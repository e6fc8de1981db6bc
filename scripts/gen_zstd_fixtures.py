"""Generate the committed zstd interop fixtures in tests/data/zstd/.

Each fixture is REAL ``zstd`` CLI output over a plaintext that the
test re-derives deterministically (closed-form text + an inline LCG —
no dependence on stdlib RNG stream stability), so only the compressed
bytes are committed and the decode test is hermetic: if the from-spec
decoder (sources/zstdcodec.py) mis-implements any of FSE, Huffman,
sequences, or the checksum, the fixture decode diverges from the
re-derived plaintext.

One-shot provenance tool; rerun only to regenerate (requires a zstd
CLI on PATH or at /root/miniconda/bin/zstd).
"""

import os
import shutil
import subprocess
import sys

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "zstd")


def lcg_bytes(n: int, seed: int = 12345) -> bytes:
    """Deterministic pseudo-random bytes (Numerical-Recipes LCG)."""
    out = bytearray(n)
    s = seed & 0xFFFFFFFF
    for i in range(n):
        s = (1664525 * s + 1013904223) & 0xFFFFFFFF
        out[i] = s >> 24
    return bytes(out)


def plaintexts() -> dict[str, bytes]:
    jsonl = "".join(
        f'{{"doc_id": {i}, "lang": "en", "text": "fixture document {i} '
        f'body with some repeated phrasing, phrase {i % 7}"}}\n'
        for i in range(1500)
    ).encode()
    return {
        "jsonl": jsonl,                        # the .jsonl.zst shape
        "binary": lcg_bytes(40000),            # incompressible -> raw blocks
        "runs": b"abcabcabc" * 8000 + b"Z" * 5000,  # long matches + RLE-ish
        "mixed": jsonl[:30000] + lcg_bytes(20000, seed=9) + jsonl[30000:60000],
    }


def main() -> None:
    cli = shutil.which("zstd") or "/root/miniconda/bin/zstd"
    os.makedirs(OUT, exist_ok=True)
    texts = plaintexts()
    jobs = [
        ("jsonl_l1.zst", ["-1"], texts["jsonl"]),
        ("jsonl_l19.zst", ["-19"], texts["jsonl"]),
        ("binary_l3.zst", ["-3"], texts["binary"]),
        ("runs_l3.zst", ["-3"], texts["runs"]),
        ("mixed_l12.zst", ["-12"], texts["mixed"]),
        ("jsonl_l3_nocheck.zst", ["-3", "--no-check"], texts["jsonl"]),
    ]
    for name, args, payload in jobs:
        comp = subprocess.run([cli, *args, "-c"], input=payload,
                              capture_output=True, check=True).stdout
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(comp)
        print(f"wrote {name}: {len(payload)} -> {len(comp)}")
    # multi-frame concatenation (frame-per-record shard layout)
    f1 = subprocess.run([cli, "-3", "-c"], input=texts["runs"],
                        capture_output=True, check=True).stdout
    f2 = subprocess.run([cli, "-19", "-c"], input=texts["jsonl"][:5000],
                        capture_output=True, check=True).stdout
    with open(os.path.join(OUT, "concat_2frames.zst"), "wb") as f:
        f.write(f1 + f2)
    print(f"wrote concat_2frames.zst: {len(f1) + len(f2)}")

    # Shared dictionary (round 12): train over the exact q_zstd_dict
    # shard distribution (ZSTD_DICT_TEMPLATE + unique tail) and commit
    # the result as PACKAGE data (the query's plant/decode stages and
    # the interop tests read the same file).  Also commit two
    # CLI-compressed-with-dict shards for the decode-direction test.
    import tempfile

    sys.path.insert(0, os.path.dirname(OUT.rsplit("/tests", 1)[0]) or "/root/repo")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.sources.zstdcodec import (
        ZSTD_DICT_TEMPLATE,
    )

    pkg_data = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark",
        "sources", "data",
    )
    os.makedirs(pkg_data, exist_ok=True)
    dict_path = os.path.join(pkg_data, "zstd_shared.dict")
    with tempfile.TemporaryDirectory() as td:
        for i in range(240):
            text = f"{ZSTD_DICT_TEMPLATE}doc {i} tail {(i * i) % 9973}\n"
            with open(os.path.join(td, f"s{i}.txt"), "w") as f:
                f.write(text)
        subprocess.run(
            [cli, "--train", *[os.path.join(td, f"s{i}.txt") for i in range(240)],
             "-o", dict_path, "--maxdict=4096", "-f"],
            check=True, capture_output=True,
        )
        print(f"wrote {dict_path}: {os.path.getsize(dict_path)} bytes")
        for i in (7, 42):
            out_zst = os.path.join(OUT, f"dict_shard{i}.zst")
            subprocess.run(
                [cli, "-q", "-19", "-D", dict_path,
                 os.path.join(td, f"s{i}.txt"), "-o", out_zst, "-f"],
                check=True,
            )
            print(f"wrote dict_shard{i}.zst: {os.path.getsize(out_zst)}")


if __name__ == "__main__":
    sys.exit(main())
