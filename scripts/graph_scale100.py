"""100x GRAPH-FAMILY gate (round-8 verdict #6): demonstrate — not
extrapolate — the superstep-floor claims of the heaviest iterative
queries by running them at a 100x scale-up of sf0.1 (sf10-equivalent,
~60M lineitem rows, ~120M co-purchase edge rows) and recording wall
time AND the measured superstep counts (graphalgs.LOOP_STATS) next to
the same-boot 10x numbers.

Graph tables only (customer/supplier/orders/lineitem + fixed
region/nation): the full 100x set does not fit the container disk,
and the four gate queries read nothing else.  No DuckDB oracle at this
scale — correctness is the decade gate's job (sf1-equivalent, full
value oracles); THIS gate is the scaling-shape evidence: rounds must
stay flat (they are O(log n) / O(diameter), and the replicated
copies are disconnected components so diameter is unchanged) while
wall grows sub-linearly in edges.

Usage: python scripts/graph_scale100.py [--skip-gen] [--no-baseline]
Writes the results table into BASELINE.md between the GRAPH100_GATE
sentinels unless --no-baseline.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALED100 = os.path.join(REPO, ".scratch", "sf100x0.1_graph")
SCALED10 = os.path.join(REPO, ".scratch", "sf10x0.1")
GRAPH_TABLES = "customer,supplier,orders,lineitem"
QUERIES = ("q_sssp", "q_scc", "q_msf", "q_betweenness")
BEGIN = "<!-- GRAPH100_GATE:BEGIN (maintained by scripts/graph_scale100.py) -->"
END = "<!-- GRAPH100_GATE:END -->"


def _gen(out: str, factor: int) -> None:
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "gen_scaled_testdata.py"),
            str(factor),
            "/root/testdata/sf0.1",
            out,
            "--tables",
            GRAPH_TABLES,
        ],
        check=True,
    )


def main() -> int:
    if not os.path.isdir(SCALED100) and "--skip-gen" not in sys.argv:
        print(f"== generating {SCALED100} (graph tables only)", flush=True)
        _gen(SCALED100, 100)
    if not os.path.isdir(SCALED10):
        print(f"== generating {SCALED10} (full decade-gate set)", flush=True)
        subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "scripts", "gen_scaled_testdata.py"),
                "10",
            ],
            check=True,
        )

    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators import (
        graphalgs,
    )
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.session import (
        get_spark,
    )

    spark = get_spark()
    qs = entrymod.queries()
    results: dict[str, dict] = {}
    for sf_label, sf_dir in (("10x", SCALED10), ("100x", SCALED100)):
        for name in QUERIES:
            graphalgs.LOOP_STATS.clear()
            t0 = time.time()
            n_rows = qs[name](spark, sf_dir).count()
            wall = time.time() - t0
            stats = dict(next(iter(graphalgs.LOOP_STATS.values()), {}))
            results.setdefault(name, {})[sf_label] = {
                "wall_s": round(wall, 1),
                "rows": n_rows,
                **stats,
            }
            print(
                f"   {sf_label:>4} {name}: {wall:6.1f}s, {n_rows} rows, {stats}",
                flush=True,
            )

    lines = [
        BEGIN,
        "",
        "### 100x graph-family gate (scripts/graph_scale100.py)",
        "",
        "Same-boot 10x-vs-100x scale-up of sf0.1 (graph tables only at",
        "100x; ~120M co-purchase edge rows).  Rounds are the MEASURED",
        "superstep counts (graphalgs.LOOP_STATS) — the flat-rounds /",
        "sub-linear-wall evidence behind the O(log n) / O(diameter)",
        "claims.  No oracle at this scale (the decade gate owns",
        "correctness); row counts are recorded for plausibility.",
        "",
        "| query | 10x wall | 10x rounds | 10x rows | 100x wall | 100x rounds | 100x rows | wall ratio |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name in QUERIES:
        r10, r100 = results[name]["10x"], results[name]["100x"]

        def fmt_rounds(r):
            return (
                "/".join(str(v) for k, v in r.items() if k not in ("wall_s", "rows"))
                or "-"
            )

        ratio = round(r100["wall_s"] / max(r10["wall_s"], 0.1), 1)
        lines.append(
            f"| {name} | {r10['wall_s']}s | {fmt_rounds(r10)} | {r10['rows']} "
            f"| {r100['wall_s']}s | {fmt_rounds(r100)} | {r100['rows']} "
            f"| {ratio}x |"
        )
    lines += ["", END]
    block = "\n".join(lines)
    print(block)
    print(json.dumps(results))

    if "--no-baseline" not in sys.argv:
        path = os.path.join(REPO, "BASELINE.md")
        text = open(path).read()
        if BEGIN in text and END in text:
            pre = text[: text.index(BEGIN)]
            post = text[text.index(END) + len(END) :]
            text = pre + block + post
        else:
            text = text.rstrip() + "\n\n" + block + "\n"
        open(path, "w").write(text)
        print(f"BASELINE.md updated between GRAPH100_GATE sentinels")
    return 0


if __name__ == "__main__":
    sys.exit(main())
