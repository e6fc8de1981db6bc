"""WARC source (round 9): the Web ARChive format Common Crawl ships —
the single most common raw-input format for LLM training-data
pipelines.  Real Common Crawl WARCs are MULTI-MEMBER gzip streams (one
gzip member per WARC record, precisely so an index can point at member
byte offsets and a reader can range-read one record without inflating
the file); the parser here walks members with a zlib decompressobj
loop, so member boundaries double as record boundaries.

Scale story: at 100 TB the WARC paths live in a manifest table; each
file parses inside one Arrow ``mapInPandas`` batch (constant memory —
one member inflated at a time), and the member-offset structure is
what real pipelines use to split GIANT warcs across tasks.  Reference
analogue: none (the reference is a SysV-IPC graph server with no
ingestion formats); this belongs to the training-data-pipeline
extension brief.
"""

from __future__ import annotations

import gzip
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_FILE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("media", BinaryType(), False),
        StructField("source", StringType(), False),
    ]
)

WARC_RECORD_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("rec_idx", LongType(), False),
        StructField("warc_type", StringType(), False),
        StructField("content_length", LongType(), False),
        StructField("c_count", LongType(), False),
    ]
)


def _warc_record(warc_type: str, uri: str, payload: bytes) -> bytes:
    """One WARC/1.0 record: version line, named headers, blank line,
    payload, and the spec's two trailing CRLFs (ISO 28500 §4)."""
    headers = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode()
    return headers + payload + b"\r\n\r\n"


def warc_encode(records: list[tuple[str, str, bytes]]) -> bytes:
    """Multi-member gzip WARC: each record compressed as its OWN gzip
    member (mtime pinned to 0 for deterministic bytes), concatenated —
    the Common Crawl layout that makes record-level range reads (and
    therefore task-level splits) possible."""
    return b"".join(
        gzip.compress(_warc_record(t, u, p), mtime=0) for t, u, p in records
    )


def warc_decode(data: bytes) -> list[tuple[str, str, bytes]]:
    """Walk the gzip members with a zlib decompressobj loop (member
    boundary = record boundary), then parse each record's header block
    and slice the payload by Content-Length.  Returns
    ``[(warc_type, target_uri, payload), ...]``; raises ValueError on
    non-gzip bytes or malformed records."""
    if data[:2] != b"\x1f\x8b":
        raise ValueError("not a gzip stream")
    out = []
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        try:
            raw = d.decompress(data[pos:])
        except zlib.error as exc:
            raise ValueError(f"bad gzip member: {exc}") from exc
        if not d.eof:
            raise ValueError("truncated gzip member")
        pos = len(data) - len(d.unused_data)
        head, sep, rest = raw.partition(b"\r\n\r\n")
        if not sep or not head.startswith(b"WARC/"):
            raise ValueError("malformed WARC record")
        fields = {}
        for line in head.split(b"\r\n")[1:]:
            k, _, v = line.partition(b": ")
            fields[k.decode()] = v.decode()
        n = int(fields["Content-Length"])
        if len(rest) < n:
            raise ValueError("payload shorter than Content-Length")
        out.append(
            (fields.get("WARC-Type", ""), fields.get("WARC-Target-URI", ""), rest[:n])
        )
    return out


def plant_warc(documents: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Planted WARC fixtures with ARITHMETIC payloads: file ``id``
    carries one ``warcinfo`` record then ``1 + id % 3`` ``response``
    records; response ``r``'s payload is the unit string
    ``'doc {id} rec {r} '`` repeated ``10 + (id + r) % 20`` times — so
    content lengths and character counts replay closed-form in SQL."""
    from ..operators.multimodal import _spread

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf[id_col]:
                i = int(i)
                recs = [("warcinfo", f"urn:warc:{i}", b"format: WARC/1.0")]
                for r in range(1 + i % 3):
                    k = 10 + (i + r) % 20
                    body = (f"doc {i} rec {r} " * k).encode()
                    recs.append(("response", f"http://example.org/{i}/{r}", body))
                ids.append(i)
                payloads.append(warc_encode(recs))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": ["warc"] * len(ids),
                    "media": payloads,
                    "source": ["planted"] * len(ids),
                }
            )

    return _spread(documents.select(id_col)).mapInPandas(build, schema=WARC_FILE_SCHEMA)


def warc_records(media: DataFrame) -> DataFrame:
    """Parse WARC files into a record relation in one Arrow map stage:
    ``(media_id, rec_idx, warc_type, content_length, c_count)`` where
    ``c_count`` counts the letter 'c' in the payload — a cheap content
    checksum the oracle replays arithmetically, proving the gzip
    members actually inflated to the right bytes (length alone would
    pass a zero-filled payload).  WARC bytes never leave the stage."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                k: []
                for k in ("media_id", "rec_idx", "warc_type", "content_length", "c_count")
            }
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                for idx, (wtype, _uri, body) in enumerate(warc_decode(bytes(payload))):
                    rows["media_id"].append(int(mid))
                    rows["rec_idx"].append(idx)
                    rows["warc_type"].append(wtype)
                    rows["content_length"].append(len(body))
                    rows["c_count"].append(body.count(b"c"))
            yield pd.DataFrame(rows)

    return media.mapInPandas(process, schema=WARC_RECORD_SCHEMA)


# --- LZ4 frame format (round 9) --------------------------------------------
#
# The other wire compression real corpora arrive in (.jsonl.lz4 shard
# dumps, Kafka/Parquet lz4 payloads): the LZ4 BLOCK format (token
# byte, extended literal/match lengths, 2-byte offsets, 4-byte
# minmatch) inside the LZ4 FRAME format (magic, FLG/BD descriptor
# with an xxHash32 header-checksum byte, block-size-prefixed blocks,
# end mark) — both implemented from the public spec, stdlib-only,
# compressor AND decompressor.  Scale story: like gzip-member WARCs,
# frame blocks are independently decodable units sized by BD (64 KB
# here), so giant .lz4 shards split at block granularity.


def _xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 (public spec) — the LZ4 frame header checksum."""
    P1, P2, P3, P4, P5 = 2654435761, 2246822519, 3266489917, 668265263, 374761393
    M = 0xFFFFFFFF

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (32 - r))) & M

    i, n = 0, len(data)
    if n >= 16:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while i <= n - 16:
            for which in range(4):
                lane = int.from_bytes(data[i : i + 4], "little")
                if which == 0:
                    v1 = (rotl((v1 + lane * P2) & M, 13) * P1) & M
                elif which == 1:
                    v2 = (rotl((v2 + lane * P2) & M, 13) * P1) & M
                elif which == 2:
                    v3 = (rotl((v3 + lane * P2) & M, 13) * P1) & M
                else:
                    v4 = (rotl((v4 + lane * P2) & M, 13) * P1) & M
                i += 4
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 4 <= n:
        h = (rotl((h + int.from_bytes(data[i : i + 4], "little") * P3) & M, 17) * P4) & M
        i += 4
    while i < n:
        h = (rotl((h + data[i] * P5) & M, 11) * P1) & M
        i += 1
    h ^= h >> 15
    h = (h * P2) & M
    h ^= h >> 13
    h = (h * P3) & M
    h ^= h >> 16
    return h


def lz4_block_compress(data: bytes) -> bytes:
    """Greedy LZ4 block compressor: hash-table match finder over
    4-byte windows, spec-legal output (last 5 bytes literal-only, no
    match closer than 12 bytes to the end — the block-format end
    restrictions)."""
    n = len(data)
    out = bytearray()
    table: dict[bytes, int] = {}
    anchor = 0
    i = 0

    def emit(lit_len: int, lit_start: int, match_len: int | None, offset: int) -> None:
        tok_lit = 15 if lit_len >= 15 else lit_len
        tok_match = 0 if match_len is None else (15 if match_len - 4 >= 15 else match_len - 4)
        out.append((tok_lit << 4) | tok_match)
        rem = lit_len - 15
        while rem >= 0:
            out.append(min(rem, 255))
            if rem < 255:
                break
            rem -= 255
        out.extend(data[lit_start : lit_start + lit_len])
        if match_len is None:
            return
        out.extend(offset.to_bytes(2, "little"))
        rem = match_len - 4 - 15
        while rem >= 0:
            out.append(min(rem, 255))
            if rem < 255:
                break
            rem -= 255

    while i + 12 <= n:  # spec: matches must end >= 12 bytes before block end
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 0xFFFF and data[cand : cand + 4] == key:
            mlen = 4
            limit = n - 5  # last 5 bytes must be literals
            while i + mlen < limit and data[cand + mlen] == data[i + mlen]:
                mlen += 1
            emit(i - anchor, anchor, mlen, i - cand)
            i += mlen
            anchor = i
        else:
            i += 1
    emit(n - anchor, anchor, None, 0)
    return bytes(out)


def lz4_block_decompress(data: bytes, max_size: int = 1 << 22) -> bytes:
    """LZ4 block decompressor per the public spec: token walk,
    extended lengths, overlapping back-references copied byte-wise.
    Raises ValueError on malformed input (truncation, zero/underflow
    offsets, output overrun)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        token = data[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if i >= n:
                    raise ValueError("truncated literal length")
                b = data[i]
                i += 1
                lit += b
                if b != 255:
                    break
        if i + lit > n:
            raise ValueError("truncated literals")
        out.extend(data[i : i + lit])
        i += lit
        if i >= n:
            break  # last sequence: literals only
        if i + 2 > n:
            raise ValueError("truncated offset")
        offset = int.from_bytes(data[i : i + 2], "little")
        i += 2
        if offset == 0 or offset > len(out):
            raise ValueError("bad match offset")
        mlen = (token & 0x0F) + 4
        if (token & 0x0F) == 15:
            while True:
                if i >= n:
                    raise ValueError("truncated match length")
                b = data[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        if len(out) + mlen > max_size:
            raise ValueError("output exceeds max_size")
        src = len(out) - offset
        for k in range(mlen):  # byte-wise: offsets may overlap the output tail
            out.append(out[src + k])
    return bytes(out)


_LZ4_MAGIC = (0x184D2204).to_bytes(4, "little")


def lz4_frame_compress(
    data: bytes,
    *,
    block_size: int = 1 << 16,
    block_checksums: bool = False,
    content_checksum: bool = False,
) -> bytes:
    """LZ4 FRAME writer: magic, FLG (version 01, block-independence
    set, optional B.Checksum / C.Checksum flags), BD (64 KB max
    block), xxh32 header-checksum byte, then independently-compressed
    blocks (stored uncompressed with the high-bit size flag when
    compression does not shrink), end mark, and — when enabled — a
    per-block xxh32 over the stored block bytes and a trailing xxh32
    over the original content."""
    flg = 0x60  # version 01 + block-independence; no content size
    if block_checksums:
        flg |= 0x10
    if content_checksum:
        flg |= 0x04
    bd = 0x40  # 64 KB max block size
    header = bytes([flg, bd])
    out = bytearray(_LZ4_MAGIC + header)
    out.append((_xxh32(header) >> 8) & 0xFF)
    for off in range(0, len(data), block_size) or [0]:
        raw = data[off : off + block_size]
        if not raw:
            break
        comp = lz4_block_compress(raw)
        if len(comp) < len(raw):
            stored = comp
            out.extend(len(comp).to_bytes(4, "little") + comp)
        else:
            stored = raw
            out.extend((len(raw) | 0x80000000).to_bytes(4, "little") + raw)
        if block_checksums:
            out.extend(_xxh32(stored).to_bytes(4, "little"))
    out.extend((0).to_bytes(4, "little"))  # EndMark
    if content_checksum:
        out.extend(_xxh32(data).to_bytes(4, "little"))
    return bytes(out)


def lz4_frame_decompress(data: bytes) -> bytes:
    """LZ4 FRAME reader: validates magic, FLG version, and the xxh32
    header-checksum byte, then walks size-prefixed blocks to the end
    mark.  ValueError on anything malformed."""
    if data[:4] != _LZ4_MAGIC:
        raise ValueError("not an LZ4 frame")
    if len(data) < 7:
        raise ValueError("truncated frame header")
    flg, bd = data[4], data[5]
    if (flg >> 6) != 0b01:
        raise ValueError("unsupported LZ4 frame version")
    if flg & 0x01:  # dictionary-ID flag — explicit, not incidental
        raise ValueError("LZ4 frames with a dictionary ID are not supported")
    if flg & 0x08:  # content-size field present
        if len(data) < 15:
            raise ValueError("truncated frame header")
        header = data[4:14]
        pos = 15
    else:
        header = data[4:6]
        pos = 7
    if data[pos - 1] != (_xxh32(header) >> 8) & 0xFF:
        raise ValueError("frame header checksum mismatch")
    out = bytearray()
    while True:
        if pos + 4 > len(data):
            raise ValueError("missing end mark")
        size = int.from_bytes(data[pos : pos + 4], "little")
        pos += 4
        if size == 0:
            break
        uncompressed = bool(size & 0x80000000)
        size &= 0x7FFFFFFF
        if pos + size > len(data):
            raise ValueError("truncated block")
        block = data[pos : pos + size]
        pos += size
        if flg & 0x10:  # per-block checksum: xxh32 over stored bytes
            if pos + 4 > len(data):
                raise ValueError("truncated block checksum")
            if int.from_bytes(data[pos : pos + 4], "little") != _xxh32(block):
                raise ValueError("block checksum mismatch")
            pos += 4
        out.extend(block if uncompressed else lz4_block_decompress(block))
    if flg & 0x04:  # content checksum: xxh32 over the decoded content
        if pos + 4 > len(data):
            raise ValueError("truncated content checksum")
        if int.from_bytes(data[pos : pos + 4], "little") != _xxh32(bytes(out)):
            raise ValueError("content checksum mismatch")
    return bytes(out)


LZ4_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("n_lines", LongType(), False),
        StructField("c_count", LongType(), False),
    ]
)


def plant_lz4_shards(documents: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Planted .lz4 text shards: file ``id`` is the LZ4-frame
    compression of ``m = 20 + id % 30`` lines ``'doc {id} line {l}\\n'``
    — decompressed byte counts, line counts, and character counts
    replay closed-form in SQL."""
    from ..operators.multimodal import _spread

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf[id_col]:
                i = int(i)
                m = 20 + i % 30
                text = "".join(f"doc {i} line {l}\n" for l in range(m)).encode()
                ids.append(i)
                payloads.append(lz4_frame_compress(text))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": ["lz4"] * len(ids),
                    "media": payloads,
                    "source": ["planted"] * len(ids),
                }
            )

    return _spread(documents.select(id_col)).mapInPandas(build, schema=WARC_FILE_SCHEMA)


def lz4_corpus_stats(media: DataFrame) -> DataFrame:
    """Decompress .lz4 shards in one Arrow map stage and emit exact
    integers over the INFLATED text (bytes, lines, 'c' count): length
    alone would pass a garbage inflater that got sizes right, so the
    character count value-checks the actual reconstructed bytes."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "n_bytes", "n_lines", "c_count")}
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                raw = lz4_frame_decompress(bytes(payload))
                rows["media_id"].append(int(mid))
                rows["n_bytes"].append(len(raw))
                rows["n_lines"].append(raw.count(b"\n"))
                rows["c_count"].append(raw.count(b"c"))
            yield pd.DataFrame(rows)

    return media.mapInPandas(process, schema=LZ4_STATS_SCHEMA)
