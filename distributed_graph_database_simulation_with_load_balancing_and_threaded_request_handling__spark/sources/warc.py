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
