"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` pipelines.

The decode step itself is STUBBED (no image/audio libraries in this
environment): ``decode_image``/``decode_audio`` raise
NotImplementedError behind a clearly-marked seam, and
``fake_decode_meta`` provides a deterministic stand-in so the
Spark-side plumbing — schema, batch iteration, partitioning, UDF
signatures — is real and tested end-to-end.

Scale posture (100 TB): media bytes stay in Arrow record batches from
Parquet scan to Python worker (no row-at-a-time pickling); per-batch
processing bounds Python memory by ``spark.sql.execution.arrow.
maxRecordsPerBatch``; outputs are narrow metadata rows so only the
map stage ever holds media bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

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

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("media", BinaryType(), True),        # opaque encoded bytes
        StructField("source", StringType(), True),
    ]
)

META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sha256", StringType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
    ]
)

def attach_media(documents: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Demo media table over the documents fixture: utf-8 bytes of the
    text as the opaque payload (deterministic, library-free).  Real
    pipelines read binary columns straight from Parquet."""
    return documents.select(
        F.col(id_col).alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("media"),
        F.col("source"),
    )

def decode_image(data: bytes) -> Any:
    """STUB — image decode (PIL/opencv not available in this
    container).  The mapInPandas plumbing around it is real; swap this
    seam for a real decoder in production."""
    raise NotImplementedError("image decode requires PIL/opencv; stubbed by design")

def decode_audio(data: bytes) -> Any:
    """STUB — audio decode (soundfile/ffmpeg not available)."""
    raise NotImplementedError("audio decode requires soundfile/ffmpeg; stubbed by design")

def fake_decode_meta(data: bytes) -> tuple[int, int]:
    """Deterministic stand-in for the decode step: derive a fake
    (width, height) from the payload digest.  Lets tests exercise the
    full distributed pipeline without media libraries."""
    d = hashlib.sha256(data).digest()
    return (64 + d[0] % 192, 64 + d[1] % 192)

def extract_media_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column:
    byte length, content digest, and (fake-)decoded dimensions.

    ``mapInPandas`` so each Python worker sees an iterator of Arrow
    batches — constant memory regardless of table size.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["media"]
            dims = [fake_decode_meta(bytes(b)) for b in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(b)) for b in payloads],
                    "sha256": [hashlib.sha256(bytes(b)).hexdigest() for b in payloads],
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                }
            )

    return media.mapInPandas(process, schema=META_SCHEMA)

def frame_sample(media: DataFrame, *, chunk_bytes: int = 4096, max_frames: int = 8) -> DataFrame:
    """'Video frame sampling' over opaque bytes: split each payload
    into fixed-size chunks and keep every k-th so at most
    ``max_frames`` survive — the partitioning/batch shape of real
    frame extraction with the codec swapped for byte slicing."""
    frame_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_no", LongType(), False),
            StructField("frame", BinaryType(), False),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                raw = bytes(payload)
                chunks = [raw[i : i + chunk_bytes] for i in range(0, len(raw), chunk_bytes)]
                stride = max(1, -(-len(chunks) // max_frames))  # ceil div
                for j, ch in enumerate(chunks[::stride][:max_frames]):
                    ids.append(mid)
                    nos.append(j)
                    frames.append(ch)
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    return media.where(F.col("media_type") == "video").mapInPandas(process, schema=frame_schema)
