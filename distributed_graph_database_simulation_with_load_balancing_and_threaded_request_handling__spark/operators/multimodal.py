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
    """STUB — generic pixel decode for codec-library formats (JPEG
    entropy decode, webp…; PIL/opencv not available in this
    container).  The mapInPandas plumbing around it is real; swap
    this seam for a real decoder in production.  The PNG family needs
    NO seam: header metadata (``image_dims`` parses real
    PNG/GIF/JPEG/BMP bytes, stdlib only) and 8-bit
    grayscale/truecolor/palette pixels, sequential or
    Adam7-interlaced (``png_decode`` is a complete stdlib
    inflate+unfilter+de-interlace+PLTE decoder, value-oracle-checked
    end-to-end by q_png_decode/q_rgb_decode/q_png_palette/
    q_png_adam7)."""
    raise NotImplementedError("image decode requires PIL/opencv; stubbed by design")


def image_dims(data: bytes) -> tuple[int, int] | None:
    """REAL image dimension extraction from actual encoded bytes —
    stdlib only, header-level (no pixel decode):

    * PNG: 8-byte signature, IHDR width/height big-endian u32 at 16.
    * GIF: 'GIF87a'/'GIF89a', logical-screen w/h little-endian u16.
    * JPEG: walk the marker stream to the first SOFn frame header
      (C0-CF except the DHT/DAC/RST family), height/width big-endian
      u16 at offset 5 of the segment.
    * BMP: 'BM', BITMAPINFOHEADER w/h little-endian i32 at 18.

    Returns None for anything unrecognized or truncated — callers fall
    back to the stub/fake path, so non-image payloads keep flowing."""
    import struct

    try:
        if data[:8] == b"\x89PNG\r\n\x1a\n" and data[12:16] == b"IHDR":
            w, h = struct.unpack(">II", data[16:24])
            return (int(w), int(h))
        if data[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", data[6:10])
            return (int(w), int(h))
        if data[:2] == b"\xff\xd8":  # JPEG SOI
            pos = 2
            while pos + 4 <= len(data):
                if data[pos] != 0xFF:
                    return None
                marker = data[pos + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    pos += 2  # standalone markers have no length
                    continue
                seglen = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", data[pos + 5 : pos + 9])
                    return (int(w), int(h))
                pos += 2 + seglen
            return None
        if data[:2] == b"BM" and len(data) >= 26:
            w, h = struct.unpack("<ii", data[18:26])
            return (int(w), abs(int(h)))  # negative h = top-down DIB
    except (struct.error, IndexError):
        return None
    return None

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
            # Real header parse first (PNG/GIF/JPEG/BMP); fake dims
            # only for payloads that aren't recognizable images, so
            # the pipeline is exercised end-to-end either way.
            dims = [
                image_dims(bytes(b)) or fake_decode_meta(bytes(b)) for b in payloads
            ]
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

def audio_meta(data: bytes) -> tuple[int, int, int] | None:
    """REAL audio metadata from actual encoded bytes — stdlib-only
    RIFF/WAVE chunk walk (no soundfile/ffmpeg needed for headers):
    returns ``(sample_rate, n_channels, duration_ms)`` or None for
    anything that isn't a parseable WAV.  Walks the chunk stream (fmt
    may be preceded/followed by LIST/fact/etc.), reads PCM params
    from ``fmt `` and the payload size from ``data``; duration is
    ``n_frames * 1000 // sample_rate`` (integer ms)."""
    import struct

    try:
        if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
            return None
        pos = 12
        rate = channels = block_align = None
        data_size = None
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
            if cid == b"fmt ":
                channels, rate = struct.unpack("<HI", data[pos + 10 : pos + 16])
                block_align = struct.unpack("<H", data[pos + 20 : pos + 22])[0]
            elif cid == b"data":
                data_size = size
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        if not rate or not block_align or data_size is None:
            return None
        n_frames = data_size // block_align
        return (int(rate), int(channels), int(n_frames * 1000 // rate))
    except (struct.error, IndexError, ZeroDivisionError):
        return None


AUDIO_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sample_rate", LongType(), True),
        StructField("n_channels", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)


def extract_audio_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched audio metadata over the binary column: real WAV
    header parse (``audio_meta``); unparseable payloads yield NULL
    metadata rather than dying mid-batch."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["media"]
            metas = [audio_meta(bytes(b)) for b in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(bytes(b)) for b in payloads],
                    "sample_rate": [m[0] if m else None for m in metas],
                    "n_channels": [m[1] if m else None for m in metas],
                    "duration_ms": [m[2] if m else None for m in metas],
                }
            )

    return media.mapInPandas(process, schema=AUDIO_META_SCHEMA)


def _wav_bytes(
    sample_rate: int, n_channels: int, n_frames: int, samples: bytes | None = None
) -> bytes:
    """Minimal valid 16-bit PCM WAV: RIFF header + fmt + data
    (``samples`` as little-endian int16 payload; silent when None)."""
    import struct

    block_align = n_channels * 2
    data_size = n_frames * block_align
    payload = b"\x00" * data_size if samples is None else samples
    assert len(payload) == data_size
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt + b"data" + struct.pack(
        "<I", data_size
    ) + payload
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_pcm_decode(data: bytes):
    """REAL stdlib WAV sample decode (the audio twin of
    ``png_gray_decode``): RIFF chunk walk to ``fmt `` + ``data``,
    16-bit integer PCM asserted, samples returned as an int16 numpy
    array (interleaved channels).  Closes the audio-decode seam for
    the PCM format the fixtures plant; ``decode_audio`` remains the
    documented stub for compressed codecs (mp3/aac/opus)."""
    import struct

    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    audio_format = bits = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        if cid == b"fmt ":
            audio_format = struct.unpack("<H", data[pos + 8 : pos + 10])[0]
            bits = struct.unpack("<H", data[pos + 22 : pos + 24])[0]
        elif cid == b"data":
            payload = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    if payload is None or audio_format is None:
        raise ValueError("WAV missing fmt/data chunk")
    if (audio_format, bits) != (1, 16):
        raise ValueError(
            f"unsupported WAV shape: format={audio_format} bits={bits} "
            f"(stdlib decoder covers 16-bit integer PCM)"
        )
    return np.frombuffer(payload, dtype="<i2")


def plant_audio(documents: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Planted-WAV fixture generator (the audio analogue of
    ``plant_images``): sample rate, channel count, and frame count are
    arithmetic in the id so a SQL oracle can predict exactly what the
    byte-level parser must extract."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col]
            payloads = [
                _wav_bytes(
                    8000 + (int(i) % 5) * 4000,
                    1 + int(i) % 2,
                    100 + (37 * int(i)) % 900,
                )
                for i in ids
            ]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": ["audio"] * len(ids),
                    "media": payloads,
                    "source": ["planted"] * len(ids),
                }
            )

    return documents.select(id_col).mapInPandas(build, schema=MEDIA_SCHEMA)


def plant_audio_signal(documents: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Planted WAVs with ARITHMETIC PCM samples (the signal analogue of
    ``plant_encoded_pngs``): same rate/channel/frame params as
    ``plant_audio``, but sample k (interleaved) is
    ``((37*k + 11*id) % 4001) - 2000`` — every int16 predictable from
    the id, so signal features computed from the DECODED samples are
    value-checkable in SQL."""
    import numpy as np

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf[id_col]:
                i = int(i)
                rate = 8000 + (i % 5) * 4000
                channels = 1 + i % 2
                frames = 100 + (37 * i) % 900
                k = np.arange(frames * channels, dtype=np.int64)
                samples = (((37 * k + 11 * i) % 4001) - 2000).astype("<i2")
                ids.append(i)
                payloads.append(_wav_bytes(rate, channels, frames, samples.tobytes()))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": ["audio"] * len(ids),
                    "media": payloads,
                    "source": ["planted"] * len(ids),
                }
            )

    return documents.select(id_col).mapInPandas(build, schema=MEDIA_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_samples", LongType(), False),
        StructField("peak", LongType(), False),
        StructField("sum_abs", LongType(), False),
        StructField("sum_sq", LongType(), False),
    ]
)


def audio_pcm_features(media: DataFrame) -> DataFrame:
    """REAL signal features from DECODED PCM samples, one Arrow map
    stage: ``wav_pcm_decode`` then vectorized numpy reductions —
    ``peak = max(|s|)``, ``sum_abs = Σ|s|``, ``sum_sq = Σs²`` (the
    integer core of RMS/loudness gating: rms = sqrt(sum_sq /
    n_samples), kept as exact integers so the oracle replays them
    bit-for-bit).  Audio bytes never leave the stage — the output is
    five integers per file."""
    import numpy as np

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, peaks, sabs, ssq = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                s = wav_pcm_decode(bytes(payload)).astype(np.int64)
                a = np.abs(s)
                ids.append(int(mid))
                ns.append(int(s.size))
                peaks.append(int(a.max(initial=0)))
                sabs.append(int(a.sum(dtype=np.int64)))
                ssq.append(int((s * s).sum(dtype=np.int64)))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_samples": ns,
                    "peak": peaks,
                    "sum_abs": sabs,
                    "sum_sq": ssq,
                }
            )

    return media.mapInPandas(process, schema=AUDIO_FEATURES_SCHEMA)


def _png_bytes(w: int, h: int) -> bytes:
    """Minimal structurally-valid PNG: signature + IHDR (real CRC)."""
    import struct
    import zlib

    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"  # 8-bit RGB
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
    )


def _gif_bytes(w: int, h: int) -> bytes:
    """Minimal GIF89a header: signature + logical screen descriptor."""
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


def _jpeg_bytes(w: int, h: int) -> bytes:
    """Minimal JPEG: SOI + APP0(JFIF) + SOF0 frame header — enough
    real marker structure that the dimension parser must actually walk
    the segment stream (APP0 first) to find SOFn."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00\x01\x00\x01\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x01\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0


def plant_images(documents: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Fixture generator for the real-decode path: one structurally
    valid encoded image per document — PNG / GIF / JPEG cycling on
    ``id % 3`` — with dimensions planted arithmetically
    (w = 16 + 7*id mod 240, h = 16 + 13*id mod 240) so a SQL oracle
    can predict what the byte-level parser must extract.

    Built in the same Arrow ``mapInPandas`` shape as the consumers:
    the bytes exist only inside the map stage, never on the driver."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        makers = (_png_bytes, _gif_bytes, _jpeg_bytes)
        for pdf in batches:
            ids = pdf[id_col]
            payloads = [
                makers[int(i) % 3](16 + (7 * int(i)) % 240, 16 + (13 * int(i)) % 240)
                for i in ids
            ]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": ["image"] * len(ids),
                    "media": payloads,
                    "source": ["planted"] * len(ids),
                }
            )

    return documents.select(id_col).mapInPandas(build, schema=MEDIA_SCHEMA)


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): the neighbor (left, up,
    up-left) closest to the linear estimate a + b - c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_gray_encode(pixels, *, filter_seed: int = 0) -> bytes:
    """COMPLETE 8-bit grayscale PNG encoder (stdlib struct/zlib +
    numpy): signature, IHDR, one zlib IDAT of filtered scanlines, IEND.
    Row r uses filter type ``(filter_seed + r) % 5`` so every planted
    image exercises all five filters (None/Sub/Up/Average/Paeth) and a
    decoder cannot pass by special-casing filter 0."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w = arr.shape
    raw = _filter_scanlines(arr, 1, filter_seed)
    ihdr = struct.pack(">II", w, h) + b"\x08\x00\x00\x00\x00"  # 8-bit grayscale
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def png_rgb_encode(pixels, *, filter_seed: int = 0) -> bytes:
    """COMPLETE 8-bit truecolor (RGB, color type 2) PNG encoder — the
    3-bytes-per-pixel sibling of ``png_gray_encode``, same per-row
    filter cycle so a decoder must handle every filter at bpp=3."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    raw = _filter_scanlines(arr.reshape(h, w * 3), 3, filter_seed)
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"  # 8-bit RGB
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _filter_scanlines(flat, bpp: int, filter_seed: int) -> bytearray:
    """Apply the per-row PNG filter cycle ``(filter_seed + r) % 5`` to
    a (rows, stride) uint8 matrix — the shared forward-filter core of
    the gray/RGB encoders, reused by the Adam7 and palette encoders
    (each Adam7 pass filters independently, so callers invoke this
    once per pass with its own sub-image)."""
    import numpy as np

    mat = np.asarray(flat, dtype=np.uint8).astype(np.int64)
    n_rows, stride = mat.shape
    raw = bytearray()
    prior = np.zeros(stride, dtype=np.int64)
    for r in range(n_rows):
        row = mat[r]
        ftype = (filter_seed + r) % 5
        if ftype == 0:
            out = row
        elif ftype == 1:  # Sub
            left = np.concatenate((np.zeros(bpp, dtype=np.int64), row[:-bpp]))
            out = (row - left) % 256
        elif ftype == 2:  # Up
            out = (row - prior) % 256
        elif ftype == 3:  # Average
            left = np.concatenate((np.zeros(bpp, dtype=np.int64), row[:-bpp]))
            out = (row - (left + prior) // 2) % 256
        else:  # Paeth
            out = np.empty(stride, dtype=np.int64)
            for j in range(stride):
                a = int(row[j - bpp]) if j >= bpp else 0
                c = int(prior[j - bpp]) if j >= bpp else 0
                out[j] = (int(row[j]) - _paeth(a, int(prior[j]), c)) % 256
        raw.append(ftype)
        raw.extend(out.astype(np.uint8).tobytes())
        prior = row
    return raw


def png_gray_encode_adam7(pixels, *, filter_seed: int = 0) -> bytes:
    """8-bit grayscale PNG encoder with Adam7 interlacing (IHDR
    interlace=1): the seven RFC 2083 §8.2 passes, each sub-image
    filtered independently with the same per-row filter cycle as the
    sequential encoders — so a decoder must de-interlace AND unfilter
    every path to reproduce the arithmetic pixels."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w = arr.shape
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = arr[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        raw.extend(_filter_scanlines(sub, 1, filter_seed))
    ihdr = struct.pack(">II", w, h) + b"\x08\x00\x00\x00\x01"  # interlace=1
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def png_palette_encode(indices, palette, *, filter_seed: int = 0) -> bytes:
    """8-bit palette-indexed PNG encoder (color type 3): a PLTE chunk
    of up to 256 RGB entries plus filtered index scanlines at bpp=1 —
    the indexed-color sibling of ``png_gray_encode``."""
    import struct
    import zlib

    import numpy as np

    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    raw = _filter_scanlines(idx, 1, filter_seed)
    ihdr = struct.pack(">II", w, h) + b"\x08\x03\x00\x00\x00"  # color type 3
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", pal.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


# Adam7 interlace passes (x0, y0, dx, dy) — RFC 2083 §8.2: each pass
# is the sub-image of pixels at (x0 + i*dx, y0 + j*dy), filtered as an
# independent image (prior scanline resets per pass; empty passes
# contribute no bytes).
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _unfilter_scanlines(raw: bytes, n_rows: int, stride: int, bpp: int):
    """Reverse the per-scanline PNG filters over one filtered segment
    (a whole sequential image, or one Adam7 pass): ``n_rows`` lines of
    ``1 + stride`` bytes -> (n_rows, stride) int64 pixel bytes.

    Sub/Average/Paeth are inherently sequential across a scanline
    (each byte depends on the reconstructed neighbor ``bpp`` bytes
    left); Sub reduces to a vectorized per-byte-lane cumulative sum,
    Up is fully vectorized, and the remaining loops run per SCANLINE
    inside an Arrow-batched worker — the parallel unit at scale is
    the image, not the pixel."""
    import numpy as np

    if len(raw) != n_rows * (stride + 1):
        raise ValueError("PNG scanline payload length mismatch")
    out = np.empty((n_rows, stride), dtype=np.int64)
    prior = np.zeros(stride, dtype=np.int64)
    for r in range(n_rows):
        line = raw[r * (stride + 1) : (r + 1) * (stride + 1)]
        ftype = line[0]
        filt = np.frombuffer(line[1:], dtype=np.uint8).astype(np.int64)
        if ftype == 0:
            row = filt
        elif ftype == 1:  # Sub: cumulative sum within each byte lane
            row = filt.copy()
            for lane in range(bpp):
                row[lane::bpp] = np.cumsum(filt[lane::bpp]) % 256
        elif ftype == 2:  # Up
            row = (filt + prior) % 256
        elif ftype == 3:  # Average
            row = np.empty(stride, dtype=np.int64)
            for j in range(stride):
                a = int(row[j - bpp]) if j >= bpp else 0
                row[j] = (filt[j] + (a + prior[j]) // 2) % 256
        elif ftype == 4:  # Paeth
            row = np.empty(stride, dtype=np.int64)
            for j in range(stride):
                a = int(row[j - bpp]) if j >= bpp else 0
                c = int(prior[j - bpp]) if j >= bpp else 0
                row[j] = (filt[j] + _paeth(a, int(prior[j]), c)) % 256
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[r] = row
        prior = row
    return out


def png_decode(data: bytes):
    """REAL stdlib PNG pixel decode for 8-bit grayscale (color type
    0), truecolor RGB (color type 2), and palette-indexed (color type
    3, PLTE lookup), sequential OR Adam7-interlaced: chunk walk ->
    concatenated-IDAT zlib inflate -> per-segment unfilter for ALL
    five filter types with the correct bytes-per-pixel offset (one
    segment for interlace 0; the seven RFC 2083 §8.2 passes, each an
    independently-filtered sub-image scattered back by its stride, for
    interlace 1) -> uint8 array of shape (h, w) for grayscale or
    (h, w, 3) for RGB/palette.  This closes the image-decode seam for
    every PNG shape the fixtures plant; ``decode_image`` remains the
    documented stub for formats that genuinely need a codec library
    (JPEG entropy decode etc.)."""
    import struct
    import zlib

    import numpy as np

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos = 8
    w = h = color_type = interlace = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h = struct.unpack(">II", body[:8])
            bit_depth, color_type, _, _, interlace = struct.unpack(">BBBBB", body[8:13])
            if bit_depth != 8 or color_type not in (0, 2, 3) or interlace not in (0, 1):
                raise ValueError(
                    f"unsupported PNG shape: depth={bit_depth} color={color_type} "
                    f"interlace={interlace} (stdlib decoder covers 8-bit "
                    f"gray/RGB/palette, sequential or Adam7)"
                )
        elif tag == b"PLTE":
            if length % 3:
                raise ValueError("PLTE length not a multiple of 3")
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("PNG missing IHDR")
    if color_type == 3 and palette is None:
        raise ValueError("palette PNG missing PLTE")
    bpp = 3 if color_type == 2 else 1
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        flat = _unfilter_scanlines(raw, h, w * bpp, bpp)
    else:
        flat = np.zeros((h, w * bpp), dtype=np.int64)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            sh = len(range(y0, h, dy))
            sw = len(range(x0, w, dx))
            if sh == 0 or sw == 0:
                continue
            seg_len = sh * (sw * bpp + 1)
            sub = _unfilter_scanlines(raw[off : off + seg_len], sh, sw * bpp, bpp)
            off += seg_len
            flat.reshape(h, w, bpp)[y0::dy, x0::dx, :] = sub.reshape(sh, sw, bpp)
        if off != len(raw):
            raise ValueError("PNG interlaced payload length mismatch")
    arr = flat.astype(np.uint8)
    if color_type == 2:
        return arr.reshape(h, w, 3)
    if color_type == 3:
        idx = arr.reshape(h, w)
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("palette index out of range")
        return palette[idx]
    return arr.reshape(h, w)


def png_gray_decode(data: bytes):
    """Grayscale-asserting wrapper over ``png_decode`` (the original
    round-4 seam-closer; kept as the narrow contract the grayscale
    fixtures and ``decode_png_bitmaps`` rely on)."""
    arr = png_decode(data)
    if arr.ndim != 2:
        raise ValueError("expected 8-bit grayscale PNG")
    return arr


def plant_encoded_pngs(documents: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Fully-encoded PNG fixtures: the SAME arithmetic pixels as
    ``plant_bitmaps`` (W = 8 + id%9, H = 8 + id%7,
    pixel(i, j) = (31*i + 17*j + id) % 256) but compressed through the
    real encoder with per-row filters cycling on ``(id + r) % 5`` —
    so decoding them exercises inflate + every unfilter path, and the
    decoded result is value-predictable by the same SQL arithmetic
    that checks the raw-bitmap queries."""
    import numpy as np

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf[id_col]:
                i = int(i)
                w, h = 8 + i % 9, 8 + i % 7
                rows = np.arange(h, dtype=np.int64)[:, None] * 31
                cols = np.arange(w, dtype=np.int64)[None, :] * 17
                arr = ((rows + cols + i) % 256).astype(np.uint8)
                ids.append(i)
                payloads.append(png_gray_encode(arr, filter_seed=i))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": ["image"] * len(ids),
                    "media": payloads,
                    "source": ["planted"] * len(ids),
                }
            )

    return documents.select(id_col).mapInPandas(build, schema=MEDIA_SCHEMA)


def plant_encoded_rgb_pngs(documents: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Fully-encoded truecolor PNG fixtures: W = 8 + id%9,
    H = 8 + id%7, pixel(i, j, c) = (31*i + 17*j + 7*c + id) % 256,
    per-row filters cycling on ``(id + r) % 5`` at bpp=3 — the RGB
    twin of ``plant_encoded_pngs``."""
    import numpy as np

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf[id_col]:
                i = int(i)
                w, h = 8 + i % 9, 8 + i % 7
                rows = np.arange(h, dtype=np.int64)[:, None, None] * 31
                cols = np.arange(w, dtype=np.int64)[None, :, None] * 17
                chans = np.arange(3, dtype=np.int64)[None, None, :] * 7
                arr = ((rows + cols + chans + i) % 256).astype(np.uint8)
                ids.append(i)
                payloads.append(png_rgb_encode(arr, filter_seed=i))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": ["image"] * len(ids),
                    "media": payloads,
                    "source": ["planted"] * len(ids),
                }
            )

    return documents.select(id_col).mapInPandas(build, schema=MEDIA_SCHEMA)


def plant_encoded_adam7_pngs(documents: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Adam7-INTERLACED grayscale PNG fixtures with the SAME arithmetic
    pixels as ``plant_encoded_pngs`` (W = 8 + id%9, H = 8 + id%7,
    pixel(i, j) = (31*i + 17*j + id) % 256) — so the de-interlaced
    decode must reproduce exactly the sequential fixtures' pixel sums,
    and the q_png_decode SQL oracle applies verbatim."""
    import numpy as np

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf[id_col]:
                i = int(i)
                w, h = 8 + i % 9, 8 + i % 7
                rows = np.arange(h, dtype=np.int64)[:, None] * 31
                cols = np.arange(w, dtype=np.int64)[None, :] * 17
                arr = ((rows + cols + i) % 256).astype(np.uint8)
                ids.append(i)
                payloads.append(png_gray_encode_adam7(arr, filter_seed=i))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": ["image"] * len(ids),
                    "media": payloads,
                    "source": ["planted"] * len(ids),
                }
            )

    return documents.select(id_col).mapInPandas(build, schema=MEDIA_SCHEMA)


def plant_encoded_palette_pngs(documents: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Palette-indexed PNG fixtures: index(i, j) = (31*i + 17*j + id)
    % 256 (the familiar arithmetic grid) through a full 256-entry
    per-image palette palette[k] = ((11*k + id) % 256,
    (13*k + 2*id) % 256, (17*k + 3*id) % 256) — so the decoded RGB
    channel sums are integer-replayable by composing the two
    congruences in SQL."""
    import numpy as np

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf[id_col]:
                i = int(i)
                w, h = 8 + i % 9, 8 + i % 7
                rows = np.arange(h, dtype=np.int64)[:, None] * 31
                cols = np.arange(w, dtype=np.int64)[None, :] * 17
                idx = ((rows + cols + i) % 256).astype(np.uint8)
                k = np.arange(256, dtype=np.int64)
                pal = np.stack(
                    [
                        (11 * k + i) % 256,
                        (13 * k + 2 * i) % 256,
                        (17 * k + 3 * i) % 256,
                    ],
                    axis=1,
                ).astype(np.uint8)
                ids.append(i)
                payloads.append(png_palette_encode(idx, pal, filter_seed=i))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": ["image"] * len(ids),
                    "media": payloads,
                    "source": ["planted"] * len(ids),
                }
            )

    return documents.select(id_col).mapInPandas(build, schema=MEDIA_SCHEMA)


RGB_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("sum_r", LongType(), False),
        StructField("sum_g", LongType(), False),
        StructField("sum_b", LongType(), False),
    ]
)


def rgb_decode_stats(media: DataFrame) -> DataFrame:
    """Decode truecolor PNGs and emit per-channel pixel sums in one
    Arrow map stage — replayable integers proving the bpp=3 unfilter
    reconstructed every byte of every channel."""
    import numpy as np

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, rs, gs, bs = [], [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                arr = png_decode(bytes(payload)).astype(np.int64)
                h, w, _ = arr.shape
                ids.append(int(mid))
                ws.append(w)
                hs.append(h)
                rs.append(int(arr[:, :, 0].sum()))
                gs.append(int(arr[:, :, 1].sum()))
                bs.append(int(arr[:, :, 2].sum()))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": ws,
                    "height": hs,
                    "sum_r": rs,
                    "sum_g": gs,
                    "sum_b": bs,
                }
            )

    return media.mapInPandas(process, schema=RGB_STATS_SCHEMA)


def decode_png_bitmaps(media: DataFrame) -> DataFrame:
    """Encoded PNG column -> raw bitmap rows (``RAW_BITMAP_SCHEMA``),
    composable with ``resize_bitmaps``: the decode stage of the
    multimodal pipeline, REAL end-to-end for 8-bit grayscale."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, pxs = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                arr = png_gray_decode(bytes(payload))
                h, w = arr.shape
                ids.append(int(mid))
                ws.append(w)
                hs.append(h)
                pxs.append(arr.tobytes())
            yield pd.DataFrame(
                {"media_id": ids, "width": ws, "height": hs, "pixels": pxs}
            )

    return media.mapInPandas(process, schema=RAW_BITMAP_SCHEMA)


PNG_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("pix_sum", LongType(), False),
        StructField("resized_sum", LongType(), False),
    ]
)


def png_decode_stats(media: DataFrame, *, out_w: int, out_h: int) -> DataFrame:
    """Decode encoded PNGs and run the nearest-neighbor resize kernel
    in ONE map stage: per image, inflate + unfilter (png_gray_decode),
    then the same two-index-vector gather as ``resize_bitmaps``.
    Emits ``(media_id, width, height, pix_sum, resized_sum)`` — narrow
    replayable integers, so decoded pixels never leave the stage (the
    100 TB shape: media bytes live only inside the scan-side map)."""
    import numpy as np

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, psums, rsums = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                src = png_gray_decode(bytes(payload))
                h, w = src.shape
                rr = (np.arange(out_h, dtype=np.int64) * h) // out_h
                cc = (np.arange(out_w, dtype=np.int64) * w) // out_w
                resized = src[np.ix_(rr, cc)]
                ids.append(int(mid))
                ws.append(w)
                hs.append(h)
                psums.append(int(src.sum(dtype=np.int64)))
                rsums.append(int(resized.sum(dtype=np.int64)))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": ws,
                    "height": hs,
                    "pix_sum": psums,
                    "resized_sum": rsums,
                }
            )

    return media.mapInPandas(process, schema=PNG_STATS_SCHEMA)


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


RAW_BITMAP_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("pixels", BinaryType(), False),  # row-major grayscale
    ]
)


def plant_bitmaps(documents: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Raw grayscale bitmap fixtures with arithmetic pixels:
    W = 8 + id%9, H = 8 + id%7, pixel(i, j) = (31*i + 17*j + id) % 256
    — every byte predictable from the id, so resize output is
    value-checkable without ever materializing pixels in SQL."""
    import numpy as np

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, pxs = [], [], [], []
            for i in pdf[id_col]:
                i = int(i)
                w, h = 8 + i % 9, 8 + i % 7
                rows = np.arange(h, dtype=np.int64)[:, None] * 31
                cols = np.arange(w, dtype=np.int64)[None, :] * 17
                arr = ((rows + cols + i) % 256).astype(np.uint8)
                ids.append(i)
                ws.append(w)
                hs.append(h)
                pxs.append(arr.tobytes())
            yield pd.DataFrame(
                {"media_id": ids, "width": ws, "height": hs, "pixels": pxs}
            )

    return documents.select(id_col).mapInPandas(build, schema=RAW_BITMAP_SCHEMA)


def resize_bitmaps(
    bitmaps: DataFrame, *, out_w: int, out_h: int
) -> DataFrame:
    """REAL image resize (nearest-neighbor) over raw grayscale
    bitmaps — the resize stage of a multimodal pipeline with the codec
    removed, not stubbed: vectorized numpy index-sampling per Arrow
    batch (``out[r, c] = src[r*H // out_h, c*W // out_w]``).  Returns
    ``(media_id, out_w, out_h, checksum)`` where checksum is the sum
    of all output pixels (exactly replayable arithmetic for the
    oracle; swap the tail of the map function to emit the resized
    bytes instead when a downstream stage wants the pixels).

    Scale: pixels ride Arrow record batches; per-image work is two
    integer index vectors + one fancy-index gather — O(out pixels),
    vectorized, no Python loop over pixels."""
    import numpy as np

    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("out_w", LongType(), False),
            StructField("out_h", LongType(), False),
            StructField("checksum", LongType(), False),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sums = [], []
            for mid, w, h, raw in zip(
                pdf["media_id"], pdf["width"], pdf["height"], pdf["pixels"]
            ):
                src = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(
                    int(h), int(w)
                )
                rr = (np.arange(out_h, dtype=np.int64) * int(h)) // out_h
                cc = (np.arange(out_w, dtype=np.int64) * int(w)) // out_w
                out = src[np.ix_(rr, cc)]
                ids.append(int(mid))
                sums.append(int(out.sum(dtype=np.int64)))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "out_w": [out_w] * len(ids),
                    "out_h": [out_h] * len(ids),
                    "checksum": sums,
                }
            )

    return bitmaps.mapInPandas(process, schema=out_schema)


AUDIO_DOWNSAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("rate_out", LongType(), False),
        StructField("n_samples", LongType(), False),
        StructField("peak", LongType(), False),
        StructField("sum_abs", LongType(), False),
        StructField("sum_sq", LongType(), False),
    ]
)


def audio_downsample_features(media: DataFrame, *, factor: int = 2) -> DataFrame:
    """REAL audio resample (integer decimation) + features in one
    Arrow map stage — the audio twin of ``resize_images``'
    nearest-neighbor gather: decode PCM, reshape to (frames,
    channels), keep every ``factor``-th FRAME (all channels of a kept
    frame stay together — decimating raw interleaved samples would
    desync stereo), then the same exact-integer reductions as
    ``audio_pcm_features`` over the decimated signal, plus the new
    nominal rate ``rate // factor``.

    Decimation-without-filtering is the deterministic integer
    resample (a proper low-pass+decimate needs float FIR taps — the
    documented ``decode_audio`` seam covers codec-grade paths); what
    this pins is the Spark-side plumbing: bytes in, O(1) integers
    out, nothing but the Arrow batch crossing the stage.
    """
    import numpy as np

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rates, ns, peaks, sabs, ssq = [], [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                raw = bytes(payload)
                rate, channels, _dur = audio_meta(raw)
                s = wav_pcm_decode(raw).astype(np.int64)
                frames = s.reshape(-1, channels)[:: int(factor)]
                d = frames.ravel()
                a = np.abs(d)
                ids.append(int(mid))
                rates.append(int(rate) // int(factor))
                ns.append(int(d.size))
                peaks.append(int(a.max(initial=0)))
                sabs.append(int(a.sum(dtype=np.int64)))
                ssq.append(int((d * d).sum(dtype=np.int64)))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "rate_out": rates,
                    "n_samples": ns,
                    "peak": peaks,
                    "sum_abs": sabs,
                    "sum_sq": ssq,
                }
            )

    return media.mapInPandas(process, schema=AUDIO_DOWNSAMPLE_SCHEMA)
