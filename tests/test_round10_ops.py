"""Round-10 operator tests.

Covers the round-9 ADVICE fixes first (FLAC extended UTF-8 number
coding, LZ4 frame checksum verification, AVI stream-0 binding, the
parallel-JPEG multi-component guard), then the round's new codecs as
they land (zstd RFC 8878, FLAC LPC subframes, WebP VP8L).
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

PKG = "distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark"


# ---------------------------------------------------------------- FLAC UTF-8


@given(st.integers(min_value=0, max_value=(1 << 36) - 1))
@settings(max_examples=300, deadline=None)
def test_flac_utf8_number_roundtrips_full_36_bit_range(n):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.multimodal import (
        _MSBReader,
        _read_utf8_number,
        _utf8_number,
    )

    enc = _utf8_number(n)
    assert _read_utf8_number(_MSBReader(enc)) == n


def test_flac_utf8_number_handles_unicode_dead_zones():
    """chr().encode() would raise on surrogates and stop at 0x10FFFF;
    the FLAC coding has neither restriction (RFC 9639 §9.1.5)."""
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.multimodal import (
        _MSBReader,
        _read_utf8_number,
        _utf8_number,
    )

    for n in (0x7F, 0x80, 0x7FF, 0x800, 0xD800, 0xDFFF, 0xFFFF, 0x10FFFF,
              0x110000, (1 << 31) - 1, (1 << 36) - 1):
        enc = _utf8_number(n)
        assert _read_utf8_number(_MSBReader(enc)) == n
    # values < 0x800 must stay byte-identical to standard UTF-8
    for n in (0, 1, 0x7F, 0x80, 0x3FF, 0x7FF):
        assert _utf8_number(n) == chr(n).encode("utf-8")
    with pytest.raises(ValueError):
        _utf8_number(1 << 36)
    with pytest.raises(ValueError):
        _utf8_number(-1)


# ------------------------------------------------------- LZ4 frame checksums


@given(st.binary(max_size=3000))
@settings(max_examples=100, deadline=None)
def test_lz4_frame_checksums_roundtrip(data):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.sources.warc import (
        lz4_frame_compress,
        lz4_frame_decompress,
    )

    enc = lz4_frame_compress(data, block_checksums=True, content_checksum=True)
    assert lz4_frame_decompress(enc) == data


def test_lz4_frame_checksums_catch_corruption():
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.sources.warc import (
        lz4_frame_compress,
        lz4_frame_decompress,
    )

    data = b"the quick brown fox jumps over the lazy dog " * 400
    enc = bytearray(
        lz4_frame_compress(data, block_checksums=True, content_checksum=True)
    )
    # flip one bit inside the first block's stored bytes (after the
    # 7-byte header + 4-byte block size)
    enc[20] ^= 0x40
    with pytest.raises(ValueError):
        lz4_frame_decompress(bytes(enc))
    # flip a bit of the trailing content checksum itself
    enc2 = bytearray(
        lz4_frame_compress(data, content_checksum=True)
    )
    enc2[-1] ^= 0x01
    with pytest.raises(ValueError, match="content checksum"):
        lz4_frame_decompress(bytes(enc2))


def test_lz4_frame_dictionary_id_rejected_explicitly():
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.sources.warc import (
        _LZ4_MAGIC,
        lz4_frame_decompress,
    )

    # version-01 FLG with the DictID bit set; any header checksum —
    # the dict rejection must come first with a clear message
    payload = _LZ4_MAGIC + bytes([0x61, 0x40, 0x00, 0x00, 0x00, 0x00, 0x00])
    with pytest.raises(ValueError, match="dictionary"):
        lz4_frame_decompress(payload)


# ------------------------------------------------------ AVI stream-0 binding


def test_mjpeg_avi_binds_mjpg_check_to_stream_zero():
    """'00dc' chunks are stream 0's by AVI naming: an AVI whose FIRST
    stream is audio and whose SECOND is vids/MJPG must be rejected —
    the old code let the last vids strh whitelist stream 0's payloads."""
    import struct

    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.multimodal import (
        _avi_mjpeg_bytes,
        jpeg_gray_encode,
        mjpeg_avi_frames,
    )

    def chunk(cc, body):
        return cc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(cc, body):
        return chunk(b"LIST", cc + body)

    frame = jpeg_gray_encode(np.full((8, 8), 100, dtype=np.int64))
    auds_strh = b"auds" + b"\x00" * 52
    vids_strh = b"vids" + b"MJPG" + b"\x00" * 48
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", b"\x00" * 56)
        + lst(b"strl", chunk(b"strh", auds_strh))
        + lst(b"strl", chunk(b"strh", vids_strh)),
    )
    movi = lst(b"movi", chunk(b"00dc", frame))
    bad = chunk(b"RIFF", b"AVI " + hdrl + movi)
    with pytest.raises(ValueError, match="stream 0"):
        mjpeg_avi_frames(bad)
    # the writer's own single-stream layout still parses
    good = _avi_mjpeg_bytes([frame], 8, 8)
    assert mjpeg_avi_frames(good) == [frame]


# ------------------------------------------- parallel JPEG component guard


def test_jpeg_parallel_rejects_multi_component_streams():
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.multimodal import (
        jpeg_gray_decode_parallel,
        jpeg_ycbcr_encode,
    )

    y = np.full((16, 16), 90, dtype=np.int64)
    cb = np.full((8, 8), 10, dtype=np.int64)
    cr = np.full((8, 8), -5, dtype=np.int64)
    color = jpeg_ycbcr_encode(y, cb, cr)
    with pytest.raises(NotImplementedError):
        jpeg_gray_decode_parallel(color)
