"""Round-11 operator tests.

Covers the round-10 ADVICE fixes first (zstd RLE block-size bound,
truncated trailing skippable frame), then the round's codec work as it
lands: stereo FLAC channel decorrelation (RFC 9639 §9.1.3), JPEG
4:4:4 / 4:2:2 sampling grids, GIF transparency + interlace, and the
WebP encoder transform subset.
"""

import importlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

PKG = "distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark"


def _zc():
    return importlib.import_module(f"{PKG}.sources.zstdcodec")


def _mm():
    return importlib.import_module(f"{PKG}.operators.multimodal")


# ------------------------------------------------------- zstd ADVICE fixes


def test_zstd_rle_block_respects_block_maximum_size():
    """RFC 8878 §3.1.1.2.3: Block_Size <= Block_Maximum_Size applies to
    RLE blocks too — a 21-bit RLE regenerated size past 128 KiB must be
    rejected, not expanded (r10 ADVICE)."""
    Z = _zc()
    bsize = Z._BLOCK_MAX + 1
    hdr = ((bsize << 3) | (1 << 1) | 1).to_bytes(3, "little")
    frame = Z.ZSTD_MAGIC + bytes([0x20, 0x00]) + hdr + b"x"
    with pytest.raises(ValueError, match="maximum size"):
        Z.zstd_decompress(frame)
    # the boundary itself stays legal
    hdr_ok = ((Z._BLOCK_MAX << 3) | (1 << 1) | 1).to_bytes(3, "little")
    ok = Z.ZSTD_MAGIC + bytes([0x00]) + b"\x00" + hdr_ok + b"x"
    assert Z.zstd_decompress(ok) == b"x" * Z._BLOCK_MAX


def test_zstd_truncated_trailing_skippable_frame_raises():
    """A skippable frame whose declared size runs past the end of input
    must raise like every other truncation path, not be silently
    accepted as clean EOF (r10 ADVICE)."""
    Z = _zc()
    good = Z.zstd_compress(b"payload bytes")
    skip = (0x184D2A50).to_bytes(4, "little") + (100).to_bytes(4, "little") + b"\x00" * 10
    with pytest.raises(ValueError, match="skippable"):
        Z.zstd_decompress(good + skip)
    # a complete trailing skippable frame still decodes cleanly
    whole = (0x184D2A50).to_bytes(4, "little") + (4).to_bytes(4, "little") + b"abcd"
    assert Z.zstd_decompress(good + whole) == b"payload bytes"
