"""Round-12 operator tests.

Covers the round-11 ADVICE fixes first (GIF transparent-index bounds
policy, bench rounds schema), then the round's codec work as it lands:
sub-8-bit PNG depths + tRNS, zstd dictionary frames, Ogg-encapsulated
FLAC, lossy-WebP VP8 keyframes, MP3 Layer III.
"""

import importlib
import struct

import numpy as np
import pytest

PKG = "distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark"


def _mm():
    return importlib.import_module(f"{PKG}.operators.multimodal")


# ------------------------------------------------------ r11 ADVICE fixes


def test_gif_transparent_index_beyond_local_palette_is_legal():
    """A transparent index past the end of a small LOCAL color table is
    legal (it is never mapped through the palette); only OPAQUE indices
    are bounds-checked (r11 ADVICE, multimodal.py:4043)."""
    mm = _mm()
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 2, 0xF7, 0, 0)
    out += mm._GIF_GRAY_PALETTE  # 256-entry global table
    def img(idx_arr, iflags, mcs, pal=b""):
        b = bytearray(b"\x2c") + struct.pack("<HHHHB", 0, 0, 2, 2, iflags)
        b += pal + bytes([mcs])
        comp = mm._lzw_compress(idx_arr.tobytes(), mcs)
        b += bytes([len(comp)]) + comp + b"\x00"
        return b
    gce = bytearray(b"\x21\xf9\x04") + struct.pack("<BHB", 0x05, 1, 5) + b"\x00"
    # base frame: opaque 7s through the global palette
    out += img(np.full((2, 2), 7, np.uint8), 0x00, 8)
    # second frame: LOCAL 4-entry palette (indices 0-3 valid), GCE
    # transparent index 5 — beyond the table but never palette-mapped
    local_pal = bytes([0, 0, 0, 10, 0, 0, 20, 0, 0, 30, 0, 0])
    arr = np.array([[5, 2], [2, 5]], dtype=np.uint8)
    out += gce + img(arr, 0x81, 3, local_pal)
    out += b"\x3b"
    d = mm.gif_decode_frames(bytes(out))
    assert np.array_equal(d[1], np.array([[7, 20], [20, 7]]))


def test_gif_opaque_index_beyond_palette_still_rejected():
    """The opaque-index bounds check survives the r11 ADVICE fix."""
    mm = _mm()
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 2, 0x00, 0, 0)
    local_pal = bytes(12)  # 4 entries
    b = bytearray(b"\x2c") + struct.pack("<HHHHB", 0, 0, 2, 2, 0x81)
    b += local_pal + bytes([3])
    comp = mm._lzw_compress(np.full((2, 2), 5, np.uint8).tobytes(), 3)
    b += bytes([len(comp)]) + comp + b"\x00"
    out += b + b"\x3b"
    with pytest.raises(ValueError, match="palette index out of range"):
        mm.gif_decode_frames(bytes(out))


def test_bench_rounds_schema_always_op_keyed():
    """bench.py records LOOP_STATS in the op-keyed nested form even for
    a single instrumented loop (r11 ADVICE, bench.py:89)."""
    import ast
    import pathlib

    src = (pathlib.Path(__file__).parent.parent / "bench.py").read_text()
    tree = ast.parse(src)
    # no `len(stats) == 1` special case survives anywhere in bench.py
    for node in ast.walk(tree):
        if isinstance(node, ast.Compare):
            seg = ast.get_source_segment(src, node) or ""
            assert "len(stats) == 1" not in seg
