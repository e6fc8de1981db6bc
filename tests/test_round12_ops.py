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


# ------------------------------------- sub-8-bit PNG + tRNS (r12)


def _lowbit_case(i):
    mm = _mm()
    d = 1 << (i % 3)
    n = 1 << d
    w, h = 8 + i % 9, 8 + i % 7
    ii = np.arange(h)[:, None]
    jj = np.arange(w)[None, :]
    v = (3 * ii + 5 * jj + i) % n
    return mm, d, n, v, w, h


@pytest.mark.parametrize("i", [0, 1, 2, 3, 4, 5, 10, 11, 15, 20])
def test_png_lowbit_roundtrip_gray_and_palette(i):
    """1/2/4-bit encode->decode round-trip: gray bit-replicates to
    8 bits, palette maps through PLTE; Adam7 and tRNS variants per
    the fixture's id arithmetic."""
    mm, d, n, v, w, h = _lowbit_case(i)
    inter = i % 5 == 0
    has_trns = i % 4 < 2
    if i % 2 == 0:
        trns = (i % n).to_bytes(2, "big") if has_trns else None
        got = mm.png_decode(
            mm.png_lowbit_encode(v, d, color_type=0, trns=trns,
                                 filter_seed=i, interlace=inter)
        )
        scale = 255 // (n - 1)
        if has_trns:
            assert got.shape == (h, w, 2)
            assert np.array_equal(got[..., 0], v * scale)
            assert np.array_equal(got[..., 1], np.where(v == i % n, 0, 255))
        else:
            assert np.array_equal(got, v * scale)
    else:
        kk = np.arange(n)
        pal = np.stack(
            [(11 * kk + i) % 256, (13 * kk + 2 * i) % 256, (17 * kk + 3 * i) % 256],
            axis=1,
        ).astype(np.uint8)
        trns = None
        if has_trns:
            al = 1 + (37 * kk + 11 * i) % 255
            al[i % n] = 0
            trns = bytes(al.astype(np.uint8))
        got = mm.png_decode(
            mm.png_lowbit_encode(v, d, color_type=3, palette=pal, trns=trns,
                                 filter_seed=i, interlace=inter)
        )
        if has_trns:
            assert got.shape == (h, w, 4)
            assert np.array_equal(got[..., :3], pal[v])
            assert np.array_equal(got[..., 3], np.frombuffer(trns, np.uint8)[v])
        else:
            assert np.array_equal(got, pal[v])


def test_png_trns_rgb_keyed_transparency():
    """RGB tRNS: the single keyed color decodes with alpha 0, all
    other pixels 255; short palette tRNS defaults missing entries to
    opaque per RFC 2083 §4.2.1."""
    mm = _mm()
    img = np.zeros((4, 4, 3), np.uint8)
    img[1, 1] = img[2, 2] = [9, 8, 7]
    got = mm.png_decode(mm.png_rgb_encode(img, trns_rgb=(9, 8, 7)))
    assert got.shape == (4, 4, 4)
    assert int((got[..., 3] == 0).sum()) == 2 and got[1, 1, 3] == 0
    # short palette tRNS: entries past the table are opaque
    pal = np.arange(12, dtype=np.uint8).reshape(4, 3)
    idx = np.array([[0, 1], [2, 3]])
    enc = mm.png_lowbit_encode(idx, 2, color_type=3, palette=pal, trns=b"\x00\x80")
    got2 = mm.png_decode(enc)
    assert list(got2[..., 3].ravel()) == [0, 0x80, 255, 255]


def test_png_trns_gray16_uses_full_range_alpha():
    mm = _mm()
    g16 = ((np.arange(12, dtype=np.int64).reshape(3, 4) * 999) % 65536).astype(
        np.uint16
    )
    enc = mm.png_encode16(g16, color_type=0)
    key = int(g16[1, 1])
    hdr, rest = enc[: 8 + 25], enc[8 + 25 :]
    got = mm.png_decode(hdr + mm._png_chunk(b"tRNS", key.to_bytes(2, "big")) + rest)
    assert got.shape == (3, 4, 2) and got.dtype == np.uint16
    assert got[1, 1, 1] == 0 and got[0, 0, 1] == 65535
    assert np.array_equal(got[..., 0], g16)


def test_png_lowbit_guards():
    """Spec-illegal combinations still raise: sub-byte RGB, 16-bit
    palette, tRNS on an alpha color type."""
    mm = _mm()
    with pytest.raises(ValueError, match="unsupported PNG shape"):
        # hand-build a depth-2 RGB header
        import struct as st
        ihdr = st.pack(">II", 4, 4) + bytes([2, 2, 0, 0, 0])
        mm.png_decode(b"\x89PNG\r\n\x1a\n" + mm._png_chunk(b"IHDR", ihdr))
    rgba = np.zeros((2, 2, 4), np.uint8)
    enc = mm.png_rgba_encode(rgba)
    hdr, rest = enc[: 8 + 25], enc[8 + 25 :]
    with pytest.raises(ValueError, match="illegal with an alpha"):
        mm.png_decode(hdr + mm._png_chunk(b"tRNS", b"\x00\x00") + rest)


# ----------------------------------------- zstd dictionary frames (r12)


def _zc():
    return importlib.import_module(f"{PKG}.sources.zstdcodec")


def _dict_text(i):
    Z = _zc()
    return f"{Z.ZSTD_DICT_TEMPLATE}doc {i} tail {(i * i) % 9973}\n".encode()


def test_zstd_dict_parse_and_fixture_decode():
    """The committed trained dictionary parses (RFC 8878 §5 layout)
    and the committed `zstd -19 -D` shards decode to the re-derived
    plaintext through the DID gate + dict window."""
    import pathlib

    Z = _zc()
    d = Z.shared_dictionary()
    assert d.dict_id != 0
    assert Z.ZSTD_DICT_TEMPLATE.encode() in d.content
    assert all(0 < r <= len(d.content) for r in d.rep)
    data_dir = pathlib.Path(__file__).parent / "data" / "zstd"
    for i in (7, 42):
        comp = (data_dir / f"dict_shard{i}.zst").read_bytes()
        assert Z.zstd_decompress(comp, dictionary=d) == _dict_text(i)


def test_zstd_dict_roundtrip_and_compression_win():
    """Our dictionary frames round-trip and genuinely use the dict:
    the template collapses into matches, so the dict frame is a small
    fraction of the plain frame."""
    Z = _zc()
    d = Z.shared_dictionary()
    for i in (0, 3, 99, 1234):
        text = _dict_text(i)
        enc = Z.zstd_compress(text, dictionary=d)
        assert Z.zstd_decompress(enc, dictionary=d) == text
        assert len(enc) < 0.3 * len(Z.zstd_compress(text))


def test_zstd_dict_cli_decodes_our_frames():
    """Live interop, encode direction: the reference CLI accepts our
    dictionary frames (DID + window descriptor + dict-prefix
    matches)."""
    import shutil
    import subprocess

    cli = shutil.which("zstd")
    if cli is None:
        pytest.skip("zstd CLI not available")
    Z = _zc()
    d = Z.shared_dictionary()
    import os
    dict_path = os.path.join(
        os.path.dirname(Z.__file__), "data", "zstd_shared.dict"
    )
    text = _dict_text(77)
    enc = Z.zstd_compress(text, dictionary=d)
    got = subprocess.run(
        [cli, "-d", "-q", "-D", dict_path, "-c"], input=enc, capture_output=True
    )
    assert got.returncode == 0, got.stderr
    assert got.stdout == text


def test_zstd_dict_guards():
    """DID gate: a dict frame without a dictionary raises; a mismatched
    dictionary ID raises; out-of-range dictionary recent offsets
    raise at parse time."""
    Z = _zc()
    d = Z.shared_dictionary()
    enc = Z.zstd_compress(_dict_text(5), dictionary=d)
    with pytest.raises(ValueError, match="requires dictionary"):
        Z.zstd_decompress(enc)
    import copy
    d2 = copy.copy(d)
    d2.dict_id = d.dict_id + 1
    with pytest.raises(ValueError, match="ID mismatch"):
        Z.zstd_decompress(enc, dictionary=d2)
    # rep offset beyond content size -> parse-time rejection: the 12
    # recent-offset bytes sit immediately before the content
    import os
    raw = bytearray(
        open(os.path.join(os.path.dirname(Z.__file__), "data",
                          "zstd_shared.dict"), "rb").read()
    )
    rep_at = raw.rindex(d.content) - 12
    raw[rep_at : rep_at + 4] = (len(d.content) + 1).to_bytes(4, "little")
    with pytest.raises(ValueError, match="recent offset"):
        Z.zstd_parse_dictionary(bytes(raw))
    # bad magic
    with pytest.raises(ValueError, match="dictionary magic"):
        Z.zstd_parse_dictionary(b"\x00" * 32)


def test_zstd_dict_frame_corruption_never_silent():
    """Flipping any byte of a dictionary frame must raise or change
    the output — the checksum + structural validation leave no silent
    path back to the original text."""
    Z = _zc()
    d = Z.shared_dictionary()
    text = _dict_text(11)
    enc = bytearray(Z.zstd_compress(text, dictionary=d))
    for pos in range(4, len(enc), max(1, len(enc) // 17)):
        bad = bytearray(enc)
        bad[pos] ^= 0x41
        try:
            got = Z.zstd_decompress(bytes(bad), dictionary=d)
        except (ValueError, IndexError):
            continue
        assert got != text, f"silent corruption at byte {pos}"


# ------------------------------------------- Ogg-encapsulated FLAC (r12)


def _ogg_signal(i):
    n = 100 + (37 * i) % 900
    k = np.arange(n, dtype=np.int64)
    return ((37 * k + 11 * i) % 4001) - 2000, 8000 + (i % 5) * 4000


@pytest.mark.parametrize("i", [0, 1, 4, 9])
def test_ogg_flac_roundtrip(i):
    """Ogg encapsulation must be transparent: page walk + lacing
    reassembly + mapping strip reproduce the native decode exactly,
    for both 1- and 2-frame pages."""
    mm = _mm()
    x, rate = _ogg_signal(i)
    enc = mm.ogg_flac_encode(x, rate, block_size=256, frames_per_page=1 + i % 2)
    s, r = mm.ogg_flac_decode(enc)
    assert r == rate
    assert np.array_equal(s.astype(np.int64), x)


def test_ogg_flac_structure():
    """BOS on the first page only; EOS on the last; the mapping packet
    is alone on page 0 and carries version 1.0 + the native fLaC
    signature; granules are cumulative interleaved sample counts."""
    mm = _mm()
    x, rate = _ogg_signal(3)
    enc = mm.ogg_flac_encode(x, rate, block_size=256)
    pages = []
    pos = 0
    while pos < len(enc):
        assert enc[pos : pos + 4] == b"OggS"
        nseg = enc[pos + 26]
        lac = enc[pos + 27 : pos + 27 + nseg]
        end = pos + 27 + nseg + sum(lac)
        pages.append(enc[pos:end])
        pos = end
    assert pages[0][5] == 0x02 and all(p[5] != 0x02 for p in pages[1:])
    assert pages[-1][5] == 0x04
    packets = mm.ogg_packets(enc)
    assert packets[0][:9] == b"\x7fFLAC\x01\x00\x00\x00"
    assert packets[0][9:13] == b"fLaC"
    last_granule = int.from_bytes(pages[-1][6:14], "little")
    assert last_granule == len(x)


def test_ogg_flac_page_crc_and_lacing_guards():
    """A flipped body byte fails the page CRC; a continued-packet flag
    contradiction fails; truncation mid-packet fails."""
    mm = _mm()
    x, rate = _ogg_signal(5)
    enc = bytearray(mm.ogg_flac_encode(x, rate, block_size=256))
    bad = bytearray(enc)
    bad[-1] ^= 0x10
    with pytest.raises(ValueError, match="CRC"):
        mm.ogg_packets(bytes(bad))
    with pytest.raises(ValueError, match="capture pattern"):
        mm.ogg_packets(b"NotO" + bytes(enc[4:]))
    # a packet split by a 255 lacing run with no terminator -> mid-packet
    pkt = bytes(range(255))
    page = mm._ogg_page([pkt], serial=1, seqno=0, granule=0, htype=0x02)
    # _ogg_page terminates a 255-multiple packet with a 0 lacing value;
    # strip that terminator to simulate truncation
    assert page[26] == 2 and page[28] == 0
    broken = bytearray(page[:28] + page[29:])
    broken[26] = 1
    import struct
    broken[22:26] = b"\x00\x00\x00\x00"
    broken[22:26] = struct.pack("<I", mm._ogg_crc(bytes(broken)))
    with pytest.raises(ValueError, match="mid-packet"):
        mm.ogg_packets(bytes(broken))


def test_ogg_cross_page_packet_continuation():
    """A packet whose lacing ends at 255 continues onto the next page
    (continued-packet flag set): reassembly must splice it; a missing
    flag must raise."""
    mm = _mm()
    import struct

    pkt = bytes((i * 7) % 256 for i in range(300))  # 255 + 45 split

    def page(body, lac, htype, seqno):
        hdr = (
            b"OggS\x00" + bytes([htype]) + struct.pack("<q", 0)
            + struct.pack("<I", 9) + struct.pack("<I", seqno)
            + b"\x00\x00\x00\x00" + bytes([len(lac)]) + bytes(lac)
        )
        pg = bytearray(hdr + body)
        pg[22:26] = struct.pack("<I", mm._ogg_crc(bytes(pg)))
        return bytes(pg)

    p1 = page(pkt[:255], [255], 0x02, 0)           # BOS, packet continues
    p2 = page(pkt[255:], [45], 0x01, 1)            # continued-packet flag
    assert mm.ogg_packets(p1 + p2) == [pkt]
    p2_noflag = page(pkt[255:], [45], 0x00, 1)
    with pytest.raises(ValueError, match="continued-packet flag"):
        mm.ogg_packets(p1 + p2_noflag)


def test_vp8_bool_coder_roundtrip_property():
    """The RFC 6386 boolean coder primitives: any (bit, prob) sequence
    encodes and decodes identically (hypothesis-driven)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    V = _vp8()

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 1), st.integers(1, 254)),
            min_size=1, max_size=300,
        )
    )
    def check(seq):
        enc = V._BoolEnc()
        for bit, prob in seq:
            enc.put(bit, prob)
        data = enc.finish()
        dec = V._BoolDec(data)
        for bit, prob in seq:
            assert dec.get(prob) == bit

    check()


def test_ogg_crc_known_vector():
    """CRC-32/OGG check value: '123456789' -> 0x89A1897F (the
    published CRC-32/OGG aka CRC-32/POSIX-like with init 0 /
    xorout 0)."""
    mm = _mm()
    assert mm._ogg_crc(b"123456789") == 0x89A1897F


# --------------------------------------------- lossy WebP / VP8 (r12)


def _vp8():
    return importlib.import_module(f"{PKG}.operators.vp8")


def _libwebp():
    import ctypes
    import ctypes.util
    import os

    path = ctypes.util.find_library("webp")
    if path is None and os.path.exists("/usr/lib/x86_64-linux-gnu/libwebp.so.7"):
        path = "/usr/lib/x86_64-linux-gnu/libwebp.so.7"
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.WebPEncodeRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeYUV.argtypes = (
        [ctypes.c_char_p, ctypes.c_size_t]
        + [ctypes.POINTER(ctypes.c_int)] * 2
        + [ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))] * 2
        + [ctypes.POINTER(ctypes.c_int)] * 2
    )
    return lib


def _libwebp_yuv(lib, webp: bytes):
    import ctypes

    ww, hh = ctypes.c_int(), ctypes.c_int()
    up, vp = ctypes.POINTER(ctypes.c_uint8)(), ctypes.POINTER(ctypes.c_uint8)()
    st, ust = ctypes.c_int(), ctypes.c_int()
    yp = lib.WebPDecodeYUV(webp, len(webp), ctypes.byref(ww), ctypes.byref(hh),
                           ctypes.byref(up), ctypes.byref(vp),
                           ctypes.byref(st), ctypes.byref(ust))
    W, H, S, US = ww.value, hh.value, st.value, ust.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    y = np.array([[yp[r * S + c] for c in range(W)] for r in range(H)], np.uint8)
    u = np.array([[up[r * US + c] for c in range(cw)] for r in range(ch)], np.uint8)
    v = np.array([[vp[r * US + c] for c in range(cw)] for r in range(ch)], np.uint8)
    return y, u, v


def test_vp8_committed_cwebp_fixtures_decode_bit_exact():
    """Real cwebp keyframes (committed, three qualities/images,
    exercising B_PRED + all 16x16 modes, segmentation, prob updates,
    the loop filter) must decode to byte-identical YUV planes vs the
    committed libwebp digests — VP8 decode is bit-exact normative."""
    import hashlib
    import json
    import pathlib

    V = _vp8()
    ddir = pathlib.Path(__file__).parent / "data" / "webp"
    digests = json.loads((ddir / "lossy_digests.json").read_text())
    assert len(digests) == 3
    for fname, d in digests.items():
        y, u, v = V.webp_lossy_decode((ddir / fname).read_bytes())
        assert y.shape == (d["h"], d["w"]), fname
        assert hashlib.sha256(y.tobytes()).hexdigest() == d["y_sha"], fname
        assert hashlib.sha256(u.tobytes()).hexdigest() == d["u_sha"], fname
        assert hashlib.sha256(v.tobytes()).hexdigest() == d["v_sha"], fname


def test_vp8_dc_encoder_exact_and_self_roundtrip():
    """The planted-fixture writer's decode is EXACT: per-MB constant
    targets come back verbatim through the full lossy pipeline."""
    V = _vp8()
    rng = np.random.default_rng(11)
    for _ in range(4):
        mbh, mbw = int(rng.integers(1, 4)), int(rng.integers(1, 4))
        y_t = rng.integers(0, 256, (mbh, mbw))
        u_t = rng.integers(0, 256, (mbh, mbw))
        v_t = rng.integers(0, 256, (mbh, mbw))
        webp = V.webp_container(V.vp8_encode_dc(y_t, u_t, v_t))
        y, u, v = V.webp_lossy_decode(webp)
        assert np.array_equal(y, np.kron(y_t, np.ones((16, 16), np.int64)))
        assert np.array_equal(u, np.kron(u_t, np.ones((8, 8), np.int64)))
        assert np.array_equal(v, np.kron(v_t, np.ones((8, 8), np.int64)))


def test_vp8_live_interop_both_directions():
    """Live libwebp round-trip: (a) libwebp-encoded random images
    decode here byte-identical to WebPDecodeYUV; (b) libwebp accepts
    and exactly decodes our self-made VP8 streams."""
    import ctypes

    lib = _libwebp()
    if lib is None:
        pytest.skip("no libwebp available")
    V = _vp8()
    rng = np.random.default_rng(2)
    # (a) cwebp -> us
    h, w = 48, 36
    i = np.arange(h)[:, None]
    j = np.arange(w)[None, :]
    rgba = np.stack(
        [(i * 3 + j * 2) % 256, (i * 5 + j) % 256, (i + j * 7) % 256,
         np.full((h, w), 255)], axis=2
    ).astype(np.uint8)
    rgba[10:20, 5:25] = rng.integers(0, 256, (10, 20, 4)).astype(np.uint8)
    rgba[..., 3] = 255
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGBA(rgba.tobytes(), w, h, w * 4, 68.0, ctypes.byref(out))
    webp = bytes(bytearray(out[k] for k in range(n)))
    ry, ru, rv = _libwebp_yuv(lib, webp)
    y, u, v = V.webp_lossy_decode(webp)
    assert np.array_equal(y, ry) and np.array_equal(u, ru) and np.array_equal(v, rv)
    # (b) us -> libwebp
    y_t = rng.integers(0, 256, (2, 3))
    u_t = rng.integers(0, 256, (2, 3))
    v_t = rng.integers(0, 256, (2, 3))
    ours = V.webp_container(V.vp8_encode_dc(y_t, u_t, v_t))
    ly, lu, lv = _libwebp_yuv(lib, ours)
    assert np.array_equal(ly, np.kron(y_t, np.ones((16, 16), np.int64)))
    assert np.array_equal(lu, np.kron(u_t, np.ones((8, 8), np.int64)))
    assert np.array_equal(lv, np.kron(v_t, np.ones((8, 8), np.int64)))


def test_vp8_guards_and_dispatch():
    """Interframes, bad start codes, and VP8X reject cleanly; the
    VP8L container dispatcher now routes lossy files to the VP8
    decoder and returns RGBA through the shared BT.601 path."""
    V = _vp8()
    vp8l = importlib.import_module(f"{PKG}.operators.vp8l")
    mm = _mm()
    y_t = np.array([[100, 200]])
    u_t = np.array([[60, 180]])
    v_t = np.array([[90, 30]])
    payload = V.vp8_encode_dc(y_t, u_t, v_t)
    # interframe: flip the keyframe bit
    bad = bytearray(payload)
    bad[0] |= 1
    with pytest.raises(ValueError, match="interframe"):
        V.vp8_decode(bytes(bad))
    bad = bytearray(payload)
    bad[3] ^= 0xFF
    with pytest.raises(ValueError, match="start code"):
        V.vp8_decode(bytes(bad))
    webp = V.webp_container(payload)
    rgba = vp8l.vp8l_decode(webp)
    y, u, v = V.vp8_decode(payload)
    exp = mm._ycbcr_to_rgb(y.astype(np.int64), u.astype(np.int64), v.astype(np.int64))
    assert rgba.shape == (16, 32, 4)
    assert np.array_equal(rgba[..., :3].astype(np.int64), exp)
    assert (rgba[..., 3] == 255).all()
    with pytest.raises(ValueError, match="VP8X"):
        vp8l.vp8l_decode(
            b"RIFF" + (12).to_bytes(4, "little") + b"WEBP"
            + b"VP8X" + (0).to_bytes(4, "little")
        )


def test_vp8_multipartition_and_filter_paths_bit_exact():
    """Decoder paths the simple libwebp encode API never emits —
    2/4 token partitions, the SIMPLE loop filter, and high normal
    filter levels — pinned bit-exact against libwebp on our own
    streams (both decoders read the same bits; RFC 6386 decode is
    normative)."""
    lib = _libwebp()
    if lib is None:
        pytest.skip("no libwebp available")
    V = _vp8()
    rng = np.random.default_rng(42)
    for fl, ft, nparts in [(0, 0, 4), (35, 1, 1), (50, 0, 2), (12, 1, 4)]:
        y_t = rng.integers(0, 256, (5, 4))
        u_t = rng.integers(0, 256, (5, 4))
        v_t = rng.integers(0, 256, (5, 4))
        webp = V.webp_container(
            V.vp8_encode_dc(y_t, u_t, v_t, filter_level=fl,
                            filter_type=ft, n_parts=nparts)
        )
        y, u, v = V.webp_lossy_decode(webp)
        ry, ru, rv = _libwebp_yuv(lib, webp)
        assert np.array_equal(y, ry), (fl, ft, nparts)
        assert np.array_equal(u, ru) and np.array_equal(v, rv), (fl, ft, nparts)
        if fl == 0:
            assert np.array_equal(y, np.kron(y_t, np.ones((16, 16), np.int64)))


def test_vp8x_alpha_matches_libwebp():
    """Extended WebP (VP8X + ALPH over a lossy VP8 frame): the decoded
    alpha plane must match libwebp's RGBA alpha exactly (alpha is
    losslessly coded; the RGB path differs only by upsampling
    convention, which the YUV-exactness tests already pin)."""
    import ctypes

    lib = _libwebp()
    if lib is None:
        pytest.skip("no libwebp available")
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    vp8l = importlib.import_module(f"{PKG}.operators.vp8l")
    h, w = 32, 48
    i = np.arange(h)[:, None]
    j = np.arange(w)[None, :]
    for alpha in (
        ((i * 5 + j * 3) % 200 + 40).astype(np.uint8),
        np.where((i + j) % 7 < 3, 0, 255).astype(np.uint8),
    ):
        rgba = np.stack(
            [(i * 3 + j * 2) % 256, (i * 5 + j) % 256, (i + j * 7) % 256, alpha],
            axis=2,
        ).astype(np.uint8)
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = lib.WebPEncodeRGBA(rgba.tobytes(), w, h, w * 4, 75.0, ctypes.byref(out))
        webp = bytes(bytearray(out[k] for k in range(n)))
        assert webp[12:16] == b"VP8X"  # real alpha forces the extended container
        got = vp8l.vp8l_decode(webp)
        ww, hh = ctypes.c_int(), ctypes.c_int()
        ptr = lib.WebPDecodeRGBA(webp, n, ctypes.byref(ww), ctypes.byref(hh))
        ref_a = np.array(
            [[ptr[(r * w + c) * 4 + 3] for c in range(w)] for r in range(h)], np.uint8
        )
        assert np.array_equal(got[..., 3], ref_a)


def test_vp8x_raw_alpha_all_filters_roundtrip():
    """Hand-built VP8X files with RAW-method ALPH chunks: each of the
    four row filters forward-applied in the test must invert exactly;
    animation flags raise the documented seam error."""
    V = _vp8()
    vp8l = importlib.import_module(f"{PKG}.operators.vp8l")
    rng = np.random.default_rng(4)
    h, w = 16, 16
    alpha = rng.integers(0, 256, (h, w)).astype(np.int64)
    payload = V.vp8_encode_dc(np.array([[128]]), np.array([[128]]), np.array([[128]]))

    def fwd(plane, method):
        out = plane.copy()
        if method == 0:
            return out
        for y in range(h):
            prev = plane[y - 1] if y > 0 else None
            for x in range(w):
                if method == 1 or prev is None:
                    pred = (int(plane[y, x - 1]) if x > 0
                            else (0 if prev is None else int(prev[0])))
                elif method == 2:
                    pred = int(prev[x])
                else:
                    left = int(plane[y, x - 1]) if x > 0 else int(prev[0])
                    tl = int(prev[x - 1]) if x > 0 else int(prev[0])
                    pred = max(0, min(255, left + int(prev[x]) - tl))
                out[y, x] = (int(plane[y, x]) - pred) & 0xFF
        return out

    def vp8x_file(alph_body, anim=False):
        flags = 0x10 | (0x02 if anim else 0)
        vp8x = flags.to_bytes(1, "little") + b"\x00\x00\x00"
        vp8x += (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
        chunks = b"VP8X" + len(vp8x).to_bytes(4, "little") + vp8x
        chunks += b"ALPH" + len(alph_body).to_bytes(4, "little") + alph_body
        if len(alph_body) & 1:
            chunks += b"\x00"
        chunks += b"VP8 " + len(payload).to_bytes(4, "little") + payload
        if len(payload) & 1:
            chunks += b"\x00"
        return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WEBP" + chunks

    for method in range(4):
        body = bytes([method << 2]) + bytes(
            fwd(alpha, method).astype(np.uint8).tobytes()
        )
        got = vp8l.vp8l_decode(vp8x_file(body))
        assert np.array_equal(got[..., 3].astype(np.int64), alpha), method
    with pytest.raises(ValueError, match="animated"):
        vp8l.vp8l_decode(vp8x_file(bytes([0]) + alpha.astype(np.uint8).tobytes(), anim=True))


def test_webp_anim_mux_demux_blend_dispose():
    """Animated WebP: mux -> demux round-trip with exact compositing —
    copy frames verbatim, dispose-to-background fills the rect, and
    the alpha-128 blend over an opaque canvas reduces to
    (src*128 + dst*127) // 255 with alpha 255."""
    vp8l = importlib.import_module(f"{PKG}.operators.vp8l")
    H, W = 12, 16
    i = np.arange(H)[:, None]
    j = np.arange(W)[None, :]
    f0 = np.stack([(3 * i + 5 * j) % 256, (7 * i + j) % 256, (i + j) % 256,
                   np.full((H, W), 255)], axis=2).astype(np.uint8)
    f2 = np.full((4, 6, 4), 80, np.uint8)
    f2[..., 3] = 128
    BG = (200, 100, 50, 255)
    data = vp8l.webp_anim_encode(
        [dict(x=0, y=0, rgba=f0, duration=40, blend=False, dispose=1),
         dict(x=8, y=4, rgba=f2, duration=60, blend=True)],
        W, H, bg=BG, loop=5,
    )
    canvases, durs, loop, bg = vp8l.webp_anim_decode(data)
    assert durs == [40, 60] and loop == 5 and bg == BG
    assert np.array_equal(canvases[0], f0)
    exp = np.tile(np.array(BG, np.uint8), (H, W, 1)).reshape(H, W, 4)
    exp[4:8, 8:14, 0] = (80 * 128 + 200 * 127) // 255
    exp[4:8, 8:14, 1] = (80 * 128 + 100 * 127) // 255
    exp[4:8, 8:14, 2] = (80 * 128 + 50 * 127) // 255
    assert np.array_equal(canvases[1], exp)


def test_webp_anim_transparent_canvas_blend_and_guards():
    """Blending onto the initially TRANSPARENT canvas exercises the
    zero/partial dst-alpha branch; structural guards reject odd
    offsets, out-of-canvas rects, and non-animated files."""
    vp8l = importlib.import_module(f"{PKG}.operators.vp8l")
    f = np.full((4, 4, 4), 100, np.uint8)
    f[..., 3] = 64
    data = vp8l.webp_anim_encode(
        [dict(x=2, y=2, rgba=f, duration=10, blend=True)], 8, 8
    )
    canvases, _, _, _ = vp8l.webp_anim_decode(data)
    c = canvases[0]
    # dst_a = 0: blend_a = 64, rgb = src*64*... / 64 = src values
    assert (c[2:6, 2:6, 3] == 64).all() and (c[2:6, 2:6, 0] == 100).all()
    assert (c[0, 0] == 0).all()  # untouched canvas stays transparent black
    with pytest.raises(ValueError, match="even"):
        vp8l.webp_anim_encode([dict(x=1, y=0, rgba=f)], 8, 8)
    with pytest.raises(ValueError, match="outside"):
        vp8l.webp_anim_encode([dict(x=6, y=6, rgba=f)], 8, 8)
    still = vp8l.vp8l_encode(np.zeros((4, 4, 4), np.uint8))
    with pytest.raises(ValueError, match="no ANMF|ANIM"):
        vp8l.webp_anim_decode(still)


def test_vp8_mutation_fuzz_never_silently_identical():
    """Flipping bytes of a valid VP8 stream must raise or change the
    output — no corruption path silently reproduces the original."""
    V = _vp8()
    y_t = np.array([[10, 250, 40], [130, 77, 200]])
    u_t = (y_t * 3) % 256
    v_t = (y_t * 7) % 256
    payload = V.vp8_encode_dc(y_t, u_t, v_t)
    ref = V.vp8_decode(payload)
    for pos in range(3, len(payload), max(1, len(payload) // 23)):
        bad = bytearray(payload)
        bad[pos] ^= 0x55
        try:
            got = V.vp8_decode(bytes(bad))
        except (ValueError, NotImplementedError, IndexError):
            continue
        same = all(np.array_equal(a, b) for a, b in zip(got, ref))
        assert not same, f"silent corruption at byte {pos}"


# ------------------------------------------------------------- BMP (r12)


@pytest.mark.parametrize("i", list(range(12)))
def test_bmp_roundtrip_all_variants(i):
    """24-bit BGR, 8-bit palettized, 32-bit BGRA; both row orders; odd
    widths exercising the 4-byte scanline padding."""
    mm = _mm()
    w, h = 5 + i % 9, 4 + i % 7
    ii = np.arange(h)[:, None]
    jj = np.arange(w)[None, :]
    td = i % 5 == 0
    if i % 3 == 0:
        img = np.stack(
            [(31 * ii + 17 * jj + i) % 256, (29 * ii + 19 * jj + 3 * i) % 256,
             (23 * ii + 13 * jj + 7 * i) % 256], axis=2).astype(np.uint8)
        assert np.array_equal(mm.bmp_decode(mm.bmp_encode(img, top_down=td)), img)
    elif i % 3 == 1:
        v = ((3 * ii + 5 * jj + i) % 256).astype(np.uint8)
        kk = np.arange(256)
        pal = np.stack(
            [(11 * kk + i) % 256, (13 * kk + 2 * i) % 256, (17 * kk + 3 * i) % 256],
            axis=1).astype(np.uint8)
        got = mm.bmp_decode(mm.bmp_encode(v, palette=pal, top_down=td))
        assert np.array_equal(got, pal[v])
    else:
        img = np.stack(
            [(31 * ii + 17 * jj + i) % 256, (29 * ii + 19 * jj + 3 * i) % 256,
             (23 * ii + 13 * jj + 7 * i) % 256, (5 * ii + 3 * jj + 11 * i) % 256],
            axis=2).astype(np.uint8)
        assert np.array_equal(mm.bmp_decode(mm.bmp_encode(img, top_down=td)), img)


def test_bmp_guards():
    """RLE compression, truncation, short palettes, and out-of-range
    indices reject cleanly."""
    import struct

    mm = _mm()
    img = np.zeros((3, 3, 3), np.uint8)
    enc = bytearray(mm.bmp_encode(img))
    bad = bytearray(enc)
    bad[30:34] = struct.pack("<I", 1)  # BI_RLE8
    with pytest.raises(ValueError, match="BI_RGB"):
        mm.bmp_decode(bytes(bad))
    with pytest.raises(ValueError, match="truncated pixel"):
        mm.bmp_decode(bytes(enc[:-4]))
    # 8-bit with an index past the declared color count
    pal = np.zeros((4, 3), np.uint8)
    v = np.full((2, 2), 3, np.uint8)
    ok = mm.bmp_encode(v, palette=pal)
    assert mm.bmp_decode(ok).shape == (2, 2, 3)
    v_bad = np.full((2, 2), 4, np.uint8)
    with pytest.raises(ValueError, match="index out of range"):
        mm.bmp_decode(mm.bmp_encode(v_bad, palette=pal))
    with pytest.raises(ValueError, match="not a BMP"):
        mm.bmp_decode(b"XX" + bytes(60))


# ------------------------------------------------------------ TIFF (r12)


@pytest.mark.parametrize("trial", list(range(12)))
def test_tiff_roundtrip_matrix(trial):
    """Gray8/RGB24 x none/LZW/PackBits x II/MM x single/multi-strip."""
    mm = _mm()
    rng = np.random.default_rng(trial)
    h, w = int(rng.integers(2, 30)), int(rng.integers(2, 30))
    img = rng.integers(0, 256, (h, w) if trial % 2 == 0 else (h, w, 3)).astype(np.uint8)
    comp = [1, 5, 32773][trial % 3]
    enc = mm.tiff_encode(
        img, compression=comp, big_endian=(trial % 4 < 2),
        rows_per_strip=None if trial % 5 else max(1, h // 3),
    )
    assert np.array_equal(mm.tiff_decode(enc), img)


def test_tiff_lzw_table_growth_and_clear():
    """Content large enough to walk the 9->10->11->12-bit widths and
    force a table clear must round-trip exactly (the early-change
    boundaries are where a wrong convention desynchronizes)."""
    mm = _mm()
    rng = np.random.default_rng(7)
    # low-entropy but varied: long runs + noise islands -> deep table
    base = np.repeat(rng.integers(0, 64, 4000).astype(np.uint8), 3)
    img = base[: 100 * 117].reshape(100, 117)
    enc = mm.tiff_encode(img, compression=5)
    assert np.array_equal(mm.tiff_decode(enc), img)


def test_tiff_guards():
    mm = _mm()
    img = np.zeros((4, 4), np.uint8)
    enc = bytearray(mm.tiff_encode(img))
    with pytest.raises(ValueError, match="not a TIFF"):
        mm.tiff_decode(b"XX" + bytes(enc[2:]))
    # unsupported compression tag
    import struct
    bad = bytearray(enc)
    # find tag 259 in the IFD and rewrite its value to 7 (JPEG-in-TIFF)
    (ifd,) = struct.unpack("<I", bytes(bad[4:8]))
    (n,) = struct.unpack("<H", bytes(bad[ifd : ifd + 2]))
    for k in range(n):
        at = ifd + 2 + 12 * k
        tag = struct.unpack("<H", bytes(bad[at : at + 2]))[0]
        if tag == 259:
            bad[at + 8 : at + 10] = struct.pack("<H", 7)
    with pytest.raises(ValueError, match="compression"):
        mm.tiff_decode(bytes(bad))
    with pytest.raises(ValueError, match="truncated strip|shorter"):
        mm.tiff_decode(bytes(enc[:-6]))


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
