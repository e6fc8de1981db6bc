"""Round-9 operator tests: the G.711 companded-audio decoder (and the
other codecs this round adds as it goes).

The G.711 contract is bit-exactness against the spec arithmetic: the
numpy LUTs must match a straight, independent transcription of the
Sun/CCITT ``g711.c`` expansion routines on all 256 codes, and the WAV
walk must route format 7 -> mu-law, 6 -> A-law and reject everything
else with ValueError (never a crash) — the decoder is exposed to
arbitrary media payload bytes.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.multimodal import (
    _g711_alaw_table,
    _g711_mulaw_table,
    _g711_wav_bytes,
    g711_decode,
)


def _ulaw2linear(u: int) -> int:
    # independent transcription of g711.c ulaw2linear
    u = ~u & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


def _alaw2linear(a: int) -> int:
    # independent transcription of g711.c alaw2linear
    a ^= 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


def test_g711_tables_match_spec_on_all_codes():
    mu, al = _g711_mulaw_table(), _g711_alaw_table()
    for c in range(256):
        assert mu[c] == _ulaw2linear(c), f"mulaw code {c}"
        assert al[c] == _alaw2linear(c), f"alaw code {c}"
    # canonical anchors: both mu-law zero codes decode to 0; extremes
    assert mu[0x7F] == 0 and mu[0xFF] == 0
    assert mu[0x00] == -32124 and mu[0x80] == 32124
    assert al[0x55] == -8 and al[0xD5] == 8
    assert int(al.min()) == -32256 and int(al.max()) == 32256


def test_g711_wav_roundtrip_routes_by_format_code():
    enc = np.arange(256, dtype=np.uint8).tobytes()
    codec, s = g711_decode(_g711_wav_bytes(7, 256, enc))
    assert codec == "mulaw" and (s == _g711_mulaw_table()).all()
    codec, s = g711_decode(_g711_wav_bytes(6, 256, enc))
    assert codec == "alaw" and (s == _g711_alaw_table()).all()
    assert s.dtype == np.int16


@given(st.binary(max_size=96), st.integers(0, 4))
@settings(max_examples=300, deadline=None)
def test_round9_decoders_never_crash_on_garbage(data, which):
    """Every round-9 decoder sees arbitrary media payload bytes in
    production: the only legal outcomes on garbage are a decode, a
    ValueError, or a NotImplementedError — never IndexError or
    struct.error (the fuzz that found the truncated-fmt-chunk crash
    this test now pins)."""
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.multimodal import (
        g711_decode,
        ima_adpcm_decode,
        mjpeg_avi_frames,
        wav_pcm_decode,
    )
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.sources.warc import (
        warc_decode,
    )

    fn = (g711_decode, ima_adpcm_decode, mjpeg_avi_frames, warc_decode, wav_pcm_decode)[
        which
    ]
    try:
        fn(data)
    except (ValueError, NotImplementedError):
        pass


@given(st.binary(max_size=40), st.integers(0, 4))
@settings(max_examples=300, deadline=None)
def test_round9_decoders_never_crash_on_corrupted_headers(data, which):
    # graft garbage onto real container magic so header paths are hit
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.multimodal import (
        g711_decode,
        ima_adpcm_decode,
        mjpeg_avi_frames,
        wav_pcm_decode,
    )
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.sources.warc import (
        warc_decode,
    )

    fn, magic = (
        (g711_decode, b"RIFF\x20\x00\x00\x00WAVEfmt "),
        (ima_adpcm_decode, b"RIFF\x20\x00\x00\x00WAVEfmt "),
        (mjpeg_avi_frames, b"RIFF\x20\x00\x00\x00AVI LIST"),
        (warc_decode, b"\x1f\x8b\x08\x00\x00\x00\x00\x00"),
        (wav_pcm_decode, b"RIFF\x20\x00\x00\x00WAVEfmt "),
    )[which]
    try:
        fn(magic + data)
    except (ValueError, NotImplementedError):
        pass


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_flac_roundtrips_losslessly(data):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.multimodal import (
        flac_decode,
        flac_encode,
    )

    kind = data.draw(st.integers(0, 3))
    n = data.draw(st.integers(1, 3000))
    seed = data.draw(st.integers(0, 2**31))
    rng = np.random.default_rng(seed)
    if kind == 0:
        x = rng.integers(-32768, 32768, size=n)  # noise -> verbatim/order0
    elif kind == 1:
        x = np.clip(np.cumsum(rng.integers(-50, 51, size=n)), -32768, 32767)
    elif kind == 2:
        x = (1000 * np.sin(np.arange(n) / 10)).astype(np.int64)  # smooth
    else:
        x = np.full(n, int(rng.integers(-32768, 32768)))  # constant
    dec, sr = flac_decode(flac_encode(x, 44100))
    assert sr == 44100
    assert (dec.astype(np.int64) == x).all()


def test_flac_detects_corruption_via_crc_and_md5():
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.multimodal import (
        flac_decode,
        flac_encode,
    )

    x = np.clip(np.cumsum(np.arange(500) % 7 - 3), -32768, 32767)
    enc = bytearray(flac_encode(x, 8000))
    # flip a bit in the entropy region: CRC-16 (or header CRC-8) must
    # catch it — never a silent wrong decode
    for off in (len(enc) // 2, len(enc) - 3, 60):
        bad = bytearray(enc)
        bad[off] ^= 0x10
        with pytest.raises((ValueError, NotImplementedError)):
            flac_decode(bytes(bad))
    # flip a bit in the STREAMINFO MD5 itself: frames decode fine, the
    # final self-check must reject
    bad = bytearray(enc)
    # file layout: 'fLaC'(4) + block header(4) + STREAMINFO; md5 is
    # STREAMINFO[18:34] -> file bytes 26..41
    bad[30] ^= 0x01
    with pytest.raises(ValueError, match="MD5"):
        flac_decode(bytes(bad))


@given(st.binary(max_size=80))
@settings(max_examples=200, deadline=None)
def test_flac_decode_never_crashes_on_garbage(data):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.multimodal import (
        flac_decode,
    )

    for payload in (data, b"fLaC" + data):
        try:
            flac_decode(payload)
        except (ValueError, NotImplementedError):
            pass


def test_xxh32_matches_public_vectors():
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.sources.warc import (
        _xxh32,
    )

    assert _xxh32(b"") == 0x02CC5D05
    assert _xxh32(b"a") == 0x550D7456
    assert _xxh32(b"abc") == 0x32D153FF
    assert _xxh32(b"Nobody inspects the spammish repetition") == 0xE2293B2F


@given(st.binary(max_size=4000))
@settings(max_examples=150, deadline=None)
def test_lz4_roundtrips_arbitrary_bytes(data):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.sources.warc import (
        lz4_block_compress,
        lz4_block_decompress,
        lz4_frame_compress,
        lz4_frame_decompress,
    )

    assert lz4_block_decompress(lz4_block_compress(data)) == data
    assert lz4_frame_decompress(lz4_frame_compress(data)) == data


def test_lz4_multiblock_and_compression():
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.sources.warc import (
        lz4_frame_compress,
        lz4_frame_decompress,
    )

    big = b"hello world, this text repeats a lot. " * 9000  # > 5 blocks
    enc = lz4_frame_compress(big)
    assert lz4_frame_decompress(enc) == big
    assert len(enc) < len(big) // 5  # actually compresses


@given(st.binary(max_size=60))
@settings(max_examples=200, deadline=None)
def test_lz4_frame_decompress_never_crashes_on_garbage(data):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.sources.warc import (
        _LZ4_MAGIC,
        lz4_frame_decompress,
    )

    for payload in (data, _LZ4_MAGIC + data):
        try:
            lz4_frame_decompress(payload)
        except ValueError:
            pass


def test_progressive_color_equals_baseline_color():
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.multimodal import (
        jpeg_color_decode,
        jpeg_progressive_color_decode,
        jpeg_ycbcr_decode,
        jpeg_ycbcr_encode,
        jpeg_ycbcr_encode_progressive,
        jpeg_ycbcr_progressive_decode,
    )

    rng = np.random.default_rng(13)
    for t in range(25):
        mh, mw = int(rng.integers(1, 4)), int(rng.integers(1, 4))
        H, W = mh * 16, mw * 16
        Y = rng.integers(0, 256, size=(H, W))
        Cb = rng.integers(0, 256, size=(H // 2, W // 2))
        Cr = rng.integers(0, 256, size=(H // 2, W // 2))
        enc_p = jpeg_ycbcr_encode_progressive(Y, Cb, Cr)
        enc_b = jpeg_ycbcr_encode(Y, Cb, Cr)
        # progressive coefficient coding across a full scan script is
        # lossless: all planes AND the RGB conversion must be
        # bit-identical to the baseline decode of the same image
        for p, b in zip(
            jpeg_ycbcr_progressive_decode(enc_p), jpeg_ycbcr_decode(enc_b)
        ):
            assert (p == b).all(), t
        assert (
            jpeg_progressive_color_decode(enc_p) == jpeg_color_decode(enc_b)
        ).all(), t


def test_progressive_color_rejects_wrong_shapes():
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.multimodal import (
        jpeg_gray_encode,
        jpeg_ycbcr_encode,
        jpeg_ycbcr_progressive_decode,
    )

    with pytest.raises(NotImplementedError):
        # baseline stream routed to the progressive decoder
        jpeg_ycbcr_progressive_decode(
            jpeg_ycbcr_encode(
                np.full((16, 16), 128), np.full((8, 8), 128), np.full((8, 8), 128)
            )
        )
    with pytest.raises((NotImplementedError, ValueError)):
        jpeg_ycbcr_progressive_decode(jpeg_gray_encode(np.full((8, 8), 99)))


def test_warc_multimember_roundtrip_and_rejection():
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.sources.warc import (
        warc_decode,
        warc_encode,
    )

    recs = [
        ("warcinfo", "urn:warc:1", b"format: WARC/1.0"),
        ("response", "http://example.org/a", b"hello world " * 7),
        ("response", "http://example.org/b", b""),  # empty payload legal
    ]
    enc = warc_encode(recs)
    # multi-member: each record its own gzip member (CC layout)
    assert enc.count(b"\x1f\x8b\x08") >= 3
    assert warc_decode(enc) == recs
    # deterministic bytes (mtime pinned)
    assert warc_encode(recs) == enc
    with pytest.raises(ValueError):
        warc_decode(b"plainly not gzip")
    with pytest.raises(ValueError):
        warc_decode(enc[:-4])  # truncated final member
    import gzip

    with pytest.raises(ValueError):
        warc_decode(gzip.compress(b"HTTP/1.1 200 OK\r\n\r\nnot warc"))


def test_mjpeg_avi_roundtrip_and_rejection():
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.multimodal import (
        _avi_mjpeg_bytes,
        jpeg_gray_decode,
        jpeg_gray_encode,
        mjpeg_avi_frames,
    )

    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, size=(16, 16)) for _ in range(5)]
    avi = _avi_mjpeg_bytes([jpeg_gray_encode(f) for f in frames], 16, 16)
    got = mjpeg_avi_frames(avi)
    assert len(got) == 5
    for f, payload in zip(frames, got):
        # MJPEG frames are plain baseline JPEGs: lossy on arbitrary
        # pixels but within the codec's pinned error bound
        assert np.abs(jpeg_gray_decode(payload) - f).max() <= 2
    with pytest.raises(ValueError):
        mjpeg_avi_frames(b"definitely not an avi")
    with pytest.raises(ValueError):
        # valid RIFF, wrong form type
        mjpeg_avi_frames(b"RIFF\x04\x00\x00\x00WAVE")
    # AVI whose video stream is not MJPG must be rejected, not decoded
    bad = avi.replace(b"vidsMJPG", b"vidsH264")
    with pytest.raises(ValueError):
        mjpeg_avi_frames(bad)


def test_bpe_train_matches_hand_computed_merges(spark_session=None):
    from pyspark.sql import SparkSession

    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.textops import (
        bpe_train,
    )

    spark = SparkSession.builder.master("local[4]").getOrCreate()
    # corpus chosen so merges cascade: 'aaaa' runs pin the pinned
    # double-replace semantics (non-overlapping left-to-right: a a a a
    # -> aa aa, a a a -> aa a), and round 2 must see merged symbols.
    docs = spark.createDataFrame(
        [("aaaa aaaa aaa ab",), ("aaaa ab ab",), ("b b b! aaaa",)], "text string"
    )
    rows = [tuple(r) for r in bpe_train(docs, n_merges=3).collect()]
    # hand computation: words = {aaaa:4, aaa:1, ab:3, b:3}
    # round 1 pairs: 'a a': 4*3 (aaaa) + 1*2 (aaa) = 14; 'a b': 3
    #   -> merge 'a a'->aa; applied: aaaa -> 'aa aa' (non-overlapping
    #   left-to-right), aaa -> 'aa a', ab stays 'a b'
    # round 2 pairs: 'aa aa':4, 'aa a':1, 'a b':3 -> 'aa aa' cnt 4
    # round 3 pairs: 'aa a':1, 'a b':3 -> 'a b' cnt 3
    assert rows == [
        (1, "a a", "aa", 14),
        (2, "aa aa", "aaaa", 4),
        (3, "a b", "ab", 3),
    ], rows


@given(st.data())
@settings(max_examples=40, deadline=None)
def test_jpeg_restart_parallel_equals_sequential_and_planted(data):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.multimodal import (
        _S4,
        jpeg_gray_decode,
        jpeg_gray_decode_parallel,
        jpeg_gray_encode,
        jpeg_restart_segments,
    )

    r = np.asarray(_S4)[:, None]
    c = np.asarray(_S4)[None, :]
    bh = data.draw(st.integers(1, 4))
    bw = data.draw(st.integers(1, 4))
    img = np.zeros((bh * 8, bw * 8), dtype=np.int64)
    for i in range(bh):
        for j in range(bw):
            m = data.draw(st.integers(64, 191))
            a1, a2, a3 = (data.draw(st.integers(-4, 4)) for _ in range(3))
            img[i * 8 : i * 8 + 8, j * 8 : j * 8 + 8] = m + a1 * r + a2 * c + a3 * r * c
    ri = data.draw(st.integers(1, bh * bw + 1))
    enc = jpeg_gray_encode(img, restart_interval=ri)
    seq = jpeg_gray_decode(enc)
    par = jpeg_gray_decode_parallel(enc)
    # planted subspace: the lossy codec round-trips exactly; and the
    # independent-segment decode must equal the sequential one
    assert (seq == img).all()
    assert (par == seq).all()
    assert len(jpeg_restart_segments(enc)) == -(-bh * bw // ri)


def test_jpeg_restart_arbitrary_pixels_parallel_equals_sequential():
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.multimodal import (
        jpeg_gray_decode,
        jpeg_gray_decode_parallel,
        jpeg_gray_encode,
    )

    rng = np.random.default_rng(42)
    for ri in (1, 2, 5):
        img = rng.integers(0, 256, size=(24, 32))
        enc = jpeg_gray_encode(img, restart_interval=ri)
        seq = jpeg_gray_decode(enc)
        par = jpeg_gray_decode_parallel(enc)
        # off-subspace pixels are lossy, but both decode paths must
        # agree bit-for-bit and stay within the codec's error bound
        assert (par == seq).all()
        assert np.abs(seq - img).max() <= 2


def test_jpeg_no_restart_segments_raises():
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.multimodal import (
        jpeg_gray_encode,
        jpeg_restart_segments,
    )

    enc = jpeg_gray_encode(np.full((8, 8), 128))
    with pytest.raises(ValueError):
        jpeg_restart_segments(enc)


def _ref_ima_block(pred, index, nibbles):
    # independent IMA state machine (different structure: bit loop)
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.multimodal import (
        _IMA_INDEX_TABLE,
        _IMA_STEP_TABLE,
    )

    out = [pred]
    for n in nibbles:
        step = _IMA_STEP_TABLE[index]
        diff = step >> 3
        for bit, sh in ((1, 2), (2, 1), (4, 0)):
            if n & bit:
                diff += step >> sh
        pred = pred + (-diff if n & 8 else diff)
        pred = min(32767, max(-32768, pred))
        index = min(88, max(0, index + _IMA_INDEX_TABLE[n & 7]))
        out.append(pred)
    return out


@given(
    st.integers(-32768, 32767),
    st.integers(0, 88),
    st.lists(st.integers(0, 15), min_size=2, max_size=64).filter(lambda l: len(l) % 2 == 0),
)
@settings(max_examples=60, deadline=None)
def test_ima_adpcm_decode_matches_independent_state_machine(pred, index, nibs):
    import struct

    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.multimodal import (
        _ima_wav_bytes,
        ima_adpcm_decode,
    )

    codes = bytes(nibs[j] | (nibs[j + 1] << 4) for j in range(0, len(nibs), 2))
    wav = _ima_wav_bytes(1, [struct.pack("<hBB", pred, index, 0) + codes])
    s, nb = ima_adpcm_decode(wav)
    assert nb == 1
    assert s.tolist() == _ref_ima_block(pred, index, nibs)


def test_ima_adpcm_multi_block_resets_state_per_block():
    import struct

    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.multimodal import (
        _ima_wav_bytes,
        ima_adpcm_decode,
    )

    # two blocks with different headers: decode must equal the two
    # independent single-block decodes concatenated (seekability).
    b1 = struct.pack("<hBB", 1000, 40, 0) + bytes([0x73, 0x1F])
    b2 = struct.pack("<hBB", -2000, 5, 0) + bytes([0x88, 0xE4])
    s, nb = ima_adpcm_decode(_ima_wav_bytes(2, [b1, b2]))
    s1, _ = ima_adpcm_decode(_ima_wav_bytes(1, [b1]))
    s2, _ = ima_adpcm_decode(_ima_wav_bytes(1, [b2]))
    assert nb == 2
    assert s.tolist() == s1.tolist() + s2.tolist()


def test_ima_adpcm_rejects_foreign_payloads_with_valueerror():
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.multimodal import (
        _wav_bytes,
        ima_adpcm_decode,
    )

    with pytest.raises(ValueError):
        ima_adpcm_decode(b"junk")
    with pytest.raises(ValueError):
        ima_adpcm_decode(_wav_bytes(8000, 1, 4))  # plain PCM, not 0x11


def test_g711_rejects_foreign_payloads_with_valueerror():
    with pytest.raises(ValueError):
        g711_decode(b"not a wav at all")
    with pytest.raises(ValueError):
        g711_decode(b"RIFF\x00\x00\x00\x00WAVE")  # no fmt/data chunks
    # 16-bit PCM (format 1) must be rejected by THIS decoder, not mis-expanded
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.multimodal import (
        _wav_bytes,
    )

    with pytest.raises(ValueError):
        g711_decode(_wav_bytes(8000, 1, 4))
