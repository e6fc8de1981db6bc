"""WebP-lossless (VP8L) codec from the public bitstream spec.

Round-10 image-format addition (the one remaining spec-implementable
image format without DCT): canonical prefix codes (simple and
code-length-coded forms, with the 19-symbol code-length code and its
17/18 zero-repeat operators), LZ77 back-references through the
120-entry plane-code distance map, color-cache lookups, meta-prefix
group images, and all four transforms — PREDICTOR (14 modes),
COLOR (per-tile signed multipliers), SUBTRACT-GREEN, and
COLOR-INDEXING (delta-coded palette, incl. sub-byte pixel bundling).

The encoder emits a deliberately simple subset (no transforms, no
cache, literal-only, per-channel canonical codes — every stream is
still fully spec-valid); the decoder covers the full format.  Interop
is pinned in BOTH directions against the system libwebp via ctypes
(tests/test_round10_ops.py + committed fixtures in tests/data/webp/
made by the REAL ``WebPEncodeLosslessRGBA``, which emits transforms,
caches, and meta groups this encoder never produces).

``_CODE_TO_PLANE`` was extracted byte-exact from libwebp 7.1.5's
compiled table (the spec's table in hex form; entry = (dy << 4) |
(8 - dx), distance = dy * width + dx, clamped to >= 1).

Scale story (100 TB): like JPEG restart segments and FLAC frames,
each WebP file decodes independently inside an Arrow map stage
(``webp_pixel_stats``); only integer stats leave the executor.

Reference analogue: none — LLM-pipeline multimodal extension surface.
"""

from __future__ import annotations

from typing import Iterator

_CODE_TO_PLANE = [
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1A, 0x26, 0x2A,
    0x38, 0x05, 0x37, 0x39, 0x15, 0x1B, 0x36, 0x3A, 0x25, 0x2B, 0x48, 0x04,
    0x47, 0x49, 0x14, 0x1C, 0x35, 0x3B, 0x46, 0x4A, 0x24, 0x2C, 0x58, 0x45,
    0x4B, 0x34, 0x3C, 0x03, 0x57, 0x59, 0x13, 0x1D, 0x56, 0x5A, 0x23, 0x2D,
    0x44, 0x4C, 0x55, 0x5B, 0x33, 0x3D, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1E,
    0x66, 0x6A, 0x22, 0x2E, 0x54, 0x5C, 0x43, 0x4D, 0x65, 0x6B, 0x32, 0x3E,
    0x78, 0x01, 0x77, 0x79, 0x53, 0x5D, 0x11, 0x1F, 0x64, 0x6C, 0x42, 0x4E,
    0x76, 0x7A, 0x21, 0x2F, 0x75, 0x7B, 0x31, 0x3F, 0x63, 0x6D, 0x52, 0x5E,
    0x00, 0x74, 0x7C, 0x41, 0x4F, 0x10, 0x20, 0x62, 0x6E, 0x30, 0x73, 0x7D,
    0x51, 0x5F, 0x40, 0x72, 0x7E, 0x61, 0x6F, 0x50, 0x71, 0x7F, 0x60, 0x70,
]

_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


class _LsbBits:
    """LSB-first bit reader (every VP8L field)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > len(self.data) * 8:
            raise ValueError("vp8l: bitstream over-read")
        b0 = self.pos >> 3
        chunk = int.from_bytes(
            self.data[b0 : (end + 7) >> 3], "little"
        )
        v = (chunk >> (self.pos & 7)) & ((1 << n) - 1)
        self.pos = end
        return v


class _LsbWriter:
    __slots__ = ("out", "acc", "n")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def bytes(self) -> bytes:
        tail = bytes([self.acc & 0xFF]) if self.n else b""
        return bytes(self.out) + tail


class _Canon:
    """Canonical prefix decoder: DEFLATE-style code assignment, bits
    consumed first-bit-as-code-MSB (libwebp stores reversed codes for
    its LSB-first reader — walking MSB-first over stream bits is the
    equivalent formulation)."""

    __slots__ = ("map", "single")

    def __init__(self, lengths: list[int]) -> None:
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("vp8l: empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.map = {}
            return
        self.single = None
        max_len = max(l for l, _ in nz)
        bl_count = [0] * (max_len + 1)
        for l, _ in nz:
            bl_count[l] += 1
        code = 0
        next_code = [0] * (max_len + 1)
        for l in range(1, max_len + 1):
            code = (code + bl_count[l - 1]) << 1
            next_code[l] = code
        # completeness (libwebp rejects over/under-subscribed codes)
        kraft = sum(1 << (max_len - l) for l, _ in nz)
        if kraft != 1 << max_len:
            raise ValueError("vp8l: prefix code not complete")
        self.map = {}
        for s, l in enumerate(lengths):
            if l > 0:
                self.map[(l, next_code[l])] = s
                next_code[l] += 1

    def decode(self, br: _LsbBits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        while True:
            code = (code << 1) | br.read(1)
            length += 1
            sym = self.map.get((length, code))
            if sym is not None:
                return sym
            if length > 15:
                raise ValueError("vp8l: invalid prefix code walk")


def _read_prefix_code(br: _LsbBits, alphabet_size: int) -> _Canon:
    lengths = [0] * alphabet_size
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        if br.read(1):  # first symbol in 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        if sym0 >= alphabet_size:
            raise ValueError("vp8l: simple-code symbol out of range")
        lengths[sym0] = 1
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym1 >= alphabet_size:
                raise ValueError("vp8l: simple-code symbol out of range")
            lengths[sym1] = 1
        else:
            return _Canon.__new__(_Canon)._init_single(sym0)
        return _Canon(lengths)
    # normal: 19-symbol code-length code
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl = _Canon(cl_lengths)
    if br.read(1):  # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    sym = 0
    prev = 8
    while sym < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl.decode(br)
        if code_len < 16:
            lengths[sym] = code_len
            sym += 1
            if code_len:
                prev = code_len
        elif code_len == 16:
            rep = 3 + br.read(2)
            if sym + rep > alphabet_size:
                raise ValueError("vp8l: code-length repeat overrun")
            for _ in range(rep):
                lengths[sym] = prev
                sym += 1
        elif code_len == 17:
            sym += 3 + br.read(3)
        else:
            sym += 11 + br.read(7)
        if sym > alphabet_size:
            raise ValueError("vp8l: code-length overrun")
    return _Canon(lengths)


def _init_single(self, sym):  # helper grafted onto _Canon for simple 1-symbol
    self.single = sym
    self.map = {}
    return self


_Canon._init_single = _init_single


def _lz77_value(code: int, br: _LsbBits) -> int:
    """Length/distance prefix decoding (spec 'LZ77 backward
    reference' section): codes 0-3 are literal values 1-4; beyond,
    (code-2)>>1 extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _plane_to_dist(width: int, code: int) -> int:
    if code > 120:
        return code - 120
    b = _CODE_TO_PLANE[code - 1]
    dy = b >> 4
    dx = 8 - (b & 0xF)
    dist = dy * width + dx
    return dist if dist >= 1 else 1


def _read_entropy_coded(br: _LsbBits, w: int, h: int, is_level0: bool,
                        transforms=None):
    """DecodeImageStream: returns a flat list of ARGB uint32.
    ``transforms`` (level0 only) is filled with the parsed transform
    records in read order."""
    cur_w = w
    if is_level0:
        while br.read(1):
            ttype = br.read(2)
            if any(t[0] == ttype for t in transforms):
                raise ValueError("vp8l: duplicate transform")
            if ttype == 2:  # subtract green
                transforms.append((2,))
            elif ttype in (0, 1):  # predictor / color
                bits = br.read(3) + 2
                tw = -(-cur_w // (1 << bits))
                th = -(-h // (1 << bits))
                tiles = _read_entropy_coded(br, tw, th, False)
                transforms.append((ttype, bits, tw, tiles))
            else:  # color indexing
                n_colors = br.read(8) + 1
                deltas = _read_entropy_coded(br, n_colors, 1, False)
                palette = []
                prev = 0
                for d in deltas:
                    cur = (
                        (((prev >> 24) + (d >> 24)) & 0xFF) << 24
                        | ((((prev >> 16) & 0xFF) + ((d >> 16) & 0xFF)) & 0xFF) << 16
                        | ((((prev >> 8) & 0xFF) + ((d >> 8) & 0xFF)) & 0xFF) << 8
                        | (((prev & 0xFF) + (d & 0xFF)) & 0xFF)
                    )
                    palette.append(cur)
                    prev = cur
                if n_colors <= 2:
                    wbits = 3
                elif n_colors <= 4:
                    wbits = 2
                elif n_colors <= 16:
                    wbits = 1
                else:
                    wbits = 0
                transforms.append((3, wbits, cur_w, palette))
                cur_w = -(-cur_w // (1 << wbits))
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("vp8l: invalid color-cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0
    meta = None
    meta_bits = 0
    n_groups = 1
    if is_level0 and br.read(1):
        meta_bits = br.read(3) + 2
        mw = -(-cur_w // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        meta = _read_entropy_coded(br, mw, mh, False)
        meta = [((p >> 8) & 0xFFFF) for p in meta]  # (red<<8)|green
        n_groups = max(meta) + 1
    green_alpha = 256 + 24 + cache_size
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(br, green_alpha),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 40),
            )
        )
    cache = [0] * cache_size
    out: list[int] = []
    total = cur_w * h
    mw = -(-cur_w // (1 << meta_bits)) if meta is not None else 0
    while len(out) < total:
        pos = len(out)
        if meta is not None:
            x, y = pos % cur_w, pos // cur_w
            g = groups[meta[(y >> meta_bits) * mw + (x >> meta_bits)]]
        else:
            g = groups[0]
        s = g[0].decode(br)
        if s < 256:
            red = g[1].decode(br)
            blue = g[2].decode(br)
            alpha = g[3].decode(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out.append(px)
            if cache_size:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        elif s < 256 + 24:
            length = _lz77_value(s - 256, br)
            dist_code = _lz77_value(g[4].decode(br), br)
            dist = _plane_to_dist(cur_w, dist_code)
            if dist > len(out):
                raise ValueError("vp8l: back-reference before image start")
            for _ in range(length):
                px = out[-dist]
                out.append(px)
                if cache_size:
                    cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        else:
            if not cache_size:
                raise ValueError("vp8l: cache symbol without a color cache")
            out.append(cache[s - 256 - 24])
    if len(out) != total:
        raise ValueError("vp8l: pixel overrun")
    return out


# ------------------------------------------------------ inverse transforms


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) >> 1) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
        | ((((a & 0xFF) + (b & 0xFF)) >> 1))
    )


def _clip255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _sel(p, a):
    return (p >> a) & 0xFF


def _select(top: int, left: int, top_left: int) -> int:
    p_left = 0
    p_top = 0
    for sh in (24, 16, 8, 0):
        pred = _sel(top, sh) + _sel(left, sh) - _sel(top_left, sh)
        p_left += abs(pred - _sel(left, sh))
        p_top += abs(pred - _sel(top, sh))
    return left if p_left < p_top else top


def _cas_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= _clip255(_sel(l, sh) + _sel(t, sh) - _sel(tl, sh)) << sh
    return out


def _cas_half(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        ave = (_sel(l, sh) + _sel(t, sh)) >> 1
        d = ave - _sel(tl, sh)
        half = d // 2 if d >= 0 else -((-d) // 2)  # C truncation
        out |= _clip255(ave + half) << sh
    return out


def _predict(mode: int, l: int, t: int, tr: int, tl: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(t, l, tl)
    if mode == 12:
        return _cas_full(l, t, tl)
    if mode == 13:
        return _cas_half(l, t, tl)
    raise ValueError("vp8l: invalid predictor mode")


def _add_px(a: int, b: int) -> int:
    return (
        ((((a >> 24) + (b >> 24)) & 0xFF) << 24)
        | (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16)
        | (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8)
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)
    )


def _inv_predictor(px: list[int], w: int, h: int, bits: int, tw: int,
                   tiles: list[int]) -> list[int]:
    out = px  # in place
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = out[i - 1]
            elif x == 0:
                pred = out[i - w]
            else:
                mode = (tiles[(y >> bits) * tw + (x >> bits)] >> 8) & 0xFF
                # TR at the last column wraps to the current row's
                # first pixel (libwebp's contiguous-buffer indexing)
                pred = _predict(
                    mode, out[i - 1], out[i - w], out[i - w + 1], out[i - w - 1]
                )
            out[i] = _add_px(out[i], pred)
    return out


def _ct_delta(t: int, c: int) -> int:
    """(int8 t * int8 c) >> 5 with arithmetic shift."""
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _inv_color_transform(px: list[int], w: int, h: int, bits: int, tw: int,
                         tiles: list[int]) -> list[int]:
    for y in range(h):
        for x in range(w):
            i = y * w + x
            cte = tiles[(y >> bits) * tw + (x >> bits)]
            g2r = cte & 0xFF
            g2b = (cte >> 8) & 0xFF
            r2b = (cte >> 16) & 0xFF
            v = px[i]
            green = (v >> 8) & 0xFF
            red = (((v >> 16) & 0xFF) + _ct_delta(g2r, green)) & 0xFF
            blue = ((v & 0xFF) + _ct_delta(g2b, green) + _ct_delta(r2b, red)) & 0xFF
            px[i] = (v & 0xFF00FF00) | (red << 16) | blue
    return px


def _inv_subtract_green(px: list[int]) -> list[int]:
    for i, v in enumerate(px):
        g = (v >> 8) & 0xFF
        red = (((v >> 16) & 0xFF) + g) & 0xFF
        blue = ((v & 0xFF) + g) & 0xFF
        px[i] = (v & 0xFF00FF00) | (red << 16) | blue
    return px


def _inv_color_indexing(px: list[int], w: int, h: int, wbits: int,
                        palette: list[int]) -> list[int]:
    if wbits == 0:
        return [
            palette[(v >> 8) & 0xFF] if ((v >> 8) & 0xFF) < len(palette) else 0
            for v in px
        ]
    packed_w = -(-w // (1 << wbits))
    bpp = 8 >> wbits
    mask = (1 << bpp) - 1
    out = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            packed = px[y * packed_w + (x >> wbits)]
            idx = ((packed >> 8) >> ((x & ((1 << wbits) - 1)) * bpp)) & mask
            out[y * w + x] = palette[idx] if idx < len(palette) else 0
    return out


# ------------------------------------------------------------------ decode


def _yuv420_to_rgba(y, u, v):
    """YUV 4:2:0 -> (h, w, 4) uint8 RGBA via the engine's shared
    BT.601 convention (multimodal._ycbcr_to_rgb: nearest-neighbor
    chroma upsample, floor(x+0.5), clamp)."""
    import numpy as np

    from .multimodal import _ycbcr_to_rgb

    rgb = _ycbcr_to_rgb(y.astype(np.int64), u.astype(np.int64), v.astype(np.int64))
    alpha = np.full(rgb.shape[:2] + (1,), 255, dtype=np.int64)
    return np.concatenate([rgb, alpha], axis=2).astype(np.uint8)


def vp8l_decode(data: bytes):
    """Decode a lossless WebP file (RIFF container or bare VP8L
    stream) into an (h, w, 4) uint8 RGBA ndarray."""
    import numpy as np

    if data[:4] == b"RIFF":
        if data[8:12] != b"WEBP":
            raise ValueError("vp8l: RIFF is not WEBP")
        pos = 12
        payload = None
        while pos + 8 <= len(data):
            cc = data[pos : pos + 4]
            size = int.from_bytes(data[pos + 4 : pos + 8], "little")
            if cc == b"VP8L":
                payload = data[pos + 8 : pos + 8 + size]
                break
            if cc == b"VP8 ":
                # lossy VP8 keyframe (round 12): decode via the RFC
                # 6386 codec and upsample YUV 4:2:0 back to RGBA so
                # callers keep one return shape.  Nearest-neighbor
                # chroma + BT.601 full-swing is the integer-exact
                # convention of the engine's own YUV surface; callers
                # needing the native planes use vp8.webp_lossy_decode.
                from .vp8 import vp8_decode as _vp8_decode

                y, u, v = _vp8_decode(data[pos + 8 : pos + 8 + size])
                return _yuv420_to_rgba(y, u, v)
            if cc == b"VP8X":
                # extended WebP (round 12): STILL images only — walk
                # the remaining chunks, decode the image chunk, and
                # merge the ALPH alpha plane for lossy payloads;
                # metadata chunks (ICCP/EXIF/XMP) are skipped;
                # animation stays the documented library-gated seam.
                return _vp8x_decode(data, pos, size)
            pos += 8 + size + (size & 1)
        if payload is None:
            raise ValueError("vp8l: no VP8L chunk")
        data = payload
    if not data or data[0] != 0x2F:
        raise ValueError("vp8l: bad signature byte")
    br = _LsbBits(data[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("vp8l: unsupported version")
    return _vp8l_stream_decode(br, w, h)


def _vp8x_decode(data: bytes, vp8x_pos: int, vp8x_size: int):
    """Extended-WebP (VP8X) STILL image: flags + canvas size, then the
    chunk walk collecting ALPH and the VP8/VP8L image chunk.  Lossy +
    ALPH composes the decoded alpha plane over the BT.601 RGB;
    lossless carries alpha natively.  Animated files (ANIM/ANMF)
    raise — inter-frame reconstruction is the documented seam."""
    import numpy as np

    body = data[vp8x_pos + 8 : vp8x_pos + 8 + vp8x_size]
    if len(body) < 10:
        raise ValueError("webp: truncated VP8X header")
    flags = body[0]
    canvas_w = 1 + int.from_bytes(body[4:7], "little")
    canvas_h = 1 + int.from_bytes(body[7:10], "little")
    if flags & 0x02:  # animation
        raise ValueError("webp: animated WebP not supported (library-gated seam)")
    pos = vp8x_pos + 8 + vp8x_size + (vp8x_size & 1)
    alph = None
    while pos + 8 <= len(data):
        cc = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        payload = data[pos + 8 : pos + 8 + size]
        if cc == b"ALPH":
            alph = payload
        elif cc == b"VP8L":
            rgba = vp8l_decode(payload)  # lossless: alpha is native
            break
        elif cc == b"VP8 ":
            from .vp8 import vp8_decode as _vp8_decode

            y, u, v = _vp8_decode(payload)
            rgba = _yuv420_to_rgba(y, u, v)
            if alph is not None:
                h, w = rgba.shape[:2]
                rgba[..., 3] = _alpha_decode(alph, w, h).astype(np.uint8)
            break
        pos += 8 + size + (size & 1)
    else:
        raise ValueError("webp: VP8X file carries no image chunk")
    if rgba.shape[:2] != (canvas_h, canvas_w):
        raise ValueError("webp: VP8X canvas size contradicts the image chunk")
    return rgba


def _vp8l_stream_decode(br: "_LsbBits", w: int, h: int):
    """The post-header VP8L image stream (DecodeImageStream level 0 +
    inverse transforms) -> (h, w, 4) uint8 RGBA.  Shared by the
    signed stream (``vp8l_decode``) and the HEADERLESS stream an
    extended-WebP ALPH chunk embeds (dimensions come from the frame,
    round 12)."""
    import numpy as np

    transforms: list = []
    px = _read_entropy_coded(br, w, h, True, transforms)
    cur_w = w
    for t in transforms:
        if t[0] == 3:
            cur_w = -(-cur_w // (1 << t[1]))
    for t in reversed(transforms):
        if t[0] == 0:
            px = _inv_predictor(px, cur_w, h, t[1], t[2], t[3])
        elif t[0] == 1:
            px = _inv_color_transform(px, cur_w, h, t[1], t[2], t[3])
        elif t[0] == 2:
            px = _inv_subtract_green(px)
        else:
            px = _inv_color_indexing(px, t[2], h, t[1], t[3])
            cur_w = t[2]
    if cur_w != w:
        raise ValueError("vp8l: width bookkeeping mismatch")
    arr = np.asarray(px, dtype=np.uint32).reshape(h, w)
    rgba = np.empty((h, w, 4), dtype=np.uint8)
    rgba[..., 0] = (arr >> 16) & 0xFF
    rgba[..., 1] = (arr >> 8) & 0xFF
    rgba[..., 2] = arr & 0xFF
    rgba[..., 3] = (arr >> 24) & 0xFF
    return rgba


def _alpha_unfilter(plane, method: int):
    """Invert the ALPH chunk's row filters (libwebp dsp/filters.c
    semantics): horizontal (1) predicts from the left (row 0 of the
    frame seeds with 0; later rows seed pixel 0 from the row above),
    vertical (2) from above (row 0 falls back to horizontal), gradient
    (3) from clip(left + above - above_left) (row 0 likewise
    horizontal)."""
    h, w = plane.shape
    if method == 0:
        return plane
    out = plane.copy()
    for y in range(h):
        prev = out[y - 1] if y > 0 else None
        if method == 1 or prev is None:  # horizontal (and any row-0)
            pred = 0 if prev is None else int(prev[0])
            for x in range(w):
                out[y, x] = (int(plane[y, x]) + pred) & 0xFF
                pred = int(out[y, x])
        elif method == 2:  # vertical
            out[y] = (plane[y] + prev) & 0xFF
        else:  # gradient
            left = int(prev[0])
            for x in range(w):
                top = int(prev[x])
                top_left = int(prev[x - 1]) if x > 0 else int(prev[0])
                g = left + top - top_left
                g = 0 if g < 0 else (255 if g > 255 else g)
                out[y, x] = (int(plane[y, x]) + g) & 0xFF
                left = int(out[y, x])
    return out


def _alpha_decode(alph: bytes, w: int, h: int):
    """Extended-WebP ALPH chunk -> (h, w) int64 alpha plane: 1-byte
    header (compression method, filter, pre-processing), then raw
    bytes or a HEADERLESS VP8L stream whose green channel carries the
    alpha values; the row filter inverts last.  Pre-processing (level
    reduction) needs no decode-side inverse."""
    import numpy as np

    if not alph:
        raise ValueError("webp: empty ALPH chunk")
    hdr = alph[0]
    method = hdr & 3
    filt = (hdr >> 2) & 3
    if method == 0:
        body = alph[1 : 1 + w * h]
        if len(body) != w * h:
            raise ValueError("webp: truncated raw ALPH payload")
        plane = np.frombuffer(body, dtype=np.uint8).astype(np.int64).reshape(h, w)
    elif method == 1:
        rgba = _vp8l_stream_decode(_LsbBits(alph[1:]), w, h)
        plane = rgba[..., 1].astype(np.int64)  # green channel
    else:
        raise ValueError("webp: reserved ALPH compression method")
    return _alpha_unfilter(plane, filt)


# ------------------------------------------------------------------ encode


def _limited_huffman(freqs: dict[int, int], limit: int) -> dict[int, int]:
    """Code lengths <= limit with an exactly-complete Kraft sum
    (zlib-style overflow fixup)."""
    import heapq

    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    tick = len(heap)
    depth = {s: 0 for s in freqs}
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, tick, g1 + g2))
        tick += 1
    for s in depth:
        depth[s] = min(depth[s], limit)
    def kraft() -> float:
        return sum(1 / (1 << l) for l in depth.values())
    while kraft() > 1:  # overflowed: deepen the shallowest deep symbol
        s = max((s for s in depth if depth[s] < limit), key=lambda s: depth[s])
        depth[s] += 1
    # tighten under-full codes back to completeness
    changed = True
    while changed and kraft() < 1:
        changed = False
        for s in sorted(depth, key=lambda s: -depth[s]):
            if depth[s] > 1 and kraft() - 1 / (1 << depth[s]) + 1 / (1 << (depth[s] - 1)) <= 1:
                depth[s] -= 1
                changed = True
    if kraft() != 1:
        raise ValueError("vp8l: could not complete prefix code")
    return depth


def _canon_codes(lengths: dict[int, int]):
    max_len = max(lengths.values())
    bl_count = [0] * (max_len + 1)
    for l in lengths.values():
        bl_count[l] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for l in range(1, max_len + 1):
        code = (code + bl_count[l - 1]) << 1
        next_code[l] = code
    out = {}
    for s in sorted(lengths):
        l = lengths[s]
        out[s] = (next_code[l], l)
        next_code[l] += 1
    return out


def _write_code_msb(bw: _LsbWriter, code: int, length: int) -> None:
    for k in range(length - 1, -1, -1):
        bw.write((code >> k) & 1, 1)


def _write_prefix_code(bw: _LsbWriter, values: list[int], alphabet: int):
    """Serialize one prefix code for ``values`` and return the
    symbol->(code,len) map.  Uses the simple form for <=2 distinct
    symbols, else the code-length-coded normal form (17/18 zero-run
    operators, no max_symbol shortcut)."""
    distinct = sorted(set(values))
    if len(distinct) <= 2 and all(v < 256 for v in distinct):
        bw.write(1, 1)  # simple
        bw.write(len(distinct) - 1, 1)
        s0 = distinct[0]
        if s0 <= 1 and len(distinct) == 1:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        if len(distinct) == 2:
            bw.write(distinct[1], 8)
            return {distinct[0]: (0, 1), distinct[1]: (1, 1)}
        return {distinct[0]: (0, 0)}
    bw.write(0, 1)  # normal
    freqs: dict[int, int] = {}
    for v in values:
        freqs[v] = freqs.get(v, 0) + 1
    lengths = _limited_huffman(freqs, 15)
    full = [lengths.get(s, 0) for s in range(alphabet)]
    # code-length sequence with zero-run operators
    cl_seq: list[tuple[int, int]] = []  # (cl_symbol, extra_value)
    i = 0
    while i < alphabet:
        if full[i] == 0:
            run = 1
            while i + run < alphabet and full[i + run] == 0:
                run += 1
            rem = run
            while rem >= 11:
                take = min(rem, 138)
                cl_seq.append((18, take - 11))
                rem -= take
            while rem >= 3:
                take = min(rem, 10)
                cl_seq.append((17, take - 3))
                rem -= take
            for _ in range(rem):
                cl_seq.append((0, 0))
            i += run
        else:
            cl_seq.append((full[i], 0))
            i += 1
    cl_freqs: dict[int, int] = {}
    for s, _ in cl_seq:
        cl_freqs[s] = cl_freqs.get(s, 0) + 1
    cl_lengths = _limited_huffman(cl_freqs, 7)
    if len(cl_lengths) == 1:
        # a 1-entry code-length code is legal but its canonical length
        # must be written as-is; force a 2-entry code for simplicity
        only = next(iter(cl_lengths))
        other = 0 if only != 0 else 1
        cl_lengths = {only: 1, other: 1}
    order_pos = {s: i for i, s in enumerate(_CL_ORDER)}
    num_cl = max(order_pos[s] for s in cl_lengths) + 1
    num_cl = max(num_cl, 4)
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths.get(_CL_ORDER[i], 0), 3)
    bw.write(0, 1)  # no max_symbol shortcut
    cl_codes = _canon_codes(cl_lengths)
    for s, extra in cl_seq:
        code, length = cl_codes[s]
        _write_code_msb(bw, code, length)
        if s == 17:
            bw.write(extra, 3)
        elif s == 18:
            bw.write(extra, 7)
    return _canon_codes(lengths)


def _write_literal_image(bw: _LsbWriter, greens, reds, blues, alphas) -> None:
    """Five prefix codes + the literal pixel stream — the shared body
    of the main image and (round 11) transform tile sub-images."""
    g_codes = _write_prefix_code(bw, greens, 256 + 24)
    r_codes = _write_prefix_code(bw, reds, 256)
    b_codes = _write_prefix_code(bw, blues, 256)
    a_codes = _write_prefix_code(bw, alphas, 256)
    d_codes = _write_prefix_code(bw, [0], 40)  # unused distance code
    del d_codes
    for g, r, b, a in zip(greens, reds, blues, alphas):
        for v, codes in ((g, g_codes), (r, r_codes), (b, b_codes), (a, a_codes)):
            code, length = codes[v]
            if length:
                _write_code_msb(bw, code, length)


def vp8l_encode(rgba, *, transforms: tuple = ()) -> bytes:
    """Encode an (h, w, 4) uint8 RGBA array as a lossless WebP file:
    literal-only entropy coding, no color cache, no meta groups — a
    fully valid (if unambitious) VP8L stream wrapped in RIFF.

    ``transforms`` (round 11) may list ``"subtract_green"`` and/or
    ``"predictor"`` in write order; forward transforms are applied in
    that order (the decoder inverts in reverse read order, so this is
    the spec pairing).  The predictor transform signals mode 1 (left)
    for every 16x16 tile via a real entropy-coded tile sub-image;
    border pixels follow the spec rules the decoder replays (top-left
    predicts from opaque black, row 0 from left, column 0 from top).
    Exercises the decoder's transform machinery on self-made streams;
    the committed libwebp fixtures stay the foreign-stream check."""
    import numpy as np

    rgba = np.asarray(rgba, dtype=np.uint8)
    h, w, _ = rgba.shape
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("vp8l: dimensions out of range")
    bw = _LsbWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(int(np.any(rgba[..., 3] != 255)), 1)
    bw.write(0, 3)  # version

    A = rgba[..., 3].astype(np.int32)
    R = rgba[..., 0].astype(np.int32)
    G = rgba[..., 1].astype(np.int32)
    B = rgba[..., 2].astype(np.int32)
    for t in transforms:
        if t == "subtract_green":
            bw.write(1, 1)
            bw.write(2, 2)
            R = (R - G) % 256
            B = (B - G) % 256
        elif t == "predictor":
            bw.write(1, 1)
            bw.write(0, 2)
            bits = 4  # 16x16 tiles
            bw.write(bits - 2, 3)
            tw, th = -(-w // (1 << bits)), -(-h // (1 << bits))
            bw.write(0, 1)  # tile sub-image: no color cache
            n = tw * th
            # mode 1 (left) in the green channel of every tile pixel
            _write_literal_image(bw, [1] * n, [0] * n, [0] * n, [0] * n)

            def resid(C, black):
                out = np.empty_like(C)
                out[0, 0] = (C[0, 0] - black) % 256
                if w > 1:
                    out[0, 1:] = (C[0, 1:] - C[0, :-1]) % 256  # row 0: left
                if h > 1:
                    out[1:, 0] = (C[1:, 0] - C[:-1, 0]) % 256  # col 0: top
                if w > 1 and h > 1:
                    out[1:, 1:] = (C[1:, 1:] - C[1:, :-1]) % 256  # mode 1
                return out

            A, R, G, B = resid(A, 0xFF), resid(R, 0), resid(G, 0), resid(B, 0)
        else:
            raise ValueError(f"vp8l: unknown encoder transform {t!r}")
    bw.write(0, 1)  # end of transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix image
    _write_literal_image(
        bw,
        G.ravel().tolist(),
        R.ravel().tolist(),
        B.ravel().tolist(),
        A.ravel().tolist(),
    )
    payload = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


# --------------------------------------------------------- animated WebP
#
# Round 12 (late): ANIMATED WebP is NOT an inter-frame-predicted codec —
# each ANMF frame is a complete VP8/VP8L image composited onto a canvas
# with blend/dispose flags, exactly the GIF model.  The per-frame codec
# layer is already externally pinned (VP8 bit-exact vs libwebp, VP8L
# interop both directions); the mux layer below is spec arithmetic over
# those decodes, fixture-tested the same way the GIF compositor is.
# Only H.26x/VP9/AV1-class video remains the library-gated seam.


def webp_anim_encode(
    frames: list,
    canvas_w: int,
    canvas_h: int,
    *,
    bg=(255, 255, 255, 255),
    loop: int = 0,
) -> bytes:
    """Mux an animated WebP: VP8X (animation flag) + ANIM (background
    RGBA, loop count) + one ANMF per frame.  Each frame dict:
    ``{x, y, rgba, duration, blend, dispose}`` — x/y are EVEN canvas
    offsets (the wire stores them halved), ``rgba`` an (h, w, 4)
    array encoded losslessly via ``vp8l_encode``, ``blend`` True for
    alpha compositing (wire bit 0 MEANS do-not-blend), ``dispose``
    1 to restore the frame rectangle to the background color after
    rendering."""
    import numpy as np

    chunks = bytearray()
    vp8x = bytes([0x12]) + b"\x00\x00\x00"  # alpha + animation flags
    vp8x += (canvas_w - 1).to_bytes(3, "little")
    vp8x += (canvas_h - 1).to_bytes(3, "little")
    chunks += b"VP8X" + len(vp8x).to_bytes(4, "little") + vp8x
    r, g, b, a = bg
    anim = bytes([b, g, r, a]) + int(loop).to_bytes(2, "little")  # BGRA
    chunks += b"ANIM" + len(anim).to_bytes(4, "little") + anim
    for f in frames:
        arr = np.asarray(f["rgba"], dtype=np.uint8)
        fh, fw = arr.shape[:2]
        x, y = int(f["x"]), int(f["y"])
        if x % 2 or y % 2:
            raise ValueError("webp: ANMF offsets must be even")
        if x + fw > canvas_w or y + fh > canvas_h:
            raise ValueError("webp: frame rectangle outside the canvas")
        sub = vp8l_encode(arr)[12:]  # the VP8L chunk (+pad) sans RIFF/WEBP
        hdr = (x // 2).to_bytes(3, "little") + (y // 2).to_bytes(3, "little")
        hdr += (fw - 1).to_bytes(3, "little") + (fh - 1).to_bytes(3, "little")
        hdr += int(f.get("duration", 100)).to_bytes(3, "little")
        flags = (0x01 if not f.get("blend", True) else 0) | (
            0x02 if f.get("dispose", 0) else 0
        )
        body = hdr + bytes([flags]) + sub
        chunks += b"ANMF" + len(body).to_bytes(4, "little") + body
        if len(body) & 1:
            chunks += b"\x00"
    riff = b"WEBP" + bytes(chunks)
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def _blend_rect(canvas, frame, y0: int, x0: int) -> None:
    """Alpha-compose ``frame`` over the canvas rectangle (the
    non-premultiplied integer convention: blend_a = src_a + dst_a *
    (255 - src_a) / 255, channel = (src*src_a + dst*dst_a*(255-src_a)
    / 255) / blend_a; a zero blend alpha yields transparent black)."""
    import numpy as np

    fh, fw = frame.shape[:2]
    dst = canvas[y0 : y0 + fh, x0 : x0 + fw].astype(np.int64)
    src = frame.astype(np.int64)
    src_a = src[..., 3:4]
    dst_scale = dst[..., 3:4] * (255 - src_a) // 255
    blend_a = src_a + dst_scale
    rgb = src[..., :3] * src_a + dst[..., :3] * dst_scale
    safe = np.maximum(blend_a, 1)
    out = np.concatenate([rgb // safe, blend_a], axis=2)
    out[np.broadcast_to(blend_a == 0, out.shape)] = 0
    canvas[y0 : y0 + fh, x0 : x0 + fw] = out.astype(np.uint8)


def webp_anim_decode(data: bytes):
    """Demux + composite an animated WebP: returns ``(canvases,
    durations, loop, bg_rgba)`` where ``canvases`` is one (canvas_h,
    canvas_w, 4) uint8 array per ANMF frame (the canvas as displayed
    after that frame).  The canvas starts transparent black; blend
    composites per ``_blend_rect``; dispose=1 restores the frame
    rectangle to the ANIM background color after the snapshot.  Frame
    payloads route through the pinned VP8/VP8L decoders (ALPH merged
    for lossy frames)."""
    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    canvas = None
    bg = (0, 0, 0, 0)
    loop = 0
    canvases: list = []
    durations: list = []
    seen_anim = False
    while pos + 8 <= len(data):
        cc = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + size]
        if cc == b"VP8X":
            if not (body[0] & 0x02):
                raise ValueError("webp: not an animated file (no ANIM flag)")
            cw = 1 + int.from_bytes(body[4:7], "little")
            ch = 1 + int.from_bytes(body[7:10], "little")
            canvas = np.zeros((ch, cw, 4), dtype=np.uint8)
        elif cc == b"ANIM":
            bg = (body[2], body[1], body[0], body[3])  # BGRA wire order
            loop = int.from_bytes(body[4:6], "little")
            seen_anim = True
        elif cc == b"ANMF":
            if canvas is None or not seen_anim:
                raise ValueError("webp: ANMF before VP8X/ANIM")
            x = 2 * int.from_bytes(body[0:3], "little")
            y = 2 * int.from_bytes(body[3:6], "little")
            fw = 1 + int.from_bytes(body[6:9], "little")
            fh = 1 + int.from_bytes(body[9:12], "little")
            durations.append(int.from_bytes(body[12:15], "little"))
            flags = body[15]
            if y + fh > canvas.shape[0] or x + fw > canvas.shape[1]:
                raise ValueError("webp: frame rectangle outside the canvas")
            # frame payload: optional ALPH + VP8/VP8L chunk
            fpos = 16
            alph = None
            frame = None
            while fpos + 8 <= len(body):
                fcc = body[fpos : fpos + 4]
                fsz = int.from_bytes(body[fpos + 4 : fpos + 8], "little")
                fbody = body[fpos + 8 : fpos + 8 + fsz]
                if fcc == b"ALPH":
                    alph = fbody
                elif fcc == b"VP8L":
                    frame = vp8l_decode(fbody)
                    break
                elif fcc == b"VP8 ":
                    from .vp8 import vp8_decode as _vp8_decode

                    yv, uv, vv = _vp8_decode(fbody)
                    frame = _yuv420_to_rgba(yv, uv, vv)
                    if alph is not None:
                        frame[..., 3] = _alpha_decode(
                            alph, frame.shape[1], frame.shape[0]
                        ).astype(np.uint8)
                    break
                fpos += 8 + fsz + (fsz & 1)
            if frame is None:
                raise ValueError("webp: ANMF carries no image chunk")
            if frame.shape[:2] != (fh, fw):
                raise ValueError("webp: ANMF size contradicts the frame payload")
            if flags & 0x01:  # do-not-blend: straight copy
                canvas[y : y + fh, x : x + fw] = frame
            else:
                _blend_rect(canvas, frame, y, x)
            canvases.append(canvas.copy())
            if flags & 0x02:  # dispose to background color
                canvas[y : y + fh, x : x + fw] = np.array(bg, dtype=np.uint8)
        pos += 8 + size + (size & 1)
    if not canvases:
        raise ValueError("webp: no ANMF frames")
    return canvases, durations, loop, bg


# ------------------------------------------------------------ Spark surface


def plant_webp_images(documents, *, id_col: str = "doc_id"):
    """Planted lossless WebP fixtures: per doc ``w = 8 + id % 9``,
    ``h = 8 + id % 7`` and closed-form channels

        r = (3x + 5y + id) % 256
        g = (7x + 2y + 11 id) % 256
        b = (x y + 13 id) % 256      (alpha 255)

    VP8L-encoded by this module's writer, so every decoded pixel
    replays in SQL — odd ids through the subtract-green + predictor
    transform pipeline (round 11; same pixels, so the oracle is
    unchanged while the query exercises the decoder's transform
    path on self-made streams too); foreign-stream interop
    (cache/meta paths) stays pinned by the committed libwebp
    fixtures."""
    import numpy as np
    import pandas as pd

    from .multimodal import _spread
    from ..sources.warc import WARC_FILE_SCHEMA

    def build(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf[id_col]:
                i = int(i)
                w, h = 8 + i % 9, 8 + i % 7
                yy, xx = np.mgrid[0:h, 0:w]
                img = np.zeros((h, w, 4), np.uint8)
                img[..., 0] = (3 * xx + 5 * yy + i) % 256
                img[..., 1] = (7 * xx + 2 * yy + 11 * i) % 256
                img[..., 2] = (xx * yy + 13 * i) % 256
                img[..., 3] = 255
                ids.append(i)
                tf = ("subtract_green", "predictor") if i % 2 else ()
                payloads.append(vp8l_encode(img, transforms=tf))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": ["webp"] * len(ids),
                    "media": payloads,
                    "source": ["planted"] * len(ids),
                }
            )

    return _spread(documents.select(id_col)).mapInPandas(build, schema=WARC_FILE_SCHEMA)


def webp_pixel_stats(media):
    """Decode WebP files in ONE Arrow map stage and emit exact
    integers: per-channel sums plus ``wsum = Σ (r + 2g + 3b) *
    (31y + 17x + 1)`` — position-sensitive, so a decoder that
    scrambles ANY pixel fails the value oracle even where plain
    channel sums would collide.  Image bytes never leave the stage;
    each file decodes independently (the multimodal shard grain)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("width", LongType(), False),
            StructField("height", LongType(), False),
            StructField("r_sum", LongType(), False),
            StructField("g_sum", LongType(), False),
            StructField("b_sum", LongType(), False),
            StructField("wsum", LongType(), False),
        ]
    )

    def process(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "width", "height",
                                    "r_sum", "g_sum", "b_sum", "wsum")}
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                img = vp8l_decode(bytes(payload)).astype(np.int64)
                h, w, _ = img.shape
                yy, xx = np.mgrid[0:h, 0:w]
                weight = 31 * yy + 17 * xx + 1
                rows["media_id"].append(int(mid))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["r_sum"].append(int(img[..., 0].sum()))
                rows["g_sum"].append(int(img[..., 1].sum()))
                rows["b_sum"].append(int(img[..., 2].sum()))
                rows["wsum"].append(
                    int(((img[..., 0] + 2 * img[..., 1] + 3 * img[..., 2]) * weight).sum())
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(process, schema=schema)


def plant_anim_webps(documents, *, id_col: str = "doc_id"):
    """Planted ANIMATED WebP fixtures (round 12): 16x12 canvas,
    background (200,100,50,255), loop ``id % 4``; three VP8L frames
    per file in the GIF-fixture style —

      f0 full-canvas, opaque, copy; dispose-to-background iff id odd
         (duration 40 + id%10)
      f1 8x6 at (x=4, y=2), opaque, copy (duration 50)
      f2 6x4 at (x=8, y=4), ALPHA 128, BLEND (duration 60) — over an
         opaque canvas the non-premultiplied compositor reduces to
         channel = (src*128 + dst*127) // 255 with alpha 255, exact
         integers a SQL oracle replays.

    Frame arithmetic (frame-local u, v):
      f0: r=(3i+5j+id)%256  g=(7i+j+2id)%256  b=(i+j+3id)%256
      f1: r=(11u+13v+id)%256 g=(2u+v+5id)%256 b=(u+4v+7id)%256
      f2: r=(9u+4v+5id)%256  g=(u+2v+id)%256  b=(5u+v+2id)%256
    """
    import numpy as np
    import pandas as pd

    from .multimodal import MEDIA_SCHEMA, _spread

    def build(batches):
        for pdf in batches:
            ids, payloads = [], []
            for did in pdf[id_col]:
                did = int(did)
                i = np.arange(12)[:, None]
                j = np.arange(16)[None, :]
                f0 = np.stack(
                    [(3 * i + 5 * j + did) % 256, (7 * i + j + 2 * did) % 256,
                     (i + j + 3 * did) % 256, np.full((12, 16), 255)], axis=2
                ).astype(np.uint8)
                u1 = np.arange(6)[:, None]
                v1 = np.arange(8)[None, :]
                f1 = np.stack(
                    [(11 * u1 + 13 * v1 + did) % 256, (2 * u1 + v1 + 5 * did) % 256,
                     (u1 + 4 * v1 + 7 * did) % 256, np.full((6, 8), 255)], axis=2
                ).astype(np.uint8)
                u2 = np.arange(4)[:, None]
                v2 = np.arange(6)[None, :]
                f2 = np.stack(
                    [(9 * u2 + 4 * v2 + 5 * did) % 256, (u2 + 2 * v2 + did) % 256,
                     (5 * u2 + v2 + 2 * did) % 256, np.full((4, 6), 128)], axis=2
                ).astype(np.uint8)
                payloads.append(
                    webp_anim_encode(
                        [
                            dict(x=0, y=0, rgba=f0, duration=40 + did % 10,
                                 blend=False, dispose=1 if did % 2 else 0),
                            dict(x=4, y=2, rgba=f1, duration=50, blend=False),
                            dict(x=8, y=4, rgba=f2, duration=60, blend=True),
                        ],
                        16, 12, bg=(200, 100, 50, 255), loop=did % 4,
                    )
                )
                ids.append(did)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": ["image"] * len(ids),
                    "media": payloads,
                    "source": ["planted"] * len(ids),
                }
            )

    return _spread(documents.select(id_col)).mapInPandas(build, schema=MEDIA_SCHEMA)


def webp_anim_stats(media):
    """Composite every animated-WebP file and emit per-displayed-frame
    exact channel sums over the 16x12 canvas (plus duration and the
    loop count) — value-checking the demux, per-frame VP8L decode,
    blend arithmetic, and dispose-to-background in one pass."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", LongType(), False),
            StructField("duration", LongType(), False),
            StructField("loop_count", LongType(), False),
            StructField("r_sum", LongType(), False),
            StructField("g_sum", LongType(), False),
            StructField("b_sum", LongType(), False),
            StructField("a_sum", LongType(), False),
        ]
    )

    def process(batches):
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "frame_idx", "duration", "loop_count",
                "r_sum", "g_sum", "b_sum", "a_sum",
            )}
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                canvases, durs, loop, _bg = webp_anim_decode(bytes(payload))
                for k, (canvas, dur) in enumerate(zip(canvases, durs)):
                    c = canvas.astype(np.int64)
                    rows["media_id"].append(int(mid))
                    rows["frame_idx"].append(k)
                    rows["duration"].append(int(dur))
                    rows["loop_count"].append(int(loop))
                    rows["r_sum"].append(int(c[..., 0].sum()))
                    rows["g_sum"].append(int(c[..., 1].sum()))
                    rows["b_sum"].append(int(c[..., 2].sum()))
                    rows["a_sum"].append(int(c[..., 3].sum()))
            yield pd.DataFrame(rows)

    return media.mapInPandas(process, schema=schema)
