"""Generate committed WebP-lossless interop fixtures in
tests/data/webp/: REAL ``WebPEncodeLosslessRGBA`` (libwebp via
ctypes) output over closed-form deterministic images that the test
re-derives — so only the compressed bytes are committed, and decoding
them exercises the transform/cache/meta paths the from-spec encoder
never emits.  One-shot provenance tool; requires libwebp.so.7.
"""

import ctypes
import ctypes.util
import os
import sys

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "webp")


def fixture_images() -> dict[str, "np.ndarray"]:
    """Closed-form images (all arithmetic in the index grid, so the
    decode test rebuilds them without this script)."""
    imgs = {}
    yy, xx = np.mgrid[0:48, 0:64]
    grad = np.zeros((48, 64, 4), np.uint8)
    grad[..., 0] = (3 * xx + 5 * yy) % 256
    grad[..., 1] = (7 * xx + 2 * yy) % 256
    grad[..., 2] = (xx * yy) % 256
    grad[..., 3] = 255
    imgs["grad_48x64"] = grad  # -> predictor / color transforms
    pal_colors = np.array(
        [[10, 200, 30, 255], [250, 40, 90, 255], [0, 0, 0, 255], [128, 128, 128, 255]],
        dtype=np.uint8,
    )
    yy2, xx2 = np.mgrid[0:40, 0:56]
    imgs["pal4_40x56"] = pal_colors[(xx2 // 4 + yy2 // 3) % 4]  # -> bundled palette
    tile = np.zeros((8, 8, 4), np.uint8)
    ty, tx = np.mgrid[0:8, 0:8]
    tile[..., 0] = (31 * tx + 17 * ty) % 256
    tile[..., 1] = (13 * tx * ty + 7) % 256
    tile[..., 2] = (tx + 11 * ty) % 256
    tile[..., 3] = 255
    imgs["tiled_64x64"] = np.tile(tile, (8, 8, 1))  # -> LZ77
    alpha = grad.copy()
    alpha[..., 3] = (180 + (xx % 76)).astype(np.uint8)
    imgs["alpha_48x64"] = alpha  # -> real alpha channel
    return imgs


def main() -> None:
    libpath = ctypes.util.find_library("webp") or "/usr/lib/x86_64-linux-gnu/libwebp.so.7"
    lib = ctypes.CDLL(libpath)
    lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    os.makedirs(OUT, exist_ok=True)
    for name, img in fixture_images().items():
        h, w, _ = img.shape
        out = ctypes.POINTER(ctypes.c_uint8)()
        size = lib.WebPEncodeLosslessRGBA(img.tobytes(), w, h, w * 4, ctypes.byref(out))
        assert size, name
        with open(os.path.join(OUT, f"{name}.webp"), "wb") as f:
            f.write(ctypes.string_at(out, size))
        print(f"wrote {name}.webp: {img.nbytes} -> {size}")

    # LOSSY fixtures (round 12): real cwebp/VP8 keyframes over the
    # same closed-form images at several qualities, plus the
    # libwebp-decoded YUV plane digests (VP8 decode is bit-exact
    # normative, so the digests are the hermetic ground truth —
    # tests/test_round12_ops.py re-derives nothing lossy-wise).
    import hashlib
    import json

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
    digests = {}
    imgs = fixture_images()
    for name, q in (("grad_48x64", 75.0), ("tiled_64x64", 40.0), ("pal4_40x56", 92.0)):
        img = imgs[name].copy()
        img[..., 3] = 255  # lossy VP8 carries no alpha
        h, w, _ = img.shape
        out = ctypes.POINTER(ctypes.c_uint8)()
        size = lib.WebPEncodeRGBA(img.tobytes(), w, h, w * 4, q, ctypes.byref(out))
        assert size, name
        webp = ctypes.string_at(out, size)
        fname = f"lossy_{name}_q{int(q)}.webp"
        with open(os.path.join(OUT, fname), "wb") as f:
            f.write(webp)
        ww, hh = ctypes.c_int(), ctypes.c_int()
        up, vp = ctypes.POINTER(ctypes.c_uint8)(), ctypes.POINTER(ctypes.c_uint8)()
        st, ust = ctypes.c_int(), ctypes.c_int()
        yp = lib.WebPDecodeYUV(webp, size, ctypes.byref(ww), ctypes.byref(hh),
                               ctypes.byref(up), ctypes.byref(vp),
                               ctypes.byref(st), ctypes.byref(ust))
        W, H, S, US = ww.value, hh.value, st.value, ust.value
        cw, ch = (W + 1) // 2, (H + 1) // 2
        y = bytes(bytearray(yp[r * S + c] for r in range(H) for c in range(W)))
        u = bytes(bytearray(up[r * US + c] for r in range(ch) for c in range(cw)))
        v = bytes(bytearray(vp[r * US + c] for r in range(ch) for c in range(cw)))
        digests[fname] = {
            "w": W, "h": H,
            "y_sha": hashlib.sha256(y).hexdigest(),
            "u_sha": hashlib.sha256(u).hexdigest(),
            "v_sha": hashlib.sha256(v).hexdigest(),
        }
        print(f"wrote {fname}: {size} bytes")
    with open(os.path.join(OUT, "lossy_digests.json"), "w") as f:
        json.dump(digests, f, indent=1, sort_keys=True)
    print("wrote lossy_digests.json")


if __name__ == "__main__":
    sys.exit(main())
