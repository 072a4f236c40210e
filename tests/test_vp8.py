"""VP8 key-frame decoder (operators/vp8.py) — YUV-plane conformance vs
the container's own libwebp.so.7 (ctypes, tests-only, the zstd-jni
pattern).

WebPDecodeYUV is the anchor: the VP8 spec ends at the loop-filtered
YUV 4:2:0 planes (RGB reconstruction is an output-stage choice), so
every frame the real encoder produces must decode to byte-identical
Y/U/V here — across quality 0-100 (drives quantizers, segmentation,
filter levels, probability updates), multi-MB/multi-partition shapes,
odd dimensions, and CPython's real python.webp.
"""

from __future__ import annotations

import ctypes
import struct

import numpy as np
import pytest

from impala_cut_spark.operators import vp8

PYWEBP = (
    "/root/.pyenv/versions/3.13.0/lib/python3.13/test/"
    "test_email/data/python.webp"
)


@pytest.fixture(scope="module")
def libwebp():
    try:
        lw = ctypes.CDLL("libwebp.so.7")
    except OSError:
        pytest.skip("libwebp.so.7 not present")
    lw.WebPEncodeRGBA.restype = ctypes.c_size_t
    lw.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.c_char_p),
    ]
    lw.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
    lw.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    return lw


def _enc(lw, img: np.ndarray, q: float) -> bytes:
    img = np.ascontiguousarray(img.astype(np.uint8))
    h, w = img.shape[:2]
    out = ctypes.c_char_p()
    n = lw.WebPEncodeRGBA(img.tobytes(), w, h, w * 4, q, ctypes.byref(out))
    assert n > 0
    return ctypes.string_at(out, n)


def _vp8_chunk(p: bytes) -> bytes:
    pos = 12
    while pos + 8 <= len(p):
        four = p[pos : pos + 4]
        (size,) = struct.unpack_from("<I", p, pos + 4)
        if four == b"VP8 ":
            return p[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


def _lw_yuv(lw, payload: bytes):
    w, h = ctypes.c_int(), ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_ubyte)()
    vp = ctypes.POINTER(ctypes.c_ubyte)()
    stride, uvstride = ctypes.c_int(), ctypes.c_int()
    yp = lw.WebPDecodeYUV(
        payload, len(payload), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(up), ctypes.byref(vp),
        ctypes.byref(stride), ctypes.byref(uvstride),
    )
    assert yp, "libwebp rejected payload"
    W, H, S, US = w.value, h.value, stride.value, uvstride.value
    y = np.ctypeslib.as_array(yp, shape=(H, S))[:, :W].copy()
    u = np.ctypeslib.as_array(up, shape=((H + 1) // 2, US))[:, : (W + 1) // 2].copy()
    v = np.ctypeslib.as_array(vp, shape=((H + 1) // 2, US))[:, : (W + 1) // 2].copy()
    return y, u, v


def _assert_yuv_exact(lw, payload: bytes) -> None:
    ry, ru, rv = _lw_yuv(lw, payload)
    gy, gu, gv = vp8.decode_vp8(_vp8_chunk(payload))
    assert gy.shape == ry.shape and (gy == ry).all()
    assert (gu == ru).all() and (gv == rv).all()


def test_quality_sweep(libwebp):
    """q0-q100 on a photographic multi-MB image: drives quantizer
    deltas, segmentation, per-segment filter levels, coefficient
    probability updates and both filter strengths."""
    from impala_cut_spark.operators.jpeg import decode_jpeg

    kit = decode_jpeg(
        open("/opt/spark/data/mllib/images/origin/kittens/54893.jpg", "rb").read()
    )
    img = np.dstack([kit[:128, :160], np.full((128, 160, 1), 255, np.uint8)])
    for q in (0, 10, 35, 50, 75, 95, 100):
        _assert_yuv_exact(libwebp, _enc(libwebp, img, float(q)))


def test_shapes_and_content(libwebp):
    """Odd dimensions (partial edge MBs), single-MB, flat (skip MBs),
    gradients (every intra mode family), tall/wide strips, noise."""
    rng = np.random.default_rng(9)
    gy_, gx_ = np.mgrid[0:48, 0:80]
    grad = np.stack(
        [gx_ * 3 % 256, gy_ * 5 % 256, (gx_ + gy_) % 256, np.full_like(gx_, 255)], 2
    )
    cases = [
        (np.full((16, 16, 4), 128, np.uint8), 75),
        (grad, 75),
        (np.dstack([rng.integers(0, 256, (17, 33, 3), np.uint8),
                    np.full((17, 33, 1), 255, np.uint8)]), 50),
        (np.dstack([rng.integers(0, 256, (23, 37, 3), np.uint8),
                    np.full((23, 37, 1), 255, np.uint8)]), 60),
        (np.dstack([rng.integers(0, 256, (129, 17, 3), np.uint8),
                    np.full((129, 17, 1), 255, np.uint8)]), 70),
        (np.dstack([rng.integers(0, 256, (16, 257, 3), np.uint8),
                    np.full((16, 257, 1), 255, np.uint8)]), 70),
        (np.dstack([rng.integers(0, 256, (3, 5, 3), np.uint8),
                    np.full((3, 5, 1), 255, np.uint8)]), 60),
    ]
    for img, q in cases:
        _assert_yuv_exact(libwebp, _enc(libwebp, img, float(q)))


def test_real_python_webp(libwebp):
    """CPython's python.webp: a real-world libwebp-encoded VP8 frame
    (with VP8X + lossless ALPH alongside)."""
    try:
        data = open(PYWEBP, "rb").read()
    except OSError:
        pytest.skip("stdlib python.webp not present")
    _assert_yuv_exact(libwebp, data)


def test_tables_match_rodata():
    """The RFC 6386 constants transcribed into _vp8_tables.py must be
    byte-identical to the copies in the container's libwebp rodata
    (spot-checked by content search, not fixed offsets)."""
    from impala_cut_spark.operators import _vp8_tables as t

    try:
        data = open("/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5", "rb").read()
    except OSError:
        pytest.skip("libwebp binary not present")
    coeff = bytes(
        p
        for typ in t.COEFF_PROBS
        for band in typ
        for ctx in band
        for p in ctx
    )
    bmode = bytes(p for a in t.KF_BMODE_PROBS for l_ in a for p in l_)
    assert coeff in data
    assert bmode in data
    assert bytes(t.DC_TABLE) in data
    assert b"".join(v.to_bytes(2, "little") for v in t.AC_TABLE) in data


def test_corrupt_and_inter_frames_rejected():
    with pytest.raises(ValueError):
        vp8.decode_vp8(b"\x00\x00\x00BAD")  # bad start code
    with pytest.raises(NotImplementedError):  # inter-frame tag bit
        vp8.decode_vp8(b"\x01\x00\x00\x9d\x01\x2a\x10\x00\x10\x00" + b"\x00" * 8)
    with pytest.raises(ValueError):
        vp8.decode_vp8(b"")


def test_lossy_alpha_via_decode_webp(libwebp):
    """decode_webp on python.webp: RGB comes from the VP8 frame, the
    alpha channel from the lossless ALPH plane — matching libwebp's
    alpha byte-for-byte."""
    try:
        data = open(PYWEBP, "rb").read()
    except OSError:
        pytest.skip("stdlib python.webp not present")
    from impala_cut_spark.operators.vp8l import decode_webp

    libwebp.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
    libwebp.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    w, h = ctypes.c_int(), ctypes.c_int()
    ptr = libwebp.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    ref = np.ctypeslib.as_array(ptr, shape=(h.value, w.value, 4)).copy()
    got = decode_webp(data)
    assert got.shape == ref.shape
    assert (got[..., 3] == ref[..., 3]).all()  # ALPH plane exact

def test_alpha_methods_and_filters(libwebp):
    """ALPH plane coverage: raw (method 0) and lossless (method 1)
    payloads the encoder emits decode alpha byte-exact; hand-built
    ALPH chunks with prediction filters 1-3 (horizontal / vertical /
    gradient) match libwebp's own unfilters byte-for-byte."""
    from impala_cut_spark.operators.vp8l import decode_webp

    libwebp.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
    libwebp.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]

    def lw_rgba(payload):
        w, h = ctypes.c_int(), ctypes.c_int()
        ptr = libwebp.WebPDecodeRGBA(
            payload, len(payload), ctypes.byref(w), ctypes.byref(h)
        )
        assert ptr
        return np.ctypeslib.as_array(ptr, shape=(h.value, w.value, 4)).copy()

    rng = np.random.default_rng(12)
    W, H = 48, 64
    gy, gx = np.mgrid[0:H, 0:W]
    for alpha in (
        (gx * 4 % 256).astype(np.uint8),             # smooth → method 1
        rng.integers(0, 256, (H, W), np.uint8),      # noise → method 0 raw
    ):
        img = np.dstack(
            [rng.integers(0, 256, (H, W, 3), np.uint8), alpha[:, :, None]]
        )
        payload = _enc(libwebp, img, 75.0)
        assert (decode_webp(payload)[..., 3] == lw_rgba(payload)[..., 3]).all()

    # hand-built ALPH chunks exercising prediction filters 1-3
    base = _enc(
        libwebp,
        np.dstack([rng.integers(0, 256, (H, W, 3), np.uint8),
                   rng.integers(0, 256, (H, W, 1), np.uint8)]),
        75.0,
    )

    def rebuild(payload, alph_body):
        chunks = []
        pos = 12
        while pos + 8 <= len(payload):
            four = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            chunks.append([four, payload[pos + 8 : pos + 8 + size]])
            pos += 8 + size + (size & 1)
        for c in chunks:
            if c[0] == b"ALPH":
                c[1] = alph_body
        body = b""
        for four, ch in chunks:
            body += four + struct.pack("<I", len(ch)) + ch
            if len(ch) & 1:
                body += b"\x00"
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body

    for filt in (1, 2, 3):
        raw = rng.integers(0, 256, (H, W), np.uint8)
        payload = rebuild(base, bytes([filt << 2]) + raw.tobytes())
        assert (decode_webp(payload)[..., 3] == lw_rgba(payload)[..., 3]).all(), filt


def test_full_rgba_byte_exact(libwebp):
    """End-to-end lossy path matches WebPDecodeRGBA byte-for-byte:
    exact YUV + the reproduced fancy upsampler + fixed-point YUV→RGB
    + composed ALPH alpha."""
    from impala_cut_spark.operators.vp8l import decode_webp

    libwebp.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
    libwebp.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]

    def lw_rgba(p):
        w, h = ctypes.c_int(), ctypes.c_int()
        ptr = libwebp.WebPDecodeRGBA(p, len(p), ctypes.byref(w), ctypes.byref(h))
        assert ptr
        return np.ctypeslib.as_array(ptr, shape=(h.value, w.value, 4)).copy()

    rng = np.random.default_rng(13)
    from impala_cut_spark.operators.jpeg import decode_jpeg

    kit = decode_jpeg(
        open("/opt/spark/data/mllib/images/origin/kittens/54893.jpg", "rb").read()
    )
    for img in (
        np.dstack([rng.integers(0, 256, (32, 32, 3), np.uint8),
                   np.full((32, 32, 1), 255, np.uint8)]),
        np.dstack([kit[:128, :160], np.full((128, 160, 1), 255, np.uint8)]),
        np.dstack([rng.integers(0, 256, (23, 37, 3), np.uint8),
                   np.full((23, 37, 1), 255, np.uint8)]),
    ):
        for q in (20.0, 75.0, 95.0):
            p = _enc(libwebp, img, q)
            assert (decode_webp(p) == lw_rgba(p)).all(), q
    try:
        data = open(PYWEBP, "rb").read()
    except OSError:
        return
    assert (decode_webp(data) == lw_rgba(data)).all()
