"""HEIF/AVIF container metadata (operators/multimodal.py
heif_metadata / build_minimal_avif) — ISO/IEC 23008-12 conformance.

Independent anchor: the container's libheif (ctypes, tests only) with
its real x265 (HEVC) and aom (AV1) encoders — the parser must report
the same brand/codec/dimensions libheif itself reports for files
libheif encoded, including the grid wrapping its HEVC writer emits.
The muxer/parser pair round-trips every metadata field; sample decode
(AV1/HEVC payloads) is the documented stub boundary.
"""

from __future__ import annotations

import ctypes

import pytest

from impala_cut_spark.operators.multimodal import (
    build_minimal_avif,
    heif_metadata,
    image_container_metadata,
)


class _HeifError(ctypes.Structure):
    _fields_ = [("code", ctypes.c_int), ("subcode", ctypes.c_int),
                ("message", ctypes.c_char_p)]


def _libheif():
    try:
        h = ctypes.CDLL("libheif.so.1")
    except OSError:
        return None
    h.heif_context_alloc.restype = ctypes.c_void_p
    for fn, res, args in [
        ("heif_image_create", _HeifError,
         [ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
          ctypes.POINTER(ctypes.c_void_p)]),
        ("heif_image_add_plane", _HeifError,
         [ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
          ctypes.c_int]),
        ("heif_context_get_encoder_for_format", _HeifError,
         [ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_void_p)]),
        ("heif_context_encode_image", _HeifError,
         [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
          ctypes.POINTER(ctypes.c_void_p)]),
        ("heif_context_write_to_file", _HeifError,
         [ctypes.c_void_p, ctypes.c_char_p]),
        ("heif_context_read_from_memory_without_copy", _HeifError,
         [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p]),
        ("heif_context_get_primary_image_handle", _HeifError,
         [ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p)]),
    ]:
        getattr(h, fn).restype = res
        getattr(h, fn).argtypes = args
    h.heif_image_get_plane.restype = ctypes.POINTER(ctypes.c_uint8)
    h.heif_image_get_plane.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                       ctypes.POINTER(ctypes.c_int)]
    h.heif_image_handle_get_width.restype = ctypes.c_int
    h.heif_image_handle_get_width.argtypes = [ctypes.c_void_p]
    h.heif_image_handle_get_height.restype = ctypes.c_int
    h.heif_image_handle_get_height.argtypes = [ctypes.c_void_p]
    h.heif_image_handle_has_alpha_channel.restype = ctypes.c_int
    h.heif_image_handle_has_alpha_channel.argtypes = [ctypes.c_void_p]
    return h


_H = _libheif()
needs_libheif = pytest.mark.skipif(_H is None, reason="libheif not available")


def _chk(err, what):
    assert err.code == 0, f"{what}: {err.code}/{err.subcode} {err.message}"


def _encode(fmt: int, w: int, h: int, path: bytes, alpha: bool = False) -> bytes:
    """Encode a solid image via libheif: fmt 1=HEVC, 4=AV1.  Enum
    values per libheif 1.x public headers (colorspace RGB=1,
    interleaved RGB(A) chroma=10/11, interleaved channel=10)."""
    ctx = _H.heif_context_alloc()
    img = ctypes.c_void_p()
    chroma = 11 if alpha else 10
    _chk(_H.heif_image_create(w, h, 1, chroma, ctypes.byref(img)), "create")
    _chk(_H.heif_image_add_plane(img, 10, w, h, 8), "plane")
    stride = ctypes.c_int()
    ptr = _H.heif_image_get_plane(img, 10, ctypes.byref(stride))
    npx = 4 if alpha else 3
    for y in range(h):
        row = y * stride.value
        for x in range(w * npx):
            ptr[row + x] = 180 if (not alpha or x % npx != 3) else 255
    enc = ctypes.c_void_p()
    _chk(_H.heif_context_get_encoder_for_format(ctx, fmt, ctypes.byref(enc)),
         "encoder")
    handle = ctypes.c_void_p()
    _chk(_H.heif_context_encode_image(ctx, img, enc, None,
                                      ctypes.byref(handle)), "encode")
    _chk(_H.heif_context_write_to_file(ctx, path), "write")
    with open(path, "rb") as f:
        return f.read()


def _lib_reports(payload: bytes):
    ctx = _H.heif_context_alloc()
    _chk(_H.heif_context_read_from_memory_without_copy(
        ctx, payload, len(payload), None), "read")
    handle = ctypes.c_void_p()
    _chk(_H.heif_context_get_primary_image_handle(ctx, ctypes.byref(handle)),
         "primary")
    return (_H.heif_image_handle_get_width(handle),
            _H.heif_image_handle_get_height(handle),
            bool(_H.heif_image_handle_has_alpha_channel(handle)))


class TestHeifMetadata:
    def test_muxer_parser_roundtrip_matrix(self):
        for codec in ("av01", "hvc1"):
            for rot in (0, 90, 180, 270):
                for alpha in (False, True):
                    for depth in (8, 10, 12):
                        p = build_minimal_avif(321, 205, codec, depth, rot, alpha)
                        m = heif_metadata(p)
                        assert m["codec"] == codec
                        assert (m["width"], m["height"]) == (321, 205)
                        assert m["bit_depth"] == depth
                        assert m["rotation"] == rot
                        assert m["has_alpha"] == alpha
                        assert m["brand"] == ("avif" if codec == "av01" else "heic")

    @needs_libheif
    def test_real_avif_from_libheif_aom(self, tmp_path):
        data = _encode(4, 100, 62, str(tmp_path / "t.avif").encode())
        m = heif_metadata(data)
        lw, lh, la = _lib_reports(data)
        assert m["brand"] == "avif" and m["codec"] == "av01"
        assert (m["width"], m["height"]) == (lw, lh) == (100, 62)
        assert m["has_alpha"] == la is False

    @needs_libheif
    def test_real_heic_from_libheif_x265(self, tmp_path):
        data = _encode(1, 64, 48, str(tmp_path / "t.heic").encode())
        m = heif_metadata(data)
        lw, lh, _ = _lib_reports(data)
        assert m["brand"] == "heic" and m["codec"] == "hvc1"
        # libheif's HEVC writer wraps the image in a 1-tile grid; the
        # final (grid) dimensions must still match what libheif reports
        assert (m["width"], m["height"]) == (lw, lh) == (64, 48)
        assert m["is_grid"] is True and m["n_tiles"] >= 1

    @needs_libheif
    def test_real_avif_with_alpha(self, tmp_path):
        data = _encode(4, 40, 30, str(tmp_path / "a.avif").encode(), alpha=True)
        m = heif_metadata(data)
        lw, lh, la = _lib_reports(data)
        assert la is True and m["has_alpha"] is True
        assert (m["width"], m["height"]) == (lw, lh) == (40, 30)

    def test_malformed_payloads_raise(self):
        with pytest.raises(ValueError):
            heif_metadata(b"not bmff at all")
        p = build_minimal_avif(10, 10)
        with pytest.raises((ValueError, IndexError, Exception)):
            heif_metadata(p[:30])  # truncated inside meta
        # a meta tree with no pitm → no primary item
        import struct

        def box(t, b):
            return struct.pack(">I", 8 + len(b)) + t + b

        ftyp = box(b"ftyp", b"avif\x00\x00\x00\x00avif")
        meta = box(b"meta", b"\x00\x00\x00\x00")
        with pytest.raises(ValueError, match="primary"):
            heif_metadata(ftyp + meta)

    def test_operator_rows_and_degrade(self, spark):
        good = build_minimal_avif(33, 44, "av01", 10, 90, True)
        df = spark.createDataFrame(
            [(1, bytearray(good)), (2, b"JUNKJUNKJUNK")],
            "asset_id bigint, payload binary",
        )
        rows = {r.asset_id: r for r in image_container_metadata(df).collect()}
        assert rows[1].parse_ok and rows[1].codec == "av01"
        assert (rows[1].width, rows[1].height) == (33, 44)
        assert rows[1].rotation == 90 and rows[1].has_alpha
        assert rows[2].parse_ok is False
