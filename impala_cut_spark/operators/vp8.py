"""VP8 key-frame (intra) decoder — the lossy WebP still-image coding.

Round 10: closes the last image-format stub in decode_image.  WebP
stills are always VP8 KEY frames (RFC 6386), so no inter prediction,
motion vectors or reference buffers are involved; what remains is the
published intra toolchain, implemented here from the spec:

- the boolean arithmetic decoder (§7),
- frame/segmentation/filter/quantizer header parsing (§9),
- intra mode decoding with the key-frame trees and contextual
  sub-block mode probabilities (§11),
- DCT/WHT coefficient token decoding with the band/context probability
  model and large-value categories (§13),
- dequantization with the segment/delta rules (§14),
- the exact integer inverse DCT/WHT (§14.3-14.4),
- intra prediction (16x16 / 8x8 chroma / 4x4 B_PRED with the 127/129
  edge conventions) (§12),
- and the normal + simple in-loop deblocking filters (§15).

Output is the YUV 4:2:0 planes, byte-exact against libwebp's
WebPDecodeYUV (tests/test_vp8.py decodes real libwebp-encoded frames
at qualities 0-100, multi-MB/multi-segment/odd-dimension shapes, and
CPython's python.webp).  RGB is byte-exact vs WebPDecodeRGBA too:
vp8_to_rgb reproduces the library's fancy 9/3/3/1 chroma upsampler
and fixed-point YUV→RGB (constants verified against the binary's
immediates; rounding offsets pinned by a zero-slack fit), so the full
lossy path — pixels AND composed ALPH alpha — is bit-identical to the
reference library.

Constant tables live in _vp8_tables.py (RFC 6386 13.4/13.5/11.4/14.1,
byte-verified against the container's libwebp rodata).
"""

from __future__ import annotations

import numpy as np

from impala_cut_spark.operators._vp8_tables import (
    AC_TABLE,
    BANDS,
    CAT_PROBS,
    COEFF_PROBS,
    COEFF_UPDATE_PROBS,
    DC_TABLE,
    KF_BMODE_PROBS,
    KF_UVMODE_PROBS,
    KF_YMODE_PROBS,
    ZIGZAG,
)

__all__ = ["decode_vp8", "vp8_to_rgb"]


# -- boolean decoder (RFC 6386 §7) --------------------------------------------


class _Bool:
    __slots__ = ("d", "pos", "val", "rng", "bits")

    def __init__(self, data: bytes) -> None:
        self.d = data
        self.pos = 2
        self.val = (data[0] << 8) | data[1] if len(data) >= 2 else (
            (data[0] << 8) if data else 0
        )
        self.rng = 255
        self.bits = 0  # bits of the 16-bit window already consumed

    def bit(self, prob: int) -> int:
        split = 1 + (((self.rng - 1) * prob) >> 8)
        big = split << 8
        if self.val >= big:
            ret = 1
            self.rng -= split
            self.val -= big
        else:
            ret = 0
            self.rng = split
        while self.rng < 128:
            self.val = (self.val << 1) & 0xFFFF_FFFF
            self.rng <<= 1
            self.bits += 1
            if self.bits == 8:
                self.bits = 0
                if self.pos < len(self.d):
                    self.val |= self.d[self.pos]
                self.pos += 1
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit(128)
        return v

    def signed(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.bit(128) else v

    def tree(self, tree: list[int], probs: list[int], start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.bit(probs[i >> 1])]
            if i <= 0:
                return -i


# -- mode trees (RFC 6386 §8.2 tree coder form) -------------------------------

# luma 16x16 modes
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
# 4x4 sub-modes — NUMBERED per the extracted probability table's
# convention (B_RD/B_VR before B_LD; verified against the tree array
# and index arithmetic in the library's ParseIntraMode disassembly —
# the table's context rows are meaningless under any other numbering)
(B_DC, B_TM, B_VE, B_HE, B_RD, B_VR, B_LD, B_VL, B_HD, B_HU) = range(10)

_KF_YMODE_TREE = [-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED]
_UVMODE_TREE = [-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED]
_BMODE_TREE = [
    -B_DC, 2,
    -B_TM, 4,
    -B_VE, 6,
    8, 12,
    -B_HE, 10,
    -B_RD, -B_VR,
    -B_LD, 14,
    -B_VL, 16,
    -B_HD, -B_HU,
]
_SEGMENT_TREE = [2, 4, -0, -1, -2, -3]
#: 16x16 mode → equivalent sub-mode for neighbor context (RFC 11.3)
_MODE_TO_B = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}


# -- headers -------------------------------------------------------------------


class _Frame:
    pass


def _parse_headers(data: bytes) -> _Frame:
    f = _Frame()
    if len(data) < 10:
        raise ValueError("vp8: truncated frame")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise NotImplementedError("vp8: inter frames need reference buffers")
    f.part1_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("vp8: bad keyframe start code")
    w = data[6] | (data[7] << 8)
    h = data[8] | (data[9] << 8)
    f.width, f.height = w & 0x3FFF, h & 0x3FFF
    if not f.width or not f.height:
        raise ValueError("vp8: zero dimensions")
    part1 = data[10 : 10 + f.part1_size]
    if len(part1) < f.part1_size:
        raise ValueError("vp8: truncated first partition")
    b = _Bool(part1)
    f.b = b
    b.bit(128)  # color space (must be 0 for the profile we decode)
    b.bit(128)  # clamping type

    # segmentation (§9.3)
    f.seg_enabled = b.bit(128)
    f.seg_update_map = 0
    f.seg_abs = 0
    f.seg_quant = [0, 0, 0, 0]
    f.seg_lf = [0, 0, 0, 0]
    f.seg_tree_probs = [255, 255, 255]
    if f.seg_enabled:
        f.seg_update_map = b.bit(128)
        update_data = b.bit(128)
        if update_data:
            f.seg_abs = b.bit(128)
            for i in range(4):
                f.seg_quant[i] = b.signed(7) if b.bit(128) else 0
            for i in range(4):
                f.seg_lf[i] = b.signed(6) if b.bit(128) else 0
        if f.seg_update_map:
            for i in range(3):
                f.seg_tree_probs[i] = b.literal(8) if b.bit(128) else 255

    # loop filter (§9.4)
    f.filter_simple = b.bit(128)
    f.filter_level = b.literal(6)
    f.sharpness = b.literal(3)
    f.lf_delta_enabled = b.bit(128)
    f.ref_lf_delta = [0, 0, 0, 0]
    f.mode_lf_delta = [0, 0, 0, 0]
    if f.lf_delta_enabled:
        if b.bit(128):  # update deltas
            for i in range(4):
                if b.bit(128):
                    f.ref_lf_delta[i] = b.signed(6)
            for i in range(4):
                if b.bit(128):
                    f.mode_lf_delta[i] = b.signed(6)

    # token partitions (§9.5)
    n_parts = 1 << b.literal(2)
    rest = data[10 + f.part1_size :]
    sizes = []
    off = 3 * (n_parts - 1)
    for i in range(n_parts - 1):
        sizes.append(rest[3 * i] | (rest[3 * i + 1] << 8) | (rest[3 * i + 2] << 16))
    parts = []
    for i in range(n_parts):
        end = off + sizes[i] if i < n_parts - 1 else len(rest)
        parts.append(rest[off:end])
        off = end
    f.token_parts = [_Bool(p) for p in parts]

    # quantizers (§9.6)
    f.q_yac = b.literal(7)
    f.q_ydc_d = b.signed(4) if b.bit(128) else 0
    f.q_y2dc_d = b.signed(4) if b.bit(128) else 0
    f.q_y2ac_d = b.signed(4) if b.bit(128) else 0
    f.q_uvdc_d = b.signed(4) if b.bit(128) else 0
    f.q_uvac_d = b.signed(4) if b.bit(128) else 0

    b.bit(128)  # refresh entropy probs (keyframe: value irrelevant here)

    # coefficient probability updates (§13.4)
    f.coeff_probs = [
        [[list(COEFF_PROBS[t][band][c]) for c in range(3)] for band in range(8)]
        for t in range(4)
    ]
    for t in range(4):
        for band in range(8):
            for c in range(3):
                for p in range(11):
                    if b.bit(COEFF_UPDATE_PROBS[t][band][c][p]):
                        f.coeff_probs[t][band][c][p] = b.literal(8)

    f.mb_no_skip = b.bit(128)
    f.skip_prob = b.literal(8) if f.mb_no_skip else 0
    return f


def _quant_index(f: _Frame, segment: int) -> int:
    q = f.q_yac
    if f.seg_enabled:
        q = f.seg_quant[segment] if f.seg_abs else q + f.seg_quant[segment]
    return max(0, min(127, q))


def _clip_q(i: int, hi: int = 127) -> int:
    return 0 if i < 0 else (hi if i > hi else i)


def _dequant_factors(f: _Frame, segment: int):
    q = _quant_index(f, segment)
    y1 = (DC_TABLE[_clip_q(q + f.q_ydc_d)], AC_TABLE[_clip_q(q)])
    y2dc = DC_TABLE[_clip_q(q + f.q_y2dc_d)] * 2
    y2ac = AC_TABLE[_clip_q(q + f.q_y2ac_d)] * 155 // 100
    if y2ac < 8:
        y2ac = 8
    uvdc = DC_TABLE[_clip_q(q + f.q_uvdc_d, 117)]
    uv = (uvdc, AC_TABLE[_clip_q(q + f.q_uvac_d)])
    return y1, (y2dc, y2ac), uv


# -- coefficient tokens (§13) --------------------------------------------------


def _decode_coeffs(
    bd: _Bool, probs, first: int, quant, ctx: int
) -> tuple[np.ndarray, int]:
    """Decode one 4x4 block's coefficients → (natural-order int32[16],
    nonzero flag).  ``probs`` = coeff_probs[block_type]; ``ctx`` in 0-2."""
    out = np.zeros(16, dtype=np.int64)
    n = first
    nonzero = 0
    skip_eob = False
    while n < 16:
        p = probs[BANDS[n]][ctx]
        if not skip_eob:
            if not bd.bit(p[0]):  # EOB
                break
        if not bd.bit(p[1]):  # zero
            n += 1
            ctx = 0
            skip_eob = True
            continue
        skip_eob = False
        if not bd.bit(p[2]):
            val = 1
            ctx = 1
        else:
            ctx = 2
            if not bd.bit(p[3]):
                if not bd.bit(p[4]):
                    val = 2
                else:
                    val = 3 + bd.bit(p[5])
            elif not bd.bit(p[6]):
                base, cp = CAT_PROBS[0] if not bd.bit(p[7]) else CAT_PROBS[1]
                extra = 0
                for cpb in cp:
                    extra = (extra << 1) | bd.bit(cpb)
                val = base + extra
            else:
                if not bd.bit(p[8]):
                    base, cp = CAT_PROBS[2] if not bd.bit(p[9]) else CAT_PROBS[3]
                else:
                    base, cp = CAT_PROBS[4] if not bd.bit(p[10]) else CAT_PROBS[5]
                extra = 0
                for cpb in cp:
                    extra = (extra << 1) | bd.bit(cpb)
                val = base + extra
        if bd.bit(128):
            val = -val
        out[ZIGZAG[n]] = val * quant[0 if n == 0 else 1]
        nonzero = 1
        n += 1
    return out, nonzero


# -- inverse transforms (§14.3-14.4) -------------------------------------------


def _iwht(inp: np.ndarray) -> np.ndarray:
    """Inverse Walsh-Hadamard for the Y2 block → 16 DC values."""
    out = np.zeros(16, dtype=np.int64)
    tmp = np.zeros(16, dtype=np.int64)
    for i in range(4):
        a1 = inp[i] + inp[12 + i]
        b1 = inp[4 + i] + inp[8 + i]
        c1 = inp[4 + i] - inp[8 + i]
        d1 = inp[i] - inp[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    for i in range(4):
        a1 = tmp[4 * i] + tmp[4 * i + 3]
        b1 = tmp[4 * i + 1] + tmp[4 * i + 2]
        c1 = tmp[4 * i + 1] - tmp[4 * i + 2]
        d1 = tmp[4 * i] - tmp[4 * i + 3]
        out[4 * i] = (a1 + b1 + 3) >> 3
        out[4 * i + 1] = (c1 + d1 + 3) >> 3
        out[4 * i + 2] = (a1 - b1 + 3) >> 3
        out[4 * i + 3] = (d1 - c1 + 3) >> 3
    return out


def _idct4x4(c: np.ndarray) -> np.ndarray:
    """Exact VP8 inverse DCT (c in natural order) → int16 4x4 residual."""
    cos = 20091
    sin = 35468
    tmp = np.zeros(16, dtype=np.int64)
    for i in range(4):
        a1 = c[i] + c[8 + i]
        b1 = c[i] - c[8 + i]
        t1 = (c[4 + i] * sin) >> 16
        t2 = c[12 + i] + ((c[12 + i] * cos) >> 16)
        c1 = t1 - t2
        t1 = c[4 + i] + ((c[4 + i] * cos) >> 16)
        t2 = (c[12 + i] * sin) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = np.zeros(16, dtype=np.int64)
    for i in range(4):
        a1 = tmp[4 * i] + tmp[4 * i + 2]
        b1 = tmp[4 * i] - tmp[4 * i + 2]
        t1 = (tmp[4 * i + 1] * sin) >> 16
        t2 = tmp[4 * i + 3] + ((tmp[4 * i + 3] * cos) >> 16)
        c1 = t1 - t2
        t1 = tmp[4 * i + 1] + ((tmp[4 * i + 1] * cos) >> 16)
        t2 = (tmp[4 * i + 3] * sin) >> 16
        d1 = t1 + t2
        out[4 * i] = (a1 + d1 + 4) >> 3
        out[4 * i + 3] = (a1 - d1 + 4) >> 3
        out[4 * i + 1] = (b1 + c1 + 4) >> 3
        out[4 * i + 2] = (b1 - c1 + 4) >> 3
    return out.reshape(4, 4)


# -- intra prediction (§12) ----------------------------------------------------


def _pred16_or_8(
    plane: np.ndarray, x0: int, y0: int, size: int, mode: int,
    have_up: bool, have_left: bool,
) -> None:
    """Whole-block prediction into plane[y0:y0+size, x0:x0+size].
    The arrays carry the 127 (top) / 129 (left) border conventions in
    row 0 / column 0, so V/H/TM read borders directly; only DC needs
    the availability flags (it switches divisor/fallback)."""
    if mode == DC_PRED:
        if have_up and have_left:
            s = int(plane[y0 - 1, x0 : x0 + size].sum()) + int(
                plane[y0 : y0 + size, x0 - 1].sum()
            )
            dc = (s + size) // (2 * size)
        elif have_up:
            dc = (int(plane[y0 - 1, x0 : x0 + size].sum()) + size // 2) // size
        elif have_left:
            dc = (int(plane[y0 : y0 + size, x0 - 1].sum()) + size // 2) // size
        else:
            dc = 128
        plane[y0 : y0 + size, x0 : x0 + size] = dc
    elif mode == V_PRED:
        plane[y0 : y0 + size, x0 : x0 + size] = plane[y0 - 1, x0 : x0 + size][None, :]
    elif mode == H_PRED:
        plane[y0 : y0 + size, x0 : x0 + size] = plane[y0 : y0 + size, x0 - 1][:, None]
    else:  # TM_PRED
        up = plane[y0 - 1, x0 : x0 + size]
        left = plane[y0 : y0 + size, x0 - 1]
        tl = int(plane[y0 - 1, x0 - 1])
        v = left[:, None] + up[None, :] - tl
        plane[y0 : y0 + size, x0 : x0 + size] = np.clip(v, 0, 255)


def _pred4(
    Y: np.ndarray, x0: int, y0: int, mode: int, tr: np.ndarray
) -> None:
    """4x4 B_PRED into Y[y0:y0+4, x0:x0+4]; ``tr`` = the 4 above-right
    pixels.  Edges are guaranteed present: the caller pads row -1 /
    col -1 with the 127/129 conventions."""
    A = Y[y0 - 1, x0 : x0 + 4]
    L = Y[y0 : y0 + 4, x0 - 1]
    P = int(Y[y0 - 1, x0 - 1])
    a = [int(v) for v in A] + [int(v) for v in tr]
    l = [int(v) for v in L]
    out = Y[y0 : y0 + 4, x0 : x0 + 4]

    def avg3(x, y, z):
        return (x + 2 * y + z + 2) >> 2

    def avg2(x, y):
        return (x + y + 1) >> 1

    if mode == B_DC:
        dc = (sum(a[:4]) + sum(l) + 4) >> 3
        out[:, :] = dc
    elif mode == B_TM:
        v = np.array(l, np.int64)[:, None] + np.array(a[:4], np.int64)[None, :] - P
        out[:, :] = np.clip(v, 0, 255)
    elif mode == B_VE:
        row = [
            avg3(P, a[0], a[1]),
            avg3(a[0], a[1], a[2]),
            avg3(a[1], a[2], a[3]),
            avg3(a[2], a[3], a[4]),
        ]
        out[:, :] = np.array(row, np.int64)[None, :]
    elif mode == B_HE:
        col = [
            avg3(P, l[0], l[1]),
            avg3(l[0], l[1], l[2]),
            avg3(l[1], l[2], l[3]),
            avg3(l[2], l[3], l[3]),
        ]
        out[:, :] = np.array(col, np.int64)[:, None]
    elif mode == B_LD:
        out[0, 0] = avg3(a[0], a[1], a[2])
        out[0, 1] = out[1, 0] = avg3(a[1], a[2], a[3])
        out[0, 2] = out[1, 1] = out[2, 0] = avg3(a[2], a[3], a[4])
        out[0, 3] = out[1, 2] = out[2, 1] = out[3, 0] = avg3(a[3], a[4], a[5])
        out[1, 3] = out[2, 2] = out[3, 1] = avg3(a[4], a[5], a[6])
        out[2, 3] = out[3, 2] = avg3(a[5], a[6], a[7])
        out[3, 3] = avg3(a[6], a[7], a[7])
    elif mode == B_RD:
        out[3, 0] = avg3(l[3], l[2], l[1])
        out[2, 0] = out[3, 1] = avg3(l[2], l[1], l[0])
        out[1, 0] = out[2, 1] = out[3, 2] = avg3(l[1], l[0], P)
        out[0, 0] = out[1, 1] = out[2, 2] = out[3, 3] = avg3(l[0], P, a[0])
        out[0, 1] = out[1, 2] = out[2, 3] = avg3(P, a[0], a[1])
        out[0, 2] = out[1, 3] = avg3(a[0], a[1], a[2])
        out[0, 3] = avg3(a[1], a[2], a[3])
    elif mode == B_VR:
        out[0, 0] = out[2, 1] = avg2(P, a[0])
        out[0, 1] = out[2, 2] = avg2(a[0], a[1])
        out[0, 2] = out[2, 3] = avg2(a[1], a[2])
        out[0, 3] = avg2(a[2], a[3])
        out[1, 0] = out[3, 1] = avg3(l[0], P, a[0])
        out[1, 1] = out[3, 2] = avg3(P, a[0], a[1])
        out[1, 2] = out[3, 3] = avg3(a[0], a[1], a[2])
        out[1, 3] = avg3(a[1], a[2], a[3])
        out[2, 0] = avg3(P, l[0], l[1])
        out[3, 0] = avg3(l[0], l[1], l[2])
    elif mode == B_VL:
        out[0, 0] = avg2(a[0], a[1])
        out[0, 1] = out[2, 0] = avg2(a[1], a[2])
        out[0, 2] = out[2, 1] = avg2(a[2], a[3])
        out[0, 3] = out[2, 2] = avg2(a[3], a[4])
        out[1, 0] = avg3(a[0], a[1], a[2])
        out[1, 1] = out[3, 0] = avg3(a[1], a[2], a[3])
        out[1, 2] = out[3, 1] = avg3(a[2], a[3], a[4])
        out[1, 3] = out[3, 2] = avg3(a[3], a[4], a[5])
        out[2, 3] = avg3(a[4], a[5], a[6])
        out[3, 3] = avg3(a[5], a[6], a[7])
    elif mode == B_HD:
        out[3, 0] = avg2(l[3], l[2])
        out[3, 1] = avg3(l[3], l[2], l[1])
        out[2, 0] = out[3, 2] = avg2(l[2], l[1])
        out[2, 1] = out[3, 3] = avg3(l[2], l[1], l[0])
        out[1, 0] = out[2, 2] = avg2(l[1], l[0])
        out[1, 1] = out[2, 3] = avg3(l[1], l[0], P)
        out[0, 0] = out[1, 2] = avg2(l[0], P)
        out[0, 1] = out[1, 3] = avg3(l[0], P, a[0])
        out[0, 2] = avg3(P, a[0], a[1])
        out[0, 3] = avg3(a[0], a[1], a[2])
    elif mode == B_HU:
        out[0, 0] = avg2(l[0], l[1])
        out[0, 1] = avg3(l[0], l[1], l[2])
        out[0, 2] = out[1, 0] = avg2(l[1], l[2])
        out[0, 3] = out[1, 1] = avg3(l[1], l[2], l[3])
        out[1, 2] = out[2, 0] = avg2(l[2], l[3])
        out[1, 3] = out[2, 1] = avg3(l[2], l[3], l[3])
        out[2, 2] = out[2, 3] = l[3]
        out[3, :] = l[3]
    else:
        raise ValueError(f"vp8: bad bmode {mode}")


# -- main decode ----------------------------------------------------------------


def decode_vp8(data: bytes):
    """VP8 key-frame payload → (Y, U, V) uint8 planes (Y: HxW; U/V:
    ceil(H/2) x ceil(W/2)), loop-filtered, byte-exact vs libwebp."""
    f = _parse_headers(data)
    W, H = f.width, f.height
    mb_w = (W + 15) >> 4
    mb_h = (H + 15) >> 4
    # padded planes: 1-px virtual border realized at [0,*]/[*,0];
    # +4 extra columns on Y for B_PRED above-right reads
    yw, yh = mb_w * 16, mb_h * 16
    cw, ch = mb_w * 8, mb_h * 8
    Y = np.full((yh + 1, yw + 1 + 4), 129, dtype=np.int64)
    U = np.full((ch + 1, cw + 1), 129, dtype=np.int64)
    V = np.full((ch + 1, cw + 1), 129, dtype=np.int64)
    Y[0, :] = 127
    U[0, :] = 127
    V[0, :] = 127
    # (the 127/129 conventions: row above the frame reads 127, column
    #  left of the frame reads 129, above-left corner also 127 on the
    #  top row / 129 down the left side — matched below per predictor)

    # per-MB mode parse (partition 1, after the header bool state)
    b = f.b
    segments = np.zeros(mb_h * mb_w, dtype=np.int64)
    skips = np.zeros(mb_h * mb_w, dtype=np.int64)
    ymodes = np.zeros(mb_h * mb_w, dtype=np.int64)
    uvmodes = np.zeros(mb_h * mb_w, dtype=np.int64)
    bmodes = np.zeros((mb_h * mb_w, 16), dtype=np.int64)
    #: per-MB bottom row of sub-modes (context for the MB below)
    above_b = [[B_DC] * 4 for _ in range(mb_w)]
    for mby in range(mb_h):
        left_b = [B_DC] * 4
        for mbx in range(mb_w):
            i = mby * mb_w + mbx
            if f.seg_enabled and f.seg_update_map:
                segments[i] = b.tree(_SEGMENT_TREE, f.seg_tree_probs)
            if f.mb_no_skip:
                skips[i] = b.bit(f.skip_prob)
            ym = b.tree(_KF_YMODE_TREE, KF_YMODE_PROBS)
            ymodes[i] = ym
            if ym == B_PRED:
                for sy in range(4):
                    for sx in range(4):
                        a = above_b[mbx][sx] if sy == 0 else bmodes[i][(sy - 1) * 4 + sx]
                        l = left_b[sy] if sx == 0 else bmodes[i][sy * 4 + sx - 1]
                        m = b.tree(_BMODE_TREE, KF_BMODE_PROBS[a][l])
                        bmodes[i][sy * 4 + sx] = m
                above_b[mbx] = [int(v) for v in bmodes[i][12:16]]
                left_b = [int(bmodes[i][r * 4 + 3]) for r in range(4)]
            else:
                eq = _MODE_TO_B[ym]
                bmodes[i][:] = eq
                above_b[mbx] = [eq] * 4
                left_b = [eq] * 4
            uvmodes[i] = b.tree(_UVMODE_TREE, KF_UVMODE_PROBS)

    # coefficient decode + reconstruction
    # nonzero contexts: per-plane per-4x4-column/row flags
    above_nz_y = np.zeros((mb_w, 4), dtype=np.int64)
    above_nz_u = np.zeros((mb_w, 2), dtype=np.int64)
    above_nz_v = np.zeros((mb_w, 2), dtype=np.int64)
    above_nz_y2 = np.zeros(mb_w, dtype=np.int64)
    fstore = np.zeros((mb_h, mb_w, 2), dtype=np.int64)  # (has_coeffs, level) for LF
    n_parts = len(f.token_parts)
    for mby in range(mb_h):
        bd = f.token_parts[mby % n_parts]
        left_nz_y = np.zeros(4, dtype=np.int64)
        left_nz_u = np.zeros(2, dtype=np.int64)
        left_nz_v = np.zeros(2, dtype=np.int64)
        left_nz_y2 = 0
        for mbx in range(mb_w):
            i = mby * mb_w + mbx
            seg = int(segments[i])
            qy1, qy2, quv = _dequant_factors(f, seg)
            ym = int(ymodes[i])
            has_y2 = ym != B_PRED
            coeffs = np.zeros((25, 16), dtype=np.int64)
            mb_nonzero = 0
            if skips[i]:
                # skipped MB: no coefficients; nonzero ctx resets (but
                # Y2 ctx persists only for MBs WITH Y2 — RFC 13.1)
                left_nz_y[:] = 0
                above_nz_y[mbx, :] = 0
                left_nz_u[:] = 0
                above_nz_u[mbx, :] = 0
                left_nz_v[:] = 0
                above_nz_v[mbx, :] = 0
                if has_y2:
                    left_nz_y2 = 0
                    above_nz_y2[mbx] = 0
            else:
                first = 0
                if has_y2:
                    ctx = int(above_nz_y2[mbx] + left_nz_y2)
                    c, nz = _decode_coeffs(bd, f.coeff_probs[1], 0, qy2, ctx)
                    coeffs[24] = c
                    above_nz_y2[mbx] = left_nz_y2 = nz
                    mb_nonzero |= nz
                    first = 1
                ptype = 0 if has_y2 else 3
                for sy in range(4):
                    for sx in range(4):
                        ctx = int(above_nz_y[mbx, sx] + left_nz_y[sy])
                        c, nz = _decode_coeffs(
                            bd, f.coeff_probs[ptype], first, qy1, ctx
                        )
                        coeffs[sy * 4 + sx] = c
                        above_nz_y[mbx, sx] = left_nz_y[sy] = nz
                        mb_nonzero |= nz
                for plane, base, anz, lnz in (
                    (16, 16, above_nz_u, left_nz_u),
                    (20, 20, above_nz_v, left_nz_v),
                ):
                    for sy in range(2):
                        for sx in range(2):
                            ctx = int(anz[mbx, sx] + lnz[sy])
                            c, nz = _decode_coeffs(
                                bd, f.coeff_probs[2], 0, quv, ctx
                            )
                            coeffs[base + sy * 2 + sx] = c
                            anz[mbx, sx] = lnz[sy] = nz
                            mb_nonzero |= nz
            fstore[mby, mbx, 0] = mb_nonzero
            # --- reconstruction ---
            x0, y0 = mbx * 16 + 1, mby * 16 + 1
            cx0, cy0 = mbx * 8 + 1, mby * 8 + 1
            if has_y2:
                dcs = _iwht(coeffs[24])
                for k in range(16):
                    coeffs[k][0] = dcs[k]
            if mbx == mb_w - 1:
                # rightmost MB: the 4 above-right samples replicate the
                # last above pixel (row 0 already holds 127s)
                if mby > 0:
                    Y[y0 - 1, x0 + 16 : x0 + 20] = Y[y0 - 1, x0 + 15]
            if ym == B_PRED:
                for sy in range(4):
                    for sx in range(4):
                        bx, by = x0 + sx * 4, y0 + sy * 4
                        if sx == 3:
                            tr = Y[y0 - 1, x0 + 16 : x0 + 20]
                        else:
                            tr = Y[by - 1, bx + 4 : bx + 8]
                        _pred4(Y, bx, by, int(bmodes[i][sy * 4 + sx]), tr)
                        blk = coeffs[sy * 4 + sx]
                        if blk.any():
                            res = _idct4x4(blk)
                            v = Y[by : by + 4, bx : bx + 4] + res
                            Y[by : by + 4, bx : bx + 4] = np.clip(v, 0, 255)
            else:
                _pred16_or_8(Y, x0, y0, 16, ym, mby > 0, mbx > 0)
                for sy in range(4):
                    for sx in range(4):
                        blk = coeffs[sy * 4 + sx]
                        if blk.any():
                            res = _idct4x4(blk)
                            by, bx = y0 + sy * 4, x0 + sx * 4
                            v = Y[by : by + 4, bx : bx + 4] + res
                            Y[by : by + 4, bx : bx + 4] = np.clip(v, 0, 255)
            for plane, base in ((U, 16), (V, 20)):
                _pred16_or_8(plane, cx0, cy0, 8, int(uvmodes[i]), mby > 0, mbx > 0)
                for sy in range(2):
                    for sx in range(2):
                        blk = coeffs[base + sy * 2 + sx]
                        if blk.any():
                            res = _idct4x4(blk)
                            by, bx = cy0 + sy * 4, cx0 + sx * 4
                            v = plane[by : by + 4, bx : bx + 4] + res
                            plane[by : by + 4, bx : bx + 4] = np.clip(v, 0, 255)

    _loop_filter(f, Y, U, V, mb_w, mb_h, segments, ymodes, skips, fstore)

    y = Y[1 : H + 1, 1 : W + 1].astype(np.uint8)
    u = U[1 : ((H + 1) >> 1) + 1, 1 : ((W + 1) >> 1) + 1].astype(np.uint8)
    v = V[1 : ((H + 1) >> 1) + 1, 1 : ((W + 1) >> 1) + 1].astype(np.uint8)
    return y, u, v


# -- loop filter (§15) -----------------------------------------------------------


def _filter_level(f: _Frame, seg: int, ym: int) -> int:
    level = f.filter_level
    if f.seg_enabled:
        level = f.seg_lf[seg] if f.seg_abs else level + f.seg_lf[seg]
    if f.lf_delta_enabled:
        level += f.ref_lf_delta[0]  # intra frame
        if ym == B_PRED:
            level += f.mode_lf_delta[0]
    return max(0, min(63, level))


def _lf_params(f: _Frame, level: int):
    interior = level
    if f.sharpness:
        interior >>= 2 if f.sharpness > 4 else 1
        hm = 9 - f.sharpness
        if interior > hm:
            interior = hm
    if interior < 1:
        interior = 1
    hev = 0
    if level >= 40:
        hev = 2
    elif level >= 15:
        hev = 1
    return interior, hev


def _c(v: int) -> int:  # signed clamp to [-128, 127]
    return -128 if v < -128 else (127 if v > 127 else v)


def _filter_common4(p1, p0, q0, q1, hev):
    """Normal sub-filter on unsigned [p1,p0,q0,q1] → new (p1,p0,q0,q1)."""
    sp1, sp0, sq0, sq1 = p1 - 128, p0 - 128, q0 - 128, q1 - 128
    a = _c(sp1 - sq1) if hev else 0
    a = _c(a + 3 * (sq0 - sp0))
    f1 = _c(a + 4) >> 3
    f2 = _c(a + 3) >> 3
    v = sq0 - f1 + 128
    nq0 = 0 if v < 0 else (255 if v > 255 else v)
    v = sp0 + f2 + 128
    np0 = 0 if v < 0 else (255 if v > 255 else v)
    if hev:
        return p1, np0, nq0, q1
    a = (f1 + 1) >> 1
    v = sq1 - a + 128
    nq1 = 0 if v < 0 else (255 if v > 255 else v)
    v = sp1 + a + 128
    np1 = 0 if v < 0 else (255 if v > 255 else v)
    return np1, np0, nq0, nq1


def _mb_filter6(p2, p1, p0, q0, q1, q2):
    """Macroblock-edge 6-pixel filter (RFC §15.3; every tap re-clamped)."""
    sp2, sp1, sp0 = p2 - 128, p1 - 128, p0 - 128
    sq0, sq1, sq2 = q0 - 128, q1 - 128, q2 - 128
    w = _c(_c(sp1 - sq1) + 3 * (sq0 - sp0))
    a = _c((27 * w + 63) >> 7)
    v = sq0 - a + 128
    nq0 = 0 if v < 0 else (255 if v > 255 else v)
    v = sp0 + a + 128
    np0 = 0 if v < 0 else (255 if v > 255 else v)
    a = _c((18 * w + 63) >> 7)
    v = sq1 - a + 128
    nq1 = 0 if v < 0 else (255 if v > 255 else v)
    v = sp1 + a + 128
    np1 = 0 if v < 0 else (255 if v > 255 else v)
    a = _c((9 * w + 63) >> 7)
    v = sq2 - a + 128
    nq2 = 0 if v < 0 else (255 if v > 255 else v)
    v = sp2 + a + 128
    np2 = 0 if v < 0 else (255 if v > 255 else v)
    return np2, np1, np0, nq0, nq1, nq2


def _filter_edge(buf, e, lo, hi, ilimit, elimit, hev_t, mb_edge, horizontal):
    """Filter one edge of a list-of-lists plane buffer.  ``e`` is the
    column (vertical edge) or row (horizontal edge) of the q0 pixel."""
    if horizontal:
        r = [buf[e + d] for d in range(-4, 4)]
        for t in range(lo, hi):
            p3 = r[0][t]; p2 = r[1][t]; p1 = r[2][t]; p0 = r[3][t]
            q0 = r[4][t]; q1 = r[5][t]; q2 = r[6][t]; q3 = r[7][t]
            if (abs(p0 - q0) * 2 + (abs(p1 - q1) >> 1) > elimit
                    or abs(p3 - p2) > ilimit or abs(p2 - p1) > ilimit
                    or abs(p1 - p0) > ilimit or abs(q3 - q2) > ilimit
                    or abs(q2 - q1) > ilimit or abs(q1 - q0) > ilimit):
                continue
            hev = abs(p1 - p0) > hev_t or abs(q1 - q0) > hev_t
            if mb_edge and not hev:
                (r[1][t], r[2][t], r[3][t], r[4][t], r[5][t], r[6][t]) = (
                    _mb_filter6(p2, p1, p0, q0, q1, q2)
                )
            else:
                (r[2][t], r[3][t], r[4][t], r[5][t]) = _filter_common4(
                    p1, p0, q0, q1, hev if not mb_edge else True
                )
    else:
        for t in range(lo, hi):
            row = buf[t]
            p3, p2, p1, p0, q0, q1, q2, q3 = row[e - 4 : e + 4]
            if (abs(p0 - q0) * 2 + (abs(p1 - q1) >> 1) > elimit
                    or abs(p3 - p2) > ilimit or abs(p2 - p1) > ilimit
                    or abs(p1 - p0) > ilimit or abs(q3 - q2) > ilimit
                    or abs(q2 - q1) > ilimit or abs(q1 - q0) > ilimit):
                continue
            hev = abs(p1 - p0) > hev_t or abs(q1 - q0) > hev_t
            if mb_edge and not hev:
                row[e - 3 : e + 3] = _mb_filter6(p2, p1, p0, q0, q1, q2)
            else:
                row[e - 2 : e + 2] = _filter_common4(
                    p1, p0, q0, q1, hev if not mb_edge else True
                )


def _simple_edge(buf, e, lo, hi, elimit, horizontal):
    if horizontal:
        r = [buf[e + d] for d in range(-2, 2)]
        for t in range(lo, hi):
            p1 = r[0][t]; p0 = r[1][t]; q0 = r[2][t]; q1 = r[3][t]
            if abs(p0 - q0) * 2 + (abs(p1 - q1) >> 1) > elimit:
                continue
            _, r[1][t], r[2][t], _ = _filter_common4(p1, p0, q0, q1, True)
    else:
        for t in range(lo, hi):
            row = buf[t]
            p1, p0, q0, q1 = row[e - 2 : e + 2]
            if abs(p0 - q0) * 2 + (abs(p1 - q1) >> 1) > elimit:
                continue
            _, row[e - 1], row[e], _ = _filter_common4(p1, p0, q0, q1, True)


def _loop_filter(f, Y, U, V, mb_w, mb_h, segments, ymodes, skips, fstore):
    if f.filter_level == 0:
        return
    # list-of-lists buffers: per-pixel numpy scalar indexing made the
    # filter 75% of decode time; plain list slicing is ~5x faster
    Yb = Y.tolist()
    Ub = U.tolist()
    Vb = V.tolist()
    _run_loop_filter(f, Yb, Ub, Vb, mb_w, mb_h, segments, ymodes, fstore)
    Y[:, :] = np.asarray(Yb, dtype=np.int64)
    U[:, :] = np.asarray(Ub, dtype=np.int64)
    V[:, :] = np.asarray(Vb, dtype=np.int64)


def _run_loop_filter(f, Y, U, V, mb_w, mb_h, segments, ymodes, fstore):
    for mby in range(mb_h):
        for mbx in range(mb_w):
            i = mby * mb_w + mbx
            level = _filter_level(f, int(segments[i]), int(ymodes[i]))
            if level == 0:
                continue
            interior, hev_t = _lf_params(f, level)
            mb_elimit = (level + 2) * 2 + interior
            sub_elimit = level * 2 + interior
            inner = bool(fstore[mby, mbx, 0]) or int(ymodes[i]) == B_PRED
            x0, y0 = mbx * 16 + 1, mby * 16 + 1
            cx0, cy0 = mbx * 8 + 1, mby * 8 + 1
            if f.filter_simple:
                if mbx > 0:
                    _simple_edge(Y, x0, y0, y0 + 16, mb_elimit, False)
                if inner:
                    for dx in (4, 8, 12):
                        _simple_edge(Y, x0 + dx, y0, y0 + 16, sub_elimit, False)
                if mby > 0:
                    _simple_edge(Y, y0, x0, x0 + 16, mb_elimit, True)
                if inner:
                    for dy in (4, 8, 12):
                        _simple_edge(Y, y0 + dy, x0, x0 + 16, sub_elimit, True)
                continue
            if mbx > 0:
                _filter_edge(Y, x0, y0, y0 + 16, interior, mb_elimit, hev_t, True, False)
                _filter_edge(U, cx0, cy0, cy0 + 8, interior, mb_elimit, hev_t, True, False)
                _filter_edge(V, cx0, cy0, cy0 + 8, interior, mb_elimit, hev_t, True, False)
            if inner:
                for dx in (4, 8, 12):
                    _filter_edge(Y, x0 + dx, y0, y0 + 16, interior, sub_elimit, hev_t, False, False)
                _filter_edge(U, cx0 + 4, cy0, cy0 + 8, interior, sub_elimit, hev_t, False, False)
                _filter_edge(V, cx0 + 4, cy0, cy0 + 8, interior, sub_elimit, hev_t, False, False)
            if mby > 0:
                _filter_edge(Y, y0, x0, x0 + 16, interior, mb_elimit, hev_t, True, True)
                _filter_edge(U, cy0, cx0, cx0 + 8, interior, mb_elimit, hev_t, True, True)
                _filter_edge(V, cy0, cx0, cx0 + 8, interior, mb_elimit, hev_t, True, True)
            if inner:
                for dy in (4, 8, 12):
                    _filter_edge(Y, y0 + dy, x0, x0 + 16, interior, sub_elimit, hev_t, False, True)
                _filter_edge(U, cy0 + 4, cx0, cx0 + 8, interior, sub_elimit, hev_t, False, True)
                _filter_edge(V, cy0 + 4, cx0, cx0 + 8, interior, sub_elimit, hev_t, False, True)


# -- YUV → RGB -------------------------------------------------------------------


def _fancy_upsample(c: np.ndarray, H: int, W: int) -> np.ndarray:
    """libwebp's 'fancy' 2x chroma upsampler: each luma position blends
    the 4 nearest chroma samples with the 9/3/3/1 kernel (edges
    replicate); offsets confirmed by an exact zero-slack fit against
    WebPDecodeRGBA output."""
    ch, cw = c.shape
    i = np.arange(W)
    a = i >> 1
    an = np.clip(np.where(i & 1, a + 1, a - 1), 0, cw - 1)
    j = np.arange(H)
    b = j >> 1
    bn = np.clip(np.where(j & 1, b + 1, b - 1), 0, ch - 1)
    C = c.astype(np.int64)
    return (9 * C[b][:, a] + 3 * (C[b][:, an] + C[bn][:, a]) + C[bn][:, an] + 8) >> 4


def _clip8(v14: np.ndarray) -> np.ndarray:
    """libwebp VP8Clip8: in-range 14-bit values shift down, out-of-range
    saturate."""
    return np.where(
        (v14 & ~16383) == 0, v14 >> 6, np.where(v14 < 0, 0, 255)
    ).astype(np.uint8)


def vp8_to_rgb(
    y: np.ndarray, u: np.ndarray, v: np.ndarray, fancy: bool = True
) -> np.ndarray:
    """YUV 4:2:0 → (H, W, 3) uint8 RGB.

    ``fancy=True`` (default) reproduces libwebp's output BYTE-EXACTLY:
    the 9/3/3/1 fancy chroma upsampler plus the fixed-point conversion
    r14 = (19077*y)>>8 + (26149*v)>>8 - 14234 (G: -u·6419>>8 -v·13320>>8
    + 8708; B: +u·33050>>8 - 17685), clip8(v14>>6) — every constant
    verified against the library (immediates in code; offsets pinned by
    a zero-slack fit over interior pixels).  ``fancy=False`` keeps the
    cheap nearest-neighbor + integer BT.601 form."""
    H, W = y.shape
    yy = y.astype(np.int64)
    if fancy:
        uu = _fancy_upsample(u, H, W)
        vv = _fancy_upsample(v, H, W)
        ty = (19077 * yy) >> 8
        r = _clip8(ty + ((26149 * vv) >> 8) - 14234)
        g = _clip8(ty - ((6419 * uu) >> 8) - ((13320 * vv) >> 8) + 8708)
        b = _clip8(ty + ((33050 * uu) >> 8) - 17685)
        return np.stack([r, g, b], axis=2)
    uu = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:H, :W].astype(np.int64)
    vv = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:H, :W].astype(np.int64)
    c = yy - 16
    d = uu - 128
    e = vv - 128
    r = np.clip((298 * c + 409 * e + 128) >> 8, 0, 255)
    g = np.clip((298 * c - 100 * d - 208 * e + 128) >> 8, 0, 255)
    b = np.clip((298 * c + 516 * d + 128) >> 8, 0, 255)
    return np.stack([r, g, b], axis=2).astype(np.uint8)
