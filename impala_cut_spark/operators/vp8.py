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

#: renormalization shift per post-split range value: the §7.3 loop
#: doubles rng until >= 128, i.e. shifts by 8 - bit_length(rng); a
#: 256-entry table turns the per-bit while-loop into one lookup
#: (round 11).  At most ONE byte refill can occur per renorm (shift
#: <= 7, pending bits <= 7), inserted at the post-shift bit offset —
#: identical to feeding the byte mid-loop and shifting the remainder.
_RENORM = tuple(8 - r.bit_length() if 0 < r < 128 else 0 for r in range(256))


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
        sh = _RENORM[self.rng]
        if sh:
            self.val = (self.val << sh) & 0xFFFF_FFFF
            self.rng <<= sh
            bits = self.bits + sh
            if bits >= 8:
                bits -= 8
                if self.pos < len(self.d):
                    self.val |= self.d[self.pos] << bits
                self.pos += 1
            self.bits = bits
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
) -> tuple[list, int]:
    """Decode one 4x4 block's coefficients → (natural-order int[16]
    list, nonzero flag).  ``probs`` = coeff_probs[block_type]; ``ctx``
    in 0-2.  The §7 boolean decoder is INLINED on local ints — the
    half-million per-megapixel bd.bit() method calls were ~20% of
    decode time (round 11); decoder state round-trips through ``bd``
    at the call boundary.  Each inlined site is the same primitive:
    split/compare for the bit, then the §7.3 renormalize loop."""
    d = bd.d
    dlen = len(d)
    pos = bd.pos
    val = bd.val
    rng = bd.rng
    bits = bd.bits
    out = [0] * 16
    n = first
    nonzero = 0
    skip_eob = False
    q_dc, q_ac = quant[0], quant[1]
    bands = BANDS
    zigzag = ZIGZAG
    cat_probs = CAT_PROBS
    renorm = _RENORM
    while n < 16:
        p = probs[bands[n]][ctx]
        if not skip_eob:
            split = 1 + (((rng - 1) * p[0]) >> 8)
            big = split << 8
            if val >= big:
                rng -= split
                val -= big
                eob = False
            else:
                rng = split
                eob = True
            sh = renorm[rng]
            if sh:
                val = (val << sh) & 0xFFFF_FFFF
                rng <<= sh
                bits += sh
                if bits >= 8:
                    bits -= 8
                    if pos < dlen:
                        val |= d[pos] << bits
                    pos += 1
            if eob:
                break
        split = 1 + (((rng - 1) * p[1]) >> 8)
        big = split << 8
        if val >= big:
            rng -= split
            val -= big
            zero = False
        else:
            rng = split
            zero = True
        sh = renorm[rng]
        if sh:
            val = (val << sh) & 0xFFFF_FFFF
            rng <<= sh
            bits += sh
            if bits >= 8:
                bits -= 8
                if pos < dlen:
                    val |= d[pos] << bits
                pos += 1
        if zero:
            n += 1
            ctx = 0
            skip_eob = True
            continue
        skip_eob = False
        split = 1 + (((rng - 1) * p[2]) >> 8)
        big = split << 8
        if val >= big:
            rng -= split
            val -= big
            one = False
        else:
            rng = split
            one = True
        sh = renorm[rng]
        if sh:
            val = (val << sh) & 0xFFFF_FFFF
            rng <<= sh
            bits += sh
            if bits >= 8:
                bits -= 8
                if pos < dlen:
                    val |= d[pos] << bits
                pos += 1
        if one:
            v = 1
            ctx = 1
        else:
            # larger magnitudes: walk the category tree with the same
            # inlined primitive behind a local prob cursor
            ctx = 2
            bd.pos, bd.val, bd.rng, bd.bits = pos, val, rng, bits
            bit = bd.bit
            if not bit(p[3]):
                if not bit(p[4]):
                    v = 2
                else:
                    v = 3 + bit(p[5])
            elif not bit(p[6]):
                base, cp = cat_probs[0] if not bit(p[7]) else cat_probs[1]
                extra = 0
                for cpb in cp:
                    extra = (extra << 1) | bit(cpb)
                v = base + extra
            else:
                if not bit(p[8]):
                    base, cp = cat_probs[2] if not bit(p[9]) else cat_probs[3]
                else:
                    base, cp = cat_probs[4] if not bit(p[10]) else cat_probs[5]
                extra = 0
                for cpb in cp:
                    extra = (extra << 1) | bit(cpb)
                v = base + extra
            pos, val, rng, bits = bd.pos, bd.val, bd.rng, bd.bits
        # sign bit (prob 128)
        split = 1 + (((rng - 1) * 128) >> 8)
        big = split << 8
        if val >= big:
            rng -= split
            val -= big
            v = -v
        else:
            rng = split
        sh = renorm[rng]
        if sh:
            val = (val << sh) & 0xFFFF_FFFF
            rng <<= sh
            bits += sh
            if bits >= 8:
                bits -= 8
                if pos < dlen:
                    val |= d[pos] << bits
                pos += 1
        out[zigzag[n]] = v * (q_dc if n == 0 else q_ac)
        nonzero = 1
        n += 1
    bd.pos, bd.val, bd.rng, bd.bits = pos, val, rng, bits
    return out, nonzero


# -- inverse transforms (§14.3-14.4) -------------------------------------------


def _iwht_batch(inp: np.ndarray) -> np.ndarray:
    """Inverse Walsh-Hadamard for (m, 16) Y2 blocks → (m, 16) DC values
    (the scalar §14.3 ops vectorized over the block axis; arithmetic
    right shift on int64 matches the spec's floor semantics)."""
    c = inp.reshape(-1, 4, 4)  # [m, row k, column i]
    a1 = c[:, 0, :] + c[:, 3, :]
    b1 = c[:, 1, :] + c[:, 2, :]
    c1 = c[:, 1, :] - c[:, 2, :]
    d1 = c[:, 0, :] - c[:, 3, :]
    t = np.stack([a1 + b1, c1 + d1, a1 - b1, d1 - c1], axis=1)
    a1 = t[:, :, 0] + t[:, :, 3]
    b1 = t[:, :, 1] + t[:, :, 2]
    c1 = t[:, :, 1] - t[:, :, 2]
    d1 = t[:, :, 0] - t[:, :, 3]
    out = np.stack(
        [(a1 + b1 + 3) >> 3, (c1 + d1 + 3) >> 3,
         (a1 - b1 + 3) >> 3, (d1 - c1 + 3) >> 3],
        axis=2,
    )
    return out.reshape(-1, 16)


def _idct4x4_batch(c: np.ndarray) -> np.ndarray:
    """Exact VP8 inverse DCT on (m, 16) natural-order blocks → (m, 4, 4)
    residuals (§14.4 vectorized over the block axis)."""
    cos = 20091
    sin = 35468
    c = c.reshape(-1, 4, 4)
    a1 = c[:, 0, :] + c[:, 2, :]
    b1 = c[:, 0, :] - c[:, 2, :]
    c1 = ((c[:, 1, :] * sin) >> 16) - (c[:, 3, :] + ((c[:, 3, :] * cos) >> 16))
    d1 = (c[:, 1, :] + ((c[:, 1, :] * cos) >> 16)) + ((c[:, 3, :] * sin) >> 16)
    t = np.stack([a1 + d1, b1 + c1, b1 - c1, a1 - d1], axis=1)
    a1 = t[:, :, 0] + t[:, :, 2]
    b1 = t[:, :, 0] - t[:, :, 2]
    c1 = ((t[:, :, 1] * sin) >> 16) - (t[:, :, 3] + ((t[:, :, 3] * cos) >> 16))
    d1 = (t[:, :, 1] + ((t[:, :, 1] * cos) >> 16)) + ((t[:, :, 3] * sin) >> 16)
    return np.stack(
        [(a1 + d1 + 4) >> 3, (b1 + c1 + 4) >> 3,
         (b1 - c1 + 4) >> 3, (a1 - d1 + 4) >> 3],
        axis=2,
    )


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
    P = int(Y[y0 - 1, x0 - 1])
    a = Y[y0 - 1, x0 : x0 + 4].tolist() + tr.tolist()
    l = Y[y0 : y0 + 4, x0 - 1].tolist()
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

    # per-MB mode parse (partition 1, after the header bool state).
    # Plain Python lists throughout the sequential bookkeeping: numpy
    # scalar indexing on these tiny per-MB state arrays was a real
    # fraction of decode time (round 11).
    b = f.b
    n_mb = mb_h * mb_w
    segments = [0] * n_mb
    skips = [0] * n_mb
    ymodes = [0] * n_mb
    uvmodes = [0] * n_mb
    bmodes: list = [None] * n_mb
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
                bm = [0] * 16
                for sy in range(4):
                    for sx in range(4):
                        a = above_b[mbx][sx] if sy == 0 else bm[(sy - 1) * 4 + sx]
                        l = left_b[sy] if sx == 0 else bm[sy * 4 + sx - 1]
                        bm[sy * 4 + sx] = b.tree(_BMODE_TREE, KF_BMODE_PROBS[a][l])
                bmodes[i] = bm
                above_b[mbx] = bm[12:16]
                left_b = [bm[r * 4 + 3] for r in range(4)]
            else:
                eq = _MODE_TO_B[ym]
                bmodes[i] = [eq] * 16
                above_b[mbx] = [eq] * 4
                left_b = [eq] * 4
            uvmodes[i] = b.tree(_UVMODE_TREE, KF_UVMODE_PROBS)

    # coefficient decode + reconstruction
    # nonzero contexts: per-plane per-4x4-column/row flags
    above_nz_y = [[0] * 4 for _ in range(mb_w)]
    above_nz_u = [[0] * 2 for _ in range(mb_w)]
    above_nz_v = [[0] * 2 for _ in range(mb_w)]
    above_nz_y2 = [0] * mb_w
    fstore = np.zeros((mb_h, mb_w, 2), dtype=np.int64)  # (has_coeffs, level) for LF
    n_parts = len(f.token_parts)
    zero16 = [0] * 16  # shared: np.asarray copies, rows are never mutated
    for mby in range(mb_h):
        bd = f.token_parts[mby % n_parts]
        left_nz_y = [0] * 4
        left_nz_u = [0] * 2
        left_nz_v = [0] * 2
        left_nz_y2 = 0
        # phase 1 (sequential entropy decode): the whole MB row's
        # coefficients land in one (mb_w, 25, 16) buffer so the inverse
        # transforms can run as ONE vectorized batch per row (round 11 —
        # the per-block scalar iDCT was ~15% of decode time)
        row_coeff_lists = [[zero16] * 25 for _ in range(mb_w)]
        row_nz_lists = [[False] * 25 for _ in range(mb_w)]
        for mbx in range(mb_w):
            i = mby * mb_w + mbx
            qy1, qy2, quv = _dequant_factors(f, segments[i])
            ym = ymodes[i]
            has_y2 = ym != B_PRED
            coeffs = row_coeff_lists[mbx]
            nzs = row_nz_lists[mbx]
            mb_nonzero = 0
            anz_y = above_nz_y[mbx]
            if skips[i]:
                # skipped MB: no coefficients; nonzero ctx resets (but
                # Y2 ctx persists only for MBs WITH Y2 — RFC 13.1)
                left_nz_y[:] = (0, 0, 0, 0)
                anz_y[:] = (0, 0, 0, 0)
                left_nz_u[:] = (0, 0)
                above_nz_u[mbx][:] = (0, 0)
                left_nz_v[:] = (0, 0)
                above_nz_v[mbx][:] = (0, 0)
                if has_y2:
                    left_nz_y2 = 0
                    above_nz_y2[mbx] = 0
            else:
                first = 0
                if has_y2:
                    ctx = above_nz_y2[mbx] + left_nz_y2
                    c, nz = _decode_coeffs(bd, f.coeff_probs[1], 0, qy2, ctx)
                    coeffs[24] = c
                    nzs[24] = nz != 0
                    above_nz_y2[mbx] = left_nz_y2 = nz
                    mb_nonzero |= nz
                    first = 1
                ptype = 0 if has_y2 else 3
                for sy in range(4):
                    lnz = left_nz_y[sy]
                    for sx in range(4):
                        c, nz = _decode_coeffs(
                            bd, f.coeff_probs[ptype], first, qy1,
                            anz_y[sx] + lnz,
                        )
                        coeffs[sy * 4 + sx] = c
                        nzs[sy * 4 + sx] = nz != 0
                        anz_y[sx] = lnz = nz
                        mb_nonzero |= nz
                    left_nz_y[sy] = lnz
                for base, anzs, lnzs in (
                    (16, above_nz_u[mbx], left_nz_u),
                    (20, above_nz_v[mbx], left_nz_v),
                ):
                    for sy in range(2):
                        for sx in range(2):
                            c, nz = _decode_coeffs(
                                bd, f.coeff_probs[2], 0, quv,
                                anzs[sx] + lnzs[sy],
                            )
                            coeffs[base + sy * 2 + sx] = c
                            nzs[base + sy * 2 + sx] = nz != 0
                            anzs[sx] = lnzs[sy] = nz
                            mb_nonzero |= nz
            fstore[mby, mbx, 0] = mb_nonzero
        # phase 2 (batched inverse transforms for the row)
        row_coeffs = np.asarray(row_coeff_lists, dtype=np.int64)
        row_nz = np.asarray(row_nz_lists, dtype=bool)
        y2_mbs = np.asarray(
            [x for x in range(mb_w) if ymodes[mby * mb_w + x] != B_PRED],
            dtype=np.intp,
        )
        if len(y2_mbs):
            dcs = _iwht_batch(row_coeffs[y2_mbs, 24])
            row_coeffs[y2_mbs, :16, 0] = dcs
            # a zero-token Y block still needs its iDCT when the iWHT
            # hands it a nonzero DC (matches the scalar blk.any() gate)
            row_nz[y2_mbs, :16] |= dcs != 0
        flat_nz = row_nz.reshape(-1)
        res = np.zeros((mb_w * 25, 4, 4), dtype=np.int64)
        if flat_nz.any():
            res[flat_nz] = _idct4x4_batch(row_coeffs.reshape(-1, 16)[flat_nz])
        res = res.reshape(mb_w, 25, 4, 4)
        row_nz_lists = row_nz.tolist()  # refreshed with the iWHT DCs
        # phase 3 (prediction + residual add, sequential per MB)
        for mbx in range(mb_w):
            i = mby * mb_w + mbx
            ym = ymodes[i]
            nzs = row_nz_lists[mbx]
            nza = row_nz[mbx]
            mres = res[mbx]
            x0, y0 = mbx * 16 + 1, mby * 16 + 1
            cx0, cy0 = mbx * 8 + 1, mby * 8 + 1
            if mbx == mb_w - 1:
                # rightmost MB: the 4 above-right samples replicate the
                # last above pixel (row 0 already holds 127s)
                if mby > 0:
                    Y[y0 - 1, x0 + 16 : x0 + 20] = Y[y0 - 1, x0 + 15]
            if ym == B_PRED:
                bm = bmodes[i]
                for sy in range(4):
                    for sx in range(4):
                        bx, by = x0 + sx * 4, y0 + sy * 4
                        if sx == 3:
                            tr = Y[y0 - 1, x0 + 16 : x0 + 20]
                        else:
                            tr = Y[by - 1, bx + 4 : bx + 8]
                        _pred4(Y, bx, by, bm[sy * 4 + sx], tr)
                        if nzs[sy * 4 + sx]:
                            v = Y[by : by + 4, bx : bx + 4] + mres[sy * 4 + sx]
                            Y[by : by + 4, bx : bx + 4] = np.clip(v, 0, 255)
            else:
                _pred16_or_8(Y, x0, y0, 16, ym, mby > 0, mbx > 0)
                if nza[:16].any():
                    # one composite 16x16 add: untouched blocks carry a
                    # zero residual, so clip is the identity there
                    comp = (
                        mres[:16]
                        .reshape(4, 4, 4, 4)
                        .transpose(0, 2, 1, 3)
                        .reshape(16, 16)
                    )
                    v = Y[y0 : y0 + 16, x0 : x0 + 16] + comp
                    Y[y0 : y0 + 16, x0 : x0 + 16] = np.clip(v, 0, 255)
            for plane, base in ((U, 16), (V, 20)):
                _pred16_or_8(plane, cx0, cy0, 8, uvmodes[i], mby > 0, mbx > 0)
                if nza[base : base + 4].any():
                    comp = (
                        mres[base : base + 4]
                        .reshape(2, 2, 4, 4)
                        .transpose(0, 2, 1, 3)
                        .reshape(8, 8)
                    )
                    v = plane[cy0 : cy0 + 8, cx0 : cx0 + 8] + comp
                    plane[cy0 : cy0 + 8, cx0 : cx0 + 8] = np.clip(v, 0, 255)

    _loop_filter(
        f, Y, U, V, mb_w, mb_h,
        np.asarray(segments, dtype=np.int64),
        np.asarray(ymodes, dtype=np.int64),
        skips, fstore,
    )

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


def _vcl(x, lo, hi, _mx=np.maximum, _mn=np.minimum):
    """np.clip without its python dispatch wrapper (~7us/call saved —
    the filter makes ~50k small-array clips per megapixel)."""
    return _mn(_mx(x, lo), hi)


def _vec_common4(p1, p0, q0, q1, hev):
    """Vectorized normal sub-filter (RFC §15.2) on int64 lane arrays
    of unsigned [p1,p0,q0,q1]; ``hev`` is a boolean lane mask.  Returns
    the filtered (p1, p0, q0, q1) — p1/q1 pass through on hev lanes,
    exactly like the scalar form (arithmetic >> on int64 = the spec's
    sign-propagating shift)."""
    sp1, sp0, sq0, sq1 = p1 - 128, p0 - 128, q0 - 128, q1 - 128
    a = np.where(hev, _vcl(sp1 - sq1, -128, 127), 0)
    a = _vcl(a + 3 * (sq0 - sp0), -128, 127)
    f1 = _vcl(a + 4, -128, 127) >> 3
    f2 = _vcl(a + 3, -128, 127) >> 3
    nq0 = _vcl(sq0 - f1 + 128, 0, 255)
    np0 = _vcl(sp0 + f2 + 128, 0, 255)
    a = (f1 + 1) >> 1
    nq1 = np.where(hev, q1, _vcl(sq1 - a + 128, 0, 255))
    np1 = np.where(hev, p1, _vcl(sp1 + a + 128, 0, 255))
    return np1, np0, nq0, nq1


def _vec_mb6(p2, p1, p0, q0, q1, q2):
    """Vectorized macroblock-edge 6-pixel filter (RFC §15.3)."""
    sp2, sp1, sp0 = p2 - 128, p1 - 128, p0 - 128
    sq0, sq1, sq2 = q0 - 128, q1 - 128, q2 - 128
    w = _vcl(_vcl(sp1 - sq1, -128, 127) + 3 * (sq0 - sp0), -128, 127)
    a = _vcl((27 * w + 63) >> 7, -128, 127)
    nq0 = _vcl(sq0 - a + 128, 0, 255)
    np0 = _vcl(sp0 + a + 128, 0, 255)
    a = _vcl((18 * w + 63) >> 7, -128, 127)
    nq1 = _vcl(sq1 - a + 128, 0, 255)
    np1 = _vcl(sp1 + a + 128, 0, 255)
    a = _vcl((9 * w + 63) >> 7, -128, 127)
    nq2 = _vcl(sq2 - a + 128, 0, 255)
    np2 = _vcl(sp2 + a + 128, 0, 255)
    return np2, np1, np0, nq0, nq1, nq2


def _vec_filter_seg(seg, ilimit, elimit, hev_t, mb_edge, simple):
    """Filter a gathered (n, L, 8) edge segment IN PLACE: last axis is
    [p3..q3] across the edge, middle axis the L lanes along it, first
    axis the batched macroblocks (per-MB limits broadcast as (n,1))."""
    p3, p2, p1, p0 = seg[..., 0], seg[..., 1], seg[..., 2], seg[..., 3]
    q0, q1, q2, q3 = seg[..., 4], seg[..., 5], seg[..., 6], seg[..., 7]
    filt = np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= elimit
    if simple:
        _, np0, nq0, _ = _vec_common4(
            p1, p0, q0, q1, np.ones_like(filt)
        )
        seg[..., 3] = np.where(filt, np0, p0)
        seg[..., 4] = np.where(filt, nq0, q0)
        return
    for x, y in ((p3, p2), (p2, p1), (p1, p0), (q3, q2), (q2, q1), (q1, q0)):
        filt &= np.abs(x - y) <= ilimit
    hev = (np.abs(p1 - p0) > hev_t) | (np.abs(q1 - q0) > hev_t)
    if mb_edge:
        np2, np1, np0, nq0, nq1, nq2 = _vec_mb6(p2, p1, p0, q0, q1, q2)
        _, cp0, cq0, _ = _vec_common4(p1, p0, q0, q1, np.ones_like(hev))
        m6 = filt & ~hev
        m4 = filt & hev
        seg[..., 1] = np.where(m6, np2, p2)
        seg[..., 2] = np.where(m6, np1, p1)
        seg[..., 3] = np.where(m6, np0, np.where(m4, cp0, p0))
        seg[..., 4] = np.where(m6, nq0, np.where(m4, cq0, q0))
        seg[..., 5] = np.where(m6, nq1, q1)
        seg[..., 6] = np.where(m6, nq2, q2)
    else:
        np1, np0, nq0, nq1 = _vec_common4(p1, p0, q0, q1, hev)
        seg[..., 2] = np.where(filt, np1, p1)
        seg[..., 3] = np.where(filt, np0, p0)
        seg[..., 4] = np.where(filt, nq0, q0)
        seg[..., 5] = np.where(filt, nq1, q1)


_LANE16 = np.arange(16)
_TAP8 = np.arange(-4, 4)


def _vec_edge(plane, ex, ey, lanes, ilim, elim, hev, mb_edge, simple,
              horizontal):
    """Gather-filter-scatter one edge per batched MB.  ``ex``/``ey`` are
    (n,) q0 coordinates; per-MB limits come in as (n,) and broadcast."""
    if len(ex) == 0:
        return
    il = ilim[:, None]
    el = elim[:, None]
    hv = hev[:, None]
    if horizontal:
        rows = ey[:, None] + _TAP8  # (n, 8) taps across the edge
        cols = ex[:, None] + lanes  # (n, L) lanes along it
        seg = plane[rows[:, None, :], cols[:, :, None]]  # (n, L, 8)
        _vec_filter_seg(seg, il, el, hv, mb_edge, simple)
        plane[rows[:, None, 1:7], cols[:, :, None]] = seg[..., 1:7]
    else:
        rows = ey[:, None] + lanes
        cols = ex[:, None] + _TAP8
        seg = plane[rows[:, :, None], cols[:, None, :]]
        _vec_filter_seg(seg, il, el, hv, mb_edge, simple)
        plane[rows[:, :, None], cols[:, None, 1:7]] = seg[..., 1:7]


def _vec_edge_uv(U, V, ex, ey, lanes, ilim, elim, hev, mb_edge,
                 horizontal):
    """Chroma twin of _vec_edge: U and V share every index and limit,
    so both planes' edges are gathered into ONE doubled batch and run
    through a single filter pass (halves the chroma numpy overhead)."""
    if len(ex) == 0:
        return
    n = len(ex)
    il = np.concatenate([ilim, ilim])[:, None]
    el = np.concatenate([elim, elim])[:, None]
    hv = np.concatenate([hev, hev])[:, None]
    if horizontal:
        rows = ey[:, None] + _TAP8
        cols = ex[:, None] + lanes
        ri, ci = rows[:, None, :], cols[:, :, None]
        seg = np.concatenate([U[ri, ci], V[ri, ci]], axis=0)
        _vec_filter_seg(seg, il, el, hv, mb_edge, False)
        U[rows[:, None, 1:7], ci] = seg[:n, :, 1:7]
        V[rows[:, None, 1:7], ci] = seg[n:, :, 1:7]
    else:
        rows = ey[:, None] + lanes
        cols = ex[:, None] + _TAP8
        ri, ci = rows[:, :, None], cols[:, None, :]
        seg = np.concatenate([U[ri, ci], V[ri, ci]], axis=0)
        _vec_filter_seg(seg, il, el, hv, mb_edge, False)
        U[ri, cols[:, None, 1:7]] = seg[:n, :, 1:7]
        V[ri, cols[:, None, 1:7]] = seg[n:, :, 1:7]


def _loop_filter(f, Y, U, V, mb_w, mb_h, segments, ymodes, skips, fstore):
    """Wavefront-vectorized loop filter (round 11 — the per-pixel form
    was ~45% of decode time).  The per-MB raster schedule has data
    dependencies on the left (0,-1), top (-1,0) and top-RIGHT (-1,+1)
    neighbours — a macroblock's top-edge filter reads rows its
    top-right neighbour's left-edge filter wrote — so macroblocks on
    an anti-diagonal d = 2·row + col are mutually independent and are
    filtered as one numpy batch, edge pass by edge pass in the exact
    per-MB order (left V, inner V, top H, inner H).  Byte-exact vs the
    scalar schedule by construction; anchored by the libwebp
    conformance suite."""
    if f.filter_level == 0:
        return
    n = mb_h * mb_w
    levels = np.empty(n, dtype=np.int64)
    for i in range(n):  # tiny: per-MB scalar level/limit derivation
        levels[i] = _filter_level(f, int(segments[i]), int(ymodes[i]))
    interior = np.empty(n, dtype=np.int64)
    hev_t = np.empty(n, dtype=np.int64)
    for i in range(n):
        interior[i], hev_t[i] = _lf_params(f, int(levels[i]))
    mb_elimit = (levels + 2) * 2 + interior
    sub_elimit = levels * 2 + interior
    inner = (fstore[:, :, 0].reshape(-1) != 0) | (ymodes == B_PRED)
    active = levels > 0
    simple = bool(f.filter_simple)
    lane8 = _LANE16[:8]
    for d in range(2 * (mb_h - 1) + mb_w + 1):
        mbys = np.arange(max(0, (d - mb_w + 1 + 1) // 2), min(mb_h, d // 2 + 1))
        mbxs = d - 2 * mbys
        sel = (mbxs >= 0) & (mbxs < mb_w)
        mbys, mbxs = mbys[sel], mbxs[sel]
        idx = mbys * mb_w + mbxs
        on = active[idx]
        if not on.any():
            continue
        mbys, mbxs, idx = mbys[on], mbxs[on], idx[on]
        x0 = mbxs * 16 + 1
        y0 = mbys * 16 + 1
        cx0 = mbxs * 8 + 1
        cy0 = mbys * 8 + 1
        ilim = interior[idx]
        hev = hev_t[idx]
        mb_el = mb_elimit[idx]
        sub_el = sub_elimit[idx]
        inn = inner[idx]
        left = mbxs > 0
        top = mbys > 0
        # left MB edge (vertical), then inner vertical edges
        _vec_edge(Y, x0[left], y0[left], _LANE16, ilim[left], mb_el[left],
                  hev[left], True, simple, False)
        if not simple:
            _vec_edge_uv(U, V, cx0[left], cy0[left], lane8, ilim[left],
                         mb_el[left], hev[left], True, False)
        for dx in (4, 8, 12):
            _vec_edge(Y, x0[inn] + dx, y0[inn], _LANE16, ilim[inn],
                      sub_el[inn], hev[inn], False, simple, False)
        if not simple:
            _vec_edge_uv(U, V, cx0[inn] + 4, cy0[inn], lane8, ilim[inn],
                         sub_el[inn], hev[inn], False, False)
        # top MB edge (horizontal), then inner horizontal edges
        _vec_edge(Y, x0[top], y0[top], _LANE16, ilim[top], mb_el[top],
                  hev[top], True, simple, True)
        if not simple:
            _vec_edge_uv(U, V, cx0[top], cy0[top], lane8, ilim[top],
                         mb_el[top], hev[top], True, True)
        for dy in (4, 8, 12):
            _vec_edge(Y, x0[inn], y0[inn] + dy, _LANE16, ilim[inn],
                      sub_el[inn], hev[inn], False, simple, True)
        if not simple:
            _vec_edge_uv(U, V, cx0[inn], cy0[inn] + 4, lane8, ilim[inn],
                         sub_el[inn], hev[inn], False, True)


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
    C = c.astype(np.int32)  # 9*255 + 3*510 + 255 + 8 fits easily
    return (9 * C[b][:, a] + 3 * (C[b][:, an] + C[bn][:, a]) + C[bn][:, an] + 8) >> 4


def _clip8(v14: np.ndarray) -> np.ndarray:
    """libwebp VP8Clip8.  The branchy reference form is
    ((v & ~16383) == 0) ? v >> 6 : (v < 0 ? 0 : 255) — identical to
    clip(v >> 6, 0, 255) for every int (in-range values shift to
    0..255; v >= 16384 shifts to >= 256 and saturates high; negative
    v stays negative under the arithmetic shift and saturates low),
    and the single clip pass is ~8x faster (round 11)."""
    return np.clip(v14 >> 6, 0, 255).astype(np.uint8)


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
    yy = y.astype(np.int32)  # max |term| ~ 255*33050 << 2^31
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
