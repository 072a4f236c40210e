"""Baseline TIFF 6.0 codec — pure numpy + stdlib zlib.

From-scratch implementation of the public spec (the LZO/PNG/JPEG/GIF
precedent): both byte orders, strip AND tiled (§15) organization —
edge tiles decompress at full TileWidth×TileLength and clip — 8-bit
gray / white-is-zero / RGB(+extra samples) / palette photometrics,
horizontal differencing predictor (per image row for strips, per tile
row for tiles), and the compressions real TIFFs carry — none,
PackBits, Deflate (tags 8 and 32946: plain zlib streams), and
TIFF-flavor LZW (MSB-first codes, clear 256 / EOI 257, the spec's
early width change; the paired encoder's boundary sits one entry later
because a decoder learns each table entry one code behind the
encoder).

16-bit gray/RGB samples decode (either byte order, predictor applied
at 16-bit width) and reduce to their high byte for the 8-bit RGB
contract; 1/2/4-bit gray/bilevel/palette decode via MSB-first
byte-aligned rows (BitsPerSample defaults to 1 per §4 — bilevel scans
often omit the tag); the CCITT FAX compressions bilevel scans actually
ship in — Modified Huffman (comp 2), T.4 1D/2D with EOL + mode-tag
rows (comp 3), Group 4 / T.6 (comp 4) — decode from the published
ITU-T run-length tables and 2D modes.  Other depths raise
NotImplementedError — documented boundaries.

Conformance evidence (tests/test_operators.py): LZW / PackBits /
Deflate TIFFs WRITTEN BY the JVM's ImageIO codec — strip and
explicitly-tiled layouts, 1-, 8- and 16-bit — decode bit-exactly, all
three ImageIO CCITT writers round-trip bit-exactly (incl. 2700-wide
rows driving the extended >2560 makeup codes), the
JVM decodes this encoder's output bit-exactly (both directions, via
the Spark py4j gateway), and the stdlib test corpus's real-world RGBA
python.tiff decodes.

The reference engine has no multimodal surface (extension component);
decode_image in multimodal.py dispatches here on the II*/MM* magic.
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _read_ifd(d: bytes, bo: str):
    (off,) = struct.unpack_from(bo + "I", d, 4)
    (n,) = struct.unpack_from(bo + "H", d, off)
    tags = {}
    for i in range(n):
        tag, typ, cnt = struct.unpack_from(bo + "HHI", d, off + 2 + i * 12)
        voff = off + 2 + i * 12 + 8
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size > 4:
            (vpos,) = struct.unpack_from(bo + "I", d, voff)
        else:
            vpos = voff
        if typ == 3:
            vals = list(struct.unpack_from(bo + f"{cnt}H", d, vpos))
        elif typ == 4:
            vals = list(struct.unpack_from(bo + f"{cnt}I", d, vpos))
        elif typ == 1:
            vals = list(d[vpos : vpos + cnt])
        else:
            vals = [d[vpos : vpos + size]]
        tags[tag] = vals
    return tags


def _unpackbits(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out[:expected])


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-flavor LZW: MSB-first bits, clear=256/eoi=257, EARLY
    width change (at next_code == 2^width - 1)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    acc = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    while pos < len(data) or nbits >= width:
        while nbits < width and pos < len(data):
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        if nbits < width:
            break
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        # drop consumed high bits — an unmasked accumulator makes every
        # shift O(stream length) (the quadratic-decode bug r9 profiling
        # found in the JPEG bit reader; same fix here)
        acc &= (1 << nbits) - 1
        if code == 256:  # clear
            table = table[:258]
            width = 9
            prev = None
            continue
        if code == 257:  # EOI
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt TIFF LZW stream")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        prev = entry
        if len(table) == (1 << width) - 1 and width < 12:  # early change
            width += 1
        if len(out) >= expected:
            break
    return bytes(out[:expected])


def _tiff_lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1  # drop emitted bits (quadratic otherwise)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    put(256, width)  # clear
    cur = b""
    for b in data:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        put(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        # the DECODER applies the spec's early change one entry behind
        # (it learns each entry one code later), so the encoder's
        # boundary is at 2^width exactly — verified against the JVM
        # ImageIO TIFF codec in both directions
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code == 4094:  # stay clear of the 12-bit ceiling
            put(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        cur = bytes([b])
    if cur:
        put(table[cur], width)
    put(257, width)  # EOI
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """Simple valid PackBits: literal runs of <=128 + repeat runs."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find a run
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 127:
            j += 1
        if j > i:  # repeat run of length j-i+1 (>=2)
            out.append(257 - (j - i + 1))
            out.append(data[i])
            i = j + 1
        else:
            k = i
            while (
                k + 1 < n
                and k - i < 127
                and not (k + 2 < n and data[k + 1] == data[k + 2])
            ):
                k += 1
            out.append(k - i)
            out += data[i : k + 1]
            i = k + 1
    return bytes(out)


def _tiff_inflate(comp: int, chunk: bytes, expected: int) -> bytes:
    """Decompress one strip/tile to ``expected`` bytes."""
    if comp == 1:
        return chunk[:expected]
    if comp == 5:
        return _tiff_lzw_decode(chunk, expected)
    if comp == 32773:
        return _unpackbits(chunk, expected)
    if comp in (8, 32946):  # (Adobe) deflate — a plain zlib stream
        import zlib

        return zlib.decompress(chunk)[:expected]
    raise NotImplementedError(f"TIFF compression {comp} not supported")


def _decode_subbyte(payload: bytes, tags: dict, bo: str) -> np.ndarray:
    """1/2/4-bit TIFF (bilevel scans, low-depth gray, small palettes):
    rows are bit-packed most-significant-bit first and byte-aligned per
    row (TIFF 6.0 §4); strips only, single sample per pixel."""
    w = tags[256][0]
    h = tags[257][0]
    depth = tags.get(258, [1])[0]
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [1])[0]
    if 322 in tags:
        raise NotImplementedError("tiled sub-byte TIFF not supported")
    if tags.get(277, [1])[0] != 1:
        raise NotImplementedError("multi-sample sub-byte TIFF not supported")
    if tags.get(317, [1])[0] != 1:
        raise NotImplementedError("predictor on sub-byte TIFF not supported")
    rps = tags.get(278, [h])[0] or h
    if comp in (2, 3, 4):  # CCITT fax: bilevel run-length/2D coding
        if depth != 1:
            raise ValueError("CCITT TIFF must be 1-bit")
        strips = [payload[o : o + c]
                  for o, c in zip(tags[273], tags[279])]
        s = decode_ccitt(strips, w, h, comp, rps,
                         t4_2d=bool(tags.get(292, [0])[0] & 1))
        # CCITT codes white runs first; sample value for white follows
        # the photometric (0 = WhiteIsZero → white sample 0)
        if photo == 1:
            s = 1 - s
        maxv = 1
        g = (s * 255).astype(np.uint8)
        if photo == 0:
            g = 255 - g
        return np.repeat(g[:, :, None], 3, axis=2).copy()
    stride = (w * depth + 7) // 8
    raw = bytearray()
    for si, (o, c) in enumerate(zip(tags[273], tags[279])):
        nrows = min(rps, h - si * rps)
        raw += _tiff_inflate(comp, payload[o : o + c], nrows * stride)
    if len(raw) != h * stride:
        raise ValueError("TIFF strip payload size mismatch")
    rows = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, stride)
    bitsarr = np.unpackbits(rows, axis=1)
    if depth == 1:
        s = bitsarr[:, :w].astype(np.uint8)
    else:
        grp = bitsarr.reshape(h, -1, depth)
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
        s = (grp * weights).sum(axis=2, dtype=np.uint16)[:, :w].astype(np.uint8)
    maxv = (1 << depth) - 1
    if photo == 3:
        vals = tags[320]
        ncol = len(vals) // 3
        pal = (np.array(vals, dtype=np.uint32).reshape(3, ncol).T // 257
               ).astype(np.uint8)
        if int(s.max(initial=0)) >= ncol:
            raise ValueError("TIFF palette index out of range")
        return np.ascontiguousarray(pal[s])
    if photo in (0, 1):
        g = (s * (255 // maxv)).astype(np.uint8)
        if photo == 0:  # white-is-zero
            g = 255 - g
        return np.repeat(g[:, :, None], 3, axis=2).copy()
    raise NotImplementedError(f"sub-byte TIFF photometric {photo} not supported")


def decode_tiff(payload: bytes) -> np.ndarray:
    if payload[:4] not in (b"II*\x00", b"MM\x00*"):
        raise ValueError("not a TIFF payload")
    bo = "<" if payload[:2] == b"II" else ">"
    tags = _read_ifd(payload, bo)
    w = tags[256][0]
    h = tags[257][0]
    bits = tags.get(258, [1])  # BitsPerSample defaults to 1 (TIFF 6.0 §4)
    photo = tags.get(262, [1])[0]
    if bits[0] in (1, 2, 4) and len(set(bits)) == 1:
        return _decode_subbyte(payload, tags, bo)
    if all(b == 8 for b in bits):
        wide = False
    elif all(b == 16 for b in bits) and photo in (0, 1, 2):
        wide = True  # 16-bit gray/RGB: high-byte reduction at the end
    else:
        raise NotImplementedError(
            f"{bits}-bit TIFF (photometric {photo}) not supported"
        )
    dt = np.dtype(bo + "u2") if wide else np.dtype(np.uint8)
    bpsample = 2 if wide else 1
    mask = 0xFFFF if wide else 0xFF
    comp = tags.get(259, [1])[0]
    spp = tags.get(277, [1])[0]
    predictor = tags.get(317, [1])[0]
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor} not supported")
    if 322 in tags:  # tiled layout (TIFF 6.0 §15)
        tw = tags[322][0]
        tl = tags[323][0]
        offsets = tags[324]
        counts = tags[325]
        across = (w + tw - 1) // tw
        img = np.zeros((h, w, spp), dtype=dt)
        for ti, (o, c) in enumerate(zip(offsets, counts)):
            ty, tx = divmod(ti, across)
            y0, x0 = ty * tl, tx * tw
            if y0 >= h:  # ignore extra planes/IFD leftovers
                break
            # tiles decompress to the FULL tile size — edge tiles are
            # padded on disk and clipped here (§15: TileWidth×TileLength)
            raw = _tiff_inflate(comp, payload[o : o + c], tl * tw * spp * bpsample)
            if len(raw) != tl * tw * spp * bpsample:
                raise ValueError("TIFF tile payload size mismatch")
            tile = np.frombuffer(raw, dtype=dt).reshape(tl, tw, spp)
            if predictor == 2:  # horizontal differencing resets per tile row
                tile = (np.cumsum(tile.astype(np.int64), axis=1) & mask).astype(dt)
            img[y0 : y0 + tl, x0 : x0 + tw] = tile[
                : min(tl, h - y0), : min(tw, w - x0)
            ]
    else:
        rps = tags.get(278, [h])[0] or h
        offsets = tags[273]
        counts = tags[279]
        stride = w * spp * bpsample
        raw = bytearray()
        for si, (o, c) in enumerate(zip(offsets, counts)):
            nrows = min(rps, h - si * rps)
            raw += _tiff_inflate(comp, payload[o : o + c], nrows * stride)
        if len(raw) != h * stride:
            raise ValueError("TIFF strip payload size mismatch")
        img = np.frombuffer(bytes(raw), dtype=dt).reshape(h, w, spp)
        if predictor == 2:  # horizontal differencing resets per image row
            img = (np.cumsum(img.astype(np.int64), axis=1) & mask).astype(dt)
    if wide:  # 16→8: high byte (the spec's sample-depth reduction)
        img = (img >> 8).astype(np.uint8)
    if photo == 3:  # palette: 16-bit colormap, R then G then B planes
        # ColorMap is TIFF type 3 (SHORT) so _read_ifd already parsed ints
        vals = tags[320]
        ncol = len(vals) // 3
        pal = (np.array(vals, dtype=np.uint32).reshape(3, ncol).T // 257).astype(np.uint8)
        return np.ascontiguousarray(pal[img[:, :, 0]])
    if photo in (0, 1):
        g = img[:, :, 0]
        if photo == 0:  # white-is-zero
            g = 255 - g
        return np.repeat(g[:, :, None], 3, axis=2).copy()
    if photo == 2:
        return np.ascontiguousarray(img[:, :, :3])
    raise NotImplementedError(f"TIFF photometric {photo} not supported")


def encode_tiff(arr: np.ndarray, compression: int = 1, predictor: int = 1) -> bytes:
    """(H, W) | (H, W, 3) uint8 → little-endian single-strip TIFF with
    compression 1 (none), 5 (LZW) or 32773 (PackBits)."""
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    spp = 1 if gray else 3
    data = arr.astype(np.uint8)
    if predictor == 2:
        d3 = data.reshape(h, w, spp).astype(np.int16)
        diff = np.empty_like(d3)
        diff[:, 0] = d3[:, 0]
        diff[:, 1:] = d3[:, 1:] - d3[:, :-1]
        data = (diff & 0xFF).astype(np.uint8)
    raw = data.tobytes()
    if compression == 5:
        strip = _tiff_lzw_encode(raw)
    elif compression == 32773:
        strip = _packbits_encode(raw)
    elif compression == 8:
        import zlib

        strip = zlib.compress(raw)
    else:
        strip = raw
    entries = [
        (256, 3, 1, w),
        (257, 3, 1, h),
        (258, 3, 1, 8) if gray else (258, 3, 3, None),  # bits per sample
        (259, 3, 1, compression),
        (262, 3, 1, 1 if gray else 2),
        (273, 4, 1, None),  # strip offset, patched
        (277, 3, 1, spp),
        (278, 3, 1, h),
        (279, 4, 1, len(strip)),
    ]
    if predictor == 2:
        entries.append((317, 3, 1, 2))
    entries.sort()
    # layout: header(8) + ifd + extra values + strip
    ifd_off = 8
    ifd_size = 2 + len(entries) * 12 + 4
    extra = bytearray()
    extra_base = ifd_off + ifd_size
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", len(entries))
    strip_field_pos = None
    for tag, typ, cnt, val in entries:
        out += struct.pack("<HHI", tag, typ, cnt)
        if tag == 258 and not gray:
            out += struct.pack("<I", extra_base + len(extra))
            extra += struct.pack("<3H", 8, 8, 8)
        elif tag == 273:
            strip_field_pos = len(out)
            out += struct.pack("<I", 0)  # patched below
        elif typ == 3:
            out += struct.pack("<HH", val, 0)
        else:
            out += struct.pack("<I", val)
    out += struct.pack("<I", 0)  # next IFD
    out += extra
    strip_off = len(out)
    struct.pack_into("<I", out, strip_field_pos, strip_off)
    out += strip
    return bytes(out)


# -- CCITT fax compressions (ITU-T T.4 / T.6; TIFF comp 2, 3, 4) -------------
#
# The Modified-Huffman run-length tables below are the published T.4
# tables (white/black terminating 0-63, makeups to 2560); the G4 path
# implements the T.6 2D modes (pass / horizontal / vertical ±3) against
# a reference line.  Conformance: every row-run length 0..2600 is
# round-tripped through the JVM ImageIO CCITT writers in the tests.

_T4_WHITE = {
    "00110101": 0, "000111": 1, "0111": 2, "1000": 3, "1011": 4,
    "1100": 5, "1110": 6, "1111": 7, "10011": 8, "10100": 9,
    "00111": 10, "01000": 11, "001000": 12, "000011": 13, "110100": 14,
    "110101": 15, "101010": 16, "101011": 17, "0100111": 18,
    "0001100": 19, "0001000": 20, "0010111": 21, "0000011": 22,
    "0000100": 23, "0101000": 24, "0101011": 25, "0010011": 26,
    "0100100": 27, "0011000": 28, "00000010": 29, "00000011": 30,
    "00011010": 31, "00011011": 32, "00010010": 33, "00010011": 34,
    "00010100": 35, "00010101": 36, "00010110": 37, "00010111": 38,
    "00101000": 39, "00101001": 40, "00101010": 41, "00101011": 42,
    "00101100": 43, "00101101": 44, "00000100": 45, "00000101": 46,
    "00001010": 47, "00001011": 48, "01010010": 49, "01010011": 50,
    "01010100": 51, "01010101": 52, "00100100": 53, "00100101": 54,
    "01011000": 55, "01011001": 56, "01011010": 57, "01011011": 58,
    "01001010": 59, "01001011": 60, "00110010": 61, "00110011": 62,
    "00110100": 63,
    # makeups
    "11011": 64, "10010": 128, "010111": 192, "0110111": 256,
    "00110110": 320, "00110111": 384, "01100100": 448, "01100101": 512,
    "01101000": 576, "01100111": 640, "011001100": 704, "011001101": 768,
    "011010010": 832, "011010011": 896, "011010100": 960,
    "011010101": 1024, "011010110": 1088, "011010111": 1152,
    "011011000": 1216, "011011001": 1280, "011011010": 1344,
    "011011011": 1408, "010011000": 1472, "010011001": 1536,
    "010011010": 1600, "011000": 1664, "010011011": 1728,
}

_T4_BLACK = {
    "0000110111": 0, "010": 1, "11": 2, "10": 3, "011": 4, "0011": 5,
    "0010": 6, "00011": 7, "000101": 8, "000100": 9, "0000100": 10,
    "0000101": 11, "0000111": 12, "00000100": 13, "00000111": 14,
    "000011000": 15, "0000010111": 16, "0000011000": 17,
    "0000001000": 18, "00001100111": 19, "00001101000": 20,
    "00001101100": 21, "00000110111": 22, "00000101000": 23,
    "00000010111": 24, "00000011000": 25, "000011001010": 26,
    "000011001011": 27, "000011001100": 28, "000011001101": 29,
    "000001101000": 30, "000001101001": 31, "000001101010": 32,
    "000001101011": 33, "000011010010": 34, "000011010011": 35,
    "000011010100": 36, "000011010101": 37, "000011010110": 38,
    "000011010111": 39, "000001101100": 40, "000001101101": 41,
    "000011011010": 42, "000011011011": 43, "000001010100": 44,
    "000001010101": 45, "000001010110": 46, "000001010111": 47,
    "000001100100": 48, "000001100101": 49, "000001010010": 50,
    "000001010011": 51, "000000100100": 52, "000000110111": 53,
    "000000111000": 54, "000000100111": 55, "000000101000": 56,
    "000001011000": 57, "000001011001": 58, "000000101011": 59,
    "000000101100": 60, "000001011010": 61, "000001100110": 62,
    "000001100111": 63,
    # makeups
    "0000001111": 64, "000011001000": 128, "000011001001": 192,
    "000001011011": 256, "000000110011": 320, "000000110100": 384,
    "000000110101": 448, "0000001101100": 512, "0000001101101": 576,
    "0000001001010": 640, "0000001001011": 704, "0000001001100": 768,
    "0000001001101": 832, "0000001110010": 896, "0000001110011": 960,
    "0000001110100": 1024, "0000001110101": 1088, "0000001110110": 1152,
    "0000001110111": 1216, "0000001010010": 1280, "0000001010011": 1344,
    "0000001010100": 1408, "0000001010101": 1472, "0000001011010": 1536,
    "0000001011011": 1600, "0000001100100": 1664, "0000001100101": 1728,
}

#: extended makeups (shared between colors, T.4 table 3)
_T4_EXT = {
    "00000001000": 1792, "00000001100": 1856, "00000001101": 1920,
    "000000010010": 1984, "000000010011": 2048, "000000010100": 2112,
    "000000010101": 2176, "000000010110": 2240, "000000010111": 2304,
    "000000011100": 2368, "000000011101": 2432, "000000011110": 2496,
    "000000011111": 2560,
}

_WHITE_CODES = dict(_T4_WHITE)
_WHITE_CODES.update(_T4_EXT)
_BLACK_CODES = dict(_T4_BLACK)
_BLACK_CODES.update(_T4_EXT)
_MAX_CODE_LEN = 13


def _codes_by_len(table: dict) -> list[dict]:
    """length-indexed integer lookup tables: _BY_LEN[L][int(code, 2)]
    = run.  Prefix-freedom means the SHORTEST length whose table
    contains the current window prefix is the decoded code."""
    out: list[dict] = [dict() for _ in range(_MAX_CODE_LEN + 1)]
    for code, run in table.items():
        out[len(code)][int(code, 2)] = run
    return out


_WHITE_BY_LEN = _codes_by_len(_WHITE_CODES)
_BLACK_BY_LEN = _codes_by_len(_BLACK_CODES)


class _MsbBits:
    """MSB-first forward bit reader for fax streams, vectorized (r9
    verdict #5): the strip is unpacked to a bit array ONCE and the
    13-bit window value at every bit position is precomputed in 13
    whole-array passes, so peek/read are O(1) lookups instead of
    per-bit Python loops.  Reads past the end zero-pad, matching the
    old peek semantics."""

    __slots__ = ("n", "pos", "_win")

    def __init__(self, data: bytes) -> None:
        bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.n = len(bits)
        padded = np.concatenate(
            [bits, np.zeros(_MAX_CODE_LEN, np.uint8)]
        ).astype(np.int32)
        v = np.zeros(self.n, np.int32)
        for k in range(_MAX_CODE_LEN):
            v = (v << 1) | padded[k : k + self.n]
        # plain list: per-peek indexing is ~3x faster than numpy
        # scalar indexing, and the walker peeks once per coding element
        self._win = v.tolist()
        self.pos = 0  # bit position

    def bits_left(self) -> int:
        return self.n - self.pos

    def peek(self, n: int) -> int:
        if self.pos >= self.n:
            return 0
        return self._win[self.pos] >> (_MAX_CODE_LEN - n)

    def read(self, n: int) -> int:
        v = self.peek(n)
        self.pos += n
        return v

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_run(bits: _MsbBits, tables: list[dict]) -> int:
    """One complete MH run: makeup codes accumulate until a
    terminating (< 64) code closes the run.  ``tables`` is a
    length-indexed list from _codes_by_len."""
    total = 0
    while True:
        if bits.bits_left() <= 0:
            raise ValueError("CCITT: bitstream exhausted mid-code")
        v13 = bits.peek(_MAX_CODE_LEN)
        run = None
        for length in range(2, _MAX_CODE_LEN + 1):
            d = tables[length]
            if d:
                run = d.get(v13 >> (_MAX_CODE_LEN - length))
                if run is not None:
                    if bits.bits_left() < length:
                        raise ValueError("CCITT: bitstream exhausted mid-code")
                    bits.pos += length
                    break
        if run is None:
            raise ValueError(f"CCITT: invalid code at bit {bits.pos}")
        total += run
        if run < 64:
            return total


def _decode_mh_row(bits: _MsbBits, w: int) -> list[int]:
    """One 1D Modified-Huffman row → run lengths (white first)."""
    runs = []
    pos = 0
    white = True
    while pos < w:
        run = _read_run(bits, _WHITE_BY_LEN if white else _BLACK_BY_LEN)
        runs.append(run)
        pos += run
        white = not white
    if pos != w:
        raise ValueError("CCITT: row runs exceed width")
    return runs


def _paint(row: np.ndarray, runs: list[int]) -> None:
    pos = 0
    color = 0  # white
    for run in runs:
        if color:
            row[pos : pos + run] = 1
        pos += run
        color ^= 1


def _decode_g4_row(bits: _MsbBits, ref: np.ndarray, w: int) -> np.ndarray:
    """One T.6 2D-coded row against reference line ``ref`` (0=white).

    The reference line's changing elements are extracted ONCE per row
    into a sorted position array (consecutive entries alternate new-run
    colors), so b1 is a searchsorted + at-most-one parity step and b2
    the following entry — replacing the per-pixel scans that made the
    G4 walker the slowest decoder in codec_bench (r9 verdict #5)."""
    row = np.zeros(w, dtype=np.uint8)
    prev = np.empty_like(ref)
    prev[0] = 0  # imaginary white pixel left of the row
    prev[1:] = ref[:-1]
    chg = np.flatnonzero(ref != prev).tolist()
    nch = len(chg)
    # changing elements alternate new-run colors, and the first change
    # (from the imaginary white margin) is always to black — so element
    # k's color is first_color ^ (k & 1), no per-element ref lookups
    first_color = int(ref[chg[0]]) if nch else 0
    a0 = -1
    color = 0  # white
    i = 0  # a0 is strictly monotone, so this pointer only moves right
    while a0 < w:
        # b1: first changing element right of a0 whose new-run color is
        # opposite to the current color (T.6 §2.2.2)
        while i < nch and chg[i] <= a0:
            i += 1
        j = i
        if j < nch and (first_color ^ (j & 1)) == color:
            j += 1  # same color → the NEXT change flips (alternation)
        b1 = chg[j] if j < nch else w
        b2 = chg[j + 1] if j + 1 < nch else w
        v7 = bits.peek(7)  # one window covers every T.6 mode code
        if v7 >> 3 == 0b0001:  # pass: fill through b2, color kept
            bits.pos += 4
            if color:
                row[max(a0, 0) : b2] = 1
            a0 = b2
            continue
        if v7 >> 4 == 0b001:  # horizontal: two MH runs
            bits.pos += 3
            r1 = _read_run(bits, _WHITE_BY_LEN if color == 0 else _BLACK_BY_LEN)
            r2 = _read_run(bits, _BLACK_BY_LEN if color == 0 else _WHITE_BY_LEN)
            s = max(a0, 0)
            if color == 0:
                row[s + r1 : s + r1 + r2] = 1
            else:
                row[s : s + r1] = 1
            a0 = s + r1 + r2
            continue
        # vertical modes: a1 = b1 + offset, color toggles
        if v7 >> 6 == 0b1:
            bits.pos += 1
            off = 0
        elif v7 >> 4 == 0b011:
            bits.pos += 3
            off = 1
        elif v7 >> 4 == 0b010:
            bits.pos += 3
            off = -1
        elif v7 >> 1 == 0b000011:
            bits.pos += 6
            off = 2
        elif v7 >> 1 == 0b000010:
            bits.pos += 6
            off = -2
        elif v7 == 0b0000011:
            bits.pos += 7
            off = 3
        elif v7 == 0b0000010:
            bits.pos += 7
            off = -3
        else:
            raise ValueError("CCITT T.6: invalid mode code")
        a1 = max(0, min(b1 + off, w))
        if a1 <= a0 and a0 >= 0:
            # T.6 requires a1 > a0 (strictly monotone) — a corrupt
            # stream must fail, not spin (never-fail batch contract)
            raise ValueError("CCITT T.6: non-monotone coding element")
        if color:
            row[max(a0, 0) : a1] = 1
        a0 = a1
        color ^= 1
        if a0 >= w:
            break
    return row


def decode_ccitt(strips: list[bytes], w: int, h: int, comp: int,
                 rps: int, t4_2d: bool = False) -> np.ndarray:
    """CCITT strips → (h, w) uint8 samples, 0 = white, 1 = black.
    comp 2 = Modified Huffman (byte-aligned rows), comp 3 = T.4
    (EOL-led rows; 2D rows carry a 1-bit mode tag when tag 292 bit 0
    is set), comp 4 = T.6 / Group 4 (continuous 2D stream)."""
    out = np.zeros((h, w), dtype=np.uint8)
    y = 0
    for si, strip in enumerate(strips):
        nrows = min(rps, h - si * rps)
        bits = _MsbBits(strip)
        ref = np.zeros(w, dtype=np.uint8)  # imaginary all-white row
        for _ in range(nrows):
            if comp == 4:
                row = _decode_g4_row(bits, ref, w)
            elif comp == 3:
                # skip fill bits + the 000000000001 EOL
                while bits.bits_left() >= 12 and bits.peek(12) != 1:
                    bits.read(1)
                if bits.bits_left() >= 12:
                    bits.read(12)
                one_d = bits.read(1) if t4_2d else 1
                if one_d:
                    row = np.zeros(w, dtype=np.uint8)
                    _paint(row, _decode_mh_row(bits, w))
                else:
                    row = _decode_g4_row(bits, ref, w)
            else:  # comp 2: byte-aligned MH rows
                row = np.zeros(w, dtype=np.uint8)
                _paint(row, _decode_mh_row(bits, w))
                bits.align()
            out[y] = row
            ref = row
            y += 1
    return out
