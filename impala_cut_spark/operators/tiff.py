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
often omit the tag); CCITT fax compressions and other depths raise
NotImplementedError — documented boundaries.

Conformance evidence (tests/test_operators.py): LZW / PackBits /
Deflate TIFFs WRITTEN BY the JVM's ImageIO codec — strip and
explicitly-tiled layouts, 1-, 8- and 16-bit — decode bit-exactly, the
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
