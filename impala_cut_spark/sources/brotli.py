"""From-scratch Brotli decoder (RFC 7932), pure Python.

Backs the crawl front-end's ``Content-Encoding: br`` arm (sources/warc.py
``decode_http_body``): raw web crawls store HTTP bodies with their
on-the-wire encodings, and brotli is the one common encoding the Python
standard library cannot inflate (gzip/deflate → zlib, zstd → the
from-scratch sources/zstd.py).  The reference engine
(rampage644/impala-cut) contains no brotli anywhere — this extends the
WARC ingestion path, which itself exceeds the reference.

Complete RFC 7932 surface: stream header window bits, compressed /
uncompressed / metadata meta-blocks, simple (1-4 symbol) and complex
prefix codes with the static code-length-code, block switching for all
three categories, literal context modes (LSB6/MSB6/UTF8/Signed) and
context maps with RLE + inverse-move-to-front, the four-slot distance
ring buffer with short codes, NPOSTFIX/NDIRECT distance parameters, and
static-dictionary references through the 121 Appendix B word transforms.

Validated byte-exact against the container's libbrotli (ctypes,
tests only — ``tests/test_brotli.py``): encoder round-trips across
qualities 0-11 and window sizes, transform-by-transform parity with
``BrotliTransformDictionaryWord``, and table parity with the lib's
exported RFC constants.  All constant tables are RFC 7932 published
data (see _brotli_tables.py); the static dictionary ships as
_brotli_dict.bin, sha256-pinned to the RFC Appendix A value.

The module also carries a real compressing ENCODER (``compress``
level 1: greedy hash-chain LZ77 into insert-and-copy commands,
entropy-coded meta-blocks with complex/simple prefix-code emission,
explicit distances under NPOSTFIX=NDIRECT=0) whose every output
stream must decode via libbrotlidec in tests — the cross-anchored
encoder/decoder pair the LZO/zstd/VP8L codecs established; level 0
keeps the store-mode form.
"""

from __future__ import annotations

import hashlib
import os

from ._brotli_tables import (
    BLOCK_LEN,
    CONTEXT_LUT,
    COPY_LEN,
    COPY_RANGE_BASE,
    DICT_OFFSETS,
    DICT_SHA256,
    DICT_SIZE_BITS,
    DIST_SHORT_INDEX,
    DIST_SHORT_DELTA,
    INSERT_LEN,
    INSERT_RANGE_BASE,
    TRANSFORMS,
)

__all__ = ["compress", "decompress", "transform_dictionary_word"]


# -- bit reader (LSB-first, strict end) ---------------------------------------


class _Bits:
    __slots__ = ("d", "i", "acc", "nbits", "pad")

    def __init__(self, data: bytes) -> None:
        self.d = data
        self.i = 0
        self.acc = 0
        self.nbits = 0
        self.pad = 0  # virtual zero bytes appended by past-the-end peeks

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.i >= len(self.d):
                raise ValueError("brotli: truncated stream")
            self.acc |= self.d[self.i] << self.nbits
            self.i += 1
            self.nbits += 8
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v

    def peek8(self) -> int:
        while self.nbits < 8:
            # past-the-end peeks pad with zeros: a code shorter than the
            # peek width may legally end in the stream's final byte
            if self.i < len(self.d):
                self.acc |= self.d[self.i] << self.nbits
                self.i += 1
            else:
                if self.pad >= 4:
                    raise ValueError("brotli: truncated stream")
                self.pad += 1
            self.nbits += 8
        return self.acc & 0xFF

    def drop(self, n: int) -> None:
        if n > self.nbits:
            raise ValueError("brotli: truncated stream")
        self.acc >>= n
        self.nbits -= n

    def byte_align(self) -> int:
        """Discard bits up to the next byte boundary; returns them."""
        n = self.nbits & 7
        return self.read(n) if n else 0

    def take_bytes(self, n: int) -> bytes:
        """Read n raw bytes (caller must be byte-aligned).  Raises if
        the accumulator holds zero padding from a past-the-end peek —
        those are not stream bytes (truncated-stream guard)."""
        assert self.nbits & 7 == 0
        if n and self.pad:
            raise ValueError("brotli: truncated stream")
        out = bytearray()
        while self.nbits and n:
            out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8
            n -= 1
        if n:
            if self.i + n > len(self.d):
                raise ValueError("brotli: truncated stream")
            out += self.d[self.i : self.i + n]
            self.i += n
        return bytes(out)

    def at_end(self) -> bool:
        """True when only zero padding bits remain."""
        if self.acc != 0:
            return False
        return all(b == 0 for b in self.d[self.i :])


# -- canonical prefix codes ----------------------------------------------------


class _Prefix:
    """Canonical prefix decoder, DEFLATE rule (shortest first, ascending
    symbol within a length); first-read bit = MSB of the code, so the
    8-bit root table is keyed by the reversed code (same two-level
    scheme as operators/vp8l.py)."""

    __slots__ = ("table", "single", "root")

    def __init__(self, lengths: list[int]) -> None:
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ValueError("brotli: empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.table = None
            self.root = None
            return
        self.single = None
        max_len = max(ln for ln, _ in nz)
        if sum(1 << (max_len - ln) for ln, _ in nz) != 1 << max_len:
            raise ValueError("brotli: prefix code is not complete")
        bl_count = [0] * (max_len + 1)
        for ln, _ in nz:
            bl_count[ln] += 1
        code = 0
        next_code = [0] * (max_len + 1)
        for ln in range(1, max_len + 1):
            code = (code + bl_count[ln - 1]) << 1
            next_code[ln] = code
        table: dict[tuple[int, int], int] = {}
        root: list = [None] * 256
        for ln, sym in sorted(nz):
            c = next_code[ln]
            table[(ln, c)] = sym
            next_code[ln] += 1
            if ln <= 8:
                rev = 0
                cc = c
                for _ in range(ln):
                    rev = (rev << 1) | (cc & 1)
                    cc >>= 1
                for hi in range(1 << (8 - ln)):
                    root[rev | (hi << ln)] = (sym, ln)
        self.table = table
        self.root = root

    def decode(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        e = self.root[br.peek8()]
        if e is not None:
            br.drop(e[1])
            return e[0]
        code = 0
        ln = 0
        table = self.table
        while True:
            code = (code << 1) | br.read(1)
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
            if ln > 15:
                raise ValueError("brotli: invalid prefix code in stream")


def _simple_prefix_code(br: _Bits, alphabet_size: int) -> _Prefix:
    """RFC 7932 section 3.4 — 1 to 4 explicitly listed symbols."""
    abits = max(1, (alphabet_size - 1).bit_length())
    nsym = br.read(2) + 1
    syms = []
    for _ in range(nsym):
        s = br.read(abits)
        if s >= alphabet_size:
            raise ValueError("brotli: simple code symbol out of range")
        if s in syms:
            raise ValueError("brotli: duplicate symbol in simple code")
        syms.append(s)
    if nsym == 1:
        p = _Prefix.__new__(_Prefix)
        p.single = syms[0]
        p.table = None
        p.root = None
        return p
    if nsym == 2:
        syms.sort()
        code_lens = [1, 1]
    elif nsym == 3:
        if syms[1] > syms[2]:
            syms[1], syms[2] = syms[2], syms[1]
        code_lens = [1, 2, 2]
    else:
        if br.read(1):  # tree-select
            if syms[2] > syms[3]:
                syms[2], syms[3] = syms[3], syms[2]
            code_lens = [1, 2, 3, 3]
        else:
            syms.sort()
            code_lens = [2, 2, 2, 2]
    lengths = [0] * alphabet_size
    for s, ln in zip(syms, code_lens):
        lengths[s] = ln
    return _Prefix(lengths)


#: section 3.5 — order in which code-length-code lengths appear
_CL_ORDER = [1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15]
#: static prefix code over code-length-code lengths: 4-bit peek ->
#: (value, bits consumed)
_CL_STATIC_LEN = [2, 2, 2, 3, 2, 2, 2, 4, 2, 2, 2, 3, 2, 2, 2, 4]
_CL_STATIC_VAL = [0, 4, 3, 2, 0, 4, 3, 1, 0, 4, 3, 2, 0, 4, 3, 5]


def _complex_prefix_code(br: _Bits, alphabet_size: int, hskip: int) -> _Prefix:
    """RFC 7932 section 3.5 — code lengths themselves prefix-coded."""
    cl_lens = [0] * 18
    space = 32
    num_codes = 0
    for i in range(hskip, 18):
        peek = br.peek8() & 0xF
        v = _CL_STATIC_VAL[peek]
        br.drop(_CL_STATIC_LEN[peek])
        cl_lens[_CL_ORDER[i]] = v
        if v:
            space -= 32 >> v
            num_codes += 1
            if space <= 0:
                break
    if num_codes != 1 and space != 0:
        raise ValueError("brotli: code-length code is not complete")
    cl_code = _Prefix(cl_lens)

    lengths = [0] * alphabet_size
    symbol = 0
    prev_len = 8
    repeat = 0
    repeat_len = 0
    space = 32768
    while symbol < alphabet_size and space > 0:
        cl = cl_code.decode(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            repeat = 0  # a literal length breaks any repeat accumulation
            if cl:
                prev_len = cl
                space -= 32768 >> cl
        else:
            extra = cl - 14  # 16 -> 2 bits, 17 -> 3 bits
            new_len = prev_len if cl == 16 else 0
            if repeat_len != new_len:
                repeat = 0
                repeat_len = new_len
            old = repeat
            if repeat:
                repeat = (repeat - 2) << extra
            repeat += br.read(extra) + 3
            delta = repeat - old
            if symbol + delta > alphabet_size:
                raise ValueError("brotli: code-length repeat overruns alphabet")
            for _ in range(delta):
                lengths[symbol] = repeat_len
                symbol += 1
            if repeat_len:
                space -= delta << (15 - repeat_len)
    if space != 0:
        raise ValueError("brotli: prefix code lengths are not complete")
    return _Prefix(lengths)


def _read_prefix_code(br: _Bits, alphabet_size: int) -> _Prefix:
    hskip = br.read(2)
    if hskip == 1:
        return _simple_prefix_code(br, alphabet_size)
    return _complex_prefix_code(br, alphabet_size, hskip)


# -- helpers -------------------------------------------------------------------


def _var_len_uint8(br: _Bits) -> int:
    """Value 1..256 (NBLTYPES / NTREES encoding, section 9.2)."""
    if not br.read(1):
        return 1
    n = br.read(3)
    if n == 0:
        return 2
    return (1 << n) + br.read(n) + 1


def _read_context_map(br: _Bits, n_entries: int, n_trees: int) -> list[int]:
    """Section 7.3 — RLE of zeros + optional inverse-move-to-front."""
    rlemax = br.read(4) + 1 if br.read(1) else 0
    code = _read_prefix_code(br, n_trees + rlemax)
    cmap: list[int] = []
    while len(cmap) < n_entries:
        sym = code.decode(br)
        if sym == 0:
            cmap.append(0)
        elif sym <= rlemax:
            reps = (1 << sym) + br.read(sym)
            if len(cmap) + reps > n_entries:
                raise ValueError("brotli: context-map RLE overruns map")
            cmap.extend([0] * reps)
        else:
            cmap.append(sym - rlemax)
    if br.read(1):  # inverse move-to-front
        mtf = list(range(256))
        for i, v in enumerate(cmap):
            val = mtf[v]
            cmap[i] = val
            if v:
                del mtf[v]
                mtf.insert(0, val)
    return cmap


def _block_switch(
    br: _Bits,
    type_code: _Prefix,
    count_code: _Prefix,
    btype: int,
    prev: int,
    n_types: int,
) -> tuple[int, int, int]:
    """Returns (new type, new prev, new remaining count)."""
    sym = type_code.decode(br)
    if sym == 0:
        new = prev
    elif sym == 1:
        new = (btype + 1) % n_types
    else:
        new = sym - 2
    off, nbits = BLOCK_LEN[count_code.decode(br)]
    return new, btype, off + br.read(nbits)


def _read_block_count(br: _Bits, count_code: _Prefix) -> int:
    off, nbits = BLOCK_LEN[count_code.decode(br)]
    return off + br.read(nbits)


# -- static dictionary ---------------------------------------------------------

_DICT_PATH = os.path.join(os.path.dirname(__file__), "_brotli_dict.bin")
_dict_data: bytes | None = None


def _dictionary() -> bytes:
    global _dict_data
    if _dict_data is None:
        with open(_DICT_PATH, "rb") as f:
            data = f.read()
        if hashlib.sha256(data).hexdigest() != DICT_SHA256:
            raise ValueError("brotli: static dictionary file is corrupt")
        _dict_data = data
    return _dict_data


def _uppercase_utf8(t: bytearray, i: int) -> int:
    """RFC 7932 section 8 'ferment' step at position i; returns width."""
    c = t[i]
    if c < 192:
        if 97 <= c <= 122:
            t[i] ^= 32
        return 1
    if c < 224:
        if i + 1 < len(t):
            t[i + 1] ^= 32
        return 2
    if i + 2 < len(t):
        t[i + 2] ^= 5
    return 3


def transform_dictionary_word(length: int, word_id: int) -> bytes:
    """Expand a static-dictionary reference: word index + transform id
    packed into word_id per section 8.  Raises on invalid references."""
    if not 4 <= length <= 24 or DICT_SIZE_BITS[length] == 0:
        raise ValueError("brotli: invalid dictionary word length")
    bits = DICT_SIZE_BITS[length]
    index = word_id & ((1 << bits) - 1)
    tid = word_id >> bits
    if tid >= len(TRANSFORMS):
        raise ValueError("brotli: invalid dictionary transform")
    base = DICT_OFFSETS[length] + index * length
    word = _dictionary()[base : base + length]
    prefix, typ, suffix = TRANSFORMS[tid]
    if typ >= 12:  # omit-first-N
        n = typ - 11
        word = word[n:] if n < len(word) else b""
    elif 1 <= typ <= 9:  # omit-last-N
        word = word[:-typ] if typ < len(word) else b""
    if typ == 10:  # uppercase-first
        t = bytearray(word)
        if t:
            _uppercase_utf8(t, 0)
        word = bytes(t)
    elif typ == 11:  # uppercase-all
        t = bytearray(word)
        i = 0
        while i < len(t):
            i += _uppercase_utf8(t, i)
        word = bytes(t)
    return prefix + word + suffix


# -- stream decode -------------------------------------------------------------


def _window_bits(br: _Bits) -> int:
    if not br.read(1):
        return 16
    n = br.read(3)
    if n:
        return 17 + n
    n = br.read(3)
    if n == 0:
        return 17
    if n == 1:
        raise ValueError("brotli: reserved WBITS pattern")
    return 8 + n


def decompress(data: bytes, max_output: int | None = None) -> bytes:
    """Decode a complete brotli stream.  ``max_output`` bounds the
    output size (decompression-bomb guard for untrusted crawl data)."""
    br = _Bits(data)
    window = (1 << _window_bits(br)) - 16
    out = bytearray()
    # distance ring buffer, section 4
    rb = [16, 15, 11, 4]
    rb_idx = 0

    while True:
        islast = br.read(1)
        if islast and br.read(1):  # ISLASTEMPTY
            break
        mnibbles = br.read(2) + 4
        if mnibbles == 7:  # MNIBBLES code 3: metadata block
            if br.read(1):
                raise ValueError("brotli: reserved metadata bit set")
            skip_bytes = br.read(2)
            if skip_bytes == 0:
                skiplen = 0
            else:
                v = br.read(8 * skip_bytes)
                if skip_bytes > 1 and (v >> (8 * (skip_bytes - 1))) == 0:
                    raise ValueError("brotli: non-minimal metadata length")
                skiplen = v + 1
            br.byte_align()
            br.take_bytes(skiplen)
            if islast:
                break
            continue
        mlen = br.read(4 * mnibbles) + 1
        if mnibbles > 4 and (mlen - 1) >> (4 * (mnibbles - 1)) == 0:
            raise ValueError("brotli: non-minimal MLEN encoding")
        if max_output is not None and len(out) + mlen > max_output:
            raise ValueError("brotli: output exceeds allowed size")
        if not islast and br.read(1):  # ISUNCOMPRESSED
            br.byte_align()
            out += br.take_bytes(mlen)
            continue

        # -- meta-block header: block types per category (L, I, D)
        n_types = [0, 0, 0]
        btype = [0, 0, 0]
        bprev = [1, 1, 1]
        blen = [1 << 28, 1 << 28, 1 << 28]
        tcodes: list[_Prefix | None] = [None, None, None]
        ccodes: list[_Prefix | None] = [None, None, None]
        for cat in range(3):
            n = _var_len_uint8(br)
            n_types[cat] = n
            if n >= 2:
                tcodes[cat] = _read_prefix_code(br, n + 2)
                ccodes[cat] = _read_prefix_code(br, 26)
                blen[cat] = _read_block_count(br, ccodes[cat])

        npostfix = br.read(2)
        ndirect = br.read(4) << npostfix
        postfix_mask = (1 << npostfix) - 1
        ctx_modes = [br.read(2) for _ in range(n_types[0])]

        ntrees_l = _var_len_uint8(br)
        if ntrees_l >= 2:
            cmap_l = _read_context_map(br, 64 * n_types[0], ntrees_l)
        else:
            cmap_l = [0] * (64 * n_types[0])
        ntrees_d = _var_len_uint8(br)
        if ntrees_d >= 2:
            cmap_d = _read_context_map(br, 4 * n_types[2], ntrees_d)
        else:
            cmap_d = [0] * (4 * n_types[2])

        lit_codes = [_read_prefix_code(br, 256) for _ in range(ntrees_l)]
        cmd_codes = [_read_prefix_code(br, 704) for _ in range(n_types[1])]
        dist_alpha = 16 + ndirect + (48 << npostfix)
        dist_codes = [_read_prefix_code(br, dist_alpha) for _ in range(ntrees_d)]

        # -- data loop
        mode = ctx_modes[0] << 9
        while mlen > 0:
            if blen[1] == 0:
                btype[1], bprev[1], blen[1] = _block_switch(
                    br, tcodes[1], ccodes[1], btype[1], bprev[1], n_types[1]
                )
            blen[1] -= 1
            cmd = cmd_codes[btype[1]].decode(br)
            rng = cmd >> 6
            implicit_d0 = rng < 2
            if implicit_d0:
                rng_idx = rng
            else:
                rng_idx = rng - 2
            ins_off, ins_bits = INSERT_LEN[INSERT_RANGE_BASE[rng_idx] + ((cmd >> 3) & 7)]
            cpy_off, cpy_bits = COPY_LEN[COPY_RANGE_BASE[rng_idx] + (cmd & 7)]
            insert_len = ins_off + br.read(ins_bits) if ins_bits else ins_off
            copy_len = cpy_off + br.read(cpy_bits) if cpy_bits else cpy_off

            if insert_len:
                if insert_len > mlen:
                    raise ValueError("brotli: insert overruns meta-block")
                for _ in range(insert_len):
                    if blen[0] == 0:
                        btype[0], bprev[0], blen[0] = _block_switch(
                            br, tcodes[0], ccodes[0], btype[0], bprev[0], n_types[0]
                        )
                        mode = ctx_modes[btype[0]] << 9
                    blen[0] -= 1
                    p1 = out[-1] if out else 0
                    p2 = out[-2] if len(out) > 1 else 0
                    ctx = CONTEXT_LUT[mode + p1] | CONTEXT_LUT[mode + 256 + p2]
                    tree = cmap_l[(btype[0] << 6) + ctx]
                    out.append(lit_codes[tree].decode(br))
                mlen -= insert_len
            if mlen <= 0:
                break  # copy part of the final command is unused

            if implicit_d0:
                distance = rb[(rb_idx + 3) & 3]
                dcode = 0
            else:
                if blen[2] == 0:
                    btype[2], bprev[2], blen[2] = _block_switch(
                        br, tcodes[2], ccodes[2], btype[2], bprev[2], n_types[2]
                    )
                blen[2] -= 1
                dctx = 3 if copy_len > 4 else copy_len - 2
                tree = cmap_d[(btype[2] << 2) + dctx]
                dcode = dist_codes[tree].decode(br)
                if dcode < 16:
                    distance = (
                        rb[(rb_idx + DIST_SHORT_INDEX[dcode]) & 3]
                        + DIST_SHORT_DELTA[dcode]
                    )
                    if distance <= 0:
                        raise ValueError("brotli: invalid short distance")
                elif dcode < 16 + ndirect:
                    distance = dcode - 16 + 1
                else:
                    h = (dcode - ndirect - 16) >> npostfix
                    lo = (dcode - ndirect - 16) & postfix_mask
                    nbits = 1 + (h >> 1)
                    offset = ((2 + (h & 1)) << nbits) - 4
                    distance = (
                        ((offset + br.read(nbits)) << npostfix)
                        + lo
                        + ndirect
                        + 1
                    )

            max_dist = min(len(out), window)
            if distance > max_dist:
                # static dictionary reference
                word = transform_dictionary_word(copy_len, distance - max_dist - 1)
                if len(word) > mlen:
                    raise ValueError("brotli: dictionary word overruns meta-block")
                out += word
                mlen -= len(word)
            else:
                if copy_len > mlen:
                    raise ValueError("brotli: copy overruns meta-block")
                start = len(out) - distance
                if distance >= copy_len:
                    out += out[start : start + copy_len]
                else:  # overlapping copy
                    for k in range(copy_len):
                        out.append(out[start + k])
                mlen -= copy_len
                if dcode != 0:
                    rb[rb_idx & 3] = distance
                    rb_idx += 1

        if islast:
            break

    if not br.at_end():
        raise ValueError("brotli: garbage after final meta-block")
    return bytes(out)


# -- encoder ---------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def put_code(self, code: int, length: int) -> None:
        """Prefix-code bits: first-read bit = MSB of the code.  (The
        data phase avoids this per-bit loop by pre-reversing codes —
        see _reversed_codes — and calling put() once per symbol.)"""
        for k in range(length - 1, -1, -1):
            self.put((code >> k) & 1, 1)

    def byte_align(self) -> None:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0

    def bytes(self) -> bytes:
        out = bytearray(self.out)
        if self.nbits:
            out.append(self.acc & 0xFF)
        return bytes(out)


def compress(data: bytes, level: int = 1) -> bytes:
    """Emit a valid brotli stream.  ``level=0`` is store mode
    (uncompressed meta-blocks); ``level=1`` (default) actually
    compresses: greedy hash-chain LZ77 into insert-and-copy commands,
    one literal / command / distance prefix code per meta-block
    (complex or simple per section 3), explicit distances under
    NPOSTFIX=NDIRECT=0.  Both forms decode via libbrotlidec and the
    decoder above (tests/test_brotli.py) — no native library on the
    data path either direction."""
    if level == 0:
        return _compress_store(data)
    bw = _BitWriter()
    # WBITS = 22 ('1' + 3-bit 5): the window must cover every in-chunk
    # backward distance, or the decoder reads long matches as static-
    # dictionary references
    bw.put(1, 1)
    bw.put(5, 3)
    step = (1 << 22) - 16  # every in-chunk distance stays addressable
    if not data:
        bw.put(1, 1)  # ISLAST
        bw.put(1, 1)  # ISLASTEMPTY
        return bw.bytes()
    for pos in range(0, len(data), step):
        chunk = data[pos : pos + step]
        _encode_meta_block(bw, chunk, pos + step >= len(data))
    return bw.bytes()


def _compress_store(data: bytes) -> bytes:
    bw = _BitWriter()
    bw.put(0, 1)  # WBITS = 16
    pos = 0
    while pos < len(data):
        chunk = data[pos : pos + (1 << 24) - 1]
        pos += len(chunk)
        bw.put(0, 1)  # ISLAST = 0
        mlen = len(chunk) - 1
        nibbles = max(4, (mlen.bit_length() + 3) // 4)
        bw.put(nibbles - 4, 2)
        bw.put(mlen, 4 * nibbles)
        bw.put(1, 1)  # ISUNCOMPRESSED
        bw.byte_align()
        bw.out += chunk
    bw.put(1, 1)  # ISLAST
    bw.put(1, 1)  # ISLASTEMPTY
    return bw.bytes()


#: explicit-distance command cells: (insert code base, copy code base)
#: -> range index (section 5; +2 when emitted, so the distance symbol
#: is always read)
_CELL_TO_RANGE = {
    (INSERT_RANGE_BASE[i], COPY_RANGE_BASE[i]): i for i in range(9)
}


def _len_code(table: list[tuple[int, int]], v: int) -> int:
    """Largest code whose first value is <= v (tables are sorted)."""
    lo, hi = 0, len(table) - 1
    while lo < hi:
        mid = (lo + hi + 1) >> 1
        if table[mid][0] <= v:
            lo = mid
        else:
            hi = mid - 1
    return lo


def _lz_parse(chunk: bytes) -> list[tuple[int, int, int, int]]:
    """Greedy hash matcher → (lit_start, lit_end, copy_len, distance)
    commands; the final command carries copy_len=0 (sentinel: its copy
    code is never consumed by the decoder once MLEN is exhausted)."""
    n = len(chunk)
    cmds: list[tuple[int, int, int, int]] = []
    table: dict[bytes, int] = {}
    ip = 0
    lit = 0
    limit = n - 3
    while ip < limit:
        key = chunk[ip : ip + 4]
        cand = table.get(key, -1)
        table[key] = ip
        if cand < 0:
            ip += 1
            continue
        ml = 4
        while ip + ml < n and chunk[cand + ml] == chunk[ip + ml]:
            ml += 1
        cmds.append((lit, ip, ml, ip - cand))
        ip += ml
        lit = ip
    if lit < n:
        # trailing-literals command; its copy code is a sentinel the
        # decoder never consumes past MLEN.  When the chunk ends ON a
        # copy, no sentinel: the decoder stops reading at exactly that
        # command, so extra bits would be trailing garbage.
        cmds.append((lit, n, 0, 0))
    return cmds


def _dist_symbol(d: int) -> tuple[int, int, int]:
    """Distance -> (dcode, extra bits, extra value) under
    NPOSTFIX=0, NDIRECT=0 (section 4)."""
    v = d + 3
    nbits = v.bit_length() - 2
    b = (v >> nbits) - 2
    extra = v - ((2 + b) << nbits)
    return 16 + (nbits - 1) * 2 + b, nbits, extra


def _write_prefix_code(bw: _BitWriter, lengths: list[int]) -> list[tuple[int, int]]:
    """Emit a section-3 prefix-code description; returns the canonical
    (code, length) per symbol for the data phase."""
    nz = [(s, ln) for s, ln in enumerate(lengths) if ln]
    abits = max(1, (len(lengths) - 1).bit_length())
    codes = _canonical(lengths)
    if len(nz) == 1:
        bw.put(1, 2)  # HSKIP: simple form
        bw.put(0, 2)  # NSYM - 1 = 0
        bw.put(nz[0][0], abits)
        # decoders consume ZERO bits per symbol of a single-symbol code
        # (the same rule the VP8L encoder desync fix pinned): the data
        # phase must emit nothing for it
        codes = list(codes)
        codes[nz[0][0]] = (0, 0)
        return codes
    if len(nz) <= 4:
        syms = [s for s, _ in nz]
        lens = sorted(ln for _, ln in nz)
        bw.put(1, 2)
        bw.put(len(nz) - 1, 2)
        if len(nz) == 2:  # lengths 1,1 — sorted symbols
            for s in sorted(syms):
                bw.put(s, abits)
        elif len(nz) == 3:  # 1,2,2 — the len-1 symbol first, rest sorted
            one = next(s for s, ln in nz if ln == 1)
            rest = sorted(s for s, ln in nz if ln != 1)
            for s in [one] + rest:
                bw.put(s, abits)
        else:
            if lens == [2, 2, 2, 2]:
                for s in sorted(syms):
                    bw.put(s, abits)
                bw.put(0, 1)  # tree-select
            else:  # 1,2,3,3
                one = next(s for s, ln in nz if ln == 1)
                two = next(s for s, ln in nz if ln == 2)
                rest = sorted(s for s, ln in nz if ln == 3)
                for s in [one, two] + rest:
                    bw.put(s, abits)
                bw.put(1, 1)
        return codes
    # complex form: emit symbol lengths up to the last nonzero one,
    # zeros literally (no 16/17 repeats — simplicity over density)
    seq = lengths[: nz[-1][0] + 1]
    freq = [0] * 18
    for ln in seq:
        freq[ln] += 1
    used = [v for v, f in enumerate(freq) if f]
    if len(used) == 1:
        cl_lens = [0] * 18
        cl_lens[used[0]] = 1  # single-symbol: 0-bit code (num_codes==1)
    else:
        from impala_cut_spark.operators.vp8l import _huffman_lengths

        hl = _huffman_lengths(freq, max_len=5)
        cl_lens = hl + [0] * (18 - len(hl))
    bw.put(0, 2)  # HSKIP = 0
    # code-length-code lengths via the static code — defined by the
    # decoder's 4-bit LSB-first lookup (_CL_STATIC_*), so the bit
    # patterns here are stream-order values for put(), not canonical
    # MSB-first codes: value -> (stream bits LSB-first, bit count)
    static = {0: (0b00, 2), 1: (0b0111, 4), 2: (0b011, 3), 3: (0b10, 2),
              4: (0b01, 2), 5: (0b1111, 4)}
    space = 32
    ncodes = 0
    for sym in _CL_ORDER:
        v = cl_lens[sym]
        code, nb = static[v]
        bw.put(code, nb)
        if v:
            space -= 32 >> v
            ncodes += 1
            if space <= 0:
                break
    cl_codes = _canonical(cl_lens)
    if len(used) > 1:  # a 0-bit code-length code emits no length bits
        for ln in seq:
            c, w = cl_codes[ln]
            bw.put_code(c, w)
    return codes


def _reversed_codes(codes: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Bit-reverse each canonical code within its length: an MSB-first
    prefix code becomes a single LSB-first put() — one call per symbol
    instead of one per bit (the data-phase hot path)."""
    out = []
    for c, ln in codes:
        r = 0
        for _ in range(ln):
            r = (r << 1) | (c & 1)
            c >>= 1
        out.append((r, ln))
    return out


def _canonical(lengths: list[int]) -> list[tuple[int, int]]:
    """Symbol -> (canonical code, length); DEFLATE rule."""
    max_len = max(lengths, default=0)
    bl = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl[ln] += 1
    code = 0
    nxt = [0] * (max_len + 1)
    for ln in range(1, max_len + 1):
        code = (code + bl[ln - 1]) << 1
        nxt[ln] = code
    out: list[tuple[int, int]] = [(0, 0)] * len(lengths)
    for sym in sorted(range(len(lengths)), key=lambda s: (lengths[s], s)):
        ln = lengths[sym]
        if ln:
            out[sym] = (nxt[ln], ln)
            nxt[ln] += 1
    return out


def _histogram(freqs: dict[int, int], size: int) -> list[int]:
    lens = [0] * size
    items = [(s, f) for s, f in freqs.items() if f]
    if len(items) == 1:
        lens[items[0][0]] = 1
        return lens
    from impala_cut_spark.operators.vp8l import _huffman_lengths

    table = [0] * size
    for s, f in items:
        table[s] = f
    hl = _huffman_lengths(table, max_len=15)
    return hl + [0] * (size - len(hl))


def _encode_meta_block(bw: _BitWriter, chunk: bytes, is_last: bool) -> None:
    cmds = _lz_parse(chunk)
    # histograms
    lit_f: dict[int, int] = {}
    cmd_f: dict[int, int] = {}
    dist_f: dict[int, int] = {}
    encoded = []
    for ls, le, cl, d in cmds:
        ins = le - ls
        ic = _len_code(INSERT_LEN, ins)
        cc = _len_code(COPY_LEN, cl) if cl else 0
        rng = _CELL_TO_RANGE[(ic & ~7, cc & ~7)]
        cmd = (rng + 2) << 6 | (ic & 7) << 3 | (cc & 7)
        cmd_f[cmd] = cmd_f.get(cmd, 0) + 1
        for b in chunk[ls:le]:
            lit_f[b] = lit_f.get(b, 0) + 1
        if cl:
            dc, _, _ = _dist_symbol(d)
            dist_f[dc] = dist_f.get(dc, 0) + 1
        encoded.append((ls, le, cl, d, cmd, ic, cc))
    if not lit_f:
        lit_f[0] = 1  # header demands a literal code even if unused
    if not dist_f:
        dist_f[0] = 1

    bw.put(1 if is_last else 0, 1)
    if is_last:
        bw.put(0, 1)  # ISLASTEMPTY = 0
    mlen = len(chunk) - 1
    nibbles = max(4, (mlen.bit_length() + 3) // 4)
    bw.put(nibbles - 4, 2)
    bw.put(mlen, 4 * nibbles)
    if not is_last:
        bw.put(0, 1)  # ISUNCOMPRESSED = 0
    for _ in range(3):  # NBLTYPES L/I/D = 1
        bw.put(0, 1)
    bw.put(0, 2)  # NPOSTFIX
    bw.put(0, 4)  # NDIRECT >> NPOSTFIX
    bw.put(0, 2)  # context mode for the single literal block type
    bw.put(0, 1)  # NTREESL = 1
    bw.put(0, 1)  # NTREESD = 1
    lit_codes = _reversed_codes(_write_prefix_code(bw, _histogram(lit_f, 256)))
    cmd_codes = _reversed_codes(_write_prefix_code(bw, _histogram(cmd_f, 704)))
    dist_codes = _reversed_codes(_write_prefix_code(bw, _histogram(dist_f, 64)))

    put = bw.put
    for ls, le, cl, d, cmd, ic, cc in encoded:
        c, w = cmd_codes[cmd]
        put(c, w)
        off, nb = INSERT_LEN[ic]
        if nb:
            put((le - ls) - off, nb)
        off, nb = COPY_LEN[cc]
        if nb:
            put(cl - off if cl else 0, nb)
        for b in chunk[ls:le]:
            c, w = lit_codes[b]
            put(c, w)
        if cl:
            dc, nb, extra = _dist_symbol(d)
            c, w = dist_codes[dc]
            put(c, w)
            if nb:
                put(extra, nb)
