"""Zstandard frame decoder + encoder, pure Python (RFC 8878).

From-scratch implementation of the public Zstandard format — the
LZO/Snappy/LZ4 precedent taken to the full modern stack: FSE
(tANS) entropy tables with the spec's count-parsing small-value
optimization, Huffman literals (direct and FSE-compressed weight
descriptions, 1- and 4-stream layouts, treeless repeat blocks),
backward bitstreams, the three-slot repeat-offset history with the
literals_length==0 twist, and raw/RLE/compressed block framing.

The DECODER handles anything a standard zstd encoder emits (no
dictionaries — Avro/Hadoop container use never sets one).  The
ENCODER ships two forms: level 1 (default, round 11) actually
compresses — greedy LZ77 into sequences over the PREDEFINED FSE
distributions, driven by a real tANS encoder whose state chains are
derived backward from the decoder's own tables (so encode and decode
tables cannot drift) — and level 0 keeps the store-mode frame (raw
blocks, content size declared).  Both close the Avro ``zstandard``
codec round-trip; neither pretends to compete with libzstd's
optimal-parse levels.

Conformance anchors (tests/test_zstd.py): zstd-jni
(com.github.luben.zstd, bundled with Spark for shuffle/parquet
compression) compresses varied corpora at multiple levels and THIS
decoder must reproduce the exact bytes; zstd-jni must likewise decode
this encoder's frames.
"""

from __future__ import annotations

import struct

__all__ = ["compress", "decompress"]

_MAGIC = 0xFD2FB528
_SKIPPABLE_LO = 0x184D2A50
_BLOCK_MAX = 128 * 1024


# -- forward (little-endian, LSB-first) bit reader — FSE headers ------------


class _FwdBits:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit offset

    def read(self, n: int) -> int:
        v = 0
        for k in range(n):
            i = self.pos + k
            v |= ((self.data[i >> 3] >> (i & 7)) & 1) << k
        self.pos += n
        return v

    def rewind(self, n: int) -> None:
        self.pos -= n

    def bytes_consumed(self) -> int:
        return (self.pos + 7) >> 3


# -- backward bitstream — FSE/Huffman payloads -------------------------------


class _BackBits:
    """RFC 8878 backward bitstream: a final 1-bit sentinel marks the
    write head; reads consume the most-recently-written bits first."""

    def __init__(self, data: bytes) -> None:
        if not data or data[-1] == 0:
            raise ValueError("zstd: corrupt backward bitstream")
        self.data = data
        last = data[-1]
        self.nbits = last.bit_length() - 1  # drop the sentinel bit
        self.acc = last & ((1 << self.nbits) - 1)
        self.pos = len(data) - 1  # next byte to pull (from the end)
        self.overflowed = False

    def _fill(self, n: int) -> None:
        while self.nbits < n:
            if self.pos == 0:  # past the start: zero-pad (and flag)
                self.acc <<= 8
                self.nbits += 8
                self.overflowed = True
                continue
            self.pos -= 1
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def peek(self, n: int) -> int:
        self._fill(n)
        return (self.acc >> (self.nbits - n)) & ((1 << n) - 1)

    def bits_left(self) -> int:
        return self.nbits + 8 * self.pos


# -- FSE ---------------------------------------------------------------------


class _FseTable:
    __slots__ = ("log", "symbol", "nbits", "base")

    def __init__(self, log: int, counts: list[int]) -> None:
        self.log = log
        size = 1 << log
        symbol = [0] * size
        high = size - 1
        # "less than 1" symbols at the top, one cell each
        for s, c in enumerate(counts):
            if c == -1:
                symbol[high] = s
                high -= 1
        step = (size >> 1) + (size >> 3) + 3
        pos = 0
        for s, c in enumerate(counts):
            for _ in range(max(c, 0)):
                symbol[pos] = s
                pos = (pos + step) & (size - 1)
                while pos > high:
                    pos = (pos + step) & (size - 1)
        if pos != 0:
            raise ValueError("zstd: FSE table spread error")
        nbits = [0] * size
        base = [0] * size
        counter = [1 if c == -1 else c for c in counts]
        for i in range(size):
            s = symbol[i]
            c = counter[s]
            counter[s] += 1
            nb = log - (c.bit_length() - 1)
            nbits[i] = nb
            base[i] = (c << nb) - size
        self.symbol = symbol
        self.nbits = nbits
        self.base = base


def _read_fse_counts(fw: _FwdBits, max_symbol: int) -> tuple[int, list[int]]:
    """RFC 8878 §4.1.1 normalized-count parsing (with the small-value
    optimization and zero-repeat flags)."""
    log = fw.read(4) + 5
    if log > 9:
        raise ValueError(f"zstd: FSE accuracy log {log} too large")
    remaining = (1 << log) + 1
    counts: list[int] = []
    while remaining > 1 and len(counts) <= max_symbol:
        bits = remaining.bit_length()
        val = fw.read(bits)
        lower_mask = (1 << (bits - 1)) - 1
        threshold = (1 << bits) - 1 - remaining
        if (val & lower_mask) < threshold:
            fw.rewind(1)
            val &= lower_mask
        elif val > lower_mask:
            val -= threshold
        proba = val - 1
        counts.append(proba)
        remaining -= -proba if proba < 0 else proba
        if proba == 0:
            repeat = fw.read(2)
            while repeat == 3:
                counts.extend([0, 0, 0])
                repeat = fw.read(2)
            counts.extend([0] * repeat)
    if remaining != 1:
        raise ValueError("zstd: FSE counts do not sum to table size")
    return log, counts


def _fse_decode_stream(table: _FseTable, bb: _BackBits, limit: int) -> list[int]:
    """Two interleaved FSE states decoding symbols until the backward
    bitstream is exhausted (the Huffman-weights layout)."""
    out: list[int] = []
    s1 = bb.read(table.log)
    s2 = bb.read(table.log)
    while len(out) < limit:
        out.append(table.symbol[s1])
        if len(out) == limit:  # never emit past limit (flush path included)
            break
        if bb.bits_left() < table.nbits[s1]:
            out.append(table.symbol[s2])
            break
        s1 = table.base[s1] + bb.read(table.nbits[s1])
        out.append(table.symbol[s2])
        if len(out) == limit:
            break
        if bb.bits_left() < table.nbits[s2]:
            out.append(table.symbol[s1])
            break
        s2 = table.base[s2] + bb.read(table.nbits[s2])
    return out


# -- Huffman ------------------------------------------------------------------


class _HufTable:
    __slots__ = ("log", "symbol", "nbits")

    def __init__(self, weights: list[int]) -> None:
        total = sum(1 << (w - 1) for w in weights if w > 0)
        if total == 0:
            raise ValueError("zstd: empty huffman weights")
        # the implied last symbol always exists (weight >= 1), so the
        # table log is floor(log2(total)) + 1 even at exact powers of 2
        log = total.bit_length()
        left = (1 << log) - total
        if left & (left - 1):
            raise ValueError("zstd: huffman weights do not complete a power of 2")
        # implied last weight
        weights = weights + [left.bit_length()]
        if log + 1 - max(weights) < 0 or log > 11:
            raise ValueError("zstd: bad huffman table log")
        bits = [log + 1 - w if w > 0 else 0 for w in weights]
        size = 1 << log
        symbol = [0] * size
        nbits = [0] * size
        # longest codes (most bits) occupy the table start; within a
        # bit-length, natural symbol order (RFC 8878 §4.2.1)
        rank_count = [0] * (log + 2)
        for b in bits:
            if b:
                rank_count[b] += 1
        rank_idx = [0] * (log + 2)
        for b in range(log, 0, -1):
            rank_idx[b - 1] = rank_idx[b] + rank_count[b] * (1 << (log - b))
        for s, b in enumerate(bits):
            if not b:
                continue
            code = rank_idx[b]
            span = 1 << (log - b)
            for j in range(span):
                symbol[code + j] = s
                nbits[code + j] = b
            rank_idx[b] += span
        self.log = log
        self.symbol = symbol
        self.nbits = nbits

    def decode_stream(self, data: bytes, n: int) -> bytearray:
        bb = _BackBits(data)
        out = bytearray()
        log = self.log
        for _ in range(n):
            idx = bb.peek(log)
            out.append(self.symbol[idx])
            bb.read(self.nbits[idx])
        return out


def _read_huffman(data: bytes) -> tuple[_HufTable, int]:
    """Parse a Huffman_Tree_Description → (table, bytes consumed)."""
    header = data[0]
    if header >= 128:  # direct 4-bit weights, high nibble first
        n = header - 127
        nbytes = (n + 1) // 2
        raw = data[1 : 1 + nbytes]
        weights = []
        for i in range(n):
            b = raw[i >> 1]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        return _HufTable(weights), 1 + nbytes
    # FSE-compressed weights
    comp = data[1 : 1 + header]
    fw = _FwdBits(comp)
    log, counts = _read_fse_counts(fw, 255)
    if log > 6:
        raise ValueError("zstd: huffman-weight FSE log > 6")
    table = _FseTable(log, counts)
    bb = _BackBits(comp[fw.bytes_consumed() :])
    weights = _fse_decode_stream(table, bb, 255)
    return _HufTable(weights), 1 + header


# -- sequence code tables (RFC 8878 §3.1.1.3.2.1) -----------------------------

_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12,
                       13, 14, 15, 16]
_LL_BASE: list[int] = []
_b = 0
for _i, _nb in enumerate(_LL_BITS):
    _LL_BASE.append(_i if _i < 16 else _b)
    if _i < 16:
        _b = _i + 1
    else:
        _b += 1 << _nb

_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11,
                       12, 13, 14, 15, 16]
_ML_BASE: list[int] = []
_b = 3
for _i, _nb in enumerate(_ML_BITS):
    _ML_BASE.append(_b)
    _b += (1 << _nb) if _i >= 32 else 1

#: predefined FSE distributions (RFC 8878 §3.1.1.3.2.2)
_LL_DEFAULT = (6, [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
                   2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
                   -1, -1, -1, -1])
# OF codes 24-28 imply offsets ≥ 2^24, beyond the default window —
# hence the trailing less-than-1 run; ML's -1 run (codes 46-52) was
# pinned against zstd-jni ground truth (tests/test_zstd.py)
_OF_DEFAULT = (5, [1, 1, 1, 1, 1, 1, 2, 2, 2] + [1] * 15 + [-1] * 5)
_ML_DEFAULT = (6, [1, 4, 3, 2, 2, 2, 2, 2, 2] + [1] * 37 + [-1] * 7)

_MAX_SYMBOL = {"ll": 35, "of": 31, "ml": 52}
_DEFAULTS = {"ll": _LL_DEFAULT, "of": _OF_DEFAULT, "ml": _ML_DEFAULT}
_MAX_LOG = {"ll": 9, "of": 8, "ml": 9}


class _FrameCtx:
    """State that persists across blocks within one frame."""

    def __init__(self) -> None:
        self.huffman: _HufTable | None = None
        self.tables: dict[str, _FseTable | tuple[str, int]] = {}
        self.reps = [1, 4, 8]


def _read_seq_table(kind: str, mode: int, data: bytes, pos: int,
                    ctx: _FrameCtx) -> int:
    """Resolve one of LL/OF/ML per its compression mode; returns the
    new cursor.  An RLE 'table' is stored as ('rle', symbol)."""
    if mode == 0:  # predefined
        log, counts = _DEFAULTS[kind]
        ctx.tables[kind] = _FseTable(log, counts)
        return pos
    if mode == 1:  # RLE: one byte = the constant symbol
        ctx.tables[kind] = ("rle", data[pos])
        return pos + 1
    if mode == 2:  # FSE-compressed
        fw = _FwdBits(data[pos:])
        log, counts = _read_fse_counts(fw, _MAX_SYMBOL[kind])
        if log > _MAX_LOG[kind]:
            raise ValueError(f"zstd: {kind} accuracy log {log} too large")
        ctx.tables[kind] = _FseTable(log, counts)
        return pos + fw.bytes_consumed()
    if kind not in ctx.tables:  # repeat mode without a prior table
        raise ValueError("zstd: repeat mode with no previous table")
    return pos


def _decode_literals(block: bytes, ctx: _FrameCtx) -> tuple[bytes, int]:
    """Literals section → (literals, bytes consumed)."""
    b0 = block[0]
    ltype = b0 & 3
    sf = (b0 >> 2) & 3
    if ltype in (0, 1):  # Raw / RLE
        if sf & 1 == 0:  # 00 or 10: 5-bit size, 1-byte header
            regen = b0 >> 3
            hdr = 1
        elif sf == 1:
            regen = (b0 >> 4) | (block[1] << 4)
            hdr = 2
        else:
            regen = (b0 >> 4) | (block[1] << 4) | (block[2] << 12)
            hdr = 3
        if ltype == 0:
            return bytes(block[hdr : hdr + regen]), hdr + regen
        return bytes([block[hdr]]) * regen, hdr + 1
    # Compressed / Treeless
    if sf == 0:
        streams, hdr, nb = 1, 3, 10
    elif sf == 1:
        streams, hdr, nb = 4, 3, 10
    elif sf == 2:
        streams, hdr, nb = 4, 4, 14
    else:
        streams, hdr, nb = 4, 5, 18
    combined = int.from_bytes(block[:hdr], "little") >> 4
    regen = combined & ((1 << nb) - 1)
    comp = (combined >> nb) & ((1 << nb) - 1)
    payload = block[hdr : hdr + comp]
    pos = 0
    if ltype == 2:
        ctx.huffman, used = _read_huffman(payload)
        pos = used
    elif ctx.huffman is None:
        raise ValueError("zstd: treeless literals with no previous table")
    huf = ctx.huffman
    body = payload[pos:]
    if streams == 1:
        return bytes(huf.decode_stream(body, regen)), hdr + comp
    s1, s2, s3 = struct.unpack_from("<HHH", body, 0)
    parts = []
    off = 6
    per = (regen + 3) // 4
    for i, size in enumerate((s1, s2, s3, len(body) - 6 - s1 - s2 - s3)):
        want = per if i < 3 else regen - 3 * per
        parts.append(huf.decode_stream(body[off : off + size], want))
        off += size
    return bytes(b"".join(parts)), hdr + comp


def _decode_block(
    block: bytes, ctx: _FrameCtx, out: bytearray, frame_start: int = 0,
    out_cap: int | None = None,
) -> None:
    """``out_cap`` is the max allowed len(out) AFTER this block —
    min(start + Block_Maximum_Size, caller's max_output).  Enforced
    inside the sequence loop so a hostile block (~97k sequences ×
    ~131 KiB repeat-matches) cannot materialize gigabytes before a
    post-hoc check (the bomb guard decode_http_body relies on)."""
    if out_cap is None:
        out_cap = len(out) + _BLOCK_MAX
    literals, pos = _decode_literals(block, ctx)
    if len(literals) > _BLOCK_MAX:
        raise ValueError("zstd: literals exceed 128 KiB block limit")
    # Number_of_Sequences
    b0 = block[pos]
    if b0 < 128:
        nseq = b0
        pos += 1
    elif b0 < 255:
        nseq = ((b0 - 128) << 8) | block[pos + 1]
        pos += 2
    else:
        # RFC 8878 §3.1.1.3.2.1: long form is byte1 + (byte2<<8) + 0x7F00
        # (arithmetic ADD — OR only coincides when byte2's low 7 bits are 0).
        nseq = block[pos + 1] + (block[pos + 2] << 8) + 0x7F00
        pos += 3
    if nseq == 0:
        out += literals
        return
    modes = block[pos]
    pos += 1
    if modes & 3:
        raise ValueError("zstd: reserved sequence mode bits set")
    pos = _read_seq_table("ll", (modes >> 6) & 3, block, pos, ctx)
    pos = _read_seq_table("of", (modes >> 4) & 3, block, pos, ctx)
    pos = _read_seq_table("ml", (modes >> 2) & 3, block, pos, ctx)
    bb = _BackBits(block[pos:])

    def init_state(kind):
        t = ctx.tables[kind]
        return 0 if isinstance(t, tuple) else bb.read(t.log)

    def symbol_of(kind, state):
        t = ctx.tables[kind]
        return t[1] if isinstance(t, tuple) else t.symbol[state]

    def advance(kind, state):
        t = ctx.tables[kind]
        if isinstance(t, tuple):
            return 0
        return t.base[state] + bb.read(t.nbits[state])

    ll_s = init_state("ll")
    of_s = init_state("of")
    ml_s = init_state("ml")
    lit_pos = 0
    reps = ctx.reps
    for i in range(nseq):
        ll_code = symbol_of("ll", ll_s)
        of_code = symbol_of("of", of_s)
        ml_code = symbol_of("ml", ml_s)
        if of_code > 31 or ll_code > 35 or ml_code > 52:
            raise ValueError("zstd: sequence code out of range")
        # extra bits read in OF → ML → LL order
        of_value = (1 << of_code) + bb.read(of_code)
        ml = _ML_BASE[ml_code] + bb.read(_ML_BITS[ml_code])
        ll = _LL_BASE[ll_code] + bb.read(_LL_BITS[ll_code])
        if of_value > 3:
            offset = of_value - 3
            reps[2] = reps[1]
            reps[1] = reps[0]
            reps[0] = offset
        else:
            idx = of_value - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                offset = reps[0]
            elif idx == 1:
                offset = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            elif idx == 2:
                offset = reps[2]
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            else:  # ll == 0 and of_value == 3
                offset = reps[0] - 1
                if offset == 0:
                    raise ValueError("zstd: zero repeat offset")
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
        out += literals[lit_pos : lit_pos + ll]
        lit_pos += ll
        if offset > len(out) - frame_start:
            # matches may never reach back past the current frame's start
            raise ValueError("zstd: match offset beyond window")
        start = len(out) - offset
        if offset >= ml:
            out += out[start : start + ml]
        else:
            piece = bytes(out[start:])
            out += (piece * (ml // offset + 1))[:ml]
        if len(out) > out_cap:
            raise ValueError("zstd: block output exceeds allowed size")
        if i + 1 < nseq:  # states not updated after the last sequence
            ll_s = advance("ll", ll_s)
            ml_s = advance("ml", ml_s)
            of_s = advance("of", of_s)
    out += literals[lit_pos:]
    if len(out) > out_cap:
        raise ValueError("zstd: block output exceeds allowed size")


def decompress(
    data: bytes, expected: int | None = None, max_output: int | None = None
) -> bytes:
    """Decode a (possibly concatenated) sequence of zstd frames.
    ``max_output`` bounds the decoded size (decompression-bomb guard
    for untrusted inputs — checked per block, before the bytes are
    materialized past the cap)."""
    data = bytes(data)
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        (magic,) = struct.unpack_from("<I", data, pos)
        if (magic & 0xFFFFFFF0) == _SKIPPABLE_LO:
            (size,) = struct.unpack_from("<I", data, pos + 4)
            pos += 8 + size
            continue
        if magic != _MAGIC:
            raise ValueError("zstd: bad frame magic")
        pos += 4
        fhd = data[pos]
        pos += 1
        fcs_flag = fhd >> 6
        single = (fhd >> 5) & 1
        checksum = (fhd >> 2) & 1
        did_flag = fhd & 3
        if fhd & 0x08:  # bit 3 reserved (bit 4 is "unused": accept any)
            raise ValueError("zstd: reserved frame-header bit set")
        if not single:
            pos += 1  # window descriptor
        pos += (0, 1, 2, 4)[did_flag]
        fcs_size = (1 if single else 0, 2, 4, 8)[fcs_flag]
        if fcs_size:
            fcs = int.from_bytes(data[pos : pos + fcs_size], "little")
            if fcs_size == 2:
                fcs += 256
            pos += fcs_size
        ctx = _FrameCtx()
        frame_start = len(out)
        while True:
            hdr = int.from_bytes(data[pos : pos + 3], "little")
            pos += 3
            last = hdr & 1
            btype = (hdr >> 1) & 3
            bsize = hdr >> 3
            if bsize > _BLOCK_MAX:
                # RFC 8878 §3.1.1.2: Block_Maximum_Size ≤ 128 KiB —
                # for RLE bsize IS the regenerated size, so this also
                # bounds the expansion below before it happens
                raise ValueError("zstd: block size exceeds 128 KiB limit")
            cap = len(out) + _BLOCK_MAX
            if max_output is not None:
                cap = min(cap, max_output)
            if btype == 0:  # raw
                out += data[pos : pos + bsize]
                pos += bsize
            elif btype == 1:  # RLE: bsize = regenerated size, 1 byte
                out += bytes([data[pos]]) * bsize
                pos += 1
            elif btype == 2:
                _decode_block(
                    data[pos : pos + bsize], ctx, out, frame_start, cap)
                pos += bsize
            else:
                raise ValueError("zstd: reserved block type")
            if max_output is not None and len(out) > max_output:
                raise ValueError("zstd: output exceeds allowed size")
            if last:
                break
        if checksum:
            pos += 4  # xxh64 low bytes — presence honored, not verified
    if expected is not None and len(out) != expected:
        raise ValueError(f"zstd: decoded {len(out)} bytes, expected {expected}")
    return bytes(out)


def compress(data: bytes, level: int = 1) -> bytes:
    """Emit a zstd frame.  ``level=0`` is store mode (raw blocks);
    ``level=1`` (default) actually compresses: greedy hash-chain LZ77
    into sequences, raw literals, and the PREDEFINED FSE distributions
    (RFC 8878 §3.1.1.3.2.2) driven by a real tANS ENCODER — the state
    chain is derived backward from the decoder's own table (pick the
    state whose baseline range contains the successor, emit the
    delta), so the encode tables can never drift from the validated
    decode tables.  Both forms decode via zstd-jni and the decoder
    above (tests/test_zstd.py)."""
    if level:
        return _compress_entropy(data)
    data = bytes(data)
    out = bytearray()
    out += struct.pack("<I", _MAGIC)
    out.append((3 << 6) | (1 << 5))  # 8-byte FCS, single-segment
    out += struct.pack("<Q", len(data))
    if not data:
        out += (1).to_bytes(3, "little")  # last raw block, size 0
        return bytes(out)
    for s in range(0, len(data), _BLOCK_MAX):
        block = data[s : s + _BLOCK_MAX]
        last = 1 if s + _BLOCK_MAX >= len(data) else 0
        out += (last | (len(block) << 3)).to_bytes(3, "little")
        out += block
    return bytes(out)


# -- level-1 encoder (sequences over the predefined FSE tables) ----------------


class _BackWriter:
    """Builds an RFC 8878 backward bitstream: callers supply writes in
    DECODER READ order; the writer emits them in reverse LSB-first so
    the first read lands at the top of the stream, then appends the
    1-bit sentinel."""

    def __init__(self) -> None:
        self.writes: list[tuple[int, int]] = []

    def put(self, v: int, n: int) -> None:
        if n:
            self.writes.append((v, n))

    def bytes(self) -> bytes:
        out = bytearray()
        acc = 0
        nbits = 0
        for v, n in reversed(self.writes):
            acc |= (v & ((1 << n) - 1)) << nbits
            nbits += n
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        acc |= 1 << nbits  # sentinel marks the write head
        out.append(acc & 0xFF)
        return bytes(out)


def _encode_states(table: _FseTable, symbols: list[int]):
    """Backward state-chain derivation from the DECODE table: state i
    must carry symbol i, and its baseline range must contain state
    i+1 (the decoder's advance = base[state] + readBits(nbits[state])).
    Returns (initial state, per-step (delta, nbits) updates)."""
    import bisect

    by_symbol: dict[int, list[tuple[int, int]]] = {}
    for u in range(1 << table.log):
        by_symbol.setdefault(table.symbol[u], []).append((table.base[u], u))
    for v in by_symbol.values():
        v.sort()
    n = len(symbols)
    state = by_symbol[symbols[-1]][0][1]
    updates: list[tuple[int, int]] = [(0, 0)] * (n - 1)
    for i in range(n - 2, -1, -1):
        lst = by_symbol[symbols[i]]
        j = bisect.bisect_right(lst, (state, 1 << 30)) - 1
        base, u = lst[j]
        updates[i] = (state - base, table.nbits[u])
        state = u
    return state, updates


def _code_of(base_table: list[int], v: int) -> int:
    import bisect

    return bisect.bisect_right(base_table, v) - 1


def _compress_entropy(data: bytes) -> bytes:
    data = bytes(data)
    out = bytearray()
    out += struct.pack("<I", _MAGIC)
    out.append((3 << 6) | (1 << 5))  # 8-byte FCS, single-segment
    out += struct.pack("<Q", len(data))
    if not data:
        out += (1).to_bytes(3, "little")
        return bytes(out)
    ll_table = _FseTable(*_LL_DEFAULT)
    of_table = _FseTable(*_OF_DEFAULT)
    ml_table = _FseTable(*_ML_DEFAULT)
    for s in range(0, len(data), _BLOCK_MAX):
        block = data[s : s + _BLOCK_MAX]
        last = 1 if s + _BLOCK_MAX >= len(data) else 0
        body = _encode_block(block, ll_table, of_table, ml_table)
        if body is None or len(body) >= len(block):
            out += (last | 0 << 1 | (len(block) << 3)).to_bytes(3, "little")
            out += block
        else:
            out += (last | 2 << 1 | (len(body) << 3)).to_bytes(3, "little")
            out += body
    return bytes(out)


def _encode_block(block, ll_table, of_table, ml_table) -> bytes | None:
    # greedy hash matcher (the snappy/brotli idiom); offsets stay
    # inside the block so cross-block window rules never bite
    n = len(block)
    seqs = []  # (ll, ml, offset), literals consumed in order
    lits = bytearray()
    table: dict[bytes, int] = {}
    ip = 0
    lit_start = 0
    limit = n - 3
    while ip < limit:
        key = block[ip : ip + 4]
        cand = table.get(key, -1)
        table[key] = ip
        if cand < 0:
            ip += 1
            continue
        ml = 4
        while ip + ml < n and block[cand + ml] == block[ip + ml]:
            ml += 1
        lits += block[lit_start:ip]
        seqs.append((ip - lit_start, ml, ip - cand))
        ip += ml
        lit_start = ip
    if not seqs:
        return None
    lits += block[lit_start:]

    body = bytearray()
    # literals section: raw, size_format by magnitude
    ln = len(lits)
    if ln <= 31:
        body.append(ln << 3)
    elif ln <= 4095:
        body += ((ln << 4) | 0b0100).to_bytes(2, "little")
    else:
        body += ((ln << 4) | 0b1100).to_bytes(3, "little")
    body += lits
    nseq = len(seqs)
    if nseq < 128:
        body.append(nseq)
    elif nseq < 0x7F00:
        body.append(128 + (nseq >> 8))
        body.append(nseq & 0xFF)
    else:
        body += bytes([255, (nseq - 0x7F00) & 0xFF, (nseq - 0x7F00) >> 8])
    body.append(0)  # modes: predefined for LL/OF/ML

    ll_codes, of_codes, ml_codes = [], [], []
    extras = []  # per seq: (of_extra, of_bits, ml_extra, ml_bits, ll_extra, ll_bits)
    for ll, ml, off in seqs:
        of_value = off + 3
        of_c = of_value.bit_length() - 1
        ll_c = ll if ll < 16 else _code_of(_LL_BASE, ll)
        ml_c = _code_of(_ML_BASE, ml)
        ll_codes.append(ll_c)
        of_codes.append(of_c)
        ml_codes.append(ml_c)
        extras.append((
            of_value - (1 << of_c), of_c,
            ml - _ML_BASE[ml_c], _ML_BITS[ml_c],
            ll - _LL_BASE[ll_c], _LL_BITS[ll_c],
        ))
    ll_init, ll_upd = _encode_states(ll_table, ll_codes)
    of_init, of_upd = _encode_states(of_table, of_codes)
    ml_init, ml_upd = _encode_states(ml_table, ml_codes)

    bw = _BackWriter()
    bw.put(ll_init, ll_table.log)
    bw.put(of_init, of_table.log)
    bw.put(ml_init, ml_table.log)
    for i, (of_e, of_b, ml_e, ml_b, ll_e, ll_b) in enumerate(extras):
        bw.put(of_e, of_b)
        bw.put(ml_e, ml_b)
        bw.put(ll_e, ll_b)
        if i + 1 < nseq:
            bw.put(*ll_upd[i])
            bw.put(*ml_upd[i])
            bw.put(*of_upd[i])
    body += bw.bytes()
    return bytes(body)
