"""LZO text scanner: pure-Python LZO1X-1 codec + lzop container
(SURVEY §2.1 "skip" row, now closed with running code).

The reference's LZO path is a *plugin shim*:
``/root/reference/be/src/exec/hdfs-lzo-text-scanner.cc`` (107 LoC) only
dlopens an external GPL ``libimpalalzo.so`` and fails with a versioned
error when it's absent — the codec itself is not in the reference tree.
This module goes further than the reference ships: a from-scratch
LZO1X-1 decompressor AND greedy compressor (both written from the
public algorithm description in the LZO/minilzo format documentation —
no LZO source was copied), the lzop file container (magic, header
checksum, per-block lengths + adler32, raw-stored blocks), and the
Hadoop-LZO style ``.index`` sidecar of block byte offsets that makes
.lzo files split-parallel.

Format notes (public lzop-1.03 / hadoop-lzo layout):

    file   ::= magic header block* eof_block
    header ::= version libver verneed method level flags mode
               mtime_lo mtime_hi fname_len fname adler32(header)
    block  ::= u32 uncomp_len  u32 comp_len
               [u32 adler32(uncomp)]  data          (big-endian)
    eof    ::= u32 0
    comp_len == uncomp_len  →  data stored raw (lzop's incompressible
                               -block rule), no LZO stream inside

    index  ::= (u64 block_start_offset)*            (hadoop-lzo)

LZO1X stream grammar (the decoder is a faithful state machine over it):
literal runs (t<16 main-loop codes with 255-chunk extension, the >17
first-byte short run), M2 matches (len 3-8, dist ≤ 0x800), M3
(32|len-2, dist ≤ 0x4000), M4 (16|..., dist ≤ 0xBFFF), trailing
0-3 literals folded into each match code's low 2 bits, EOF marker
``11 00 00`` (the M4 dist-0 sentinel).

Scale design: the scanner parallelizes at BLOCK granularity — the
driver reads only the tiny ``.index`` sidecar (or walks block headers,
seeking past data) and ships (file, offset, length) split descriptors
to executors; each task decodes only its block range.  A 100 TB .lzo
corpus with 256 KB blocks becomes ~400M independent splits exactly the
way hadoop-lzo's LzoTextInputFormat splits it.  Decode is Python
(documented legacy-format cost, same note as the Avro/RCFile readers);
convert once to parquet for hot data.
"""

from __future__ import annotations

import io
import os
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LZOP_MAGIC = b"\x89LZO\x00\r\n\x1a\n"
F_ADLER32_D = 0x0001
F_ADLER32_C = 0x0002
F_CRC32_D = 0x0100
F_CRC32_C = 0x0200
F_H_CRC32 = 0x1000
M_LZO1X_1 = 0x01

_NULL = "\\N"  # text-converter null sentinel, same as the text scanner

# ---------------------------------------------------------------------------
# LZO1X-1 decompressor
# ---------------------------------------------------------------------------


def lzo1x_decompress(src: bytes, expected_len: int | None = None) -> bytes:
    """Decompress one raw LZO1X stream.

    Implements the public LZO1X decoder state machine (literal runs,
    M1-M4 matches, 2-bit trailing-literal state, ``11 00 00`` EOF).
    Raises ValueError on malformed input; checks ``expected_len`` when
    given (lzop blocks carry the uncompressed length).
    """
    ip, n = 0, len(src)
    out = bytearray()

    def fail(msg: str) -> ValueError:
        return ValueError(f"LZO1X stream corrupt at byte {ip}: {msg}")

    def take() -> int:
        nonlocal ip
        if ip >= n:
            raise fail("unexpected EOF")
        b = src[ip]
        ip += 1
        return b

    def run_extend(t: int, base: int) -> int:
        # 255-chunk length extension: zeros add 255 each, final byte
        # adds base+byte
        nonlocal ip
        while True:
            b = take()
            if b == 0:
                t += 255
            else:
                return t + base + b

    def copy_match(dist: int, length: int) -> None:
        pos = len(out) - dist
        if pos < 0:
            raise fail(f"match distance {dist} before stream start")
        for _ in range(length):  # byte-wise: overlapping matches overlap
            out.append(out[pos])
            pos += 1

    state = 0  # trailing literals implied by the previous code
    t = take()
    if t > 17:
        # short initial literal run: first byte = len + 17
        t -= 17
        if t < 4:
            # 1..3 literals then a forced match code
            out += src[ip : ip + t]
            ip += t
            t = take()
            state = 4  # sentinel: next code is a match even if t < 16
        else:
            out += src[ip : ip + t]
            ip += t
            t = take()
            state = 1  # first_literal_run: t<16 would be the M1 special
    else:
        state = 0

    while True:
        if state == 0 and t < 16:
            # main-loop literal run: length t+3, extended when t == 0
            length = run_extend(0, 15) + 3 if t == 0 else t + 3
            if ip + length > n:
                raise fail("literal run past EOF")
            out += src[ip : ip + length]
            ip += length
            t = take()
            state = 1
            continue
        if t >= 64:  # M2: len 3-8, dist 1..0x800
            length = (t >> 5) + 1
            dist = ((t >> 2) & 7) + (take() << 3) + 1
            copy_match(dist, length)
            trail = t & 3
        elif t >= 32:  # M3: dist 1..0x4000
            length = run_extend(0, 31) + 2 if (t & 31) == 0 else (t & 31) + 2
            b1, b2 = take(), take()
            dist = (b1 >> 2) + (b2 << 6) + 1
            copy_match(dist, length)
            trail = b1 & 3
        elif t >= 16:  # M4: dist 0x4000..0xBFFF, or the EOF sentinel
            high = (t & 8) << 11
            length = run_extend(0, 7) + 2 if (t & 7) == 0 else (t & 7) + 2
            b1, b2 = take(), take()
            dist = (b1 >> 2) + (b2 << 6)
            if dist == 0 and high == 0:
                if expected_len is not None and len(out) != expected_len:
                    raise fail(
                        f"EOF with {len(out)} bytes, header said {expected_len}"
                    )
                return bytes(out)
            dist += high + 0x4000
            copy_match(dist, length)
            trail = b1 & 3
        else:
            # t < 16 in a match position: the two M1 specials
            if state == 1:
                # after a ≥4-literal run: len-3 match, dist 0x801..0x3008
                b2 = take()
                dist = (t >> 2) + (b2 << 2) + 0x801
                copy_match(dist, 3)
            else:
                # after trailing literals: len-2 match, dist 1..0x400
                b2 = take()
                dist = (t >> 2) + (b2 << 2) + 1
                copy_match(dist, 2)
            trail = t & 3
        if trail:
            if ip + trail > n:
                raise fail("trailing literals past EOF")
            out += src[ip : ip + trail]
            ip += trail
            t = take()
            state = 4  # next code is a match regardless of value
        else:
            t = take()
            state = 0


# ---------------------------------------------------------------------------
# LZO1X-1 greedy compressor
# ---------------------------------------------------------------------------

_M2_MAX_DIST = 0x0800
_M3_MAX_DIST = 0x4000
_M4_MAX_DIST = 0xBFFF


def lzo1x_compress(src: bytes) -> bytes:
    """Compress to a valid LZO1X stream (greedy 3-byte hash matcher).

    Own implementation of the public stream grammar — emits M2/M3/M4
    matches, folds 0-3 trailing literals into each match's state bits,
    encodes long runs with 255-chunk extensions, ends with the
    ``11 00 00`` EOF marker.  Round-trips through lzo1x_decompress for
    arbitrary input (property-tested); ratio is secondary to validity.
    """
    n = len(src)
    out = bytearray()
    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0  # start of the pending literal run
    first = True  # no match emitted yet

    def _ext(rem: int) -> None:
        # 255-chunk length extension; final byte must be 1..255
        z = (rem - 1) // 255
        out.extend(b"\x00" * z)
        out.append(rem - 255 * z)

    def emit_run(start: int, end: int, at_start: bool) -> None:
        # a standalone literal-run code (decoder: main loop / first
        # byte); only legal for L >= 4, or any L at stream start
        L = end - start
        if at_start and L <= 3:
            out.append(17 + L)  # >17 first-byte short run
        elif L <= 18:
            out.append(L - 3)  # codes 1..15
        else:
            out.append(0)
            _ext(L - 18)
        out.extend(src[start:end])

    def emit_match(dist: int, length: int) -> None:
        # every shape leaves its state-bearing byte (low 2 bits clear)
        # as the LAST-BUT-ONE byte of out — the fold below relies on it
        if 3 <= length <= 8 and dist <= _M2_MAX_DIST:
            d = dist - 1
            out.append(((length - 1) << 5) | ((d & 7) << 2))
            out.append(d >> 3)
        elif dist <= _M3_MAX_DIST:
            tlen = length - 2
            if tlen <= 31:
                out.append(32 | tlen)
            else:
                out.append(32)
                _ext(tlen - 31)
            d = dist - 1
            out.append((d & 0x3F) << 2)
            out.append(d >> 6)
        else:  # M4: dist 0x4001..0xBFFF
            d = dist - 0x4000
            tlen = length - 2
            op = 16 | ((d >> 11) & 8)  # bit 14 of d rides in the opcode
            if tlen <= 7:
                out.append(op | tlen)
            else:
                out.append(op)
                _ext(tlen - 7)
            low = d & 0x3FFF
            out.append((low & 0x3F) << 2)
            out.append(low >> 6)

    def flush_literals(end: int) -> None:
        # pending literals [lit_start, end) — fold 1..3 into the
        # previous match's state bits (decoder copies them, then reads
        # the NEXT code as a forced match: only ever called right
        # before a match/EOF code)
        L = end - lit_start
        if L == 0:
            return
        if first:
            emit_run(lit_start, end, True)
        elif L <= 3:
            out[-2] |= L
            out.extend(src[lit_start:end])
        else:
            emit_run(lit_start, end, False)

    while i + 3 <= n:
        key = src[i : i + 3]
        j = table.get(key)
        table[key] = i
        if j is None or i - j > _M4_MAX_DIST:
            i += 1
            continue
        dist = i - j
        length = 3
        max_len = n - i
        while length < max_len and src[j + length] == src[i + length]:
            length += 1
        if length == 3 and dist > _M3_MAX_DIST:
            i += 1  # a 3-byte M4 match doesn't pay
            continue
        flush_literals(i)
        emit_match(dist, length)
        first = False
        end = i + length
        step = 1 if length < 64 else 7  # sparse seeding in long matches
        for k in range(i + 1, min(end, n - 2), step):
            table[src[k : k + 3]] = k
        i = end
        lit_start = i
    flush_literals(n)
    out += b"\x11\x00\x00"  # EOF: the M4 dist-0 sentinel
    return bytes(out)


# ---------------------------------------------------------------------------
# lzop container + hadoop-style block index
# ---------------------------------------------------------------------------


class LzopWriter:
    """Incremental lzop writer: feed bytes with :meth:`write`, blocks
    are emitted as soon as ``block_size`` accumulates, so the caller
    never has to materialize the whole payload (the round-5 advice:
    the table writer used to collect the full DataFrame).  Each block
    stores raw when LZO1X doesn't shrink it (lzop's rule); adler32 of
    the uncompressed block recorded (F_ADLER32_D).  The ``.index``
    sidecar lists every block's byte offset (big-endian u64) — what
    makes the file split-parallel."""

    def __init__(self, path: str, block_size: int = 256 * 1024, index: bool = True):
        self._path = path
        self._block_size = block_size
        self._index = index
        self._buf = bytearray()
        self._offsets: list[int] = []
        hdr = bytearray()
        hdr += struct.pack(">HHH", 0x1030, 0x2060, 0x0940)
        hdr += struct.pack(">BB", M_LZO1X_1, 1)
        hdr += struct.pack(">I", F_ADLER32_D)
        hdr += struct.pack(">III", 0, 0, 0)  # mode, mtime lo/hi
        hdr += b"\x00"  # no filename
        chk = zlib.adler32(bytes(hdr), 1) & 0xFFFFFFFF
        self._fh = open(path, "wb")
        self._fh.write(LZOP_MAGIC)
        self._fh.write(hdr)
        self._fh.write(struct.pack(">I", chk))

    def write(self, data: bytes) -> None:
        self._buf += data
        while len(self._buf) >= self._block_size:
            self._emit(bytes(self._buf[: self._block_size]))
            del self._buf[: self._block_size]

    def _emit(self, block: bytes) -> None:
        comp = lzo1x_compress(block)
        if len(comp) >= len(block):
            comp = block  # store raw (comp_len == uncomp_len)
        self._offsets.append(self._fh.tell())
        self._fh.write(struct.pack(">II", len(block), len(comp)))
        self._fh.write(struct.pack(">I", zlib.adler32(block, 1) & 0xFFFFFFFF))
        self._fh.write(comp)

    def close(self) -> None:
        if self._buf:
            self._emit(bytes(self._buf))
            self._buf.clear()
        self._fh.write(struct.pack(">I", 0))  # EOF block
        self._fh.close()
        if self._index:
            with open(self._path + ".index", "wb") as fh:
                for off in self._offsets:
                    fh.write(struct.pack(">Q", off))

    def __enter__(self) -> "LzopWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def write_lzop(
    data: bytes, path: str, block_size: int = 256 * 1024, index: bool = True
) -> None:
    """Write ``data`` as one lzop file at ``path`` (+ ``path.index``) —
    the one-shot convenience wrapper over :class:`LzopWriter`."""
    with LzopWriter(path, block_size, index) as w:
        w.write(data)


def _parse_lzop_header(f) -> int:
    """Validate magic+header, return the flags word; leaves ``f`` at
    the first block."""
    if f.read(len(LZOP_MAGIC)) != LZOP_MAGIC:
        raise ValueError("not an lzop file (bad magic)")
    hdr = f.read(2 + 2 + 2 + 1 + 1 + 4 + 4 + 4 + 4)
    _ver, _lib, _need = struct.unpack(">HHH", hdr[:6])
    method = hdr[6]
    flags = struct.unpack(">I", hdr[8:12])[0]
    fname_len = f.read(1)[0]
    fname = f.read(fname_len)
    stored = struct.unpack(">I", f.read(4))[0]
    calc = zlib.adler32(hdr + bytes([fname_len]) + fname, 1) & 0xFFFFFFFF
    if not (flags & F_H_CRC32) and stored != calc:
        raise ValueError("lzop header checksum mismatch")
    if method != M_LZO1X_1:
        raise NotImplementedError(
            f"lzop method {method} unsupported (LZO1X-1 only, the method "
            "hadoop-lzo writes)"
        )
    return flags


def _read_block(f, flags: int) -> bytes | None:
    """Read+decode one block at the current offset; None at EOF."""
    raw = f.read(4)
    if len(raw) < 4:
        raise ValueError("lzop truncated before EOF block")
    uncomp_len = struct.unpack(">I", raw)[0]
    if uncomp_len == 0:
        return None
    comp_len = struct.unpack(">I", f.read(4))[0]
    d_chk = None
    if flags & (F_ADLER32_D | F_CRC32_D):
        d_chk = struct.unpack(">I", f.read(4))[0]
    if comp_len != uncomp_len and flags & (F_ADLER32_C | F_CRC32_C):
        f.read(4)  # compressed-data checksum: skip
    data = f.read(comp_len)
    if len(data) < comp_len:
        raise ValueError("lzop block truncated")
    if comp_len == uncomp_len:
        block = data  # stored raw
    else:
        block = lzo1x_decompress(data, uncomp_len)
    if d_chk is not None and flags & F_ADLER32_D:
        if zlib.adler32(block, 1) & 0xFFFFFFFF != d_chk:
            raise ValueError("lzop block adler32 mismatch")
    return block


def read_lzop(path: str) -> bytes:
    """Decompress a whole lzop file (driver-side utility/tests)."""
    out = bytearray()
    with open(path, "rb") as f:
        flags = _parse_lzop_header(f)
        while True:
            block = _read_block(f, flags)
            if block is None:
                return bytes(out)
            out += block


def lzop_block_offsets(path: str) -> list[int]:
    """Block byte offsets for ``path`` — from the ``.index`` sidecar
    when present (pure metadata read), else one cheap header walk that
    SEEKS past block data (reads 12 bytes per block, not the data)."""
    idx = path + ".index"
    if os.path.exists(idx):
        raw = open(idx, "rb").read()
        return [
            struct.unpack(">Q", raw[i : i + 8])[0] for i in range(0, len(raw), 8)
        ]
    offsets = []
    with open(path, "rb") as f:
        flags = _parse_lzop_header(f)
        extra = 4 if flags & (F_ADLER32_D | F_CRC32_D) else 0
        c_extra = 4 if flags & (F_ADLER32_C | F_CRC32_C) else 0
        while True:
            off = f.tell()
            raw = f.read(4)
            if len(raw) < 4 or struct.unpack(">I", raw)[0] == 0:
                return offsets
            uncomp_len = struct.unpack(">I", raw)[0]
            comp_len = struct.unpack(">I", f.read(4))[0]
            skip = extra + (c_extra if comp_len != uncomp_len else 0) + comp_len
            f.seek(skip, 1)
            offsets.append(off)


# ---------------------------------------------------------------------------
# Spark bridge
# ---------------------------------------------------------------------------


def write_lzo_text(
    df: DataFrame, path: str, sep: str = ",", escape: str = "\\"
) -> None:
    """Render ``df`` with the text-sink rules (``\\N`` nulls, same
    to_csv options as the plain text writer) and write ONE .lzo file
    (+index).  Test/fixture writer — the scan side is the parity
    surface (the reference has no LZO write at all: its sink formats
    are text+parquet only, hdfs-table-sink.cc:341-347).

    Driver-memory bound: rows stream through ``toLocalIterator()`` —
    the driver holds at most one partition of rendered lines plus one
    256 KB compression block, never the whole table (round-5 advice;
    the single output file is the deliberate contract of a fixture
    writer — a distributed sink would write one .lzo per partition)."""
    line = F.to_csv(
        F.struct(*df.columns),
        {
            "sep": sep,
            "escape": escape,
            "nullValue": _NULL,
            "ignoreLeadingWhiteSpace": "false",
            "ignoreTrailingWhiteSpace": "false",
        },
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with LzopWriter(path) as w:
        for r in df.select(line).toLocalIterator():
            w.write(r[0].encode("utf-8") + b"\n")


def read_lzo_text(
    spark: SparkSession,
    path: str,
    schema: str,
    sep: str = ",",
    escape: str = "\\",
) -> DataFrame:
    """Scan .lzo text file(s) into a DataFrame with ``schema``.

    Split-parallel the hadoop-lzo way: the driver reads only block
    OFFSETS (the .index sidecar, or a seek-walk of 12-byte headers),
    pairs consecutive blocks into (file, start, end) splits, and
    executors decode just their range.  Lines are parsed with the same
    JVM ``from_csv`` options as the text scanner, so an LZO table and
    its plain-text twin parse identically.  Lines spanning block
    boundaries are handled with the LineRecordReader split rule
    (non-first splits skip their first partial line; every split reads
    past its end to finish its last line) — arbitrary line/block
    alignment is safe.
    """
    paths = []
    if os.path.isdir(path):
        paths = [
            os.path.join(path, f)
            for f in sorted(os.listdir(path))
            if f.endswith(".lzo")
        ]
    else:
        paths = [path]
    # (file, start_off, end_off, is_first_split)
    splits: list[tuple[str, int, int, bool]] = []
    for p in paths:
        offs = lzop_block_offsets(p)
        size = os.path.getsize(p)
        for bi, off in enumerate(offs):
            end = offs[bi + 1] if bi + 1 < len(offs) else size
            splits.append((p, off, end, bi == 0))

    def decode_split(it):
        # Hadoop LineRecordReader split rule: a non-first split skips
        # its first (possibly partial) line — the previous split owns
        # it — and every split reads PAST its end into the following
        # block(s) just far enough to finish its own last line.  Rows
        # therefore survive arbitrary line/block alignment.
        for p, start, end, is_first in it:
            with open(p, "rb") as f:
                flags = _parse_lzop_header(f)
                f.seek(start)
                buf = bytearray()
                ended_at_eof = False
                while f.tell() < end:
                    block = _read_block(f, flags)
                    if block is None:
                        ended_at_eof = True
                        break
                    buf += block
                if not is_first:
                    nl = buf.find(b"\n")
                    if nl < 0:
                        # whole split is inside one line: an earlier
                        # split is reading forward through it; emit
                        # nothing
                        continue
                    del buf[: nl + 1]
                # read ONE extra line past the split end — always, even
                # when the split happens to end on a newline (its first
                # line was unconditionally skipped by the next split)
                while not ended_at_eof:
                    block = _read_block(f, flags)
                    if block is None:
                        break
                    nl = block.find(b"\n")
                    if nl >= 0:
                        buf += block[: nl + 1]
                        break
                    buf += block
                for ln in buf.decode("utf-8").splitlines():
                    yield (ln,)

    sc = spark.sparkContext
    rdd = sc.parallelize(splits, max(1, min(len(splits), 32))).mapPartitions(
        decode_split
    )
    lines = spark.createDataFrame(rdd, "line string")
    parsed = lines.select(
        F.from_csv(
            F.col("line"),
            schema,
            {"sep": sep, "escape": escape, "nullValue": _NULL},
        ).alias("r")
    )
    return parsed.select("r.*")
