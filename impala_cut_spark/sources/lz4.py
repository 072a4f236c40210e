"""LZ4 block codec, pure Python (SURVEY §2.1 format × compression matrix).

Implements the public LZ4 block format (github.com/lz4/lz4 —
lz4_Block_format.md), the same from-scratch precedent as the
LZO1X/Snappy codecs in this package:

sequence ::= token literals* [offset matchlen-ext*]
  token:    high nibble = literal count (15 ⇒ +255-extension bytes),
            low nibble = match length - 4 (15 ⇒ +255-extension bytes)
  offset:   2-byte little-endian back-reference distance (1..65535)
  the LAST sequence is literals-only; an encoder must emit the final
  5 bytes as literals and start no match within the last 12 bytes
  (the spec's end-of-block restrictions).

``hadoop_compress``/``hadoop_decompress`` add Hadoop's
BlockCompressorStream framing (the layout Lz4Codec wraps RCFile /
SequenceFile buffers in): repeated { int32-BE uncompressed-block-len,
chunks of { int32-BE compressed-len, raw lz4 block } }.

Conformance is cross-checked in tests against lz4-java
(net.jpountz.lz4, bundled with Spark for shuffle compression) and
Hadoop's Lz4Codec itself — both directions.
"""

from __future__ import annotations

import io
import struct

__all__ = [
    "compress",
    "decompress",
    "hadoop_compress",
    "hadoop_decompress",
]

_MIN_MATCH = 4
_MF_LIMIT = 12  # no match may start within the last 12 bytes
_LAST_LITERALS = 5


def decompress(buf: bytes, expected: int | None = None) -> bytes:
    """Decode one raw LZ4 block."""
    buf = bytes(buf)
    out = bytearray()
    i = 0
    n = len(buf)
    while i < n:
        token = buf[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if i >= n:
                    raise ValueError("lz4: truncated literal length")
                b = buf[i]
                i += 1
                lit += b
                if b != 255:
                    break
        if i + lit > n:
            raise ValueError("lz4: literal run overruns input")
        out += buf[i : i + lit]
        i += lit
        if i >= n:  # last sequence: literals only
            break
        if i + 2 > n:  # a short slice would decode a bogus small offset
            raise ValueError("lz4: truncated sequence")
        off = int.from_bytes(buf[i : i + 2], "little")
        i += 2
        if off == 0 or off > len(out):
            raise ValueError("lz4: match offset out of range")
        ml = token & 0xF
        if ml == 15:
            while True:
                if i >= n:
                    raise ValueError("lz4: truncated match length")
                b = buf[i]
                i += 1
                ml += b
                if b != 255:
                    break
        ml += _MIN_MATCH
        start = len(out) - off
        if off >= ml:
            out += out[start : start + ml]
        else:  # overlapping copy = repeat the off-byte pattern
            piece = bytes(out[start:])
            out += (piece * (ml // off + 1))[:ml]
    if expected is not None and len(out) != expected:
        raise ValueError(f"lz4: decoded {len(out)} bytes, expected {expected}")
    return bytes(out)


def _write_len(out: bytearray, n: int) -> None:
    while n >= 255:
        out.append(255)
        n -= 255
    out.append(n)


def _emit(out: bytearray, data, lit_s: int, lit_e: int, off: int, ml: int) -> None:
    lit = lit_e - lit_s
    tok_lit = 15 if lit >= 15 else lit
    if ml:  # match sequence
        m = ml - _MIN_MATCH
        tok_ml = 15 if m >= 15 else m
        out.append((tok_lit << 4) | tok_ml)
        if tok_lit == 15:
            _write_len(out, lit - 15)
        out += data[lit_s:lit_e]
        out += off.to_bytes(2, "little")
        if tok_ml == 15:
            _write_len(out, m - 15)
    else:  # final literals-only sequence
        out.append(tok_lit << 4)
        if tok_lit == 15:
            _write_len(out, lit - 15)
        out += data[lit_s:lit_e]


def compress(data: bytes) -> bytes:
    """Encode one raw LZ4 block (greedy 4-byte hash matching, the
    spec's end-of-block restrictions honored)."""
    data = bytes(data)
    n = len(data)
    out = bytearray()
    if n < _MF_LIMIT + 1:
        _emit(out, data, 0, n, 0, 0)
        return bytes(out)
    table: dict[bytes, int] = {}
    ip = 0
    lit = 0
    match_limit = n - _MF_LIMIT  # last legal match start
    while ip < match_limit:
        key = data[ip : ip + 4]
        cand = table.get(cand_key := key, -1)
        table[cand_key] = ip
        if cand < 0 or ip - cand > 65535 or data[cand : cand + 4] != key:
            ip += 1
            continue
        ml = 4
        # matches may run up to the last-5-literals boundary
        hard = n - _LAST_LITERALS
        while ip + ml < hard and data[cand + ml] == data[ip + ml]:
            ml += 1
        _emit(out, data, lit, ip, ip - cand, ml)
        ip += ml
        lit = ip
    _emit(out, data, lit, n, 0, 0)
    return bytes(out)


# -- Hadoop BlockCompressorStream framing (Lz4Codec) -------------------------


def hadoop_compress(data: bytes, block_size: int = 256 * 1024) -> bytes:
    """Frame ``data`` the way Hadoop's Lz4Codec output stream does."""
    data = bytes(data)
    if not data:
        return b""
    out = bytearray()
    for s in range(0, len(data), block_size):
        block = data[s : s + block_size]
        comp = compress(block)
        out += struct.pack(">i", len(block))
        out += struct.pack(">i", len(comp))
        out += comp
    return bytes(out)


def hadoop_decompress(data: bytes) -> bytes:
    """Inverse of :func:`hadoop_compress`."""
    f = io.BytesIO(bytes(data))
    out = bytearray()
    while True:
        hdr = f.read(4)
        if not hdr:
            break
        if len(hdr) != 4:
            raise ValueError("lz4: truncated hadoop block header")
        (orig,) = struct.unpack(">i", hdr)
        got = 0
        while got < orig:
            (clen,) = struct.unpack(">i", f.read(4))
            chunk = decompress(f.read(clen))
            got += len(chunk)
            out += chunk
        if got != orig:
            raise ValueError("lz4: hadoop block length mismatch")
    return bytes(out)
