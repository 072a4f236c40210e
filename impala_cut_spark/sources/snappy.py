"""Snappy block codec, pure Python (SURVEY §2.1 format × compression matrix).

The reference exercises snappy-compressed variants of its legacy
formats throughout its scanner test matrix (RCFile / SequenceFile /
Avro dimensions in ``testdata/workloads/*/​*_dimensions.csv`` carry a
``snap/block`` compression axis, and the scanners resolve
``org.apache.hadoop.io.compress.SnappyCodec`` /
``avro.codec: snappy``).  This module implements the codec itself from
Google's published format description
(github.com/google/snappy — format_description.txt), the same
from-scratch precedent as the LZO1X codec in ``sources/lzo.py``:

raw block stream ::= uvarint(uncompressed length) element*
element ::= literal | copy
  literal:  tag ``xxxxxx00`` — length-1 in the tag's top 6 bits if
            < 60, else 60..63 selects 1..4 little-endian length bytes
  copy-1:   tag ``xxxaaa01`` — length 4..11 in ``aaa``+4, 11-bit
            offset = ``xxx``<<8 | next byte
  copy-2:   tag ``xxxxxx10`` — length 1..64 in the top 6 bits +1,
            16-bit little-endian offset
  copy-4:   tag ``xxxxxx11`` — same, 32-bit offset

The compressor mirrors the reference implementation's structure:
input is processed in 64 KiB fragments (so every offset fits a copy-2
element), greedy 4-byte hash matching inside each fragment.

Two container framings ride on the raw block format:

* ``hadoop_compress``/``hadoop_decompress`` — Hadoop's
  ``BlockCompressorStream`` layout used by SnappyCodec inside RCFile /
  SequenceFile: repeated { int32-BE uncompressed-block-length, then
  chunks of { int32-BE compressed-length, raw snappy block } until the
  block is complete }.
* Avro's ``snappy`` codec (wired in ``sources/avro.py``) — one raw
  block per Avro data block followed by a 4-byte big-endian CRC32 of
  the uncompressed bytes.

Conformance is cross-checked in tests against the JVM's snappy-java
(org.xerial.snappy, on Spark's classpath) and Hadoop's SnappyCodec
itself — both directions, same precedent as the ImageIO codec checks.
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

_FRAGMENT = 65536  # reference impl compresses 64 KiB at a time


# -- raw block format -------------------------------------------------------


def _write_uvarint(out: bytearray, n: int) -> None:
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)


def decompress(buf: bytes) -> bytes:
    """Decode one raw snappy block stream."""
    buf = bytes(buf)
    n = 0
    shift = 0
    i = 0
    while True:
        if i >= len(buf):
            raise ValueError("snappy: truncated length preamble")
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 63:
            raise ValueError("snappy: length varint overflow")
    out = bytearray()
    total = len(buf)
    while i < total:
        tag = buf[i]
        i += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                ln = int.from_bytes(buf[i : i + nb], "little")
                i += nb
            ln += 1
            if i + ln > total:
                raise ValueError("snappy: literal overruns input")
            out += buf[i : i + ln]
            i += ln
            continue
        if kind == 1:
            ln = ((tag >> 2) & 7) + 4
            off = ((tag >> 5) << 8) | buf[i]
            i += 1
        elif kind == 2:
            ln = (tag >> 2) + 1
            off = int.from_bytes(buf[i : i + 2], "little")
            i += 2
        else:
            ln = (tag >> 2) + 1
            off = int.from_bytes(buf[i : i + 4], "little")
            i += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy: copy offset out of range")
        start = len(out) - off
        if off >= ln:
            out += out[start : start + ln]
        else:  # overlapping copy = repeat the off-byte pattern
            piece = bytes(out[start:])
            out += (piece * (ln // off + 1))[:ln]
    if len(out) != n:
        raise ValueError(f"snappy: decoded {len(out)} bytes, header said {n}")
    return bytes(out)


def _emit_literal(out: bytearray, data, s: int, e: int) -> None:
    n = e - s - 1
    if n < 60:
        out.append(n << 2)
    elif n < 1 << 8:
        out.append(60 << 2)
        out.append(n)
    elif n < 1 << 16:
        out.append(61 << 2)
        out += n.to_bytes(2, "little")
    elif n < 1 << 24:
        out.append(62 << 2)
        out += n.to_bytes(3, "little")
    else:
        out.append(63 << 2)
        out += n.to_bytes(4, "little")
    out += data[s:e]


def _emit_copies(out: bytearray, off: int, ln: int) -> None:
    # copy-2 elements (offset always < 64 KiB inside a fragment);
    # never leave a sub-4-byte tail (64..67 split as (ln-4, 4))
    while ln > 0:
        if ln > 67:
            take = 64
        elif ln > 64:
            take = ln - 4
        else:
            take = ln
        out.append(((take - 1) << 2) | 2)
        out += off.to_bytes(2, "little")
        ln -= take


def _compress_fragment(data: bytes, base: bytearray) -> None:
    n = len(data)
    if n < 4:
        if n:
            _emit_literal(base, data, 0, n)
        return
    table: dict[bytes, int] = {}
    ip = 0
    lit = 0
    limit = n - 3
    while ip < limit:
        key = data[ip : ip + 4]
        cand = table.get(key, -1)
        table[key] = ip
        if cand < 0:
            ip += 1
            continue
        # extend the match by expanding doubling probes
        ml = 4
        while ip + ml < n and data[cand + ml] == data[ip + ml]:
            ml += 1
        if lit < ip:
            _emit_literal(base, data, lit, ip)
        _emit_copies(base, ip - cand, ml)
        ip += ml
        lit = ip
    if lit < n:
        _emit_literal(base, data, lit, n)


def compress(data: bytes) -> bytes:
    """Encode ``data`` as one raw snappy block stream."""
    data = bytes(data)
    out = bytearray()
    _write_uvarint(out, len(data))
    for s in range(0, len(data), _FRAGMENT):
        _compress_fragment(data[s : s + _FRAGMENT], out)
    return bytes(out)


# -- Hadoop BlockCompressorStream framing (SnappyCodec) ---------------------


def hadoop_compress(data: bytes, block_size: int = 256 * 1024) -> bytes:
    """Frame ``data`` the way Hadoop's SnappyCodec output stream does."""
    data = bytes(data)
    if not data:  # Hadoop's stream emits nothing for an empty write
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
    """Inverse of :func:`hadoop_compress` (Hadoop BlockDecompressorStream)."""
    f = io.BytesIO(bytes(data))
    out = bytearray()
    while True:
        hdr = f.read(4)
        if not hdr:
            break
        if len(hdr) != 4:
            raise ValueError("snappy: truncated hadoop block header")
        (orig,) = struct.unpack(">i", hdr)
        got = 0
        while got < orig:
            (clen,) = struct.unpack(">i", f.read(4))
            chunk = decompress(f.read(clen))
            got += len(chunk)
            out += chunk
        if got != orig:
            raise ValueError("snappy: hadoop block length mismatch")
    return bytes(out)
