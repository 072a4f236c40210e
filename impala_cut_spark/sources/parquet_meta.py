"""From-scratch Parquet footer reader — the reference's footer-first
introspection surface (`be/src/exec/hdfs-parquet-scanner.cc:52-54`
parses the footer before anything else; SURVEY §2.1), re-expressed
as a metadata operator: Spark keeps the SCAN (Catalyst's parquet
source), this module carries the footer-level facts a planner or a
storage auditor reads — row groups, column chunks, codecs, page
offsets, value counts — parsed directly from the thrift COMPACT
protocol bytes (parquet-format FileMetaData), no parquet library
involved.

Layout (parquet-format spec): ``...[metadata][4-byte LE metadata
length]["PAR1"]``.  The metadata is a TCompactProtocol-serialized
``FileMetaData`` struct; this reader implements the compact grammar
generically (varint/zigzag, short-form field headers, list headers,
nested structs) and then projects the field ids the introspection
needs — schema is data, not codegen.

Independent anchors: DuckDB's ``parquet_metadata()`` table function
reads the same footers (pytest differential on every testdata
table), and the oracle row cross-checks footer value counts against
LIVE row counts of the registered views.

Scale: footers are a few KB at any file size — the reader seeks to
the tail and touches nothing else; the operator runs one footer per
file row, Arrow-batched.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame

#: thrift compact type codes
_STOP = 0
_BOOL_T = 1
_BOOL_F = 2
_BYTE = 3
_I16 = 4
_I32 = 5
_I64 = 6
_DOUBLE = 7
_BINARY = 8
_LIST = 9
_SET = 10
_MAP = 11
_STRUCT = 12

#: parquet enum tables (parquet-format Types/CompressionCodec)
PHYSICAL_TYPES = ["BOOLEAN", "INT32", "INT64", "INT96", "FLOAT",
                  "DOUBLE", "BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY"]
CODECS = ["UNCOMPRESSED", "SNAPPY", "GZIP", "LZO", "BROTLI", "LZ4",
          "ZSTD", "LZ4_RAW"]

#: footer size guard — a metadata length beyond this is hostile
MAX_FOOTER_BYTES = 64 * 1024 * 1024


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0

    def byte(self) -> int:
        if self.pos >= len(self.d):
            raise ValueError("parquet: truncated footer")
        b = self.d[self.pos]
        self.pos += 1
        return b

    def varint(self) -> int:
        out = shift = 0
        while True:
            b = self.byte()
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7
            if shift > 63:
                raise ValueError("parquet: varint overflow")

    def zigzag(self) -> int:
        v = self.varint()
        return (v >> 1) ^ -(v & 1)

    def binary(self) -> bytes:
        n = self.varint()
        if n > len(self.d) - self.pos:
            raise ValueError("parquet: truncated binary")
        out = self.d[self.pos : self.pos + n]
        self.pos += n
        return out

    def value(self, ftype: int):
        if ftype == _BOOL_T:
            return True
        if ftype == _BOOL_F:
            return False
        if ftype == _BYTE:
            return self.zigzag()
        if ftype in (_I16, _I32, _I64):
            return self.zigzag()
        if ftype == _DOUBLE:
            v = struct.unpack_from("<d", self.d, self.pos)[0]
            self.pos += 8
            return v
        if ftype == _BINARY:
            return self.binary()
        if ftype in (_LIST, _SET):
            return self.list_()
        if ftype == _MAP:
            return self.map_()
        if ftype == _STRUCT:
            return self.struct()
        raise ValueError(f"parquet: unknown compact type {ftype}")

    def list_(self) -> list:
        head = self.byte()
        size = head >> 4
        etype = head & 0x0F
        if size == 15:
            size = self.varint()
        if size > len(self.d):  # cheap hostile-size bound
            raise ValueError("parquet: list size exceeds footer")
        if etype == _BOOL_T:  # bools in lists carry the T code
            return [self.byte() == _BOOL_T for _ in range(size)]
        return [self.value(etype) for _ in range(size)]

    def map_(self) -> dict:
        size = self.varint()
        if size == 0:
            return {}
        kv = self.byte()
        kt, vt = kv >> 4, kv & 0x0F
        return {self.value(kt): self.value(vt) for _ in range(size)}

    def struct(self) -> dict:
        """Generic compact struct → {field_id: value}; bools encode
        in the type nibble."""
        out: dict[int, object] = {}
        fid = 0
        while True:
            head = self.byte()
            if head == _STOP:
                return out
            delta = head >> 4
            ftype = head & 0x0F
            fid = fid + delta if delta else self.zigzag()
            if ftype in (_BOOL_T, _BOOL_F):
                out[fid] = ftype == _BOOL_T
            else:
                out[fid] = self.value(ftype)


def parquet_footer(payload_tail: bytes) -> dict:
    """Parse a parquet file's TAIL bytes (at least the footer —
    callers may pass the whole file) → ``{version, num_rows,
    created_by, schema: [{name, type, repetition...}], row_groups:
    [{num_rows, total_byte_size, columns: [...]}]}``."""
    if len(payload_tail) < 12 or payload_tail[-4:] != b"PAR1":
        raise ValueError("parquet: no PAR1 trailer")
    (meta_len,) = struct.unpack_from("<I", payload_tail, len(payload_tail) - 8)
    if meta_len > MAX_FOOTER_BYTES or meta_len > len(payload_tail) - 8:
        raise ValueError("parquet: footer length out of range")
    meta = payload_tail[len(payload_tail) - 8 - meta_len:
                        len(payload_tail) - 8]
    fmd = _Reader(meta).struct()
    schema = []
    for el in fmd.get(2, []):
        schema.append({
            "name": el.get(4, b"").decode("utf-8", "replace"),
            "type": (PHYSICAL_TYPES[el[1]]
                     if 1 in el and 0 <= el[1] < len(PHYSICAL_TYPES)
                     else None),
            "num_children": el.get(5, 0),
        })
    row_groups = []
    for rg in fmd.get(4, []):
        cols = []
        for cc in rg.get(1, []):
            md = cc.get(3, {})
            cols.append({
                "path": ".".join(
                    p.decode("utf-8", "replace") for p in md.get(3, [])),
                "type": (PHYSICAL_TYPES[md[1]]
                         if 1 in md and 0 <= md[1] < len(PHYSICAL_TYPES)
                         else None),
                "codec": (CODECS[md[4]]
                          if 4 in md and 0 <= md[4] < len(CODECS)
                          else None),
                "num_values": md.get(5, 0),
                "total_uncompressed_size": md.get(6, 0),
                "total_compressed_size": md.get(7, 0),
                "data_page_offset": md.get(9, 0),
                "dictionary_page_offset": md.get(11),
            })
        row_groups.append({
            "total_byte_size": rg.get(2, 0),
            "num_rows": rg.get(3, 0),
            "columns": cols,
        })
    return {
        "version": fmd.get(1, 0),
        "num_rows": fmd.get(3, 0),
        "created_by": (fmd.get(6, b"") or b"").decode("utf-8", "replace"),
        "schema": schema,
        "row_groups": row_groups,
    }


def read_parquet_footer(path: str, tail_bytes: int = 1 << 20) -> dict:
    """Footer of a parquet FILE on disk — reads only the tail (the
    100 TB behavior: footers are KBs; never pull the data pages).
    Retries with the whole file if the metadata is larger than the
    initial tail read."""
    import os

    size = os.path.getsize(path)
    with open(path, "rb") as f:
        take = min(size, tail_bytes)
        f.seek(size - take)
        tail = f.read(take)
        if len(tail) >= 8:
            (meta_len,) = struct.unpack_from("<I", tail, len(tail) - 8)
            if meta_len + 8 > take and meta_len + 8 <= size:
                f.seek(size - meta_len - 8)
                tail = f.read(meta_len + 8)
    return parquet_footer(tail)


#: output schema of parquet_meta_rows — one row per column chunk
PARQUET_META_SCHEMA = (
    "table_name string, row_group int, column_path string, "
    "physical_type string, codec string, num_values bigint, "
    "total_compressed_size bigint, total_uncompressed_size bigint, "
    "parse_ok boolean"
)


def parquet_meta_rows(spark, sf_dir: str, tables: list[str]) -> DataFrame:
    """One row per (table, row group, column chunk) across the given
    tables' files — the storage-audit projection of the footer walk.
    The file LIST is parallelized (one task per file, each reading
    only its footer tail); a malformed footer degrades to ONE
    parse_ok=false row for its table."""
    import pandas as pd

    paths = [(t, f"{sf_dir}/{t}.parquet") for t in tables]
    pdf_in = spark.createDataFrame(paths, "table_name string, path string")

    def _walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for tname, path in zip(pdf["table_name"], pdf["path"]):
                try:
                    meta = read_parquet_footer(path)
                    for gi, rg in enumerate(meta["row_groups"]):
                        for c in rg["columns"]:
                            rows.append((
                                tname, gi, c["path"], c["type"],
                                c["codec"], c["num_values"],
                                c["total_compressed_size"],
                                c["total_uncompressed_size"], True,
                            ))
                except (ValueError, OSError, struct.error, IndexError,
                        KeyError, TypeError):
                    rows.append((tname, -1, None, None, None, 0, 0, 0,
                                 False))
            yield pd.DataFrame(
                rows,
                columns=["table_name", "row_group", "column_path",
                         "physical_type", "codec", "num_values",
                         "total_compressed_size",
                         "total_uncompressed_size", "parse_ok"],
            )

    return pdf_in.repartition(max(len(tables), 1)).mapInPandas(
        _walk, PARQUET_META_SCHEMA)
