"""WARC (ISO 28500 / WARC/1.0-1.1) reader + writer — pure stdlib.

WARC is the container web crawls actually ship in (Common Crawl etc.),
so a training-data pipeline's very first operator is a WARC record
parser.  The grammar is line-oriented and public: every record is

    WARC/1.0<CRLF>
    Header-Name: value<CRLF> ...
    <CRLF>
    <Content-Length content bytes>
    <CRLF><CRLF>

and crawl files are usually gzip with ONE MEMBER PER RECORD, so a
reader can resynchronize at member boundaries — parse_warc handles
both the plain and the multi-member-gzip form via
zlib.decompressobj(wbits=31) + unused_data chaining (stdlib only; the
same from-scratch precedent as the LZO/PNG/JPEG/GIF codecs).

Spark-side plumbing (warc_ingest) is an Arrow-batched mapInPandas over
binary payload columns — at 100 TB, WARC files land as
``spark.read.format("binaryFile")`` rows or as a binary column of an
asset table, records explode executor-side, and malformed payloads
degrade to parse_ok=false rows instead of failing the job.

The reference engine has no WARC surface (extension component —
SURVEY.md pipeline ops); built from the public ISO 28500 grammar only.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_CRLF = b"\r\n"


def build_warc(records: list[dict], gzipped: bool = False) -> bytes:
    """Serialize records (dicts with ``headers: dict[str, str]`` and
    ``content: bytes``) into a WARC/1.0 byte stream — the writer twin
    of parse_warc.  ``gzipped`` emits the crawl-standard one-gzip-
    member-per-record form."""
    out = bytearray()
    for rec in records:
        body = bytearray(b"WARC/1.0" + _CRLF)
        content = rec.get("content", b"")
        headers = dict(rec.get("headers", {}))
        headers["Content-Length"] = str(len(content))
        for k, v in headers.items():
            body += f"{k}: {v}".encode() + _CRLF
        body += _CRLF + content + _CRLF + _CRLF
        if gzipped:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            out += co.compress(bytes(body)) + co.flush()
        else:
            out += body
    return bytes(out)


def _inflate_members(payload: bytes) -> bytes:
    """Concatenate every gzip member of a multi-member stream."""
    out = bytearray()
    rest = payload
    while rest:
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(rest)
        out += d.flush()
        if not d.eof:  # truncated member
            raise ValueError("truncated gzip member in WARC stream")
        rest = d.unused_data
    return bytes(out)


def parse_warc(payload: bytes) -> list[dict]:
    """Parse a WARC byte stream (plain or member-per-record gzip) into
    ``[{headers: {name: value}, content: bytes}, …]``.  Header names
    are case-preserved; lookups should use ``headers_ci``-style lower
    casing on the caller side (warc_ingest does)."""
    if payload[:2] == b"\x1f\x8b":
        payload = _inflate_members(payload)
    records = []
    pos = 0
    n = len(payload)
    while pos < n:
        # skip inter-record CRLFs
        while payload[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        eol = payload.index(_CRLF, pos)
        version = payload[pos:eol]
        if not version.startswith(b"WARC/"):
            raise ValueError(f"bad WARC version line {version[:20]!r}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while payload[pos : pos + 2] != _CRLF:
            eol = payload.index(_CRLF, pos)
            line = payload[pos:eol]
            k, _, v = line.partition(b":")
            headers[k.strip().decode("utf-8", "replace")] = v.strip().decode(
                "utf-8", "replace"
            )
            pos = eol + 2
        pos += 2  # the blank line
        length = int(
            next(v for k, v in headers.items() if k.lower() == "content-length")
        )
        content = payload[pos : pos + length]
        if len(content) != length:
            raise ValueError("WARC content block truncated")
        pos += length
        if payload[pos : pos + 4] != _CRLF + _CRLF:
            raise ValueError("WARC record missing terminating CRLFCRLF")
        pos += 4
        records.append({"headers": headers, "content": content})
    return records


def parse_http_response(content: bytes) -> tuple[int, dict[str, str], bytes]:
    """Split a WARC response record's content — a full HTTP/1.x
    response — into (status_code, lower-cased headers, body bytes).
    The crawl front-end needs this before any HTML handling: the
    Content-Type routing decision is an HTTP-header fact, not a WARC
    one."""
    sep = content.find(b"\r\n\r\n")
    if sep < 0:
        raise ValueError("HTTP response missing header/body separator")
    head = content[:sep].decode("iso-8859-1")  # HTTP/1.x header charset
    lines = head.split("\r\n")
    parts = lines[0].split(None, 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise ValueError(f"bad HTTP status line {lines[0]!r}")
    status = int(parts[1])
    headers: dict[str, str] = {}
    for line in lines[1:]:
        k, _, v = line.partition(":")
        headers[k.strip().lower()] = v.strip()
    return status, headers, content[sep + 4 :]


#: output schema of warc_ingest — one row per WARC record
WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("source_id", T.LongType(), False),
        T.StructField("record_index", T.IntegerType(), True),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("record_id", T.StringType(), True),
        T.StructField("content_length", T.LongType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("parse_ok", T.BooleanType(), False),
    ]
)


def warc_ingest(sources: DataFrame, id_col: str = "source_id", payload_col: str = "payload") -> DataFrame:
    """(id, binary WARC payload) → one row per record.  Arrow-batched
    mapInPandas; malformed payloads yield ONE parse_ok=false row, never
    a job failure (a 100 TB crawl always contains corrupt archives)."""
    import pandas as pd

    def _parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for sid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    recs = parse_warc(bytes(payload) if payload is not None else b"")
                    for i, rec in enumerate(recs):
                        hl = {k.lower(): v for k, v in rec["headers"].items()}
                        rows.append(
                            (
                                int(sid),
                                i,
                                hl.get("warc-type"),
                                hl.get("warc-target-uri"),
                                hl.get("warc-record-id"),
                                len(rec["content"]),
                                bytearray(rec["content"]),
                                True,
                            )
                        )
                except (ValueError, IndexError, zlib.error):
                    rows.append((int(sid), None, None, None, None, None, None, False))
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_RECORD_SCHEMA.fields]
            )

    return sources.select(id_col, payload_col).mapInPandas(
        _parse, schema=WARC_RECORD_SCHEMA
    )
