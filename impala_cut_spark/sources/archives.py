"""ZIP / TAR archive ingestion — from-scratch readers, stdlib-anchored.

Code and document datasets ship as archives (zip, tar, tar.gz); a
training-data pipeline's ingest step explodes them into one row per
member file, executor-side, without touching disk.  The readers here
parse the PUBLIC on-disk grammars directly — ZIP's End-Of-Central-
Directory → central directory → local headers (APPNOTE.TXT layout;
stored and deflate members via zlib, CRC-verified), and the POSIX
ustar 512-byte header blocks (octal and GNU base-256 sizes, longname
'L' extensions, pax 'x' headers' path override) — and are
cross-validated both directions against the stdlib zipfile/tarfile
implementations in tests/test_archives.py (the same from-scratch +
independent-anchor pattern as the LZO/RCFile readers).

Decompression-bomb guards: per-member and total decoded caps, member
count cap — one hostile archive can't take down an executor (the
decode_http_body precedent).  Malformed archives degrade to one
parse_ok=false row through archive_ingest, never a job failure.

The reference engine has no archive surface (extension component —
SURVEY.md pipeline ops).
"""

from __future__ import annotations

import bz2
import lzma
import struct
import zlib
from collections.abc import Iterator

__all__ = ["list_zip", "list_tar", "archive_members", "archive_ingest",
           "ARCHIVE_MEMBER_SCHEMA"]

#: bomb guards (archive_members raises past these; the operator layer
#: degrades that to parse_ok=false)
MAX_MEMBERS = 100_000
MAX_MEMBER_BYTES = 256 * 1024 * 1024
MAX_TOTAL_BYTES = 1 << 31


def _inflate_capped(raw: bytes, cap: int) -> bytes:
    """Raw-deflate decode that enforces ``cap`` DURING decompression
    (the warc.py _zlib_capped pattern): a ~51 KB hostile deflate
    stream can expand 1000×, so checking len() after a full
    zlib.decompress() bounds nothing.  decompress(raw, cap+1) stops
    the inflater at the cap; overflow shows up as output past the cap
    or unconsumed input."""
    d = zlib.decompressobj(wbits=-15)
    out = d.decompress(raw, cap + 1)
    if len(out) > cap or (d.unconsumed_tail and not d.eof):
        raise ValueError("zip: member expands past its declared size")
    return out


def _stream_capped(decomp, raw: bytes, cap: int, label: str) -> bytes:
    """Drive an incremental decompressor (BZ2Decompressor /
    LZMADecompressor / zlib obj) with max_length so peak memory is
    bounded by ``cap`` during decode, not checked after full
    materialization."""
    out = decomp.decompress(raw, cap + 1)
    if len(out) > cap:
        raise ValueError(f"{label}: archive exceeds allowed total size")
    return out


def list_zip(payload: bytes) -> list[dict]:
    """Parse a ZIP from the central directory (the authoritative
    index per APPNOTE — local headers alone miss edits): EOCD scan →
    central entries → local header skip → stored/deflate inflate with
    CRC check.  ZIP64 and encrypted members raise (documented
    boundaries; real code dumps are vanilla deflate)."""
    eocd = payload.rfind(b"PK\x05\x06")
    if eocd < 0:
        raise ValueError("zip: no end-of-central-directory")
    (n_entries,) = struct.unpack_from("<H", payload, eocd + 10)
    cd_size, cd_off = struct.unpack_from("<II", payload, eocd + 12)
    if n_entries == 0xFFFF or cd_off == 0xFFFFFFFF:
        raise ValueError("zip: ZIP64 archives not supported")
    if n_entries > MAX_MEMBERS:
        raise ValueError("zip: too many members")
    out = []
    pos = cd_off
    total = 0
    for _ in range(n_entries):
        if payload[pos : pos + 4] != b"PK\x01\x02":
            raise ValueError("zip: bad central directory signature")
        (flags, method, mtime, mdate, crc, csize, usize, nlen, elen, clen) = (
            struct.unpack_from("<HHHHIIIHHH", payload, pos + 8)
        )
        (lho,) = struct.unpack_from("<I", payload, pos + 42)
        name = payload[pos + 46 : pos + 46 + nlen].decode("utf-8", "replace")
        pos += 46 + nlen + elen + clen
        if flags & 0x01:
            raise ValueError("zip: encrypted member")
        if usize > MAX_MEMBER_BYTES:
            raise ValueError("zip: member exceeds allowed size")
        total += usize
        if total > MAX_TOTAL_BYTES:
            raise ValueError("zip: archive exceeds allowed total size")
        # local header: skip its (possibly different-length) name/extra
        if payload[lho : lho + 4] != b"PK\x03\x04":
            raise ValueError("zip: bad local header signature")
        lnlen, lelen = struct.unpack_from("<HH", payload, lho + 26)
        data_off = lho + 30 + lnlen + lelen
        raw = payload[data_off : data_off + csize]
        if method == 0:
            content = raw
        elif method == 8:
            # cap at the declared usize DURING inflate — usize itself
            # is attacker-controlled but already bounded by the
            # MAX_MEMBER_BYTES / MAX_TOTAL_BYTES checks above
            content = _inflate_capped(raw, usize)
        else:
            raise ValueError(f"zip: unsupported compression method {method}")
        if len(content) != usize or (zlib.crc32(content) & 0xFFFFFFFF) != crc:
            raise ValueError(f"zip: member {name!r} fails CRC/size check")
        # DOS timestamp → epoch-ish tuple; keep the raw fields
        out.append({
            "path": name,
            "size": usize,
            "is_dir": name.endswith("/"),
            "mtime_dos": (mdate << 16) | mtime,
            "content": b"" if name.endswith("/") else content,
        })
    return out


def _octal(field: bytes) -> int:
    field = field.split(b"\x00")[0].strip()
    if not field:
        return 0
    if field[0] & 0x80:  # GNU base-256
        v = 0
        for b in field:
            v = (v << 8) | b
        return v - (0x80 << (8 * (len(field) - 1)))
    return int(field, 8)


def list_tar(payload: bytes) -> list[dict]:
    """Parse a (possibly gzip/bzip2/xz-compressed) POSIX tar: 512-byte
    ustar headers, octal/base-256 sizes, GNU './@LongLink' 'L' name
    extensions and pax 'x' extended headers (path keyword)."""
    # streaming decompressors with max_length so the total cap bounds
    # PEAK memory during decode, not just the materialized result
    if payload[:2] == b"\x1f\x8b":
        payload = _stream_capped(
            zlib.decompressobj(wbits=31), payload, MAX_TOTAL_BYTES, "tar")
    elif payload[:3] == b"BZh":
        payload = _stream_capped(
            bz2.BZ2Decompressor(), payload, MAX_TOTAL_BYTES, "tar")
    elif payload[:6] == b"\xfd7zXZ\x00":
        payload = _stream_capped(
            lzma.LZMADecompressor(), payload, MAX_TOTAL_BYTES, "tar")
    if len(payload) > MAX_TOTAL_BYTES:
        raise ValueError("tar: archive exceeds allowed total size")
    out = []
    pos = 0
    pending_name: str | None = None
    pending_pax: dict[str, str] = {}
    while pos + 512 <= len(payload):
        hdr = payload[pos : pos + 512]
        if hdr == b"\x00" * 512:
            break
        name = hdr[0:100].split(b"\x00")[0].decode("utf-8", "replace")
        size = _octal(hdr[124:136])
        mtime = _octal(hdr[136:148])
        typeflag = hdr[156:157]
        magic = hdr[257:263]
        if magic not in (b"ustar\x00", b"ustar ", b"\x00" * 6):
            raise ValueError("tar: bad ustar magic")
        prefix = hdr[345:500].split(b"\x00")[0].decode("utf-8", "replace")
        if prefix and magic.startswith(b"ustar\x00"):
            name = prefix + "/" + name
        data = payload[pos + 512 : pos + 512 + size]
        pos += 512 + ((size + 511) // 512) * 512
        if len(data) != size:
            raise ValueError("tar: truncated member data")
        if typeflag == b"L":  # GNU longname: data = next member's name
            pending_name = data.split(b"\x00")[0].decode("utf-8", "replace")
            continue
        if typeflag in (b"x", b"g"):  # pax extended header records
            for line in data.split(b"\n"):
                if b" " in line and b"=" in line:
                    kv = line.split(b" ", 1)[1]
                    k, _, v = kv.partition(b"=")
                    if typeflag == b"x":
                        pending_pax[k.decode()] = v.decode("utf-8", "replace")
            continue
        if pending_name is not None:
            name = pending_name
            pending_name = None
        if "path" in pending_pax:
            name = pending_pax.pop("path")
        pending_pax.clear()
        if size > MAX_MEMBER_BYTES:
            raise ValueError("tar: member exceeds allowed size")
        if len(out) >= MAX_MEMBERS:
            raise ValueError("tar: too many members")
        is_dir = typeflag == b"5" or name.endswith("/")
        if typeflag in (b"0", b"\x00", b"5", b"2", b"1"):
            out.append({
                "path": name,
                "size": 0 if is_dir else size,
                "is_dir": is_dir,
                "mtime": mtime,
                "content": b"" if is_dir else data,
            })
        # other typeflags (devices, fifos): skipped, not ingestible
    return out


def archive_members(payload: bytes) -> tuple[str, list[dict]]:
    """Route on magic: (kind, members).  kind ∈ zip | tar | tar.gz |
    tar.bz2 | tar.xz."""
    if payload[:4] in (b"PK\x03\x04", b"PK\x05\x06"):
        return "zip", list_zip(payload)
    if payload[:2] == b"\x1f\x8b":
        return "tar.gz", list_tar(payload)
    if payload[:3] == b"BZh":
        return "tar.bz2", list_tar(payload)
    if payload[:6] == b"\xfd7zXZ\x00":
        return "tar.xz", list_tar(payload)
    if len(payload) >= 512 and payload[257:263] in (b"ustar\x00", b"ustar "):
        return "tar", list_tar(payload)
    raise ValueError("archive: unrecognized container magic")


#: output schema of archive_ingest — one row per member file
ARCHIVE_MEMBER_SCHEMA = (
    "source_id bigint, kind string, member_index int, path string, "
    "size bigint, is_dir boolean, content binary, parse_ok boolean"
)


def archive_ingest(
    sources, id_col: str = "source_id", payload_col: str = "payload"
):
    """(id, binary archive payload) → one row per member.  Arrow-
    batched mapInPandas, one archive resident at a time; malformed or
    bomb-guarded payloads yield ONE parse_ok=false row, never a job
    failure (the warc_ingest contract).  Scale: a narrow map with no
    shuffle — at 100 TB the explode runs where the scan runs, and the
    per-member rows feed the text/dedup operators directly."""
    import pandas as pd

    def _parse(batches) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for sid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    kind, members = archive_members(raw)
                    for i, m in enumerate(members):
                        rows.append(
                            (int(sid), kind, i, m["path"], m["size"],
                             m["is_dir"], bytearray(m["content"]), True)
                        )
                except (ValueError, KeyError, IndexError, struct.error,
                        OverflowError, EOFError, zlib.error,
                        OSError, lzma.LZMAError) as _:
                    # OSError: bz2.decompress on corrupt data;
                    # LZMAError: corrupt xz — both must degrade to a
                    # parse_ok=false row, never a job failure
                    rows.append((int(sid), None, -1, None, None, None,
                                 None, False))
            yield pd.DataFrame(
                rows,
                columns=["source_id", "kind", "member_index", "path",
                         "size", "is_dir", "content", "parse_ok"],
            )

    return sources.mapInPandas(_parse, ARCHIVE_MEMBER_SCHEMA)


# -- EPUB (the books container: ZIP + OCF/OPF spine) ----------------------------


def epub_spine(payload: bytes) -> list[tuple[str, bytes]]:
    """EPUB → [(chapter path, xhtml bytes)] in SPINE order (the
    reading order, which need not match file order): OCF
    META-INF/container.xml → the OPF package document → manifest
    id→href map → spine itemrefs.  Raises on non-EPUB zips (no
    container.xml / rootfile)."""
    import xml.etree.ElementTree as ET

    members = {m["path"]: m["content"] for m in list_zip(payload)}
    container = members.get("META-INF/container.xml")
    if container is None:
        raise ValueError("epub: missing META-INF/container.xml")
    cns = "{urn:oasis:names:tc:opendocument:xmlns:container}"
    rootfile = ET.fromstring(container).find(f".//{cns}rootfile")
    if rootfile is None:
        raise ValueError("epub: container.xml has no rootfile")
    opf_path = rootfile.attrib["full-path"]
    if opf_path not in members:
        raise ValueError("epub: OPF package document missing")
    ons = "{http://www.idpf.org/2007/opf}"
    opf = ET.fromstring(members[opf_path])
    manifest = {i.attrib["id"]: i.attrib["href"]
                for i in opf.findall(f".//{ons}item")}
    base = opf_path.rsplit("/", 1)[0] + "/" if "/" in opf_path else ""
    out = []
    for ref in opf.findall(f".//{ons}itemref"):
        href = manifest.get(ref.attrib["idref"])
        if href is None:
            raise ValueError("epub: spine itemref with no manifest item")
        path = base + href
        if path not in members:
            raise ValueError(f"epub: spine chapter {path!r} missing")
        out.append((path, members[path]))
    if not out:
        raise ValueError("epub: empty spine")
    return out


def build_epub(chapters: list[bytes], spine: list[int] | None = None) -> bytes:
    """Mux xhtml chapter bodies into a minimal valid EPUB (stored
    mimetype member first per OCF, container.xml, OPF manifest+spine,
    OEBPS chapter files) — the fixture twin of epub_spine.  ``spine``
    permutes reading order against file order (the default reverses
    it, so consumers that ignore the spine are caught)."""
    import io
    import zipfile

    n = len(chapters)
    spine = spine if spine is not None else list(range(n - 1, -1, -1))
    items = "".join(
        f'<item id="c{i}" href="chap_{i}.xhtml" '
        f'media-type="application/xhtml+xml"/>' for i in range(n))
    refs = "".join(f'<itemref idref="c{i}"/>' for i in spine)
    opf = (
        '<?xml version="1.0"?>'
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0" '
        'unique-identifier="id"><metadata/>'
        f"<manifest>{items}</manifest><spine>{refs}</spine></package>"
    ).encode()
    container = (
        '<?xml version="1.0"?>'
        '<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container" '
        'version="1.0"><rootfiles>'
        '<rootfile full-path="OEBPS/content.opf" '
        'media-type="application/oebps-package+xml"/>'
        "</rootfiles></container>"
    ).encode()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        mt = zipfile.ZipInfo("mimetype", (2020, 1, 1, 0, 0, 0))
        mt.compress_type = zipfile.ZIP_STORED  # OCF: first and stored
        z.writestr(mt, "application/epub+zip")
        z.writestr(zipfile.ZipInfo("META-INF/container.xml",
                                   (2020, 1, 1, 0, 0, 0)), container)
        z.writestr(zipfile.ZipInfo("OEBPS/content.opf",
                                   (2020, 1, 1, 0, 0, 0)), opf)
        for i, body in enumerate(chapters):
            z.writestr(zipfile.ZipInfo(f"OEBPS/chap_{i}.xhtml",
                                       (2020, 1, 1, 0, 0, 0)), body)
    return buf.getvalue()
