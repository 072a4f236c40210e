"""Archive ingestion (sources/archives.py) — APPNOTE ZIP + POSIX
ustar conformance, cross-anchored against the stdlib zipfile/tarfile
implementations in both roles (their writers feed our readers; their
readers confirm member-for-member parity on larger corpora)."""

from __future__ import annotations

import io
import os
import tarfile
import zipfile

import pytest

from impala_cut_spark.sources.archives import (
    MAX_MEMBER_BYTES,
    archive_ingest,
    archive_members,
    list_tar,
    list_zip,
)


def _zip_fixture(entries, method=zipfile.ZIP_DEFLATED) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", method) as z:
        for path, content in entries:
            z.writestr(zipfile.ZipInfo(path, (2020, 1, 1, 0, 0, 0)), content)
    return buf.getvalue()


def _tar_fixture(entries, mode="w", fmt=tarfile.GNU_FORMAT) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode=mode, format=fmt) as t:
        for path, content in entries:
            ti = tarfile.TarInfo(path)
            ti.size = len(content)
            ti.mtime = 1_600_000_000
            t.addfile(ti, io.BytesIO(content))
    return buf.getvalue()


class TestZip:
    def test_member_parity_with_stdlib_reader(self):
        entries = [(f"src/f{i:03d}.py", (f"line {i}\n" * (i % 23)).encode())
                   for i in range(150)]
        payload = _zip_fixture(entries)
        mine = {m["path"]: m for m in list_zip(payload)}
        with zipfile.ZipFile(io.BytesIO(payload)) as z:
            assert sorted(mine) == sorted(z.namelist())
            for n in z.namelist():
                assert mine[n]["content"] == z.read(n)
                assert mine[n]["size"] == z.getinfo(n).file_size

    def test_stored_and_deflate_and_dirs(self):
        payload = _zip_fixture(
            [("a.bin", os.urandom(64)), ("d/", b""), ("d/t.txt", b"x" * 999)],
            method=zipfile.ZIP_STORED)
        members = list_zip(payload)
        assert [m["is_dir"] for m in members] == [False, True, False]
        assert members[2]["content"] == b"x" * 999

    def test_crc_corruption_detected(self):
        payload = bytearray(_zip_fixture([("f.txt", b"payload bytes here")],
                                         method=zipfile.ZIP_STORED))
        i = payload.find(b"payload")
        payload[i] ^= 0xFF
        with pytest.raises(ValueError, match="CRC"):
            list_zip(bytes(payload))

    def test_bomb_guards(self):
        # a member claiming > MAX_MEMBER_BYTES must be rejected before
        # inflation; forge the central-directory uncompressed size
        payload = bytearray(_zip_fixture([("big.bin", b"tiny")]))
        cd = payload.rfind(b"PK\x01\x02")
        import struct

        struct.pack_into("<I", payload, cd + 24, MAX_MEMBER_BYTES + 1)
        with pytest.raises(ValueError, match="exceeds allowed"):
            list_zip(bytes(payload))

    def test_encrypted_member_rejected(self):
        payload = bytearray(_zip_fixture([("s.txt", b"secret")]))
        cd = payload.rfind(b"PK\x01\x02")
        payload[cd + 8] |= 0x01  # set the encryption flag bit
        with pytest.raises(ValueError, match="encrypted"):
            list_zip(bytes(payload))


class TestTar:
    @pytest.mark.parametrize("mode,kind", [("w", "tar"), ("w:gz", "tar.gz"),
                                           ("w:bz2", "tar.bz2"),
                                           ("w:xz", "tar.xz")])
    def test_all_compression_wrappers(self, mode, kind):
        entries = [("a/b.txt", b"alpha"), ("c.bin", os.urandom(700))]
        payload = _tar_fixture(entries, mode=mode)
        got_kind, members = archive_members(payload)
        assert got_kind == kind
        assert [(m["path"], m["content"]) for m in members] == entries

    def test_gnu_longname_and_pax_unicode(self):
        long_name = "deep/" + "sub_" * 40 + "leaf.rs"
        payload = _tar_fixture([(long_name, b"fn main() {}")])
        members = list_tar(payload)
        assert members[0]["path"] == long_name
        pax = _tar_fixture([("päx/ünï-" + "y" * 120 + ".txt", b"hello")],
                           fmt=tarfile.PAX_FORMAT)
        members = list_tar(pax)
        assert members[0]["path"].startswith("päx/ünï") and \
            members[0]["content"] == b"hello"

    def test_member_parity_with_stdlib_reader(self):
        entries = [(f"pkg/m{i}.py", (f"# file {i}\n" * (1 + i % 9)).encode())
                   for i in range(80)]
        payload = _tar_fixture(entries, mode="w:gz")
        mine = {m["path"]: m["content"] for m in list_tar(payload)}
        with tarfile.open(fileobj=io.BytesIO(payload)) as t:
            for ti in t.getmembers():
                assert mine[ti.name] == t.extractfile(ti).read()

    def test_truncated_archive_raises(self):
        payload = _tar_fixture([("x.txt", b"data!")])
        with pytest.raises(ValueError):
            list_tar(payload[:514])  # cut inside the member data
        bad = bytearray(payload)
        bad[124:130] = b"zzzzzz"  # non-octal size field
        with pytest.raises(ValueError):
            list_tar(bytes(bad))


class TestOperator:
    def test_rows_and_degrade(self, spark):
        zip_p = _zip_fixture([("a.txt", b"AA"), ("b.txt", b"BBB")])
        tar_p = _tar_fixture([("c.txt", b"CCCC")], mode="w:gz")
        df = spark.createDataFrame(
            [(1, bytearray(zip_p)), (2, bytearray(tar_p)), (3, b"not an archive")],
            "source_id bigint, payload binary",
        )
        rows = {(r.source_id, r.member_index): r
                for r in archive_ingest(df).collect()}
        assert rows[(1, 0)].kind == "zip" and rows[(1, 1)].size == 3
        assert bytes(rows[(2, 0)].content) == b"CCCC"
        assert rows[(3, -1)].parse_ok is False
        assert rows[(1, 0)].parse_ok and rows[(2, 0)].parse_ok

    def test_corrupt_compressed_tar_degrades(self, spark):
        # Corrupt bz2 raises OSError and corrupt xz raises LZMAError
        # inside list_tar — archive_ingest must degrade BOTH to a
        # parse_ok=false row, never a job failure (r11 ADVICE #2).
        bz2_p = bytearray(_tar_fixture([("x.txt", b"hello")], mode="w:bz2"))
        xz_p = bytearray(_tar_fixture([("y.txt", b"world")], mode="w:xz"))
        bz2_p[20] ^= 0xFF  # damage the compressed body, keep 'BZh' magic
        xz_p[20] ^= 0xFF  # damage the body, keep the xz magic
        df = spark.createDataFrame(
            [(1, bytes(bz2_p)), (2, bytes(xz_p))],
            "source_id bigint, payload binary",
        )
        rows = {r.source_id: r for r in archive_ingest(df).collect()}
        assert rows[1].parse_ok is False and rows[1].member_index == -1
        assert rows[2].parse_ok is False and rows[2].member_index == -1

    def test_zip_inflate_capped_during_decode(self):
        # A member whose deflate stream expands PAST its declared
        # central-directory usize must be stopped during inflate (the
        # r11 ADVICE #3 streaming-guard), not after materialization.
        import struct

        payload = bytearray(_zip_fixture([("bomb.bin", b"A" * 50_000)]))
        cd = payload.rfind(b"PK\x01\x02")
        struct.pack_into("<I", payload, cd + 24, 10)  # lie: usize=10
        with pytest.raises(ValueError, match="expands past|CRC|size"):
            list_zip(bytes(payload))


class TestEpub:
    def test_spine_order_not_file_order(self):
        from impala_cut_spark.sources.archives import build_epub, epub_spine

        chaps = [b"<p>one</p>", b"<p>two</p>", b"<p>three</p>"]
        assert [c for _, c in epub_spine(build_epub(chaps))] == chaps[::-1]
        assert [c for _, c in epub_spine(build_epub(chaps, spine=[1, 2, 0]))] \
            == [chaps[1], chaps[2], chaps[0]]

    def test_ocf_mimetype_member_is_first_and_stored(self):
        from impala_cut_spark.sources.archives import build_epub, list_zip

        members = list_zip(build_epub([b"<p>x</p>"]))
        assert members[0]["path"] == "mimetype"
        assert members[0]["content"] == b"application/epub+zip"

    def test_non_epub_zip_raises(self):
        from impala_cut_spark.sources.archives import epub_spine

        with pytest.raises(ValueError, match="container.xml"):
            epub_spine(_zip_fixture([("a.txt", b"not a book")]))
        # container pointing at a missing OPF
        bad = _zip_fixture([
            ("META-INF/container.xml",
             b'<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
             b'<rootfiles><rootfile full-path="gone.opf" media-type="x"/>'
             b"</rootfiles></container>"),
        ])
        with pytest.raises(ValueError, match="OPF"):
            epub_spine(bad)
