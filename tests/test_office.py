"""Office Open XML ingestion (operators/office.py): DOCX/XLSX
round-trips through the from-scratch zip walk, hostile-input degrade
paths (DOCTYPE gate, bad shared-string indices, truncated
containers), and the office_extract operator contract.

Independent anchor: the fixtures are written by the STDLIB zipfile
writer twins (build_docx/build_xlsx), so every round-trip re-validates
sources/archives.list_zip against an external producer."""

from __future__ import annotations

import zipfile

import pytest

from impala_cut_spark.operators.office import (
    build_docx,
    build_xlsx,
    docx_text,
    office_extract,
    xlsx_cells,
)


class TestDocx:
    def test_roundtrip_text_title_creator(self):
        d = build_docx(
            ["first paragraph here", "second one", "", "third"],
            title="My Title", creator="An Author",
        )
        out = docx_text(d)
        assert out["n_paragraphs"] == 3  # empty paragraph not counted
        assert out["text"] == "first paragraph here\nsecond one\n\nthird"
        assert out["title"] == "My Title"
        assert out["creator"] == "An Author"

    def test_xml_escaping_roundtrip(self):
        d = build_docx(['a < b & "c" > d'], title="<&>")
        out = docx_text(d)
        assert out["text"] == 'a < b & "c" > d'
        assert out["title"] == "<&>"

    def test_tabs_and_breaks(self):
        """<w:tab/> → space, <w:br/> → newline inside a run — build a
        part by hand since the writer twin only emits plain runs."""
        import io

        doc = (
            '<?xml version="1.0"?>'
            '<w:document xmlns:w="http://schemas.openxmlformats.org/'
            'wordprocessingml/2006/main"><w:body><w:p><w:r>'
            "<w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/><w:t>c</w:t>"
            "</w:r></w:p></w:body></w:document>"
        )
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("word/document.xml", doc)
        out = docx_text(buf.getvalue())
        assert out["text"] == "a b\nc"
        assert out["title"] is None  # no core.xml part

    def test_missing_document_part_raises(self):
        import io

        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("other.xml", "<x/>")
        with pytest.raises(ValueError, match="no word/document.xml"):
            docx_text(buf.getvalue())

    def test_doctype_rejected(self):
        """The billion-laughs gate: a DTD in any part must fail the
        parse, not expand."""
        import io

        bomb = (
            '<?xml version="1.0"?><!DOCTYPE x [<!ENTITY a "aaaa">]>'
            '<w:document xmlns:w="http://schemas.openxmlformats.org/'
            'wordprocessingml/2006/main"><w:body><w:p><w:r><w:t>&a;'
            "</w:t></w:r></w:p></w:body></w:document>"
        )
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("word/document.xml", bomb)
        with pytest.raises(ValueError, match="DTD not allowed"):
            docx_text(buf.getvalue())


class TestXlsx:
    def test_shared_inline_numeric_and_order(self):
        x = build_xlsx(
            [[["alpha", "beta"], ["gamma"]], [["delta", 7], [2.5, "echo"]]],
            inline_from_sheet=1,
        )
        out = xlsx_cells(x)
        assert out["n_sheets"] == 2
        assert out["n_cells"] == 7
        assert out["n_shared"] == 3
        assert out["n_inline"] == 2
        assert out["n_numeric"] == 2
        # sheet order then row-major order, strings only
        assert out["text"] == "alpha beta gamma delta echo"

    def test_duplicate_shared_strings_keep_positions(self):
        x = build_xlsx([[["x", "y", "x"]]])
        out = xlsx_cells(x)
        assert out["text"] == "x y x"
        assert out["n_shared"] == 3

    def test_bad_shared_index_raises(self):
        import io

        sheet = (
            '<?xml version="1.0"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main"><sheetData><row r="1">'
            '<c r="A1" t="s"><v>99</v></c></row></sheetData></worksheet>'
        )
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("xl/worksheets/sheet1.xml", sheet)
        with pytest.raises(ValueError, match="shared-string index"):
            xlsx_cells(buf.getvalue())

    def test_no_worksheets_raises(self):
        import io

        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("xl/workbook.xml", "<x/>")
        with pytest.raises(ValueError, match="no worksheet"):
            xlsx_cells(buf.getvalue())

    def test_not_a_zip_raises(self):
        with pytest.raises(ValueError, match="not a ZIP"):
            xlsx_cells(b"\xd0\xcf\x11\xe0 legacy cfb container")


class TestOfficeExtractOperator:
    def test_rows_kinds_and_degrade(self, spark):
        docx = build_docx(["hello world"], title="t1")
        xlsx = build_xlsx([[["a", "b"], [1]]])
        rows = {
            r.source_id: r
            for r in office_extract(
                spark.createDataFrame(
                    [(1, bytearray(docx)), (2, bytearray(xlsx)),
                     (3, b"garbage"), (4, None)],
                    "source_id bigint, payload binary",
                )
            ).collect()
        }
        assert rows[1].kind == "docx" and rows[1].parse_ok
        assert rows[1].n_units == 1 and rows[1].title == "t1"
        assert rows[1].n_parts == 4
        assert rows[2].kind == "xlsx" and rows[2].parse_ok
        assert rows[2].n_units == 2 and rows[2].n_numeric == 1
        assert rows[2].text == "a b"
        assert not rows[3].parse_ok and rows[3].kind is None
        assert not rows[4].parse_ok


def test_hypothesis_docx_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    # XML 1.0-legal text (no control chars); \r normalizes in XML
    xtext = st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs", "Cc"), max_codepoint=0x2FFF),
        max_size=80,
    ).map(lambda s: s.replace("\r", " "))

    @settings(max_examples=50, deadline=None)
    @given(st.lists(xtext, max_size=8),
           st.one_of(st.none(), xtext.filter(bool)))
    def check(paras, title):
        out = docx_text(build_docx(paras, title=title))
        assert out["text"] == "\n".join(paras)
        assert out["title"] == title
        assert out["n_paragraphs"] == sum(1 for p in paras if p.strip())

    check()


def test_hypothesis_xlsx_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    xtext = st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs", "Cc"), max_codepoint=0x2FFF),
        max_size=40,
    ).map(lambda s: s.replace("\r", " "))
    cell = st.one_of(xtext, st.integers(-10**6, 10**6))
    sheet = st.lists(st.lists(cell, max_size=5), max_size=4)

    @settings(max_examples=50, deadline=None)
    @given(st.lists(sheet, min_size=1, max_size=3), st.integers(0, 3))
    def check(sheets, inline_from):
        out = xlsx_cells(build_xlsx(sheets, inline_from_sheet=inline_from))
        flat = [v for s in sheets for row in s for v in row]
        strings = [v for v in flat if isinstance(v, str)]
        assert out["n_sheets"] == len(sheets)
        assert out["n_cells"] == len(flat)
        assert out["n_shared"] + out["n_inline"] == len(strings)
        assert out["n_numeric"] == len(flat) - len(strings)
        assert out["text"] == " ".join(strings)

    check()


def test_truncated_zip_degrades_not_raises(spark):
    """r12 hardening: hostile container bytes that blow up inside the
    zip walk (struct on truncated central directory, zlib on corrupt
    deflate) must degrade to parse_ok=false, never fail the job."""
    good = build_docx(["hello paragraph body long enough to deflate"])
    # EOCD magic present but the record truncated → struct.error in
    # the zip walk
    short_eocd = b"PK\x03\x04" + b"\x00" * 8 + b"PK\x05\x06\x00\x00"
    # flip bytes inside word/document.xml's deflate stream → zlib
    # error or CRC mismatch
    corrupt = bytearray(good)
    at = good.find(b"word/document.xml") + len(b"word/document.xml")
    corrupt[at + 4 : at + 12] = b"\xff" * 8
    df = spark.createDataFrame(
        [(1, bytearray(short_eocd)), (2, bytes(corrupt))],
        "source_id bigint, payload binary",
    )
    rows = office_extract(df).collect()
    assert len(rows) == 2
    assert not any(r.parse_ok for r in rows)
