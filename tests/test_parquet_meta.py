"""From-scratch parquet footer reader (sources/parquet_meta.py):
full differential against DuckDB's parquet_metadata() on every
testdata table, hostile-footer guards, and the operator contract."""

from __future__ import annotations

import glob

import duckdb
import pytest

#: slow tier: full DuckDB parquet_metadata differential — run with `pytest -m slow`
pytestmark = pytest.mark.slow

from impala_cut_spark.sources.parquet_meta import (
    parquet_footer,
    parquet_meta_rows,
    read_parquet_footer,
)

TABLES = sorted(glob.glob("/root/testdata/sf0.001/*.parquet"))


class TestDifferential:
    @pytest.mark.parametrize("path", TABLES,
                             ids=[p.rsplit("/", 1)[1] for p in TABLES])
    def test_matches_duckdb_parquet_metadata(self, path):
        """Every column chunk of every testdata table: path, type,
        codec, value count, sizes and page offsets byte-identical to
        DuckDB's independent reader."""
        mine = read_parquet_footer(path)
        got = []
        for gi, rg in enumerate(mine["row_groups"]):
            for c in rg["columns"]:
                got.append((gi, c["path"], c["type"], c["codec"],
                            c["num_values"], c["total_compressed_size"],
                            c["total_uncompressed_size"],
                            c["data_page_offset"]))
        want = duckdb.sql(
            "SELECT row_group_id, path_in_schema, type, compression,"
            " num_values, total_compressed_size, total_uncompressed_size,"
            f" data_page_offset FROM parquet_metadata('{path}')"
        ).fetchall()
        # DuckDB renders nested leaf paths "a, list, element"; the
        # parquet-conventional separator (ours) is "a.list.element"
        want = [(r[0], r[1].replace(", ", "."), *r[2:]) for r in want]
        assert got == want
        n = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{path}')").fetchone()[0]
        assert mine["num_rows"] == n

    def test_row_group_rows_sum_to_file_rows(self):
        m = read_parquet_footer("/root/testdata/sf0.001/lineitem.parquet")
        assert sum(rg["num_rows"] for rg in m["row_groups"]) == m["num_rows"]


class TestHostile:
    def test_no_trailer(self):
        with pytest.raises(ValueError, match="no PAR1 trailer"):
            parquet_footer(b"not parquet at all")

    def test_footer_length_out_of_range(self):
        import struct

        bad = b"PAR1" + b"\x00" * 10 + struct.pack("<I", 1 << 30) + b"PAR1"
        with pytest.raises(ValueError, match="length out of range"):
            parquet_footer(bad)

    def test_truncated_metadata(self):
        import struct

        # plausible length but garbage thrift bytes exhaust the buffer
        body = b"\xff" * 20
        bad = b"PAR1" + body + struct.pack("<I", len(body)) + b"PAR1"
        with pytest.raises(ValueError):
            parquet_footer(bad)


class TestOperator:
    def test_rows_and_degrade(self, spark, tmp_path):
        import shutil

        shutil.copy("/root/testdata/sf0.001/nation.parquet",
                    tmp_path / "nation.parquet")
        (tmp_path / "broken.parquet").write_bytes(b"hostile bytes")
        df = parquet_meta_rows(spark, str(tmp_path), ["nation", "broken"])
        rows = df.collect()
        ok = [r for r in rows if r.parse_ok]
        assert {r.table_name for r in ok} == {"nation"}
        assert {r.column_path for r in ok} == {
            "n_nationkey", "n_name", "n_regionkey"}
        assert all(r.codec == "SNAPPY" for r in ok)
        bad = [r for r in rows if not r.parse_ok]
        assert len(bad) == 1 and bad[0].table_name == "broken"
