"""SequenceFile text scanner/writer (sources/seqfile.py): round-trip
parity with the text-format rules (delimiters, escaping, \\N nulls) —
the hdfs-sequence-scanner.cc analogue, exercised the way the
reference's test_scanners_all_table_formats.py drives seq tables."""

from __future__ import annotations

import pytest

from impala_cut_spark.sources.seqfile import (
    read_sequencefile_text,
    write_sequencefile_text,
)


@pytest.fixture()
def tmp_out(tmp_path):
    return str(tmp_path / "seq")


def _roundtrip(spark, tmp_out, rows, schema, **opts):
    df = spark.createDataFrame(rows, schema)
    write_sequencefile_text(df, tmp_out, **opts)
    back = read_sequencefile_text(spark, tmp_out, schema, **opts)
    key = repr  # None-safe total order
    return sorted(map(tuple, df.collect()), key=key), sorted(
        map(tuple, back.collect()), key=key
    )


def test_basic_roundtrip(spark, tmp_out):
    want, got = _roundtrip(
        spark,
        tmp_out,
        [(1, "alpha", 1.5), (2, "beta", -0.25), (3, "gamma", 0.0)],
        "id bigint, name string, x double",
    )
    assert got == want


def test_nulls_roundtrip_via_sentinel(spark, tmp_out):
    want, got = _roundtrip(
        spark,
        tmp_out,
        [(1, None, None), (2, "x", 3.5), (None, "y", None)],
        "id bigint, name string, x double",
    )
    assert got == want


def test_delimiter_inside_string_survives(spark, tmp_out):
    """to_csv quotes fields containing the delimiter; from_csv with the
    same options must un-quote them — the escaping semantics the
    reference's text scanner implements with ESCAPED BY."""
    want, got = _roundtrip(
        spark,
        tmp_out,
        [(1, "a,b,c"), (2, 'quo"te'), (3, " padded ")],
        "id bigint, s string",
    )
    assert got == want


def test_custom_delimiter(spark, tmp_out):
    want, got = _roundtrip(
        spark,
        tmp_out,
        [(1, "a|x"), (2, "b")],
        "id bigint, s string",
        sep="|",
    )
    assert got == want


def test_multipartition_scan_parallelism(spark, tmp_out):
    """A multi-part SequenceFile scans split-parallel (one Hadoop split
    per part at this size) and loses no rows."""
    df = spark.range(0, 1000).selectExpr("id", "concat('v_', id) AS s").repartition(4)
    write_sequencefile_text(df, tmp_out)
    back = read_sequencefile_text(spark, tmp_out, "id bigint, s string")
    assert back.rdd.getNumPartitions() >= 2
    assert back.count() == 1000
    assert back.agg({"id": "sum"}).collect()[0][0] == 499500


def test_stored_as_sequencefile_ddl_mount(spark, tmp_path):
    """CREATE EXTERNAL TABLE … STORED AS SEQUENCEFILE … LOCATION
    (sql-parser.y file-format surface) mounts through the reader with
    the DDL-declared schema and optional row-format delimiter."""
    from impala_cut_spark.session import ImpalaSession

    df = spark.createDataFrame([(1, "a|x"), (2, None)], "id bigint, s string")
    path = str(tmp_path / "seqtab")
    write_sequencefile_text(df, path, sep="|")
    sess = ImpalaSession(spark)
    sess.sql(
        f"CREATE EXTERNAL TABLE seq_ddl_t (id BIGINT, s STRING) "
        f"ROW FORMAT DELIMITED FIELDS TERMINATED BY '|' "
        f"STORED AS SEQUENCEFILE LOCATION '{path}'"
    )
    got = sorted(map(tuple, sess.sql("select * from seq_ddl_t").collect()), key=repr)
    assert got == sorted([(1, "a|x"), (2, None)], key=repr)
    with pytest.raises(ValueError, match="column list"):
        sess.sql(f"CREATE TABLE seq_bad STORED AS SEQUENCEFILE LOCATION '{path}'")


@pytest.mark.parametrize(
    "codec",
    [
        "org.apache.hadoop.io.compress.SnappyCodec",
        "org.apache.hadoop.io.compress.DefaultCodec",
    ],
)
def test_compressed_roundtrip(spark, tmp_out, codec):
    """Record-compressed SequenceFiles (the reference matrix's
    snap/def compression axis) decompress transparently through the
    real Hadoop reader."""
    rows = [(i, f"name_{i}", i / 7.0) for i in range(500)]
    schema = "id bigint, name string, x double"
    df = spark.createDataFrame(rows, schema)
    write_sequencefile_text(df, tmp_out, codec=codec)
    back = read_sequencefile_text(spark, tmp_out, schema)
    assert sorted(map(tuple, back.collect())) == rows
