"""Avro scan parity (SURVEY §2.1 — hdfs-avro-scanner.cc analogue).

The pure-Python container reader (sources/avro.py) replaces the absent
spark-avro module: spec-level round-trips, both codecs, nullable
unions, per-file partitioning, and the STORED AS AVRO … LOCATION DDL
mount through ImpalaSession.
"""

from __future__ import annotations

import pytest

from impala_cut_spark.sources.avro import (
    avro_ddl_schema,
    read_avro,
    read_avro_file,
    write_avro,
)

FIELDS = [
    ("id", "long"),
    ("name", "string"),
    ("x", "double"),
    ("flag", "boolean"),
    ("opt", ["null", "long"]),
]
ROWS = [
    (1, "alpha", 1.5, True, None),
    (2, "béta", -2.25, False, 7),
    (-3, "", 0.0, True, 2**40),
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(tmp_path, codec):
    p = str(tmp_path / f"t_{codec}.avro")
    write_avro(p, FIELDS, ROWS, codec=codec)
    assert list(read_avro_file(p)) == ROWS
    assert (
        avro_ddl_schema(p)
        == "id bigint, name string, x double, flag boolean, opt bigint"
    )


def test_spark_scan_multi_file_partitions(spark, tmp_path):
    for i in range(3):
        write_avro(
            str(tmp_path / f"part{i}.avro"),
            FIELDS,
            [(i * 10 + j, f"r{i}", 0.5 * j, True, None) for j in range(4)],
            codec="deflate",
        )
    df = read_avro(spark, str(tmp_path))  # directory → *.avro glob
    assert df.count() == 12
    assert df.rdd.getNumPartitions() == 3  # one scan range per file
    assert df.filter("id >= 20").count() == 4
    assert df.schema.simpleString().startswith("struct<id:bigint,name:string")


def test_stored_as_avro_location_ddl(spark, tmp_path):
    from impala_cut_spark.session import ImpalaSession

    p = str(tmp_path / "ddl.avro")
    write_avro(p, [("id", "long"), ("name", "string")], [(1, "a"), (2, "b")])
    sess = ImpalaSession(spark)
    sess.sql(f"CREATE EXTERNAL TABLE av_ddl_t STORED AS AVRO LOCATION '{p}'")
    got = sess.sql("SELECT id, upper(name) AS nm FROM av_ddl_t ORDER BY id").collect()
    assert [tuple(r) for r in got] == [(1, "A"), (2, "B")]
    spark.catalog.dropTempView("av_ddl_t")


def test_stored_as_avro_without_location_raises(spark):
    from impala_cut_spark.session import ImpalaSession

    sess = ImpalaSession(spark)
    with pytest.raises(Exception, match="read-only|LOCATION"):
        sess.sql("CREATE TABLE av_bad (a INT) STORED AS AVRO")


def test_unsupported_codec_and_schema_raise(tmp_path):
    p = str(tmp_path / "x.avro")
    write_avro(p, [("id", "long")], [(1,)])
    data = open(p, "rb").read().replace(b"null", b"zstd", 1)  # codec meta
    open(p, "wb").write(data)
    with pytest.raises(ValueError, match="codec"):
        list(read_avro_file(p))
    with pytest.raises(Exception):
        write_avro(str(tmp_path / "y.avro"), [("m", {"type": "map"})], [({},)])
