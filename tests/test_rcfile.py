"""RCFile columnar scanner (sources/rcfile.py) — the
hdfs-rcfile-scanner.cc analogue.

The independent correctness anchor is the reference's REAL Hive-written
fixture (testdata/data/oldrcfile.rc → table old_rcfile_table, key INT /
value STRING — functional_schema_template.sql:1180): the reader must
produce its known contents, so reader and writer cannot be
wrong-but-consistent together."""

from __future__ import annotations

import pytest

from impala_cut_spark.sources.rcfile import (
    parse_rcfile,
    read_rcfile,
    write_rcfile,
)

REF_FIXTURE = "/root/reference/testdata/data/oldrcfile.rc"


def test_reads_hive_written_reference_fixture():
    rows = [
        [None if c is None else c.decode() for c in r]
        for r in parse_rcfile(open(REF_FIXTURE, "rb").read())
    ]
    assert rows == [
        ["1", "val_1"],
        ["3", "val_3"],
        ["4", "val_4"],
        ["5", "val_5"],
        ["10", "val_10"],
    ]


def test_column_pruning_skips_bytes():
    payload = open(REF_FIXTURE, "rb").read()
    assert [r[0] for r in parse_rcfile(payload, [0])] == [b"1", b"3", b"4", b"5", b"10"]
    assert [r[0] for r in parse_rcfile(payload, [1])][:2] == [b"val_1", b"val_3"]


def test_reference_fixture_through_spark_bridge(spark):
    df = read_rcfile(spark, REF_FIXTURE, "key int, value string")
    got = sorted((r.key, r.value) for r in df.collect())
    assert got == [(1, "val_1"), (3, "val_3"), (4, "val_4"), (5, "val_5"), (10, "val_10")]
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["int", "string"]


def test_projection_reads_single_column(spark):
    df = read_rcfile(spark, REF_FIXTURE, "key int, value string", columns=["value"])
    assert df.columns == ["value"]
    assert sorted(r.value for r in df.collect())[0] == "val_1"


@pytest.mark.parametrize("codec", [None, "DefaultCodec"])
def test_roundtrip_with_nulls_and_groups(tmp_path, codec):
    rows = [[i if i % 3 else None, f"s_{i}" if i % 4 else None] for i in range(100)]
    path = str(tmp_path / "t.rc")
    write_rcfile(rows, 2, path, rows_per_group=16, codec=codec)
    back = [
        [None if c is None else c.decode() for c in r]
        for r in parse_rcfile(open(path, "rb").read())
    ]
    want = [
        [None if a is None else str(a), b if isinstance(b, str) or b is None else str(b)]
        for a, b in rows
    ]
    assert back == want


def test_roundtrip_through_spark_with_types(spark, tmp_path):
    rows = [[1, "a", 1.5], [2, None, -2.25], [None, "c", None]]
    path = str(tmp_path / "typed.rc")
    write_rcfile(rows, 3, path)
    df = read_rcfile(spark, path, "id bigint, s string, x double")
    got = sorted(map(tuple, df.collect()), key=repr)
    assert got == sorted([(1, "a", 1.5), (2, None, -2.25), (None, "c", None)], key=repr)


def test_unsupported_codec_raises(tmp_path):
    import io
    import struct

    from impala_cut_spark.sources.rcfile import (
        KEY_CLASS,
        SEQ6_MAGIC,
        VALUE_CLASS,
        _write_text,
    )

    out = bytearray()
    out += SEQ6_MAGIC
    _write_text(out, KEY_CLASS.encode())
    _write_text(out, VALUE_CLASS.encode())
    out += b"\x01\x00"
    _write_text(out, b"com.hadoop.compression.lzo.LzoCodec")
    out += struct.pack(">i", 1)
    _write_text(out, b"hive.io.rcfile.column.number")
    _write_text(out, b"1")
    out += bytes(16)
    out += struct.pack(">iii", 10, 4, 4) + b"\x00\x00\x00\x00"
    with pytest.raises(NotImplementedError, match="codec"):
        list(parse_rcfile(bytes(out)))


def test_stored_as_rcfile_ddl_mount(spark, tmp_path):
    """CREATE EXTERNAL TABLE … STORED AS RCFILE … LOCATION mounts the
    reference's own Hive-written fixture through the reader."""
    from impala_cut_spark.session import ImpalaSession

    sess = ImpalaSession(spark)
    sess.sql(
        f"CREATE EXTERNAL TABLE rc_ddl_t (key INT, value STRING) "
        f"STORED AS RCFILE LOCATION '{REF_FIXTURE}'"
    )
    got = sorted((r.key, r.value) for r in sess.sql("select * from rc_ddl_t").collect())
    assert got[0] == (1, "val_1") and len(got) == 5
