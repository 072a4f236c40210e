"""DDL/DML statement surface through ImpalaSession.sql (SURVEY §2.11)
and the sinks module (§2.1 HdfsTableSink parity): CREATE TABLE with
Impala syntax (STORED AS, ROW FORMAT, EXTERNAL), CTAS, INSERT
INTO/OVERWRITE with static + dynamic partitions, text/parquet round
trips, COMPUTE STATS, SHOW/DESCRIBE, REFRESH.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from impala_cut_spark.session import ImpalaSession
from impala_cut_spark.sources import sinks


@pytest.fixture(scope="module")
def sess(spark):
    s = ImpalaSession(spark)
    s.sql("create database if not exists ddltest")
    s.sql("use ddltest")
    yield s
    s.sql("use default")
    s.spark.sql("drop database if exists ddltest cascade")


def test_create_stored_as_parquet_and_insert(sess):
    sess.sql("drop table if exists t1")
    sess.sql("create table t1 (x int, y string) stored as parquet")
    sess.sql("insert into t1 values (1, 'a'), (2, 'b')")
    assert sess.sql("select count(*) as n from t1").collect()[0].n == 2
    sess.sql("insert overwrite table t1 values (9, 'z')")
    rows = sess.sql("select x, y from t1").collect()
    assert [(r.x, r.y) for r in rows] == [(9, "z")]


def test_create_textfile_with_row_format(sess):
    sess.sql("drop table if exists t2")
    sess.sql(
        "create table t2 (a int, b string) "
        "row format delimited fields terminated by '|' stored as textfile"
    )
    sess.sql("insert into t2 values (1, 'x|y')")
    assert sess.sql("select b from t2").collect()[0].b == "x|y"


def test_stored_as_unsupported_format_raises(sess):
    with pytest.raises(ValueError, match="unsupported file format"):
        sess.sql("create table t_rc (x int) stored as rcfile")


def test_ctas(sess, sf_dir):
    sess.spark.read.parquet(f"{sf_dir}/nation.parquet").createOrReplaceTempView("nation_v")
    sess.sql("drop table if exists nation_copy")
    sess.sql("create table nation_copy stored as parquet as select * from nation_v")
    n = sess.sql("select count(*) as n from nation_copy").collect()[0].n
    assert n == sess.spark.table("nation_v").count()


def test_partitioned_insert_static_and_dynamic(sess):
    sess.sql("drop table if exists pt")
    sess.sql("create table pt (v int, k string) using parquet partitioned by (k)")

    # dynamic: trailing column drives the partition
    df = sess.spark.createDataFrame([(1, "a"), (2, "b")], "v int, k string")
    sinks.insert_into(df, "pt", partition={"k": None})
    # static: literal injected
    sinks.insert_into(sess.spark.createDataFrame([(3,)], "v int"), "pt", partition={"k": "c"})
    got = {(r.v, r.k) for r in sess.sql("select v, k from pt").collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c")}

    # dynamic OVERWRITE replaces only the touched partition (dynamic
    # partitionOverwriteMode — hdfs-table-sink.cc finalize semantics)
    sinks.insert_into(
        sess.spark.createDataFrame([(99, "a")], "v int, k string"),
        "pt",
        overwrite=True,
        partition={"k": None},
    )
    got = {(r.v, r.k) for r in sess.sql("select v, k from pt").collect()}
    assert got == {(99, "a"), (2, "b"), (3, "c")}


def test_compute_stats_and_show(sess):
    sess.sql("drop table if exists st")
    sess.sql("create table st (x int) using parquet")
    sess.sql("insert into st values (1), (2), (3)")
    sess.sql("compute stats st")  # → ANALYZE TABLE
    stats = sess.sql("describe extended st").collect()
    txt = "\n".join(str(r) for r in stats)
    assert "3" in txt  # row count recorded in catalog stats

    tables = {r.tableName for r in sess.sql("show tables").collect()}
    assert "st" in tables
    cols = sess.sql("describe st").collect()
    assert cols[0].col_name == "x"


def test_refresh_and_invalidate(sess):
    sess.sql("drop table if exists rt")
    sess.sql("create table rt (x int) using parquet")
    sess.sql("refresh rt")  # Impala bare-name form
    sess.sql("invalidate metadata rt")
    sess.sql("invalidate metadata")  # whole-catalog → CLEAR CACHE


def test_text_round_trip(sess, tmp_path, sf_dir):
    nation = sess.spark.read.parquet(f"{sf_dir}/nation.parquet")
    path = str(tmp_path / "nation_text")
    sinks.write_text_table(nation, path, sep="|")
    back = sinks.read_text_table(
        sess.spark, path, schema="n_nationkey bigint, n_name string, n_regionkey bigint", sep="|"
    )
    assert back.count() == nation.count()
    assert {r.n_name for r in back.collect()} == {r.n_name for r in nation.collect()}


def test_text_latin1_encoding(sess, tmp_path):
    """Charset-bearing text scan (the reference's
    delimited-latin-text.test intent): ISO-8859-1 bytes decode
    correctly with encoding=, and mojibake without it."""
    p = tmp_path / "latin1"
    p.mkdir()
    (p / "part-0.csv").write_bytes("1,caf\xe9\n2,na\xefve\n".encode("iso-8859-1"))

    good = sinks.read_text_table(
        sess.spark, str(p), schema="id int, word string", encoding="ISO-8859-1"
    )
    assert {r.word for r in good.collect()} == {"café", "naïve"}

    raw = sinks.read_text_table(sess.spark, str(p), schema="id int, word string")
    assert {r.word for r in raw.collect()} != {"café", "naïve"}


def test_text_data_errors_permissive_vs_abort(sess, tmp_path):
    """Malformed-row policy = the reference's abort_on_error option
    (tests/data_errors/, TblWithRaggedColumns): permissive scans
    null-fill ragged/unparseable fields; abort fails fast."""
    p = tmp_path / "ragged"
    p.mkdir()
    (p / "part-0.csv").write_text("1,a,2.5\n2,b\nnotanint,c,1.0\n4,d,4.25\n")

    ok = sinks.read_text_table(
        sess.spark, str(p), schema="id int, name string, v double"
    )
    rows = {(r.id, r.name, r.v) for r in ok.collect()}
    assert (1, "a", 2.5) in rows and (4, "d", 4.25) in rows
    assert (2, "b", None) in rows  # ragged row null-filled
    assert (None, "c", 1.0) in rows  # bad int null-filled

    with pytest.raises(Exception):
        sinks.read_text_table(
            sess.spark, str(p), schema="id int, name string, v double", abort_on_error=True
        ).collect()


def test_set_option_through_sql(sess):
    """SET k=v issued as SQL (impala-shell style) lands in the option
    map, not Spark's conf SET."""
    sess.sql("set mem_limit=2g")
    assert sess.options()["mem_limit"] == "2g"
    sess.sql("SET DISABLE_CODEGEN=1")
    assert sess.options()["disable_codegen"] == "1"
    assert sess.spark.conf.get("spark.sql.codegen.wholeStage") == "false"
    sess.sql("set disable_codegen=0")
    assert sess.spark.conf.get("spark.sql.codegen.wholeStage") == "true"


def test_parquet_round_trip_partitioned_write(sess, tmp_path, sf_dir):
    orders = sess.spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    sinks.cluster_by_partitions(orders, ["o_year"]).write.partitionBy("o_year").mode(
        "overwrite"
    ).parquet(path)
    back = sess.spark.read.parquet(path)
    assert back.count() == orders.count()
    # partition pruning: a year filter must prune input files
    one_year = back.filter(F.col("o_year") == 1997)
    plan = one_year._jdf.queryExecution().executedPlan().toString()
    assert one_year.count() == orders.filter(F.col("o_year") == 1997).count()
    assert "PartitionFilters: [isnotnull(o_year" in plan


def test_abort_on_error_value_case_insensitive(spark):
    """SET abort_on_error=TRUE (any case) must select FAILFAST like =1
    (round-3 self-review: the value check was case-sensitive)."""
    from impala_cut_spark.session import ImpalaSession

    s = ImpalaSession(spark)
    s.set_option("abort_on_error", "TRUE")
    from impala_cut_spark import dialect

    captured = {}
    orig = dialect.rewrite

    def spy(sql, csv_mode=None):
        captured["mode"] = csv_mode
        return orig(sql, csv_mode=csv_mode)

    dialect.rewrite = spy
    try:
        s.sql("select 1 as x")
    finally:
        dialect.rewrite = orig
    assert captured["mode"] == "FAILFAST"


def test_mixed_format_partitioned_mount(spark, tmp_path):
    """Reference mixed-format.test intent: partitions of ONE table in
    different file formats read through a single name, with partition
    pruning across formats (pruned branches constant-fold away)."""
    import pyspark.sql.functions as F

    from impala_cut_spark.sources.catalog import mount_mixed_table

    pq = str(tmp_path / "k=alpha")
    tx = str(tmp_path / "k=beta")
    spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string").write.parquet(pq)
    spark.createDataFrame([(3, "c"), (4, None)], "id int, s string").write.options(
        sep=",", nullValue=r"\N"
    ).csv(tx)
    df = mount_mixed_table(
        spark,
        "mixed_t",
        [({"k": "alpha"}, "parquet", pq), ({"k": "beta"}, "text", tx)],
        schema="id int, s string",
    )
    rows = {(r.id, r.s, r.k) for r in df.collect()}
    assert rows == {(1, "a", "alpha"), (2, "b", "alpha"), (3, "c", "beta"), (4, None, "beta")}
    # partition pruning across formats: fixing k folds the other branch
    # to an empty relation — only ONE file scan remains in the plan
    pruned = spark.sql("select id from mixed_t where k = 'beta' order by id")
    assert [r.id for r in pruned.collect()] == [3, 4]
    plan = pruned._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Relation") == 1 and "csv" in plan, plan
    spark.catalog.dropTempView("mixed_t")


def test_load_data_moves_files_into_text_table(spark, tmp_path):
    """LOAD DATA INPATH moves staged files into the table directory
    without parsing them (LoadDataStmt semantics). Spark's native
    statement refuses datasource tables, so the engine moves at the
    filesystem layer + REFRESH (round-3 fix: the old passthrough
    always failed)."""
    from impala_cut_spark.session import ImpalaSession

    s = ImpalaSession(spark)
    s.sql("drop table if exists g_load")
    s.sql(
        "create table g_load (a int, b string) row format delimited "
        "fields terminated by ',' stored as textfile"
    )
    staged = tmp_path / "part1.csv"
    staged.write_text("1,x\n2,y\n")
    s.sql(f"load data inpath '{staged}' into table g_load")
    assert not staged.exists()  # moved, not copied
    rows = {(r.a, r.b) for r in s.sql("select a, b from g_load").collect()}
    assert rows == {(1, "x"), (2, "y")}
    # append a second file, then OVERWRITE replaces everything
    staged2 = tmp_path / "part2.csv"
    staged2.write_text("3,z\n")
    s.sql(f"load data inpath '{staged2}' into table g_load")
    assert s.sql("select count(*) as n from g_load").collect()[0].n == 3
    staged3 = tmp_path / "part3.csv"
    staged3.write_text("9,w\n")
    s.sql(f"load data inpath '{staged3}' overwrite into table g_load")
    rows = {(r.a, r.b) for r in s.sql("select a, b from g_load").collect()}
    assert rows == {(9, "w")}
    s.sql("drop table g_load")


def test_load_data_into_partition(spark, tmp_path):
    from impala_cut_spark.session import ImpalaSession

    s = ImpalaSession(spark)
    s.sql("drop table if exists g_loadp")
    s.sql(
        "create table g_loadp (v int) partitioned by (k string) "
        "row format delimited fields terminated by ',' stored as textfile"
    )
    # partition must exist in the catalog for the scan to pick it up
    s.sql("alter table g_loadp add partition (k='a')")
    staged = tmp_path / "p.csv"
    staged.write_text("5\n6\n")
    s.sql(f"load data inpath '{staged}' into table g_loadp partition (k='a')")
    rows = {(r.v, r.k) for r in s.sql("select v, k from g_loadp").collect()}
    assert rows == {(5, "a"), (6, "a")}
    s.sql("drop table g_loadp")


def test_text_round_trip_preserves_whitespace(spark, tmp_path):
    """Spark's csv writer trims leading/trailing whitespace by default;
    the reference's text writer never does (round-3 fix)."""
    vals = ["plain", " lead", "trail ", "  both  ", "", "in ner"]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(vals)], "id int, s string")
    path = str(tmp_path / "ws")
    sinks.write_text_table(df, path, sep="|")
    back = sinks.read_text_table(spark, path, schema="id int, s string", sep="|")
    got = {r.id: r.s for r in back.collect()}
    for i, s in enumerate(vals):
        if s == "":
            # documented delta: empty unquoted field reads as NULL
            assert got[i] in ("", None)
        else:
            assert got[i] == s, (i, s, got[i])


def test_insert_into_text_table_preserves_whitespace(sess):
    sess.sql("drop table if exists t_ws")
    sess.sql(
        "create table t_ws (a int, b string) row format delimited "
        "fields terminated by '|' stored as textfile"
    )
    sess.sql("insert into t_ws values (1, ' padded '), (2, 'x')")
    got = {r.a: r.b for r in sess.sql("select a, b from t_ws").collect()}
    assert got == {1: " padded ", 2: "x"}
    sess.sql("drop table t_ws")


def test_default_order_by_limit_option(sess, sf_dir):
    """DEFAULT_ORDER_BY_LIMIT (ImpalaService.thrift:77-80): a top-level
    ORDER BY without LIMIT gets the default cap; explicit LIMIT wins;
    an inline-view ORDER BY doesn't trip the top-level check; unset
    restores full results."""
    from impala_cut_spark.sources.catalog import register_views

    register_views(sess.spark, sf_dir)
    try:
        sess.sql("set default_order_by_limit=5")
        assert sess.sql("select n_name from nation order by n_name").count() == 5
        assert (
            sess.sql("select n_name from nation order by n_name limit 11").count() == 11
        )
        # view-level ORDER BY ... LIMIT is its own clause; no outer cap
        assert (
            sess.sql(
                "select * from (select n_name from nation order by n_name limit 9) v"
            ).count()
            == 9
        )
        # a string literal containing 'order by' must not trip it
        n_nations = sess.sql("select 'order by trap' x, n_name from nation").count()
        assert n_nations > 5
        # `--` comments (round-5 advice): a trailing comment must not
        # swallow the appended LIMIT...
        assert (
            sess.sql(
                "select n_name from nation order by n_name -- trailing note"
            ).count()
            == 5
        )
        # ...and a commented-out ORDER BY must not trigger the cap
        assert (
            sess.sql("select n_name from nation -- order by n_name\n").count()
            == n_nations
        )
        # a LIMIT hidden inside a comment must not suppress the cap
        assert (
            sess.sql(
                "select n_name from nation order by n_name -- limit 99"
            ).count()
            == 5
        )
        sess.sql("set abort_on_default_limit_exceeded=1")  # accepted no-op
        sess.unset_option("default_order_by_limit")
        assert sess.sql("select n_name from nation order by n_name").count() == n_nations
    finally:
        sess.unset_option("default_order_by_limit")
        sess.unset_option("abort_on_default_limit_exceeded")


def test_parquet_compression_codec_option(sess, tmp_path):
    """PARQUET_COMPRESSION_CODEC snappy|gzip|none reaches the parquet
    writer (file suffixes prove the codec); 'none' maps to Spark's
    'uncompressed' spelling."""
    import os

    base = sess.spark.conf.get("spark.sql.parquet.compression.codec")
    try:
        for impala_val, suffix in [("gzip", ".gz.parquet"), ("snappy", ".snappy.parquet")]:
            sess.set_option("parquet_compression_codec", impala_val)
            p = str(tmp_path / f"t_{impala_val}")
            sess.spark.range(10).write.mode("overwrite").parquet(p)
            files = [f for f in os.listdir(p) if f.endswith(".parquet")]
            assert files and all(f.endswith(suffix) for f in files), (impala_val, files)
        sess.set_option("parquet_compression_codec", "none")
        assert (
            sess.spark.conf.get("spark.sql.parquet.compression.codec") == "uncompressed"
        )
        sess.set_option("max_scan_range_length", "1048576")
        assert sess.spark.conf.get("spark.sql.files.maxPartitionBytes") == "1048576"
    finally:
        sess.spark.conf.set("spark.sql.parquet.compression.codec", base)
        sess.unset_option("max_scan_range_length")
