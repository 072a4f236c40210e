"""ALTER TABLE / CREATE TABLE LIKE [FILE] / views / SHOW surfaces
(SURVEY §2.11; DDL op enum JniCatalog.thrift:25-41, grammar
sql-parser.y:661-940).
"""

from __future__ import annotations

import pytest

from impala_cut_spark.session import ImpalaSession


@pytest.fixture(scope="module")
def sess(spark):
    s = ImpalaSession(spark)
    s.sql("create database if not exists altertest")
    s.sql("use altertest")
    yield s
    s.sql("use default")
    s.spark.sql("drop database if exists altertest cascade")


def test_alter_add_columns(sess):
    sess.sql("drop table if exists a1")
    sess.sql("create table a1 (x int) stored as parquet")
    sess.sql("insert into a1 values (1)")
    sess.sql("alter table a1 add columns (y string, z double)")
    cols = [r.col_name for r in sess.sql("describe a1").collect()]
    assert cols == ["x", "y", "z"]
    # pre-existing rows read NULL for the new columns
    row = sess.sql("select x, y, z from a1").collect()[0]
    assert (row.x, row.y, row.z) == (1, None, None)


def test_alter_rename(sess):
    sess.sql("drop table if exists a2")
    sess.sql("drop table if exists a2_renamed")
    sess.sql("create table a2 (x int) stored as parquet")
    sess.sql("alter table a2 rename to a2_renamed")
    tables = {r.tableName for r in sess.sql("show tables").collect()}
    assert "a2_renamed" in tables and "a2" not in tables


def test_alter_set_tblproperties(sess):
    sess.sql("drop table if exists a3")
    sess.sql("create table a3 (x int) stored as parquet")
    sess.sql("alter table a3 set tblproperties ('owner_team' = 'data-eng')")
    props = sess.sql("show tblproperties a3").collect()
    assert {"owner_team": "data-eng"}.items() <= {r.key: r.value for r in props}.items()


def test_alter_partition_add_drop(sess):
    sess.sql("drop table if exists a4")
    sess.sql("create table a4 (v int, k string) using parquet partitioned by (k)")
    sess.sql("alter table a4 add partition (k='x')")
    parts = [r.partition for r in sess.sql("show partitions a4").collect()]
    assert "k=x" in parts
    sess.sql("alter table a4 drop partition (k='x')")
    parts = [r.partition for r in sess.sql("show partitions a4").collect()]
    assert parts == []


def test_create_table_like(sess):
    sess.sql("drop table if exists src_t")
    sess.sql("drop table if exists like_t")
    sess.sql("create table src_t (a int, b string) stored as parquet")
    sess.sql("create table like_t like src_t")
    src = [(r.col_name, r.data_type) for r in sess.sql("describe src_t").collect()]
    dst = [(r.col_name, r.data_type) for r in sess.sql("describe like_t").collect()]
    assert src == dst
    assert sess.sql("select count(*) as n from like_t").collect()[0].n == 0


def test_create_table_like_parquet_file(sess, sf_dir):
    sess.sql("drop table if exists like_file_t")
    sess.sql(f"create table like_file_t like parquet '{sf_dir}/nation.parquet' stored as parquet")
    cols = {r.col_name: r.data_type for r in sess.sql("describe like_file_t").collect()}
    assert cols == {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"}


def test_views_create_alter_drop(sess, sf_dir):
    # persistent views must reference persistent objects
    sess.sql("drop table if exists region_base")
    sess.sql(f"create table region_base like parquet '{sf_dir}/region.parquet' stored as parquet")
    sess.spark.read.parquet(f"{sf_dir}/region.parquet").write.insertInto("region_base")
    sess.sql("drop view if exists v1")
    sess.sql(
        "create view v1 as select r_regionkey, r_name from region_base where r_regionkey < 3"
    )
    assert sess.sql("select count(*) as n from v1").collect()[0].n == 3
    sess.sql("alter view v1 as select r_regionkey from region_base")
    assert sess.sql("select * from v1").columns == ["r_regionkey"]
    sess.sql("drop view v1")
    assert "v1" not in {r.tableName for r in sess.sql("show tables").collect()}


def test_show_surfaces(sess):
    dbs = {r.namespace for r in sess.sql("show databases").collect()}
    assert "altertest" in dbs
    fns = {r.function.split(".")[-1] for r in sess.sql("show functions").collect()}
    assert "abs" in fns
    sess.sql("drop table if exists sct")
    sess.sql("create table sct (x int) stored as parquet")
    ddl = " ".join(r.result for r in sess.sql("show create table sct").collect())
    assert "sct" in ddl and "parquet" in ddl.lower()


def test_explain_levels(sess, sf_dir):
    sess.spark.read.parquet(f"{sf_dir}/nation.parquet").createOrReplaceTempView("nation_ev")
    for level in ("minimal", "standard", "extended"):
        out = sess.explain("select count(*) from nation_ev", level=level)
        assert "Aggregate" in out or "aggregate" in out.lower()
    # verbose maps to codegen mode; on an unexecuted AQE plan it may
    # legitimately report zero subtrees — assert it answers at all
    assert sess.explain("select count(*) from nation_ev", level="verbose").strip()
    with pytest.raises(ValueError, match="unknown explain level"):
        sess.explain("select 1", level="nope")


def test_show_create_table_roundtrip(sess):
    """SHOW CREATE TABLE renders Impala-dialect DDL from the catalog
    (ToSqlUtils.getCreateTableSql; show-create-table.test) that this
    engine itself can re-execute: drop + replay must reproduce the
    identical column/partition layout."""
    sess.sql("drop table if exists sct1")
    sess.sql(
        "create table sct1 (a int, b string, c decimal(10,2)) "
        "partitioned by (k string) stored as parquet"
    )
    before = [(c.name, c.dataType, c.isPartition) for c in sess.spark.catalog.listColumns("sct1")]
    ddl = [r.result for r in sess.sql("show create table sct1").collect()]
    assert ddl[0].startswith("CREATE TABLE sct1 (")
    assert "PARTITIONED BY (k string)" in ddl
    assert "STORED AS PARQUET" in ddl
    sess.sql("drop table sct1")
    sess.sql(" ".join(ddl))
    after = [(c.name, c.dataType, c.isPartition) for c in sess.spark.catalog.listColumns("sct1")]
    assert after == before
    sess.sql("drop table sct1")


def test_show_create_table_text_row_format(sess):
    """Text tables emit their ROW FORMAT DELIMITED separators back out
    (HdfsTable delimiter metadata -> ToSqlUtils row-format clause)."""
    sess.sql("drop table if exists sct2")
    sess.sql(
        "create table sct2 (x int, y string) row format delimited "
        "fields terminated by '|' stored as textfile"
    )
    ddl = [r.result for r in sess.sql("show create table sct2").collect()]
    assert "ROW FORMAT DELIMITED FIELDS TERMINATED BY '|'" in ddl
    assert "STORED AS TEXTFILE" in ddl
    sess.sql("drop table sct2")


def test_show_create_table_comma_delimiter(sess):
    """A comma FIELD delimiter must survive SHOW CREATE TABLE — the
    DESCRIBE storage-properties string is comma-separated itself, so
    options are read from Spark's quoted DDL instead (round-3 review)."""
    sess.sql("drop table if exists sct3")
    sess.sql(
        "create table sct3 (x int, y string) row format delimited "
        "fields terminated by ',' stored as textfile"
    )
    ddl = [r.result for r in sess.sql("show create table sct3").collect()]
    assert "ROW FORMAT DELIMITED FIELDS TERMINATED BY ','" in ddl, ddl
    sess.sql("drop table sct3")


def test_show_create_table_view_variant_forms(sess):
    """CREATE OR REPLACE VIEW / CREATE VIEW IF NOT EXISTS / qualified
    names must all be recorded as view definitions so SHOW CREATE
    TABLE renders CREATE VIEW ... AS, not a column-list CREATE TABLE
    (round-4 advice: the recorder regex missed these forms)."""
    sess.sql("drop table if exists vbase")
    sess.sql("create table vbase (x int) stored as parquet")
    sess.sql("insert into vbase values (1), (2)")

    sess.sql("drop view if exists v_orr")
    sess.sql("create or replace view v_orr as select x from vbase where x > 1")
    out = " ".join(r.result for r in sess.sql("show create table v_orr").collect())
    assert "CREATE VIEW" in out and "select x from vbase where x > 1" in out

    sess.sql("drop view if exists v_ine")
    sess.sql("create view if not exists v_ine as select x + 1 as y from vbase")
    out = " ".join(r.result for r in sess.sql("show create table v_ine").collect())
    assert "CREATE VIEW" in out and "select x + 1 as y from vbase" in out

    # qualified names are rejected up front by the dialect layer (views
    # are session temp views in Spark — cannot be db-qualified); the
    # recorder never sees them, so nothing phantom is recorded
    with pytest.raises(ValueError, match="qualified name"):
        sess.sql("create view vdb.v_q as select x from vbase")
    assert "vdb.v_q" not in sess._view_defs and "v_q" not in sess._view_defs
    for v in ("v_orr", "v_ine"):
        sess.sql(f"drop view if exists {v}")
    sess.sql("drop table if exists vbase")
