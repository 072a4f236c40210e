"""Catalog memo boundaries (r12 verdict #5 / ADVICE r12 #1).

The per-session table-plan memo must (a) never serve a SHADOWED temp
view back to the SQL surface after register_views, and (b) never cover
tables the INSERT/DDL surface writes — only the immutable driver
testdata under sf_dir.
"""

from __future__ import annotations


def test_register_views_restores_replaced_view(spark, sf_dir):
    """ADVICE r12 #1 repro: a CREATE OR REPLACE TEMP VIEW that shadows
    a catalog table name must be overwritten by the next
    register_views — the r12 sentinel-existence memo returned early
    and left SQL queries silently reading the shadow."""
    from impala_cut_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    orig = spark.sql("SELECT count(*) AS c FROM lineitem").collect()[0]["c"]
    assert orig > 1

    spark.sql("CREATE OR REPLACE TEMP VIEW lineitem AS SELECT 1 AS x")
    assert spark.sql("SELECT count(*) AS c FROM lineitem").collect()[0]["c"] == 1

    register_views(spark, sf_dir)
    after = spark.sql("SELECT count(*) AS c FROM lineitem").collect()[0]["c"]
    assert after == orig


def test_register_views_restores_dropped_view(spark, sf_dir):
    from impala_cut_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    spark.catalog.dropTempView("embeddings")
    register_views(spark, sf_dir)
    assert spark.sql("SELECT count(*) FROM embeddings").collect()[0][0] > 0


def test_load_table_memo_never_covers_mutable_tables(spark, sf_dir):
    """The memo keys (sf_dir, name) over the driver's immutable
    testdata only. Tables written through the DDL/DML surface resolve
    through Spark's own catalog — two INSERTs must both be visible
    (a stale pinned file listing would freeze the first)."""
    from impala_cut_spark.session import ImpalaSession
    from impala_cut_spark.sources.catalog import TABLES

    sess = ImpalaSession(spark)
    sess.sql("DROP TABLE IF EXISTS _memo_boundary_t")
    sess.sql("CREATE TABLE _memo_boundary_t (k INT, v STRING) STORED AS PARQUET")
    sess.sql("INSERT INTO _memo_boundary_t VALUES (1, 'a')")
    assert sess.sql("SELECT count(*) FROM _memo_boundary_t").collect()[0][0] == 1
    sess.sql("INSERT INTO _memo_boundary_t VALUES (2, 'b')")
    assert sess.sql("SELECT count(*) FROM _memo_boundary_t").collect()[0][0] == 2

    # the plan memo holds only declared driver tables — never DML targets
    memo = spark.__dict__.get("_icg_table_plans", {})
    for sf, name in memo:
        assert name in TABLES
    sess.sql("DROP TABLE _memo_boundary_t")
