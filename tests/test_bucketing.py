"""Bucketed co-located joins (no exchange) and skew salting."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from impala_cut_spark.sources import bucketing
from impala_cut_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    spark.sql("create database if not exists bkt")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    bucketing.write_bucketed(orders, "bkt.orders_b", ["o_orderkey"], 8, ["o_orderkey"])
    bucketing.write_bucketed(li, "bkt.lineitem_b", ["l_orderkey"], 8, ["l_orderkey"])
    yield
    spark.sql("drop database bkt cascade")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    df = (
        spark.table("bkt.lineitem_b")
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .join(spark.table("bkt.orders_b"), "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    # the join itself needs no shuffle: both sides pre-bucketed on the key
    join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    # correctness vs the unbucketed join
    expected = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .count()
    )
    got = {(r.o_orderstatus, r.n) for r in df.collect()}
    exp = {(r.o_orderstatus, r["count"]) for r in expected.collect()}
    assert got == exp


def test_salted_groupby_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    salted = {
        (r.l_returnflag, r.n)
        for r in bucketing.salted_groupby_count(li, "l_returnflag").collect()
    }
    plain = {
        (r.l_returnflag, r["count"])
        for r in li.groupBy("l_returnflag").count().collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    salted = bucketing.salted_join(li, orders, "l_orderkey")
    plain = li.join(orders, "l_orderkey")
    assert salted.count() == plain.count()
    s = salted.groupBy("o_orderstatus").count().collect()
    p = plain.groupBy("o_orderstatus").count().collect()
    assert {(r.o_orderstatus, r["count"]) for r in s} == {
        (r.o_orderstatus, r["count"]) for r in p
    }
