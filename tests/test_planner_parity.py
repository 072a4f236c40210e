"""PlannerTest parity: the reference pins frontend plan decisions in
testdata/workloads/functional-planner/queries/PlannerTest/*.test
(predicate-propagation.test, join-order.test, hdfs-partitions); here
the same decisions are asserted against Catalyst's executed plans —
the §4 claim that Spark's optimizer replaces the reference FE is
checked, not assumed.  Complements tests/test_plans.py (which pins the
50 window plans wholesale) with targeted single-decision assertions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from impala_cut_spark.sources.catalog import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


class TestPredicatePropagation:
    """predicate-propagation.test shapes."""

    def test_equi_join_key_filter_reaches_both_scans(self, spark, sf_dir):
        """`o_custkey = c_custkey AND c_custkey < 100`: the range
        predicate must be INFERRED onto the orders side too (the
        reference FE's ValueTransferGraph; Catalyst's
        InferFiltersFromConstraints) — both FileScans carry a
        LessThan pushed filter."""
        o = load_table(spark, sf_dir, "orders")
        c = load_table(spark, sf_dir, "customer")
        df = o.join(c, o.o_custkey == c.c_custkey).filter(c.c_custkey < 100)
        plan = _plan(df)
        import re

        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        with_less = [p for p in pushed if "LessThan" in p]
        assert len(with_less) >= 2, f"inferred filter missing on one side:\n{plan}"

    def test_where_on_agg_output_filters_below_join(self, spark, sf_dir):
        """WHERE on an aggregate's output joined to a filtered table
        becomes a HAVING on the agg side (predicate-propagation.test
        'Where clause predicate is turned into Having clause'): the
        count() filter must sit BELOW the join, not above it."""
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders")
        agg = li.groupBy("l_orderkey").agg(F.count("*").alias("cnt"))
        df = agg.join(o, agg.cnt == o.o_orderkey).filter(F.col("cnt") < 10)
        opt = _optimized(df)
        # in the optimized tree the Filter on cnt sits UNDER the Join
        # (printed after the Join line)
        lines = opt.splitlines()
        join_line = next(i for i, ln in enumerate(lines) if "Join" in ln)
        filter_lines = [
            i for i, ln in enumerate(lines) if "Filter" in ln and "cnt" in ln
        ]
        assert filter_lines and all(i > join_line for i in filter_lines), opt

    def test_partition_pruning_by_inference(self, spark, sf_dir, tmp_path):
        """Filter on a non-partition column equated to the partition
        column prunes partitions (predicate-propagation.test
        'partitions are pruned due to predicate inference')."""
        path = str(tmp_path / "part_events")
        ev = load_table(spark, sf_dir, "events").withColumn(
            "day", F.dayofmonth("ts")
        )
        ev.write.partitionBy("day").mode("overwrite").parquet(path)
        d = spark.read.parquet(path)
        df = d.filter((F.col("day") == F.col("user_id") % 5 + 1) & (F.col("user_id") % 5 + 1 == 2))
        plan = _plan(df)
        # constant-folded through the equality: PartitionFilters prune
        assert "PartitionFilters: [" in plan
        seg = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
        assert seg.strip(), f"no partition filter inferred:\n{plan}"


class TestJoinOrderAndSort:
    def test_broadcast_smallest_dimension(self, spark, sf_dir):
        """join-order.test decision: the (tiny) nation dimension ends
        up on the broadcast side of the join regardless of join order
        in the query text."""
        n = load_table(spark, sf_dir, "nation")
        c = load_table(spark, sf_dir, "customer")
        for df in (
            n.join(c, n.n_nationkey == c.c_nationkey),
            c.join(n, n.n_nationkey == c.c_nationkey),
        ):
            plan = _plan(df.groupBy("n_name").count())
            assert "BroadcastHashJoin" in plan, plan

    def test_sort_stress_plans_takeordered_not_full_sort(self, spark, sf_dir):
        """targeted-stress SORT-STRESS-Q1: the reference squeezes its
        spilling external sort with this query; Spark must instead
        plan TakeOrderedAndProject (bounded per-partition heap — no
        full sort to spill at any scale)."""
        from impala_cut_spark.plans import REGISTRY

        plan = _plan(REGISTRY["perf_sort_stress"].spark(spark, sf_dir))
        assert "TakeOrderedAndProject" in plan, plan
        assert "Sort " not in plan  # no global full sort node

    def test_unbounded_order_by_is_a_real_global_sort(self, spark, sf_dir):
        """The complementary contract: WITHOUT a limit the plan is a
        range-partitioned global sort (Spark's spillable external
        sorter) — the operator the reference's stress test targets."""
        li = load_table(spark, sf_dir, "lineitem")
        plan = _plan(li.orderBy("l_shipdate", "l_partkey"))
        assert "Sort" in plan and "rangepartitioning" in plan.lower(), plan
