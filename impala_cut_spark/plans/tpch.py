"""TPC-H-style analytical queries adapted to the driver's schema.

The reference ships TPC-H q1–q22 (minus q7) as golden tests
(``/root/reference/testdata/workloads/tpch/queries/``). The driver's
testdata carries a reduced column set (no partsupp, no
commitdate/receiptdate/shipmode/phone), so each query here is the
closest faithful adaptation exercising the same operator shapes:
scan → filter → (broadcast/shuffle) joins → partial/final hash agg →
top-n / sort.

Scale notes per query are in the docstrings; shared rules in
plans/registry.py. nation/region are bounded dimensions (25/5 rows at
any SF) → always broadcast; customer/supplier/part/orders scale with
SF → left to AQE (sort-merge or shuffled-hash with runtime bloom
filters, broadcast only if stats say so).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from impala_cut_spark.plans._util import (
    SQL_CHARGE,
    SQL_DISC_PRICE,
    charge,
    davg,
    dec,
    disc_price,
    dsum,
    sql_davg,
    sql_dsum,
    t,
)
from impala_cut_spark.plans.registry import query

_TS = "timestamp_ntz"


def _ts(lit: str):
    return F.lit(lit).cast(_TS)


# ---------------------------------------------------------------------------
@query(
    "tpch_q1",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum("cast(l_quantity as decimal(9,2))", "sum_qty")},
       {sql_dsum("cast(l_extendedprice as decimal(9,2))", "sum_base_price")},
       {sql_dsum(SQL_DISC_PRICE, "sum_disc_price")},
       {sql_dsum(SQL_CHARGE, "sum_charge")},
       {sql_davg("l_quantity", "avg_qty")},
       {sql_davg("l_extendedprice", "avg_price")},
       {sql_davg("l_discount", "avg_disc")},
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    headline=True,
)
def tpch_q1(spark, sf_dir):
    """Pricing summary (tpch-q1.test). Scan→filter→hash agg.

    Scale: single shuffle on the 6-value (returnflag, linestatus) key;
    partial aggregation reduces each scan task to ≤6 rows before the
    exchange, so the shuffle is O(tasks), not O(rows) — survives 100 TB.
    Filter pushed to parquet (PushedFilters on l_shipdate).
    """
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= _ts("1998-09-02 00:00:00"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        F.sum(disc_price()).cast("double").alias("sum_disc_price"),
        F.sum(charge()).cast("double").alias("sum_charge"),
        davg("l_quantity", "avg_qty"),
        davg("l_extendedprice", "avg_price"),
        davg("l_discount", "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
@query(
    "tpch_q3",
    oracle=f"""
SELECT l_orderkey,
       {sql_dsum(SQL_DISC_PRICE, "revenue")},
       cast(o_orderdate as date) AS o_orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, cast(o_orderdate as date), o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    headline=True,
)
def tpch_q3(spark, sf_dir):
    """Shipping priority (tpch-q3.test): 3-way join → agg → top-n.

    Scale: customer is filtered on mktsegment (~1/5) before the join;
    orders filtered on date. Catalyst pushes both to the scans; the
    orders⋈lineitem join shuffles on orderkey (co-partitioned with the
    agg key → agg reuses the join's partitioning, no extra shuffle).
    Top-10 is TakeOrderedAndProject: O(k) per partition + driver merge.
    """
    cutoff = _ts("1998-03-15 00:00:00")
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("o_orderdate"), "o_orderpriority")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
@query(
    "tpch_q4",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def tpch_q4(spark, sf_dir):
    """Order priority checking (tpch-q4.test): EXISTS → LEFT SEMI join
    (the reference's TJoinOp::LEFT_SEMI_JOIN, PlanNodes.thrift:149-156).

    Scale: semi join shuffles both sides on orderkey; the non-equi
    l_shipdate > o_orderdate rides as an "other join conjunct"
    (hash-join-node.h:79-82 semantics). Semi join emits each order at
    most once — no fan-out.
    """
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1998-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-07-01 00:00:00"))
    )
    li = t(spark, sf_dir, "lineitem")
    joined = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
@query(
    "tpch_q5",
    oracle=f"""
SELECT n_name, {sql_dsum(SQL_DISC_PRICE, "revenue")}
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    headline=True,
)
def tpch_q5(spark, sf_dir):
    """Local supplier volume (tpch-q5.test): 6-table join.

    Scale: nation⋈region are bounded (25×5 rows at any SF) → explicit
    broadcast, pruning suppliers to one region *before* the big joins
    (replicates Impala's broadcast-cost choice, Planner.java:431-530).
    Remaining joins shuffle on custkey/orderkey — both high-cardinality
    uniform keys. Runtime bloom filter from the supplier side prunes
    lineitem rows at scan (session.py conf).
    """
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = t(spark, sf_dir, "nation")
    asia_nations = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            "n_nationkey", "n_name"
        )
    )
    supp = t(spark, sf_dir, "supplier").join(
        asia_nations, F.col("s_nationkey") == F.col("n_nationkey")
    )
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1999-01-01 00:00:00"))
    )
    cust = t(spark, sf_dir, "customer")
    li = t(spark, sf_dir, "lineitem")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .groupBy("n_name")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


# ---------------------------------------------------------------------------
@query(
    "tpch_q6",
    oracle="""
SELECT cast(sum(cast(l_extendedprice as decimal(9,2))
             * cast(l_discount as decimal(10,2))) as double) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN cast(0.05 as double) AND cast(0.07 as double)
  AND l_quantity < cast(24 as double)
""",
    headline=True,
)
def tpch_q6(spark, sf_dir):
    """Forecasting revenue change (tpch-q6.test): pure scan+filter+sum.

    Scale: every predicate reaches the parquet scan (PushedFilters);
    single global agg = one partial sum per task + one tiny exchange.
    The canonical "IO-bound at 100 TB" query.
    """
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(dec("l_extendedprice") * dec("l_discount", 10, 2)).cast("double").alias("revenue")
    )


# ---------------------------------------------------------------------------
@query(
    "tpch_q10",
    oracle=f"""
SELECT c_custkey, c_name, {sql_dsum(SQL_DISC_PRICE, "revenue")},
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    headline=True,
)
def tpch_q10(spark, sf_dir):
    """Returned-item reporting (tpch-q10.test): join + agg + top-20.

    Scale: nation broadcast; orders date-filtered before join; agg key
    is custkey (high cardinality) — partial agg + AQE-coalesced
    exchange; top-20 via TakeOrderedAndProject.
    """
    cust = t(spark, sf_dir, "customer")
    nation = F.broadcast(t(spark, sf_dir, "nation"))
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-07-01 00:00:00"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
@query(
    "tpch_q14",
    oracle=f"""
SELECT cast(100 as double)
       * cast(sum(CASE WHEN p_type = 'PROMO' THEN {SQL_DISC_PRICE}
                       ELSE cast(0 as decimal(20,4)) END) as double)
       / cast(sum({SQL_DISC_PRICE}) as double) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
""",
)
def tpch_q14(spark, sf_dir):
    """Promotion effect (tpch-q14.test): conditional aggregation over a
    join. Scale: part is SF-proportional → no manual broadcast; AQE
    converts to broadcast when the date-filtered lineitem side shrinks.
    """
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-10-01 00:00:00"))
    )
    part = t(spark, sf_dir, "part")
    dp = disc_price()
    zero = F.lit(0).cast("decimal(20,4)")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100).cast("double")
                * F.sum(F.when(F.col("p_type") == "PROMO", dp).otherwise(zero)).cast("double")
                / F.sum(dp).cast("double")
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
@query(
    "tpch_q17",
    oracle="""
WITH pa AS (
  SELECT l_partkey AS pa_partkey,
         cast(sum(cast(l_quantity as decimal(9,2))) as double)
           / count(l_quantity) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT cast(sum(cast(l_extendedprice as decimal(9,2))) as double)
       / cast(7.0 as double) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pa   ON pa_partkey = p_partkey
WHERE p_brand = 'Brand#1' AND l_quantity < cast(0.2 as double) * avg_qty
""",
)
def tpch_q17(spark, sf_dir):
    """Small-quantity-order revenue (tpch-q17.test): correlated
    subquery → self-join against a per-part aggregate.

    Scale: the per-part avg is a partial-agg'd shuffle on partkey; the
    probe join reuses that partitioning. At 100 TB this is the classic
    "agg then self join" — no driver-side anything.
    """
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    pa = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (F.sum(dec("l_quantity")).cast("double") / F.count("l_quantity")).alias("avg_qty")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(pa, F.col("pa_partkey") == F.col("p_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.2).cast("double") * F.col("avg_qty"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0).cast("double")).alias(
                "avg_yearly"
            )
        )
    )


# ---------------------------------------------------------------------------
@query(
    "tpch_q18",
    oracle="""
SELECT c_name, c_custkey, o_orderkey,
       cast(o_orderdate as date) AS o_orderdate, o_totalprice,
       cast(sum(cast(l_quantity as decimal(9,2))) as double) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, cast(o_orderdate as date), o_totalprice
HAVING sum(cast(l_quantity as decimal(9,2))) > 300
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    headline=True,
)
def tpch_q18(spark, sf_dir):
    """Large-volume customer (tpch-q18.test): agg + HAVING + top-n.

    Scale: HAVING on the merge agg (Planner.java:722-793 semantics is
    automatic in Spark).

    r12 shape: aggregate lineitem by l_orderkey FIRST, apply the HAVING
    cut, THEN join orders/customer (guide §2.3 "aggregate before you
    shuffle" + §3.3 "explode after the join" inverted).  The grouping
    attributes (c_name, o_orderdate, o_totalprice, …) are functionally
    determined by o_orderkey through the key joins, so grouping by the
    bare orderkey and re-attaching them is result-identical (oracle
    strict-hash-verified at sf0.001/0.01/0.1) — but the pre-exchange
    hash table keys one BIGINT instead of a 5-column string-bearing
    tuple, the HAVING filter kills ~99.99% of groups BEFORE the joins
    (at sf: 150k → dozens of rows probe the broadcasts instead of 600k),
    and the shuffle carries (orderkey, sum) only.  Measured at sf0.1:
    med 1.36 s → 1.09 s with identical output; at 100 TB the join input
    collapses from the full lineitem to the surviving orders only.
    """
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    agg = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > 300)
    )
    return (
        agg.join(orders, agg.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice",
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
@query(
    "tpch_q19",
    oracle=f"""
SELECT {sql_dsum(SQL_DISC_PRICE, "revenue")}
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= cast(1 as double) AND l_quantity <= cast(21 as double))
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= cast(10 as double) AND l_quantity <= cast(30 as double))
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= cast(20 as double) AND l_quantity <= cast(40 as double))
""",
)
def tpch_q19(spark, sf_dir):
    """Discounted revenue (tpch-q19.test): disjunctive multi-clause
    predicate over a join — exercises OR-of-AND conjunct handling
    (the reference evaluates these as other-join-conjuncts,
    hash-join-node.h:79-82).
    """
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & (q >= 1) & (q <= 21))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & (q >= 10) & (q <= 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & (q >= 20) & (q <= 40))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
@query(
    "tpch_q22",
    oracle="""
WITH avg_bal AS (
  SELECT cast(sum(cast(c_acctbal as decimal(9,2))) as double)
         / count(c_acctbal) AS ab
  FROM customer WHERE c_acctbal > cast(0.0 as double)
)
SELECT c_nationkey, count(*) AS numcust,
       cast(sum(cast(c_acctbal as decimal(9,2))) as double) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
)
def tpch_q22(spark, sf_dir):
    """Global-sales-opportunity (tpch-q22.test shape): scalar subquery +
    NOT EXISTS → LEFT ANTI join (Spark-native; the reference lacks anti
    join — SURVEY §2.3 — this is engine-extension surface).

    Scale: the scalar avg is a broadcast of one row; anti join shuffles
    on custkey. No driver-side collection.
    """
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg((F.sum(dec("c_acctbal")).cast("double") / F.count("c_acctbal")).alias("ab"))
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("ab"))
    no_orders = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return (
        no_orders.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )
