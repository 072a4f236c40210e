"""Merged operator-coverage queries — one driver row per operator
*family*, so the driver's 50-row CORRECTNESS window covers every
SURVEY.md §2 family (round-1 verdict: entries past 50 got no driver
row at all).

Each merged query composes the same operator shapes as the
fine-grained ``coverage.py`` entries (which stay registered below the
window and keep their local oracle checks); the branches here are the
original builders re-tagged/union-ed or chained, so the physical plan
genuinely contains every claimed operator (asserted in
tests/test_plans.py).

Cross-engine determinism rules: plans/registry.py docstring.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from impala_cut_spark.dialect import rewrite
from impala_cut_spark.plans import coverage as cov
from impala_cut_spark.plans._util import dec, t
from impala_cut_spark.plans.registry import query
from impala_cut_spark.sources.catalog import register_views


def _sql(spark, sf_dir, text):
    register_views(spark, sf_dir)
    return spark.sql(rewrite(text))


# ---------------------------------------------------------------------------
# §2.3 — every join type in ONE driver row.  Branches are the original
# cov_join_* builders normalized to (tag, a, b, s) and UNION ALL-ed;
# the executed plan contains inner/left/right/full/semi/anti hash
# joins, a nested-loop cross join, and a non-equi other-conjunct.
# ---------------------------------------------------------------------------

_JOIN_ORACLE = """
SELECT 'inner' AS tag, cast(s_suppkey as bigint) AS a, cast(NULL as bigint) AS b, n_name AS s
FROM supplier JOIN nation ON s_nationkey = n_nationkey
UNION ALL
SELECT 'left', cast(n_nationkey as bigint), cast(s_suppkey as bigint), s_name
FROM nation LEFT OUTER JOIN supplier ON s_nationkey = n_nationkey
UNION ALL
SELECT 'right', cast(s_suppkey as bigint), cast(n_nationkey as bigint), n_name
FROM supplier RIGHT OUTER JOIN nation ON s_nationkey = n_nationkey
UNION ALL
SELECT 'full', cast(nationkey as bigint), n_cust, cast(n_supp as varchar)
FROM (
  WITH cn AS (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1),
       sn AS (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1)
  SELECT coalesce(cn.k, sn.k) AS nationkey, n_cust, n_supp
  FROM cn FULL OUTER JOIN sn ON cn.k = sn.k)
UNION ALL
SELECT 'semi', cast(c_custkey as bigint), cast(NULL as bigint), c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
UNION ALL
SELECT 'anti', cast(c_custkey as bigint), cast(NULL as bigint), c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
UNION ALL
SELECT 'cross', cast(r_regionkey as bigint), cast(n_nationkey as bigint),
       r_name || '/' || n_name
FROM region CROSS JOIN nation
UNION ALL
SELECT 'nonequi', cast(o_orderkey as bigint), n_late, cast(NULL as varchar)
FROM (SELECT o_orderkey, count(*) AS n_late
      FROM orders JOIN lineitem
        ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      WHERE o_orderstatus = 'F'
      GROUP BY o_orderkey)
"""


@query("cov_join_all", oracle=_JOIN_ORACLE)
def cov_join_all(spark, sf_dir):
    """All §2.3 join types (TJoinOp + cross-join-node.cc nested loop +
    hash-join-node.h:79-82 other-conjuncts) in one plan: the original
    cov_join_* branches tagged and union-ed."""
    bnull = F.lit(None).cast("bigint")
    snull = F.lit(None).cast("string")

    def br(tag, df, a, b, s):
        return df.select(
            F.lit(tag).alias("tag"),
            a.cast("bigint").alias("a"),
            b.cast("bigint").alias("b"),
            s.cast("string").alias("s"),
        )

    c = F.col
    parts = [
        br("inner", cov.cov_join_inner(spark, sf_dir), c("s_suppkey"), bnull, c("n_name")),
        br("left", cov.cov_join_left_outer(spark, sf_dir), c("n_nationkey"), c("s_suppkey"), c("s_name")),
        br("right", cov.cov_join_right_outer(spark, sf_dir), c("s_suppkey"), c("n_nationkey"), c("n_name")),
        br("full", cov.cov_join_full_outer(spark, sf_dir), c("nationkey"), c("n_cust"), c("n_supp")),
        br("semi", cov.cov_join_left_semi(spark, sf_dir), c("c_custkey"), bnull, c("c_name")),
        br("anti", cov.cov_join_left_anti(spark, sf_dir), c("c_custkey"), bnull, c("c_name")),
        br(
            "cross",
            t(spark, sf_dir, "region").crossJoin(t(spark, sf_dir, "nation")),
            c("r_regionkey"),
            c("n_nationkey"),
            F.concat_ws("/", "r_name", "n_name"),
        ),
        br("nonequi", cov.cov_join_nonequi_conjunct(spark, sf_dir), c("o_orderkey"), c("n_late"), snull),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# ---------------------------------------------------------------------------
# §2.4 — grouped aggregation families in ONE row: plain aggs, DISTINCT
# two-phase, group_concat (sorted-deterministic), stats family.
# ---------------------------------------------------------------------------


@query(
    "cov_agg_all",
    oracle="""
SELECT l_returnflag,
       count(*) AS n_rows,
       count(l_quantity) AS n_qty,
       cast(min(l_quantity) as double) AS min_qty,
       cast(max(l_quantity) as double) AS max_qty,
       cast(sum(cast(l_quantity as decimal(9,2))) as double) AS sum_qty,
       min(l_shipdate) AS min_ship,
       count(DISTINCT l_suppkey) AS n_supp,
       cast(sum(DISTINCT cast(l_quantity as decimal(9,2))) as double) AS sum_dist_qty,
       round(stddev_samp(l_quantity), 6) AS sd_qty,
       round(var_pop(l_discount), 8) AS vp_disc,
       string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses
FROM lineitem GROUP BY l_returnflag
""",
)
def cov_agg_all(spark, sf_dir):
    """§2.4 families in one grouped agg: count/min/max/sum
    (aggregate-functions.h:46-63), DISTINCT two-phase
    (AggregateInfo.java:52-59), stddev/var (Knuth,
    aggregate-functions.h:98-112, rounded — SURVEY §7 risk 2),
    group_concat sorted-deterministic (BuiltinsDb.java:359-367)."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("l_quantity").alias("n_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.min("l_shipdate").alias("min_ship"),
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.sum_distinct(dec("l_quantity")).cast("double").alias("sum_dist_qty"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_pop("l_discount"), 8).alias("vp_disc"),
        F.array_join(F.array_sort(F.collect_set("l_linestatus")), ",").alias("statuses"),
    )


# ---------------------------------------------------------------------------
# §2.6 — full multi-key sort + Impala default null ordering + LIMIT +
# OFFSET in ONE row, written in Impala dialect (no NULLS clause — the
# rewriter must inject DESC→NULLS FIRST / ASC→NULLS LAST).
# ---------------------------------------------------------------------------


@query(
    "cov_sort_all",
    oracle="""
SELECT event_id, nullif(event_type, 'view') AS et, value
FROM events
ORDER BY et DESC NULLS FIRST, value NULLS LAST, event_id NULLS LAST
LIMIT 40 OFFSET 10
""",
)
def cov_sort_all(spark, sf_dir):
    """Sort family in one row: multi-key sort with NULL-bearing key,
    Impala default null ordering injected by the dialect
    (OrderByElement.java:74-75), LIMIT + OFFSET (sort-node.cc offset
    support). Tiebreak on unique event_id → deterministic page."""
    return _sql(
        spark,
        sf_dir,
        "SELECT event_id, nullif(event_type, 'view') AS et, value FROM events "
        "ORDER BY et DESC, value, event_id LIMIT 40 OFFSET 10",
    )


# ---------------------------------------------------------------------------
# §2.7 — UNION ALL + UNION DISTINCT + VALUES + SELECT DISTINCT in ONE row.
# ---------------------------------------------------------------------------


@query(
    "cov_setops_all",
    oracle="""
SELECT DISTINCT cast(k as bigint) AS k, src FROM (
  SELECT c_nationkey AS k, 'cust' AS src FROM customer
  UNION ALL
  SELECT s_nationkey AS k, 'supp' AS src FROM supplier) u
UNION
SELECT cast(k as bigint) AS k, src
FROM (VALUES (900, 'vals'), (901, 'vals'), (900, 'vals')) t(k, src)
""",
)
def cov_setops_all(spark, sf_dir):
    """§2.7 in one row: UNION ALL passthrough (union-node.cc), SELECT
    DISTINCT dedup agg, UNION DISTINCT (UnionStmt.java:97-150), VALUES
    constant exprs."""
    c = t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("bigint").alias("k"), F.lit("cust").alias("src")
    )
    s = t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("bigint").alias("k"), F.lit("supp").alias("src")
    )
    vals = spark.sql(
        "SELECT cast(k as bigint) AS k, src FROM "
        "VALUES (900, 'vals'), (901, 'vals'), (900, 'vals') AS t(k, src)"
    )
    return c.unionAll(s).distinct().unionAll(vals).distinct()


# ---------------------------------------------------------------------------
# §2.2 + §2.7 views — predicate battery + LIKE/regex + CTE + inline
# view with LIMIT (the standalone-SelectNode case) in ONE row.
# ---------------------------------------------------------------------------


@query(
    "cov_predicates_views",
    oracle="""
WITH flt AS (
  SELECT p_partkey, p_name, p_size,
         (p_name LIKE '%a%') AS has_a,
         regexp_matches(p_name, '^[a-m]') AS starts_am,
         regexp_replace(p_name, '[aeiou]', '_', 'g') AS dev
  FROM part
  WHERE p_name LIKE '%e%' AND p_name NOT LIKE 'z%'
    AND p_size BETWEEN 3 AND 45
    AND p_partkey IS NOT NULL
    AND (p_size < 15 OR p_size > 30)
    AND p_size IN (3, 5, 7, 9, 11, 13, 31, 33, 35, 37, 39, 41, 43, 45))
SELECT dev, count(*) AS n, min(p_partkey) AS first_key
FROM (SELECT * FROM flt ORDER BY p_partkey LIMIT 300) v
WHERE has_a OR starts_am
GROUP BY dev
""",
)
def cov_predicates_views(spark, sf_dir):
    """§2.2 predicate forms (=, IN, BETWEEN, LIKE/NOT LIKE, IS NOT
    NULL, OR — sql-parser.y:1889-1960) + RLIKE/regexp_replace
    (like-predicate.h) + WITH clause + predicate-above-inline-view-
    with-LIMIT (Planner.java:666-699 standalone SelectNode) in one
    row. Inner conjuncts all pushable to the parquet scan."""
    return _sql(
        spark,
        sf_dir,
        """
        WITH flt AS (
          SELECT p_partkey, p_name, p_size,
                 (p_name LIKE '%a%') AS has_a,
                 p_name REGEXP '^[a-m]' AS starts_am,
                 regexp_replace(p_name, '[aeiou]', '_') AS dev
          FROM part
          WHERE p_name LIKE '%e%' AND p_name NOT LIKE 'z%'
            AND p_size BETWEEN 3 AND 45
            AND p_partkey IS NOT NULL
            AND (p_size < 15 OR p_size > 30)
            AND p_size IN (3, 5, 7, 9, 11, 13, 31, 33, 35, 37, 39, 41, 43, 45))
        SELECT dev, count(*) AS n, min(p_partkey) AS first_key
        FROM (SELECT * FROM flt ORDER BY p_partkey LIMIT 300) v
        WHERE has_a OR starts_am
        GROUP BY dev
        """,
    )


# ---------------------------------------------------------------------------
# §2.8 — conditional + cast lattice in ONE row (one table, one scan).
# ---------------------------------------------------------------------------


@query(
    "cov_fn_condcast",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_extendedprice > cast(50000 as double) THEN 'high'
            WHEN l_extendedprice > cast(10000 as double) THEN 'mid'
            ELSE 'low' END AS bucket,
       CASE l_returnflag WHEN 'R' THEN 'ret' WHEN 'A' THEN 'ack'
            ELSE 'none' END AS st,
       coalesce(nullif(l_linestatus, 'F'), 'final') AS np,
       (CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS if_r,
       coalesce(nullif(l_linenumber, 0), -1) AS zin,
       cast(l_quantity as varchar) AS qty_str,
       cast(cast(l_orderkey as varchar) as bigint) AS rt_key,
       cast(floor(l_extendedprice) as bigint) AS price_int,
       cast(l_linenumber as double) AS ln_dbl,
       cast(l_shipdate as date) AS ship_date,
       cast(cast(l_shipdate as date) as varchar) AS ship_str
FROM lineitem WHERE l_orderkey < 100
""",
)
def cov_fn_condcast(spark, sf_dir):
    """§2.8 conditional fns (conditional-functions.h, case-expr.cc:
    searched + simple CASE, if(), isnull, nullif, nullifzero) + CAST
    lattice (CastExpr.java / TypesUtil.java: numeric↔string,
    timestamp→date→string round-trips; double→int via explicit floor —
    Impala truncates, DuckDB rounds) through the Impala dialect."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_extendedprice > cast(50000 as double) THEN 'high'
                    WHEN l_extendedprice > cast(10000 as double) THEN 'mid'
                    ELSE 'low' END AS bucket,
               CASE l_returnflag WHEN 'R' THEN 'ret' WHEN 'A' THEN 'ack'
                    ELSE 'none' END AS st,
               isnull(nullif(l_linestatus, 'F'), 'final') AS np,
               if(l_returnflag = 'R', 1, 0) AS if_r,
               cast(coalesce(nullifzero(l_linenumber), -1) as bigint) AS zin,
               cast(l_quantity as string) AS qty_str,
               cast(cast(l_orderkey as string) as bigint) AS rt_key,
               cast(floor(l_extendedprice) as bigint) AS price_int,
               cast(l_linenumber as double) AS ln_dbl,
               cast(l_shipdate as date) AS ship_date,
               cast(cast(l_shipdate as date) as string) AS ship_str
        FROM lineitem WHERE l_orderkey < 100
        """,
    )
