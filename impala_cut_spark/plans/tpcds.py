"""TPC-DS subset adapted to the driver schema.

The reference ships a 22-query TPC-DS workload
(testdata/workloads/tpcds/queries/tpcds-q*.test; BASELINE.md row 3).
The driver testdata is TPC-H-ish, so — exactly like tpch_q2/q11 were
adapted (plans/tpch2.py) — each query keeps the reference query's
SHAPE (join graph, star pattern, aggregate/pivot structure, ORDER
BY/LIMIT) on a documented schema mapping:

    store_sales   → lineitem (fact; orders supplies the order date)
    item          → part   (i_item_sk→p_partkey, i_brand→p_brand,
                            i_category→p_type, i_manager/manufact→p_size)
    date_dim      → inline dimension derived DISTINCT from the fact's
                    ship dates (d_date/d_year/d_moy) — broadcast, like
                    the real ~73k-row date_dim would be
    store         → supplier (s_store_sk→s_suppkey; s_state/zip→nation)
    customer      → customer; customer_address → nation via c_nationkey
    demographics  → customer.c_mktsegment / orders.o_orderpriority

Scale notes: every dimension here is broadcast-able and broadcast;
the only shuffles are the fact-side aggregations. The derived
date_dim is an extra scan of the fact's date column (columnar prune →
one column) — at 100 TB a real date_dim table replaces it untouched.

Cross-engine determinism rules: plans/registry.py docstring (decimal
sums surfaced as double; avg = exact decimal sum / count; LIMIT
always fully tiebroken).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from impala_cut_spark.plans._util import dec, t
from impala_cut_spark.plans.registry import query


def _date_dim(spark, sf_dir):
    """Derived broadcast date dimension (stand-in for TPC-DS date_dim)."""
    li = t(spark, sf_dir, "lineitem")
    return F.broadcast(
        li.select(
            F.col("l_shipdate").cast("date").alias("d_date"),
            F.year("l_shipdate").alias("d_year"),
            F.month("l_shipdate").alias("d_moy"),
        ).distinct()
    )


_SQL_DATE_DIM = """
date_dim AS (SELECT DISTINCT cast(l_shipdate as date) AS d_date,
                    year(l_shipdate) AS d_year,
                    month(l_shipdate) AS d_moy
             FROM lineitem)
"""


# ---------------------------------------------------------------------------
@query(
    "tpcds_q3",
    oracle="""
SELECT year(l_shipdate) AS year_sold, p_brand AS brand,
       cast(sum(cast(l_extendedprice as decimal(12,2))) as double) AS sum_agg
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size = 15
  AND (l_shipdate BETWEEN TIMESTAMP '1995-12-01' AND TIMESTAMP '1995-12-31'
    OR l_shipdate BETWEEN TIMESTAMP '1996-12-01' AND TIMESTAMP '1996-12-31'
    OR l_shipdate BETWEEN TIMESTAMP '1997-12-01' AND TIMESTAMP '1997-12-31'
    OR l_shipdate BETWEEN TIMESTAMP '1998-12-01' AND TIMESTAMP '1998-12-31'
    OR l_shipdate BETWEEN TIMESTAMP '1999-12-01' AND TIMESTAMP '1999-12-31')
GROUP BY 1, 2
ORDER BY year_sold, sum_agg DESC, brand
LIMIT 100
""",
)
def tpcds_q3(spark, sf_dir):
    """TPC-DS Q3 shape (tpcds-q3.test): fact⋈item star, December-of-N-
    years OR-of-BETWEEN date predicate pushed to the fact scan,
    manufact filter on the item dim, brand×year rollup, 3-key
    deterministic TopN. ADAPTED: i_manufact_id=436→p_size=15;
    ss_ext_sales_price→l_extendedprice."""
    li = t(spark, sf_dir, "lineitem")
    p = F.broadcast(t(spark, sf_dir, "part").filter(F.col("p_size") == 15))
    dec_windows = None
    for y in range(1995, 2000):
        w = F.col("l_shipdate").between(f"{y}-12-01", f"{y}-12-31")
        dec_windows = w if dec_windows is None else (dec_windows | w)
    return (
        li.filter(dec_windows)
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.year("l_shipdate").alias("year_sold"), F.col("p_brand").alias("brand")
        )
        .agg(F.sum(dec("l_extendedprice", 12, 2)).cast("double").alias("sum_agg"))
        .orderBy(F.asc("year_sold"), F.desc("sum_agg"), F.asc("brand"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
@query(
    "tpcds_q19",
    oracle="""
SELECT p_brand, p_type,
       cast(sum(cast(l_extendedprice as decimal(12,2))) as double) AS ext_price
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE o_orderdate BETWEEN TIMESTAMP '1997-11-01' AND TIMESTAMP '1997-11-30'
  AND p_size = 7
  AND c_nationkey <> s_nationkey
GROUP BY p_brand, p_type
ORDER BY ext_price DESC, p_brand, p_type
LIMIT 100
""",
)
def tpcds_q19(spark, sf_dir):
    """TPC-DS Q19 shape (tpcds-q19.test): 5-way star (fact⋈item⋈
    customer⋈address⋈store), one-month date window, manager filter on
    item, cross-dimension inequality (customer zip ≠ store zip).
    ADAPTED: i_manager_id=7→p_size=7; the zip-prefix inequality →
    customer nation ≠ supplier nation (same "customer shopping outside
    their area" semantics on this schema)."""
    li = t(spark, sf_dir, "lineitem")
    p = F.broadcast(t(spark, sf_dir, "part").filter(F.col("p_size") == 7))
    s = F.broadcast(t(spark, sf_dir, "supplier"))
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1997-11-01", "1997-11-30")
    )
    c = t(spark, sf_dir, "customer")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.sum(dec("l_extendedprice", 12, 2)).cast("double").alias("ext_price"))
        .orderBy(F.desc("ext_price"), F.asc("p_brand"), F.asc("p_type"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
@query(
    "tpcds_q42",
    oracle=f"""
WITH {_SQL_DATE_DIM}
SELECT d_year, p_type AS category,
       cast(sum(cast(l_extendedprice as decimal(12,2))) as double) AS total_sales
FROM lineitem
JOIN date_dim ON cast(l_shipdate as date) = d_date
JOIN part ON l_partkey = p_partkey
WHERE p_size < 10 AND d_moy = 12 AND d_year = 1998
GROUP BY d_year, p_type
ORDER BY total_sales DESC, d_year, category
LIMIT 100
""",
)
def tpcds_q42(spark, sf_dir):
    """TPC-DS Q42 shape (tpcds-q42.test): fact⋈date_dim⋈item star with
    the month/year filter applied on the DATE DIMENSION (not the fact
    column — the real TPC-DS pattern), category rollup. ADAPTED:
    i_manager_id=1→p_size<10; i_category→p_type; derived broadcast
    date_dim."""
    li = t(spark, sf_dir, "lineitem")
    d = _date_dim(spark, sf_dir).filter((F.col("d_moy") == 12) & (F.col("d_year") == 1998))
    p = F.broadcast(t(spark, sf_dir, "part").filter(F.col("p_size") < 10))
    return (
        li.join(d, li.l_shipdate.cast("date") == d.d_date)
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("d_year", F.col("p_type").alias("category"))
        .agg(F.sum(dec("l_extendedprice", 12, 2)).cast("double").alias("total_sales"))
        .orderBy(F.desc("total_sales"), F.asc("d_year"), F.asc("category"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
@query(
    "tpcds_q43",
    oracle="""
SELECT s_name,
       cast(sum(CASE WHEN dayofweek(l_shipdate) = 0 THEN cast(l_extendedprice as decimal(12,2)) END) as double) AS sun_sales,
       cast(sum(CASE WHEN dayofweek(l_shipdate) = 1 THEN cast(l_extendedprice as decimal(12,2)) END) as double) AS mon_sales,
       cast(sum(CASE WHEN dayofweek(l_shipdate) = 2 THEN cast(l_extendedprice as decimal(12,2)) END) as double) AS tue_sales,
       cast(sum(CASE WHEN dayofweek(l_shipdate) = 3 THEN cast(l_extendedprice as decimal(12,2)) END) as double) AS wed_sales,
       cast(sum(CASE WHEN dayofweek(l_shipdate) = 4 THEN cast(l_extendedprice as decimal(12,2)) END) as double) AS thu_sales,
       cast(sum(CASE WHEN dayofweek(l_shipdate) = 5 THEN cast(l_extendedprice as decimal(12,2)) END) as double) AS fri_sales,
       cast(sum(CASE WHEN dayofweek(l_shipdate) = 6 THEN cast(l_extendedprice as decimal(12,2)) END) as double) AS sat_sales
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_regionkey = 2 AND year(l_shipdate) = 1997
GROUP BY s_name
ORDER BY s_name
LIMIT 100
""",
)
def tpcds_q43(spark, sf_dir):
    """TPC-DS Q43 shape (tpcds-q43.test): day-of-week PIVOT via seven
    conditional decimal sums, fact⋈date_dim⋈store. ADAPTED: store→
    supplier, s_gmt_offset=-5→supplier's nation in region 2;
    day names via dayofweek (Spark 1=Sun, DuckDB 0=Sun — normalized
    in the CASE arms)."""
    li = t(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1997)
    s = F.broadcast(t(spark, sf_dir, "supplier"))
    n = F.broadcast(
        t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    )
    dow = F.dayofweek("l_shipdate")  # 1=Sunday
    aggs = [
        F.sum(F.when(dow == i + 1, dec("l_extendedprice", 12, 2)))
        .cast("double")
        .alias(nm)
        for i, nm in enumerate(
            ["sun_sales", "mon_sales", "tue_sales", "wed_sales", "thu_sales", "fri_sales", "sat_sales"]
        )
    ]
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(*aggs)
        .orderBy("s_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
@query(
    "tpcds_q52",
    oracle=f"""
WITH {_SQL_DATE_DIM}
SELECT d_year, p_brand AS brand,
       cast(sum(cast(l_extendedprice as decimal(12,2))) as double) AS ext_price
FROM lineitem
JOIN date_dim ON cast(l_shipdate as date) = d_date
JOIN part ON l_partkey = p_partkey
WHERE p_size < 10 AND d_moy = 12 AND d_year = 1998
GROUP BY d_year, p_brand
ORDER BY d_year, ext_price DESC, brand
LIMIT 100
""",
)
def tpcds_q52(spark, sf_dir):
    """TPC-DS Q52 shape (tpcds-q52.test): same star as q42 but brand
    grain and year-first ordering. ADAPTED as q42."""
    li = t(spark, sf_dir, "lineitem")
    d = _date_dim(spark, sf_dir).filter((F.col("d_moy") == 12) & (F.col("d_year") == 1998))
    p = F.broadcast(t(spark, sf_dir, "part").filter(F.col("p_size") < 10))
    return (
        li.join(d, li.l_shipdate.cast("date") == d.d_date)
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("d_year", F.col("p_brand").alias("brand"))
        .agg(F.sum(dec("l_extendedprice", 12, 2)).cast("double").alias("ext_price"))
        .orderBy(F.asc("d_year"), F.desc("ext_price"), F.asc("brand"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
@query(
    "tpcds_q55",
    oracle=f"""
WITH {_SQL_DATE_DIM}
SELECT p_brand AS brand,
       cast(sum(cast(l_extendedprice as decimal(12,2))) as double) AS ext_price
FROM lineitem
JOIN date_dim ON cast(l_shipdate as date) = d_date
JOIN part ON l_partkey = p_partkey
WHERE p_size = 36 AND d_moy = 11 AND d_year = 2000
GROUP BY p_brand
ORDER BY ext_price DESC, brand
LIMIT 100
""",
)
def tpcds_q55(spark, sf_dir):
    """TPC-DS Q55 shape (tpcds-q55.test): q42 family, brand-only grain,
    different manager/month/year point filters. ADAPTED:
    i_manager_id=36→p_size=36."""
    li = t(spark, sf_dir, "lineitem")
    d = _date_dim(spark, sf_dir).filter((F.col("d_moy") == 11) & (F.col("d_year") == 2000))
    p = F.broadcast(t(spark, sf_dir, "part").filter(F.col("p_size") == 36))
    return (
        li.join(d, li.l_shipdate.cast("date") == d.d_date)
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.sum(dec("l_extendedprice", 12, 2)).cast("double").alias("ext_price"))
        .orderBy(F.desc("ext_price"), F.asc("brand"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
@query(
    "tpcds_q7",
    oracle="""
SELECT p_brand,
       round(cast(sum(cast(l_quantity as decimal(9,2))) as double) / count(*), 6) AS agg1,
       round(cast(sum(cast(l_extendedprice as decimal(12,2))) as double) / count(*), 6) AS agg2,
       round(cast(sum(cast(l_discount as decimal(9,4))) as double) / count(*), 6) AS agg3,
       round(cast(sum(cast(l_tax as decimal(9,4))) as double) / count(*), 6) AS agg4
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND l_shipdate BETWEEN TIMESTAMP '1998-01-01' AND TIMESTAMP '1998-12-31'
GROUP BY p_brand
ORDER BY p_brand
LIMIT 100
""",
)
def tpcds_q7(spark, sf_dir):
    """TPC-DS Q7 shape (tpcds-q7.test): four AVG aggregates over a
    fact⋈demographics⋈item⋈promotion star. ADAPTED: cd_gender/marital/
    education→c_mktsegment='BUILDING'; p_channel_email OR p_channel_
    event→o_orderpriority IN; avg computed as exact decimal SUM/COUNT
    (registry determinism rule — engine-native avg differs in FP
    accumulation order)."""
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1998-01-01", "1998-12-31")
    )
    p = F.broadcast(t(spark, sf_dir, "part"))
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    cnt = F.count(F.lit(1))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(dec("l_quantity")).cast("double") / cnt, 6).alias("agg1"),
            F.round(F.sum(dec("l_extendedprice", 12, 2)).cast("double") / cnt, 6).alias("agg2"),
            F.round(F.sum(dec("l_discount", 9, 4)).cast("double") / cnt, 6).alias("agg3"),
            F.round(F.sum(dec("l_tax", 9, 4)).cast("double") / cnt, 6).alias("agg4"),
        )
        .orderBy("p_brand")
        .limit(100)
    )


# ---------------------------------------------------------------------------
@query(
    "tpcds_q96",
    oracle="""
SELECT count(*) AS total
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE o_orderpriority = '1-URGENT'
  AND c_mktsegment = 'MACHINERY'
  AND s_nationkey < 5
""",
)
def tpcds_q96(spark, sf_dir):
    """TPC-DS Q96 shape (tpcds-q96.test): highly-selective COUNT(*)
    over a fact⋈time_dim⋈household_demographics⋈store star. ADAPTED:
    t_hour/t_minute→o_orderpriority; hd_dep_count→c_mktsegment;
    s_store_name→s_nationkey<5."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "MACHINERY")
    s = F.broadcast(t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 5))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .agg(F.count(F.lit(1)).alias("total"))
    )
