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
    headline=True,
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


# ---------------------------------------------------------------------------
# Remaining shapes of the reference's 22-query subset, as SQL pairs.
# The Spark text runs on registered views (standard ANSI — no dialect
# rewrites needed); the oracle text is identical unless an engine
# function differs (noted per query). Determinism: decimal-cast sums
# surfaced as double, fully-tiebroken ORDER BY under every LIMIT.
# ---------------------------------------------------------------------------

from impala_cut_spark.sources.catalog import register_views  # noqa: E402


def _sql_query(name: str, doc: str, spark_sql: str, oracle_sql: str | None = None,
               headline: bool = False):
    """Register a TPC-DS shape whose Spark side is plain SQL."""

    def fn(spark, sf_dir, _sql=spark_sql):
        register_views(spark, sf_dir)
        return spark.sql(_sql)

    fn.__doc__ = doc
    fn.__name__ = name
    query(name, oracle=(oracle_sql or spark_sql), headline=headline)(fn)


_DSUM = "cast(sum(cast({c} as decimal(12,2))) as double)"


#: tpcds_q8 body, templated over the one dialect delta (Spark spells
#: the semi join LEFT SEMI JOIN, DuckDB spells it SEMI JOIN).  The
#: reference joins store to the qualifying-zip subquery on a ZIP-ZONE
#: PREFIX (substr(s_zip,1,2) = substr(ca_zip,1,2)) — replayed here as
#: the NATION_<d> name prefix: substr('NATION_15',1,8)='NATION_1', so
#: zone 'NATION_1' covers nations {1, 10..19}, a genuine many-to-many
#: fuzzy-geography join.  Duplicate zones in v1 multiply matched fact
#: rows — exactly the reference's overlapping-zip semantics, and
#: deterministic in both engines.
#: The /*+ BROADCAST(v1) */ hint pins the zone subquery to the build
#: side from the INITIAL plan: without it Catalyst plans the zone join
#: shuffle-based and AQE's broadcast conversion leaves the stream-side
#: Exchange behind as a stage boundary — 600k joined rows shuffled on a
#: 25-value substr key for nothing (plan audited at sf0.1, round 4).
#: DuckDB parses the hint as an ordinary block comment.
_Q8_BODY = f"""
SELECT /*+ BROADCAST(v1) */ s_name, {_DSUM.format(c='l_extendedprice')} AS net
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN (
  SELECT substr(a.zip, 1, 8) AS zone FROM
    (SELECT n_name AS zip, count(*) AS cnt
     FROM customer JOIN nation ON c_nationkey = n_nationkey
     WHERE c_acctbal > 0 GROUP BY n_name HAVING count(*) > 5) a
  {{semi}} JOIN
    (SELECT n_name AS zip FROM nation
     WHERE n_nationkey IN (0, 2, 4, 6, 8, 10, 12, 14, 16, 18, 20)) b
  ON a.zip = b.zip
) v1 ON substr(sn.n_name, 1, 8) = v1.zone
GROUP BY s_name
ORDER BY s_name
LIMIT 100
"""

_sql_query(
    "tpcds_q8",
    """TPC-DS Q8 shape (tpcds-q8.test): store revenue restricted to
    customers in qualifying zip zones — an agg-with-HAVING subquery
    LEFT SEMI joined against a literal IN-list, then a PREFIX-zone
    join onto the store dimension and the outer star agg. ADAPTED:
    ca_zip→customer nation name, 2-char zip zone→8-char NATION_<d>
    prefix; preferred flag c_preferred_cust_flag='Y'→c_acctbal>0;
    store→supplier (+nation for its geography).""",
    _Q8_BODY.format(semi="LEFT SEMI"),
    _Q8_BODY.format(semi="SEMI"),
    headline=True,  # round-4 window rotation: bench the zone join too
)


_sql_query(
    "tpcds_q27",
    """TPC-DS Q27 shape (tpcds-q27.test): four AVGs at item × store-state
    grain under a demographic filter. ADAPTED: cd_* → c_mktsegment;
    s_state IN (…) → supplier nation IN; avg = exact decimal SUM/COUNT
    (registry rule).""",
    """
SELECT p_brand, n_name AS s_state,
       round(cast(sum(cast(l_quantity as decimal(9,2))) as double) / count(*), 6) AS agg1,
       round(cast(sum(cast(l_extendedprice as decimal(12,2))) as double) / count(*), 6) AS agg2,
       round(cast(sum(cast(l_discount as decimal(9,4))) as double) / count(*), 6) AS agg3,
       round(cast(sum(cast(l_tax as decimal(9,4))) as double) / count(*), 6) AS agg4
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE c_mktsegment = 'MACHINERY'
  AND year(l_shipdate) = 1999
  AND n_name IN ('NATION_2', 'NATION_5')
GROUP BY p_brand, n_name
ORDER BY p_brand, s_state
LIMIT 100
""",
)


_sql_query(
    "tpcds_q34",
    """TPC-DS Q34 shape (tpcds-q34.test): per-ticket line counts in a
    dom-window + demographic filter, outer join to customer names,
    count-band filter. ADAPTED: ticket→l_orderkey, dom windows on
    o_orderdate, hd_buy_potential→o_orderpriority; cnt band 5-7
    matches this generator's lines-per-order.""",
    """
SELECT c_name, dn.ticket, dn.cnt
FROM (
  SELECT l_orderkey AS ticket, o_custkey AS ck, count(*) AS cnt
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE (day(o_orderdate) BETWEEN 1 AND 3 OR day(o_orderdate) BETWEEN 25 AND 28)
    AND o_orderpriority IN ('1-URGENT', '2-HIGH')
    AND year(o_orderdate) IN (1995, 1996, 1997)
  GROUP BY l_orderkey, o_custkey
) dn
JOIN customer ON dn.ck = c_custkey
WHERE dn.cnt BETWEEN 5 AND 7
ORDER BY c_name, dn.ticket
LIMIT 1000
""",
)


_sql_query(
    "tpcds_q46",
    """TPC-DS Q46 shape (tpcds-q46.test): weekend sales per ticket with
    the bought-city ≠ home-city cross-dimension inequality. ADAPTED:
    city→nation (bought = supplier's nation, home = customer's),
    dow IN (6,0) on l_shipdate (engine dow normalized), hd filter →
    o_orderpriority.""",
    f"""
SELECT c_name, hn.n_name AS home_city, bn.n_name AS bought_city,
       dn.ticket, dn.amt
FROM (
  SELECT l_orderkey AS ticket, o_custkey AS ck, s_nationkey AS bk,
         {_DSUM.format(c='l_extendedprice')} AS amt
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE dayofweek(l_shipdate) IN (1, 7)
    AND year(l_shipdate) IN (1996, 1997, 1998)
    AND o_orderpriority = '1-URGENT'
  GROUP BY l_orderkey, o_custkey, s_nationkey
) dn
JOIN customer ON dn.ck = c_custkey
JOIN nation hn ON c_nationkey = hn.n_nationkey
JOIN nation bn ON dn.bk = bn.n_nationkey
WHERE bn.n_name <> hn.n_name
ORDER BY c_name, dn.ticket, bought_city
LIMIT 100
""",
    f"""
SELECT c_name, hn.n_name AS home_city, bn.n_name AS bought_city,
       dn.ticket, dn.amt
FROM (
  SELECT l_orderkey AS ticket, o_custkey AS ck, s_nationkey AS bk,
         {_DSUM.format(c='l_extendedprice')} AS amt
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE dayofweek(l_shipdate) + 1 IN (1, 7)
    AND year(l_shipdate) IN (1996, 1997, 1998)
    AND o_orderpriority = '1-URGENT'
  GROUP BY l_orderkey, o_custkey, s_nationkey
) dn
JOIN customer ON dn.ck = c_custkey
JOIN nation hn ON c_nationkey = hn.n_nationkey
JOIN nation bn ON dn.bk = bn.n_nationkey
WHERE bn.n_name <> hn.n_name
ORDER BY c_name, dn.ticket, bought_city
LIMIT 100
""",
    headline=True,  # round-4 window rotation: bench the inequality join too
)


_sql_query(
    "tpcds_q53",
    """TPC-DS Q53 shape (tpcds-q53.test): manufacturer × quarter rollup
    under OR-of-(category,class,brand) item filters, with the quarter
    key GROUPED but NOT projected (the reference's unprojected-group-
    key quirk, kept). ADAPTED: i_manufact_id→p_size, category/brand
    →p_type/p_brand.""",
    """
SELECT * FROM (
  SELECT p_size AS manufact,
         cast(sum(cast(l_extendedprice as decimal(12,2))) as double) AS sum_sales
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
    AND ((p_type LIKE 'SMALL%' AND p_brand LIKE 'Brand#1%')
         OR (p_type LIKE 'LARGE%' AND p_brand LIKE 'Brand#2%'))
  GROUP BY p_size, quarter(l_shipdate)
) tmp1
ORDER BY sum_sales, manufact
LIMIT 100
""",
)


_sql_query(
    "tpcds_q59",
    """TPC-DS Q59 shape (tpcds-q59.test): week-over-week store sales
    ratios — the weekly day-pivot aggregate SELF-JOINED across two
    years on (store, week). ADAPTED: store→supplier, d_week_seq→
    weekofyear, two pivot columns instead of seven (same join
    algebra); ratio = double division of decimal-exact sums.""",
    """
WITH wss AS (
  SELECT weekofyear(l_shipdate) AS wk, year(l_shipdate) AS yr, l_suppkey AS sk,
         cast(sum(CASE WHEN dayofweek(l_shipdate) = 2 THEN cast(l_extendedprice as decimal(12,2)) END) as double) AS mon_sales,
         cast(sum(CASE WHEN dayofweek(l_shipdate) = 6 THEN cast(l_extendedprice as decimal(12,2)) END) as double) AS fri_sales
  FROM lineitem
  GROUP BY weekofyear(l_shipdate), year(l_shipdate), l_suppkey
)
SELECT y1.sk AS suppkey, y1.wk AS week_seq,
       round(y1.mon_sales / y2.mon_sales, 6) AS mon_ratio,
       round(y1.fri_sales / y2.fri_sales, 6) AS fri_ratio
FROM (SELECT * FROM wss WHERE yr = 1996) y1
JOIN (SELECT * FROM wss WHERE yr = 1997) y2
  ON y1.sk = y2.sk AND y1.wk = y2.wk
WHERE y1.mon_sales > 0 AND y2.mon_sales > 0
ORDER BY suppkey, week_seq
LIMIT 100
""",
    """
WITH wss AS (
  SELECT weekofyear(l_shipdate) AS wk, year(l_shipdate) AS yr, l_suppkey AS sk,
         cast(sum(CASE WHEN dayofweek(l_shipdate) + 1 = 2 THEN cast(l_extendedprice as decimal(12,2)) END) as double) AS mon_sales,
         cast(sum(CASE WHEN dayofweek(l_shipdate) + 1 = 6 THEN cast(l_extendedprice as decimal(12,2)) END) as double) AS fri_sales
  FROM lineitem
  GROUP BY weekofyear(l_shipdate), year(l_shipdate), l_suppkey
)
SELECT y1.sk AS suppkey, y1.wk AS week_seq,
       round(y1.mon_sales / y2.mon_sales, 6) AS mon_ratio,
       round(y1.fri_sales / y2.fri_sales, 6) AS fri_ratio
FROM (SELECT * FROM wss WHERE yr = 1996) y1
JOIN (SELECT * FROM wss WHERE yr = 1997) y2
  ON y1.sk = y2.sk AND y1.wk = y2.wk
WHERE y1.mon_sales > 0 AND y2.mon_sales > 0
ORDER BY suppkey, week_seq
LIMIT 100
""",
)


_sql_query(
    "tpcds_q63",
    """TPC-DS Q63 shape (tpcds-q63.test): q53's twin at manager × month
    grain (unprojected month group key kept). ADAPTED as q53 with the
    opposite projection/ordering.""",
    """
SELECT * FROM (
  SELECT p_size AS manager,
         cast(sum(cast(l_extendedprice as decimal(12,2))) as double) AS sum_sales
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
    AND ((p_type LIKE 'SMALL%' AND p_brand LIKE 'Brand#1%')
         OR (p_type LIKE 'LARGE%' AND p_brand LIKE 'Brand#2%'))
  GROUP BY p_size, month(l_shipdate)
) tmp1
ORDER BY manager, sum_sales
LIMIT 100
""",
)


_sql_query(
    "tpcds_q65",
    """TPC-DS Q65 shape (tpcds-q65.test): store-item revenue vs the
    store's AVERAGE item revenue (the same aggregate reused at two
    grains), keeping items under 50%% of the store average. ADAPTED:
    store→supplier, item→part; avg = sum/count exact.""",
    """
WITH sc AS (
  SELECT l_suppkey AS sk, l_partkey AS pk,
         cast(sum(cast(l_extendedprice as decimal(12,2))) as double) AS revenue
  FROM lineitem
  WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
  GROUP BY l_suppkey, l_partkey
),
sa AS (
  SELECT sk, round(sum(revenue) / count(*), 6) AS ave FROM sc GROUP BY sk
)
SELECT s_name, p_name, round(sc.revenue, 6) AS revenue, round(sa.ave, 6) AS ave
FROM sc
JOIN sa ON sc.sk = sa.sk
JOIN supplier ON sc.sk = s_suppkey
JOIN part ON sc.pk = p_partkey
WHERE sc.revenue <= 0.5 * sa.ave
ORDER BY s_name, p_name
LIMIT 100
""",
    headline=True,
)


_sql_query(
    "tpcds_q68",
    """TPC-DS Q68 shape (tpcds-q68.test): q46's family with three
    pivoted sums and the city inequality applied OUTSIDE the subquery.
    ADAPTED: cities→nations, dom IN (1,2) on the ship date.""",
    f"""
SELECT c_name, hn.n_name AS home_city, bn.n_name AS bought_city, dn.ticket,
       dn.extended_price, dn.extended_tax
FROM (
  SELECT l_orderkey AS ticket, o_custkey AS ck, s_nationkey AS bk,
         {_DSUM.format(c='l_extendedprice')} AS extended_price,
         cast(sum(cast(l_tax as decimal(9,4))) as double) AS extended_tax
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE day(l_shipdate) IN (1, 2)
    AND year(l_shipdate) BETWEEN 1996 AND 1998
    AND o_orderpriority IN ('2-HIGH', '3-MEDIUM')
  GROUP BY l_orderkey, o_custkey, s_nationkey
) dn
JOIN customer ON dn.ck = c_custkey
JOIN nation hn ON c_nationkey = hn.n_nationkey
JOIN nation bn ON dn.bk = bn.n_nationkey
WHERE bn.n_name <> hn.n_name
ORDER BY c_name, dn.ticket, bought_city
LIMIT 100
""",
)


_sql_query(
    "tpcds_q73",
    """TPC-DS Q73 shape (tpcds-q73.test): q34's twin with a narrower
    dom window and low count band, ordered by cnt DESC. ADAPTED as
    q34; full tiebreak appended for a deterministic LIMIT.""",
    """
SELECT c_name, dj.ticket, dj.cnt
FROM (
  SELECT l_orderkey AS ticket, o_custkey AS ck, count(*) AS cnt
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE day(o_orderdate) BETWEEN 1 AND 2
    AND o_orderpriority IN ('1-URGENT', '2-HIGH')
    AND year(o_orderdate) IN (1996, 1997, 1998)
  GROUP BY l_orderkey, o_custkey
) dj
JOIN customer ON dj.ck = c_custkey
WHERE dj.cnt BETWEEN 1 AND 5
ORDER BY dj.cnt DESC, c_name, dj.ticket
LIMIT 100
""",
)


_sql_query(
    "tpcds_q79",
    """TPC-DS Q79 shape (tpcds-q79.test): Monday per-ticket profit by
    store city with an employee-band store filter. ADAPTED:
    s_number_employees band→s_acctbal band, city→supplier nation,
    profit→decimal-exact extended price minus tax-weighted price.""",
    f"""
SELECT c_name, dn.city, dn.ticket, dn.amt
FROM (
  SELECT l_orderkey AS ticket, o_custkey AS ck, n_name AS city,
         {_DSUM.format(c='l_extendedprice')} AS amt
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE dayofweek(l_shipdate) = 2
    AND year(l_shipdate) IN (1996, 1997, 1998)
    AND s_acctbal BETWEEN 0 AND 5000
  GROUP BY l_orderkey, o_custkey, n_name
) dn
JOIN customer ON dn.ck = c_custkey
ORDER BY c_name, dn.city, dn.ticket
LIMIT 100
""",
    f"""
SELECT c_name, dn.city, dn.ticket, dn.amt
FROM (
  SELECT l_orderkey AS ticket, o_custkey AS ck, n_name AS city,
         {_DSUM.format(c='l_extendedprice')} AS amt
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE dayofweek(l_shipdate) + 1 = 2
    AND year(l_shipdate) IN (1996, 1997, 1998)
    AND s_acctbal BETWEEN 0 AND 5000
  GROUP BY l_orderkey, o_custkey, n_name
) dn
JOIN customer ON dn.ck = c_custkey
ORDER BY c_name, dn.city, dn.ticket
LIMIT 100
""",
)


_sql_query(
    "tpcds_q89",
    """TPC-DS Q89 shape (tpcds-q89.test): category × brand × store ×
    month rollup under OR-of-(category,class) filters. ADAPTED:
    category/class→p_type LIKE arms, store/company→supplier; full
    tiebreak appended.""",
    """
SELECT * FROM (
  SELECT p_type, p_brand, s_name, month(l_shipdate) AS moy,
         cast(sum(cast(l_extendedprice as decimal(12,2))) as double) AS sum_sales
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
    AND (p_type LIKE 'SMALL%' OR p_type LIKE 'MEDIUM%')
  GROUP BY p_type, p_brand, s_name, month(l_shipdate)
) tmp1
ORDER BY sum_sales, s_name, p_type, p_brand, moy
LIMIT 100
""",
)


_sql_query(
    "tpcds_q98",
    """TPC-DS Q98 shape (tpcds-q98.test): 30-day item revenue by
    category/class. ADAPTED: i_item_desc→p_name, i_category→p_type,
    i_class→p_brand, i_current_price→p_retailprice.""",
    """
SELECT p_name, p_type, p_brand, p_retailprice,
       cast(sum(cast(l_extendedprice as decimal(12,2))) as double) AS itemrevenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_type IN ('SMALL', 'LARGE', 'MEDIUM')
  AND l_shipdate BETWEEN TIMESTAMP '1997-01-12' AND TIMESTAMP '1997-02-11'
GROUP BY p_name, p_type, p_brand, p_retailprice
ORDER BY p_type, p_brand, p_name, p_retailprice
LIMIT 1000
""",
)


_sql_query(
    "tpcds_count",
    """TPC-DS count.test: per-table row counts as one tagged union —
    the workload's smoke check over every driver table.""",
    """
SELECT 'region' AS tbl, count(*) AS n FROM region
UNION ALL SELECT 'nation', count(*) FROM nation
UNION ALL SELECT 'customer', count(*) FROM customer
UNION ALL SELECT 'supplier', count(*) FROM supplier
UNION ALL SELECT 'part', count(*) FROM part
UNION ALL SELECT 'orders', count(*) FROM orders
UNION ALL SELECT 'lineitem', count(*) FROM lineitem
UNION ALL SELECT 'events', count(*) FROM events
UNION ALL SELECT 'documents', count(*) FROM documents
UNION ALL SELECT 'embeddings', count(*) FROM embeddings
""",
)
