"""Link-graph construction and host-level PageRank for crawl curation.

The quality signal a web-scale corpus pipeline computes BEFORE
training-data selection: pages link to hosts, the host graph gets a
centrality score, and low-reputation hosts are down-weighted or
dropped (the CommonCrawl/RefinedWeb-style curation step; the
reference has no graph operator — this sits in the LLM-pipeline
extension surface alongside dedup and ANN).

Spark-first design for 100 TB:

- **Link extraction is pure codegen** (`page_links`, `url_host`):
  `regexp_extract_all` + `explode` + a host regexp — no Python on the
  per-page data path, filters and projections reach the scan.
- **Edges stay put; ranks move.**  The edge table (billions of rows at
  crawl scale) is aggregated ONCE to distinct weighted host pairs and
  cached.  Each PageRank iteration joins the SMALL per-host rank
  table (one row per host — millions, not billions) to the edges and
  aggregates contributions per destination: one shuffle of
  map-side-combined partials per iteration, never a re-shuffle of the
  raw edge volume.  With ``broadcast_ranks=True`` (default; correct
  while the host table fits the broadcast threshold) the join ships
  the rank table to the edge partitions; past broadcast range pass
  False and AQE picks a partitioned join keyed the same way.
- **Fixed-point integer arithmetic.**  Ranks live in integer
  micro-units (``SCALE = 10**12`` total mass) and damping is the
  exact rational 17/20, so every operation is bigint add / multiply /
  floor-div.  Distributed summation order therefore CANNOT perturb
  the result — scores are bit-stable across partitionings, retries,
  and engines, which makes the operator strict-oracle-checkable
  (DuckDB replays the same integer ops with ``//``) and its output
  safe to use as a routing KEY, not just a score.  A float variant is
  one cast away; the integer core is the deterministic contract.
- **Bounded iterations** (default 3): each iteration materializes a
  small per-host table; lineage stays shallow, no checkpoint needed
  at realistic iteration counts.  The one ``collect()`` per iteration
  is a SINGLE bigint (the dangling mass) — bounded by contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: total integer rank mass — 10^12 micro-units keeps ~6 significant
#: digits after division across 10^6 hosts while the 17× damping
#: multiply stays far inside bigint range.
SCALE = 10**12

#: damping factor as the exact rational DAMP_NUM/DAMP_DEN = 0.85
DAMP_NUM = 17
DAMP_DEN = 20

#: href-target extraction regexp (Java dialect, used via expr —
#: regexp_extract_all has no Column API in this PySpark).  Fragment
#: links die at the [^...#>] class; quotes both styles.
_HREF_RE = '(?i)<a\\\\s[^>]*href\\\\s*=\\\\s*["\\\']([^"\\\'#>]+)'


def page_links(html_col: str) -> Column:
    """``<a href="...">`` targets of a page as an array column — pure
    JVM codegen over the named column (regexp_extract_all), no Python
    on the data path."""
    return F.expr(f"regexp_extract_all({html_col}, '{_HREF_RE}', 1)")


def url_host(url: Column) -> Column:
    """Lowercased host of an absolute http(s) URL; NULL for relative
    or non-http schemes (mailto:, javascript:, data:) so the edge
    builder's filter drops them.  Pure codegen."""
    host = F.regexp_extract(url, r"(?i)^https?://([^/:?#]+)", 1)
    return F.nullif(F.lower(host), F.lit(""))


def host_edges(
    pages: DataFrame,
    host_col: str = "host",
    html_col: str = "html",
    drop_self: bool = True,
) -> DataFrame:
    """(src_host, dst_host, n_links) — the weighted distinct host
    graph of a page set.  Extraction and host parsing are codegen;
    the ONLY shuffle is the (src, dst) weight aggregate, partial
    map-side.  Self-loops are dropped by default (the PageRank
    convention — they only feed a host's rank back to itself)."""
    e = (
        pages.select(
            F.col(host_col).alias("src_host"),
            F.explode(page_links(html_col)).alias("href"),
        )
        .select("src_host", url_host(F.col("href")).alias("dst_host"))
        .where(F.col("dst_host").isNotNull())
    )
    if drop_self:
        e = e.where(F.col("src_host") != F.col("dst_host"))
    return e.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("n_links")
    )


def host_rank(
    edges: DataFrame,
    iterations: int = 3,
    broadcast_ranks: bool = True,
) -> DataFrame:
    """Fixed-point integer PageRank over a (src_host, dst_host) edge
    table → ``(host, rank_micro bigint, in_hosts bigint, out_hosts
    bigint)``.  Exact update rule per iteration (all bigint ops on
    non-negative values, so Spark ``div`` ≡ DuckDB ``//``)::

        share(u) = rank(u) div out_deg(u)            -- linkers only
        dangling = sum(rank(u) : out_deg(u) = 0)
        rank'(v) = (3 * (SCALE div N)
                    + 17 * (contrib(v) + dangling div N)) div 20

    where ``contrib(v) = sum(share(u))`` over in-edges and ``N`` is
    the host count.  Edge weights are ignored (distinct-edge
    PageRank, the standard formulation); total mass drifts only by
    floor-division remainders, identically in any replay."""
    nodes = (
        edges.select(F.col("src_host").alias("host"))
        .unionAll(edges.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    deg = edges.groupBy("src_host").agg(F.count(F.lit(1)).alias("out_deg"))
    base = (
        nodes.join(deg, nodes.host == deg.src_host, "left")
        .select("host", F.coalesce("out_deg", F.lit(0)).alias("out_deg"))
        .persist()
    )
    e = edges.select("src_host", "dst_host").persist()
    n = base.count()  # materializes base; one bounded driver integer

    def _big(x: int) -> str:
        return f"cast({x} as bigint)"

    init_rank = f"{_big(SCALE)} div {_big(n)}"
    teleport = f"{_big(DAMP_DEN - DAMP_NUM)} * ({_big(SCALE)} div {_big(n)})"
    ranks = base.select(
        "host", "out_deg", F.expr(init_rank).alias("rank_micro")
    )
    prev = None
    for _ in range(iterations):
        r = ranks.persist()
        dangling = (
            r.where(F.col("out_deg") == 0)
            .agg(F.coalesce(F.sum("rank_micro"), F.lit(0)).alias("d"))
            .collect()[0]["d"]
        )  # this agg scans every partition of r, so r is now cached;
        # only then drop the previous iteration's table (unpersisting
        # earlier would make each iteration recompute the whole chain)
        if prev is not None:
            prev.unpersist()
        prev = r
        linkers = r.where(F.col("out_deg") > 0).select(
            "host", F.expr("rank_micro div out_deg").alias("share")
        )
        if broadcast_ranks:
            linkers = F.broadcast(linkers)
        contrib = (
            e.join(linkers, e.src_host == linkers.host)
            .groupBy("dst_host")
            .agg(F.sum("share").alias("contrib"))
        )
        update = (
            f"({teleport} + {_big(DAMP_NUM)} * "
            f"(cast(coalesce(contrib, 0) as bigint)"
            f" + {_big(int(dangling) // n)})) div {_big(DAMP_DEN)}"
        )
        ranks = base.join(
            contrib, base.host == contrib.dst_host, "left"
        ).select("host", "out_deg", F.expr(update).alias("rank_micro"))
    in_deg = edges.groupBy("dst_host").agg(
        F.count(F.lit(1)).alias("in_hosts")
    )
    return ranks.join(in_deg, ranks.host == in_deg.dst_host, "left").select(
        "host",
        "rank_micro",
        F.coalesce("in_hosts", F.lit(0)).alias("in_hosts"),
        F.col("out_deg").alias("out_hosts"),
    )
