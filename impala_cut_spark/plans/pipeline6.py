"""Round-12 LLM-data-pipeline queries: link graph + host PageRank.

Same contract as pipeline.py: every entry returns a DataFrame whose
rendered rows strict-match the DuckDB oracle (registry.py determinism
rules).  The link rows use FULLY-CODEGEN page synthesis — the
deterministic HTML (hosts and hrefs derived from doc_id alone) is
built with concat/when expressions, so the entire query (synthesis →
extraction → graph → rank) runs without Python touching a single data
row; the DuckDB oracle regenerates the same links with range unnest.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from impala_cut_spark.operators.linkgraph import (
    DAMP_DEN,
    DAMP_NUM,
    SCALE,
    host_edges,
    host_rank,
)
from impala_cut_spark.plans._util import t
from impala_cut_spark.plans.registry import query

#: number of synthetic hosts (prime, so the d*7+i*13 link rule mixes)
_H = 97


def _pages(docs):
    """documents → (doc_id, host, html) with PURE-CODEGEN synthesis:
    page d lives on host h{d%97}.example and links to hosts
    h{(d*7+i*13)%97}.example for i = 1..(1 + d%4).  The i=1 link is
    uppercased (<A HREF="HTTP://H...EXAMPLE...) to exercise the
    case-folding of both the extraction regexp and url_host; every
    page also carries one relative, one mailto: and one #fragment
    link that the extractor must drop."""
    d = F.col("doc_id")

    def _dst(i: int) -> F.Column:
        return ((d * 7 + i * 13) % _H).cast("string")

    link1 = F.concat(
        F.lit('<A HREF="HTTP://H'), _dst(1),
        F.lit('.EXAMPLE/p/'), d.cast("string"), F.lit('">T</A>'),
    )
    rest = [
        F.when(
            (d % 4) >= i - 1,
            F.concat(
                F.lit('<a href="http://h'), _dst(i),
                F.lit(".example/p/"), d.cast("string"), F.lit('">t</a>'),
            ),
        ).otherwise(F.lit(""))
        for i in (2, 3, 4)
    ]
    noise = F.concat(
        F.lit('<a href="/rel/'), d.cast("string"), F.lit('">r</a>'),
        F.lit('<a href="mailto:x@y.z">m</a><a href="#top">f</a>'),
    )
    html = F.concat(
        F.lit("<html><body>"), noise, link1, *rest, F.lit("</body></html>")
    )
    return docs.select(
        "doc_id",
        F.concat(F.lit("h"), (d % _H).cast("string"), F.lit(".example"))
        .alias("host"),
        html.alias("html"),
    )


#: the DuckDB twin of _pages' link rule — (src_host, dst_host) per
#: link occurrence, self-links NOT yet dropped (each consumer applies
#: its own filter, mirroring host_edges' drop_self)
_SQL_LINKS = f"""
links AS (
  SELECT doc_id AS d,
         CAST(unnest(range(1, 2 + doc_id % 4)) AS BIGINT) AS i
  FROM documents
),
pairs AS (
  SELECT 'h' || CAST(d % {_H} AS VARCHAR) || '.example' AS src_host,
         'h' || CAST((d * 7 + i * 13) % {_H} AS VARCHAR) || '.example'
           AS dst_host
  FROM links
)"""


def _link_graph_oracle() -> str:
    return f"""
WITH {_SQL_LINKS}
SELECT src_host, dst_host, CAST(count(*) AS BIGINT) AS n_links
FROM pairs
WHERE src_host <> dst_host
GROUP BY src_host, dst_host
"""


@query("pipe_link_graph", oracle=_link_graph_oracle())
def pipe_link_graph(spark, sf_dir):
    """Link-graph construction (operators/linkgraph.py host_edges):
    deterministic HTML pages — synthesized entirely in codegen from
    doc_id — flow through the pure-codegen href extractor + host
    parser into the weighted distinct host graph.  Relative, mailto:
    and #fragment links are dropped by the extractor; one link per
    page is uppercased to pin case folding.  Scale: zero Python on
    the data path; the ONLY shuffle is the (src, dst) weight
    aggregate, map-side combined."""
    docs = t(spark, sf_dir, "documents")
    return host_edges(_pages(docs))


def _host_rank_oracle(iterations: int = 3) -> str:
    """Unrolled k-iteration fixed-point PageRank in pure SQL — the
    same bigint ops as host_rank (DuckDB ``//`` ≡ Spark ``div`` on
    non-negative bigints), so the hash match is exact, not a float
    tolerance."""
    base_cte = f"""
edges AS (
  SELECT DISTINCT src_host, dst_host FROM pairs
  WHERE src_host <> dst_host
),
nodes AS (
  SELECT DISTINCT h AS host FROM (
    SELECT src_host AS h FROM edges
    UNION ALL SELECT dst_host FROM edges)
),
deg AS (SELECT src_host, CAST(count(*) AS BIGINT) AS out_deg
        FROM edges GROUP BY src_host),
base AS (SELECT host, coalesce(out_deg, 0) AS out_deg
         FROM nodes LEFT JOIN deg ON host = src_host),
params AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
r0 AS (SELECT host, out_deg, {SCALE} // n AS rank FROM base, params)"""
    its = []
    for k in range(1, iterations + 1):
        p = k - 1
        its.append(f"""
d{k} AS (SELECT coalesce(sum(rank), 0) AS dang
         FROM r{p} WHERE out_deg = 0),
c{k} AS (SELECT e.dst_host, sum(r.rank // r.out_deg) AS contrib
         FROM edges e JOIN r{p} r
           ON e.src_host = r.host AND r.out_deg > 0
         GROUP BY e.dst_host),
r{k} AS (SELECT b.host, b.out_deg,
                ({DAMP_DEN - DAMP_NUM} * ({SCALE} // n)
                 + {DAMP_NUM} * (coalesce(c.contrib, 0) + dang // n))
                // {DAMP_DEN} AS rank
         FROM base b
         LEFT JOIN c{k} c ON b.host = c.dst_host, params, d{k})""")
    return f"""
WITH {_SQL_LINKS},{base_cte},{",".join(its)},
in_deg AS (SELECT dst_host, CAST(count(*) AS BIGINT) AS in_hosts
           FROM edges GROUP BY dst_host)
SELECT r.host,
       CAST(r.rank AS BIGINT) AS rank_micro,
       coalesce(i.in_hosts, 0) AS in_hosts,
       r.out_deg AS out_hosts
FROM r{iterations} r LEFT JOIN in_deg i ON r.host = i.dst_host
"""


@query("pipe_host_rank", oracle=_host_rank_oracle())
def pipe_host_rank(spark, sf_dir):
    """Host-level PageRank (operators/linkgraph.py host_rank) over
    the same deterministic link graph: 3 iterations of the
    fixed-point INTEGER update (micro-rank units, damping 17/20), so
    distributed summation order cannot perturb a single bit and the
    DuckDB oracle unrolls the identical bigint arithmetic — a strict
    hash match on an iterative graph algorithm.  Scale: edges are
    aggregated once and cached; each iteration broadcasts the
    per-host rank table to the edge partitions and shuffles only
    map-combined per-destination partials; the one collect per
    iteration is a single bigint (dangling mass)."""
    docs = t(spark, sf_dir, "documents")
    edges = host_edges(_pages(docs))
    return host_rank(edges, iterations=3)
