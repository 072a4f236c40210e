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


# ---------------------------------------------------------------------------
# Office Open XML ingestion (round 12)
# ---------------------------------------------------------------------------


def _office_oracle() -> str:
    """The synthesis is deterministic from doc_id + text (even ids →
    DOCX with 8-word paragraphs and a 3-word title; odd → XLSX with
    10 shared-string cells on sheet 1, the rest inline on sheet 2,
    plus 1 + d%4 numeric cells), so every output column replays in
    SQL; text_md5 hashes the whitespace-NORMALIZED extraction, which
    equals the normalized source text for both kinds."""
    return """
WITH w AS (SELECT doc_id AS d,
                  list_filter(string_split(coalesce(text, ''), ' '),
                              x -> x <> '') AS ws,
                  trim(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g'))
                    AS norm
           FROM documents),
f AS (SELECT d, len(ws) AS nw, norm,
             CASE WHEN len(ws) >= 3
                  THEN ws[1] || ' ' || ws[2] || ' ' || ws[3]
                  WHEN len(ws) > 0
                  THEN array_to_string(ws, ' ') ELSE 'untitled' END AS ttl
      FROM w)
SELECT d AS doc_id,
       CASE WHEN d % 2 = 0 THEN 'docx' ELSE 'xlsx' END AS kind,
       CAST(CASE WHEN d % 2 = 0 THEN 4
                 ELSE 5 + (CASE WHEN nw > 0 THEN 1 ELSE 0 END) END AS INT)
         AS n_parts,
       CAST(CASE WHEN d % 2 = 0 THEN (nw + 7) // 8 ELSE nw END AS BIGINT)
         AS n_units,
       CAST(CASE WHEN d % 2 = 0 THEN 0 ELSE 1 + d % 4 END AS BIGINT)
         AS n_numeric,
       CASE WHEN d % 2 = 0 THEN ttl ELSE NULL END AS title,
       md5(norm) AS text_md5
FROM f
"""


@query("pipe_office_extract", oracle=_office_oracle())
def pipe_office_extract(spark, sf_dir):
    """Round-12 Office Open XML ingestion (operators/office.py):
    each document is packaged as a REAL ECMA-376 container with the
    stdlib zipfile writer twins — even doc_ids a DOCX (8-word
    paragraphs, Dublin-Core title = first 3 words), odd an XLSX
    (first 10 words as SHARED-STRING cells on sheet 1, the rest as
    INLINE strings on sheet 2, plus 1 + d%4 numeric cells) — and
    extracted back through the from-scratch zip walk + DOCTYPE-gated
    XML text path.  The whitespace-normalized extraction must hash
    equal to the normalized source text, and every count (parts,
    paragraphs/string cells, numeric cells) replays in DuckDB.
    Scale: Arrow-batched narrow map, no shuffle."""
    import hashlib

    import pandas as pd
    from pyspark.sql import functions as F

    from impala_cut_spark.operators.office import (
        build_docx,
        build_xlsx,
        office_extract,
    )

    docs = t(spark, sf_dir, "documents")

    def _pack(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                words = [x for x in (text or "").split(" ") if x]
                if d % 2 == 0:
                    paras = [" ".join(words[i : i + 8])
                             for i in range(0, len(words), 8)]
                    title = " ".join(words[:3]) or "untitled"
                    payloads.append(bytearray(build_docx(
                        paras, title=title, creator="corpus")))
                else:
                    s1 = [words[i : i + 5]
                          for i in range(0, min(len(words), 10), 5)]
                    rest = words[10:]
                    s2 = [rest[i : i + 5] for i in range(0, len(rest), 5)]
                    s2.append(list(range(1 + d % 4)))
                    payloads.append(bytearray(build_xlsx(
                        [s1, s2], inline_from_sheet=1)))
                ids.append(d)
            yield pd.DataFrame({"source_id": pd.Series(ids, dtype="int64"),
                                "payload": pd.Series(payloads, dtype="object")})

    assets = docs.select("doc_id", "text").mapInPandas(
        _pack, schema="source_id bigint, payload binary")
    out = office_extract(assets)
    return out.select(
        F.col("source_id").alias("doc_id"),
        "kind", "n_parts", "n_units", "n_numeric", "title",
        F.md5(F.trim(F.regexp_replace(
            F.coalesce(F.col("text"), F.lit("")), r"\s+", " "))
        ).alias("text_md5"),
    )
