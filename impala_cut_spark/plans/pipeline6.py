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


# ---------------------------------------------------------------------------
# robots.txt + sitemap (round 12)
# ---------------------------------------------------------------------------

#: hosts for the crawl-politeness rows: s{d%31}.example
_RH = 31


def _robots_oracle() -> str:
    """The synthetic policy per host h is fixed (trainbot group:
    Disallow /raw/, Allow /raw/pub/, Crawl-delay 1 + h%5; '*' group
    Disallow: /), and path selection by d%4 is deterministic, so the
    longest-match verdict collapses to a CASE replay: d%4=0 no rule
    matches (allowed, 0 octets), 1 hits /raw/ (disallowed, 5), 2 hits
    the longer /raw/pub/ allow (allowed, 9), 3 — the prefix edge
    /raw/pub without the slash — hits only /raw/ (disallowed, 5).
    The '*' group's Disallow: / must never apply to the trainbot
    agent, or every row flips."""
    return f"""
SELECT doc_id AS url_id,
       's' || CAST(doc_id % {_RH} AS VARCHAR) || '.example' AS host,
       CASE CAST(doc_id % 4 AS INT)
         WHEN 0 THEN '/page/' || CAST(doc_id AS VARCHAR)
         WHEN 1 THEN '/raw/' || CAST(doc_id AS VARCHAR)
         WHEN 2 THEN '/raw/pub/' || CAST(doc_id AS VARCHAR)
         ELSE '/raw/pub' END AS path,
       CAST(doc_id % 4 IN (0, 2) AS BOOLEAN) AS allowed,
       CAST(CASE CAST(doc_id % 4 AS INT)
         WHEN 0 THEN 0 WHEN 1 THEN 5 WHEN 2 THEN 9 ELSE 5 END AS INT)
         AS matched_octets,
       CAST(1 + (doc_id % {_RH}) % 5 AS DOUBLE) AS crawl_delay
FROM documents
"""


@query("pipe_robots_gate", oracle=_robots_oracle())
def pipe_robots_gate(spark, sf_dir):
    """RFC 9309 admission gate (operators/robots.py): per-host
    robots.txt bodies and per-doc URL paths are synthesized in PURE
    CODEGEN (host policy: a trainbot group with Disallow /raw/ +
    Allow /raw/pub/ + Crawl-delay, a '*' group with Disallow: /, a
    comment line and a Sitemap line), then every URL is gated through
    the real parser + longest-match engine under agent
    'trainbot-1.0' — group selection (prefix token match beats '*'),
    longest-match precedence, and the /raw/pub-without-slash prefix
    edge are all live in the window.  Scale: the robots side is ONE
    broadcast row per host; the URL volume never shuffles."""
    from pyspark.sql import functions as F

    from impala_cut_spark.operators.robots import robots_gate

    docs = t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    h = (d % _RH).cast("string")
    urls = docs.select(
        d.alias("url_id"),
        F.concat(F.lit("s"), h, F.lit(".example")).alias("host"),
        F.when(d % 4 == 0, F.concat(F.lit("/page/"), d.cast("string")))
        .when(d % 4 == 1, F.concat(F.lit("/raw/"), d.cast("string")))
        .when(d % 4 == 2, F.concat(F.lit("/raw/pub/"), d.cast("string")))
        .otherwise(F.lit("/raw/pub"))
        .alias("path"),
    )
    hosts = docs.select((d % _RH).alias("h")).distinct()
    hv = F.col("h").cast("string")
    robots = hosts.select(
        F.concat(F.lit("s"), hv, F.lit(".example")).alias("host"),
        F.concat(
            F.lit("# corpus crawler policy\n"
                  "User-agent: trainbot\n"
                  "Disallow: /raw/\n"
                  "Allow: /raw/pub/\n"
                  "Crawl-delay: "),
            (F.lit(1) + F.col("h") % 5).cast("string"),
            F.lit("\n\nUser-agent: *\nDisallow: /\n\nSitemap: http://s"),
            hv, F.lit(".example/sitemap.xml\n"),
        ).alias("robots_txt"),
    )
    return robots_gate(urls, robots, agent="trainbot-1.0")


def _sitemap_oracle() -> str:
    """Replay of the deterministic sitemap synthesis: every 5th doc
    is a <sitemapindex> with two pointer entries, the rest are
    <urlset> documents with 1 + d%3 url entries carrying lastmod
    2026-01-(1 + d%28, zero-padded) and priority 0.(d%10)."""
    return f"""
WITH idx AS (
  SELECT doc_id AS d, CAST(unnest(range(1, 3)) AS BIGINT) AS j
  FROM documents WHERE doc_id % 5 = 0
),
urls AS (
  SELECT doc_id AS d, CAST(unnest(range(0, 1 + doc_id % 3)) AS BIGINT) AS i
  FROM documents WHERE doc_id % 5 <> 0
)
SELECT d AS doc_id, 'index' AS kind,
       'http://s' || CAST(d % {_RH} AS VARCHAR) || '.example/sm/'
         || CAST(d AS VARCHAR) || '/' || CAST(j AS VARCHAR) || '.xml' AS loc,
       '2026-01-' || lpad(CAST(1 + d % 28 AS VARCHAR), 2, '0') AS lastmod,
       CAST(NULL AS VARCHAR) AS priority
FROM idx
UNION ALL
SELECT d, 'url',
       'http://s' || CAST(d % {_RH} AS VARCHAR) || '.example/p/'
         || CAST(d AS VARCHAR) || '/' || CAST(i AS VARCHAR),
       '2026-01-' || lpad(CAST(1 + d % 28 AS VARCHAR), 2, '0'),
       '0.' || CAST(d % 10 AS VARCHAR)
FROM urls
"""


@query("pipe_sitemap_urls", oracle=_sitemap_oracle())
def pipe_sitemap_urls(spark, sf_dir):
    """Sitemap discovery (operators/robots.py sitemap_extract): every
    5th document synthesizes as a <sitemapindex> (two child-sitemap
    POINTER rows — recursion is the fetcher's job, so the parser
    emits them as kind='index'), the rest as <urlset> documents with
    1 + d%3 <url> entries (loc/lastmod/priority).  Parsing goes
    through the shared DOCTYPE-rejection gate.  Scale: Arrow-batched
    narrow map, no shuffle."""
    import pandas as pd
    from pyspark.sql import functions as F

    from impala_cut_spark.operators.robots import sitemap_extract

    docs = t(spark, sf_dir, "documents")

    def _synth(batches):
        ns = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                h = d % _RH
                lastmod = f"2026-01-{1 + d % 28:02d}"
                if d % 5 == 0:
                    body = "".join(
                        f"<sitemap><loc>http://s{h}.example/sm/{d}/{j}.xml"
                        f"</loc><lastmod>{lastmod}</lastmod></sitemap>"
                        for j in (1, 2)
                    )
                    xml = (f'<?xml version="1.0" encoding="UTF-8"?>'
                           f"<sitemapindex {ns}>{body}</sitemapindex>")
                else:
                    body = "".join(
                        f"<url><loc> http://s{h}.example/p/{d}/{i} </loc>"
                        f"<lastmod>{lastmod}</lastmod>"
                        f"<priority>0.{d % 10}</priority></url>"
                        for i in range(1 + d % 3)
                    )
                    xml = (f'<?xml version="1.0" encoding="UTF-8"?>'
                           f"<urlset {ns}>{body}</urlset>")
                ids.append(d)
                payloads.append(bytearray(xml.encode("utf-8")))
            yield pd.DataFrame({"source_id": pd.Series(ids, dtype="int64"),
                                "payload": pd.Series(payloads, dtype="object")})

    assets = docs.select("doc_id").mapInPandas(
        _synth, schema="source_id bigint, payload binary")
    out = sitemap_extract(assets)
    return out.select(
        F.col("source_id").alias("doc_id"),
        "kind", "loc", "lastmod", "priority",
    )


# ---------------------------------------------------------------------------
# Matroska/WebM container metadata (round 12)
# ---------------------------------------------------------------------------


def _mkv_oracle() -> str:
    """Every muxed fact is a pure function of doc_id (+ first words
    for the title), so the metadata walk replays as a projection;
    duration is an integer number of seconds written as an exact
    IEEE double, so the DOUBLE column hash-matches with no
    tolerance."""
    return """
WITH w AS (SELECT doc_id AS d,
                  list_filter(string_split(coalesce(text, ''), ' '),
                              x -> x <> '') AS ws
           FROM documents),
f AS (SELECT d,
             CASE WHEN len(ws) >= 3
                  THEN ws[1] || ' ' || ws[2] || ' ' || ws[3]
                  WHEN len(ws) > 0
                  THEN array_to_string(ws, ' ') ELSE 'untitled' END AS ttl
      FROM w)
SELECT d AS doc_id,
       CASE WHEN d % 5 = 0 THEN 'webm' ELSE 'matroska' END AS doctype,
       CAST(1 + (CASE WHEN d % 2 = 1 THEN 1 ELSE 0 END) AS INT) AS n_tracks,
       CASE WHEN d % 3 = 0 THEN 'V_VP8' ELSE 'V_VP9' END AS video_codec,
       CAST(160 + 16 * (d % 8) AS INT) AS width,
       CAST(120 + 8 * (d % 8) AS INT) AS height,
       CASE WHEN d % 2 = 1 THEN 'A_OPUS' ELSE NULL END AS audio_codec,
       CAST(CASE WHEN d % 2 = 1 THEN 1 + (d // 2) % 2 ELSE NULL END AS INT)
         AS channels,
       CAST(1 + d % 60 AS DOUBLE) AS duration_s,
       ttl AS title
FROM f
"""


@query("pipe_video_mkv", oracle=_mkv_oracle())
def pipe_video_mkv(spark, sf_dir):
    """Round-12 Matroska/WebM metadata prune (operators/mkv.py):
    each document muxes to a minimal EBML container (VP8/VP9 video
    track with per-doc resolution, an Opus audio track on odd ids,
    title, exact-double duration; every 7th file uses the
    streaming-muxer UNKNOWN-size Segment form and every 5th the webm
    doctype) and walks back through the from-scratch VINT/master
    parser — the prune-before-decode stage for the second video
    container family after ISO BMFF.  Scale: Arrow-batched narrow
    map, Clusters skipped structurally, no shuffle."""
    import pandas as pd
    from pyspark.sql import functions as F

    from impala_cut_spark.operators.mkv import build_mkv, mkv_video_metadata

    docs = t(spark, sf_dir, "documents")

    def _mux(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                words = [x for x in (text or "").split(" ") if x]
                title = " ".join(words[:3]) or "untitled"
                payloads.append(bytearray(build_mkv(
                    doctype="webm" if d % 5 == 0 else "matroska",
                    title=title,
                    duration_s=float(1 + d % 60),
                    video=("V_VP8" if d % 3 == 0 else "V_VP9",
                           160 + 16 * (d % 8), 120 + 8 * (d % 8)),
                    audio_tracks=([("A_OPUS", 48000.0, 1 + (d // 2) % 2)]
                                  if d % 2 == 1 else []),
                    unknown_segment_size=(d % 7 == 0),
                )))
                ids.append(d)
            yield pd.DataFrame({"asset_id": pd.Series(ids, dtype="int64"),
                                "payload": pd.Series(payloads, dtype="object")})

    assets = docs.select("doc_id", "text").mapInPandas(
        _mux, schema="asset_id bigint, payload binary")
    out = mkv_video_metadata(assets)
    return out.select(
        F.col("asset_id").alias("doc_id"),
        "doctype", "n_tracks", "video_codec", "width", "height",
        "audio_codec", "channels", "duration_s", "title",
    )


# ---------------------------------------------------------------------------
# RSS/Atom feed discovery (round 12)
# ---------------------------------------------------------------------------


def _feed_oracle() -> str:
    """Even docs are RSS 2.0, odd are Atom; both carry 1 + d%3
    entries with id/link/timestamp fields derived from (d, i) — a
    range-unnest replay."""
    return f"""
WITH w AS (SELECT doc_id AS d,
                  list_filter(string_split(coalesce(text, ''), ' '),
                              x -> x <> '') AS ws
           FROM documents),
f AS (SELECT d,
             CASE WHEN len(ws) >= 2 THEN ws[1] || ' ' || ws[2]
                  WHEN len(ws) = 1 THEN ws[1] ELSE 'feed' END AS ft
      FROM w),
e AS (SELECT d, ft, CAST(unnest(range(0, 1 + d % 3)) AS BIGINT) AS i
      FROM f)
SELECT d AS doc_id,
       CASE WHEN d % 2 = 0 THEN 'rss' ELSE 'atom' END AS kind,
       ft AS feed_title,
       'entry ' || CAST(d AS VARCHAR) || ' ' || CAST(i AS VARCHAR) AS title,
       'http://s' || CAST(d % {_RH} AS VARCHAR) || '.example/a/'
         || CAST(d AS VARCHAR) || '/' || CAST(i AS VARCHAR) AS link,
       '2026-02-' || lpad(CAST(1 + d % 28 AS VARCHAR), 2, '0')
         || 'T00:00:0' || CAST(i % 10 AS VARCHAR) || 'Z' AS ts,
       CASE WHEN d % 2 = 0
            THEN 'g' || CAST(d AS VARCHAR) || '-' || CAST(i AS VARCHAR)
            ELSE 'tag:s' || CAST(d % {_RH} AS VARCHAR) || '.example,2026:'
                 || CAST(d AS VARCHAR) || ':' || CAST(i AS VARCHAR) END
         AS entry_id
FROM e
"""


@query("pipe_feed_extract", oracle=_feed_oracle())
def pipe_feed_extract(spark, sf_dir):
    """RSS/Atom feed discovery (operators/robots.py feed_extract):
    even documents synthesize as RSS 2.0 channels, odd as RFC 4287
    Atom feeds, each with 1 + d%3 entries (title/link/timestamp/id;
    the Atom link rides the href ATTRIBUTE, exercising the attribute
    path) — the incremental-crawl frontier source after sitemaps.
    Parsing shares the DOCTYPE gate.  Scale: Arrow-batched narrow
    map, no shuffle."""
    import pandas as pd
    from pyspark.sql import functions as F

    from impala_cut_spark.operators.robots import feed_extract

    docs = t(spark, sf_dir, "documents")

    def _synth(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                from xml.sax.saxutils import escape

                d = int(doc_id)
                words = [x for x in (text or "").split(" ") if x]
                ft = escape(" ".join(words[:2]) or "feed")
                h = d % _RH
                n = 1 + d % 3
                ts = [f"2026-02-{1 + d % 28:02d}T00:00:0{i % 10}Z"
                      for i in range(n)]
                if d % 2 == 0:
                    items = "".join(
                        f"<item><title>entry {d} {i}</title>"
                        f"<link>http://s{h}.example/a/{d}/{i}</link>"
                        f"<pubDate>{ts[i]}</pubDate>"
                        f"<guid>g{d}-{i}</guid></item>"
                        for i in range(n)
                    )
                    xml = (f'<rss version="2.0"><channel><title>{ft}'
                           f"</title>{items}</channel></rss>")
                else:
                    entries = "".join(
                        f"<entry><title>entry {d} {i}</title>"
                        f'<link href="http://s{h}.example/a/{d}/{i}"/>'
                        f"<updated>{ts[i]}</updated>"
                        f"<id>tag:s{h}.example,2026:{d}:{i}</id></entry>"
                        for i in range(n)
                    )
                    xml = ('<feed xmlns="http://www.w3.org/2005/Atom">'
                           f"<title>{ft}</title>{entries}</feed>")
                ids.append(d)
                payloads.append(bytearray(xml.encode("utf-8")))
            yield pd.DataFrame({"source_id": pd.Series(ids, dtype="int64"),
                                "payload": pd.Series(payloads, dtype="object")})

    assets = docs.select("doc_id", "text").mapInPandas(
        _synth, schema="source_id bigint, payload binary")
    return feed_extract(assets).select(
        F.col("source_id").alias("doc_id"),
        "kind", "feed_title", "title", "link", "ts", "entry_id",
    )


# ---------------------------------------------------------------------------
# Content-defined chunking dedup (round 12)
# ---------------------------------------------------------------------------

#: shared chunk-CTE for the CDC oracles: the polynomial boundary
#: predicate is per-position, so DuckDB rebuilds the exact chunk set
#: with range-unnest + substr (base 31, window 4 → 29791/961/31/1)
_SQL_CDC = """
d AS (SELECT doc_id, coalesce(text, '') AS t,
             len(coalesce(text, '')) AS n FROM documents),
pos AS (SELECT doc_id, t, n, CAST(unnest(range(4, n + 1)) AS INT) AS i
        FROM d),
hb AS (SELECT doc_id, i FROM pos
       WHERE (ord(substr(t, i - 3, 1)) * 29791
            + ord(substr(t, i - 2, 1)) * 961
            + ord(substr(t, i - 1, 1)) * 31
            + ord(substr(t, i, 1))) % 64 = 0),
b AS (SELECT d.doc_id, d.t, d.n,
             coalesce(list_sort(list(hb.i)
                                FILTER (WHERE hb.i IS NOT NULL)), [])
               AS bs
      FROM d LEFT JOIN hb ON d.doc_id = hb.doc_id
      GROUP BY d.doc_id, d.t, d.n),
c AS (SELECT doc_id, t, list_prepend(0, bs) AS ss,
             list_append(bs, n) AS es FROM b),
g AS (SELECT doc_id, t, ss, es,
             CAST(unnest(range(1, len(ss) + 1)) AS INT) AS gi FROM c),
ch AS (SELECT doc_id, t, ss[gi] AS s, es[gi] AS e FROM g
       WHERE es[gi] > ss[gi]),
chunks AS (SELECT doc_id,
                  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s)
                       - 1 AS INT) AS chunk_idx,
                  CAST(e - s AS INT) AS chunk_len,
                  md5(substr(t, s + 1, e - s)) AS chunk_md5
           FROM ch)"""


def _cdc_chunks_oracle() -> str:
    return f"WITH {_SQL_CDC} SELECT * FROM chunks"


@query("pipe_cdc_chunks", oracle=_cdc_chunks_oracle())
def pipe_cdc_chunks(spark, sf_dir):
    """Content-defined chunking (operators/cdc.py, the 'poly' oracle
    arm): every document splits at windowed-polynomial boundary
    positions (H over the last 4 chars ≡ 0 mod 64 → ~64-char chunks)
    — each boundary a pure per-position predicate, so DuckDB rebuilds
    the exact chunk set and the md5s strict-match.  The clamped
    FastCDC gear arm (stateful min/max, not SQL-replayable) is the
    production twin, pytest-verified for shift resistance.  Scale:
    linear Arrow-batched narrow map, chunk text never leaves the
    executor."""
    from impala_cut_spark.operators.cdc import cdc_chunk_rows

    docs = t(spark, sf_dir, "documents")
    return cdc_chunk_rows(docs, arm="poly")


def _cdc_dedup_oracle() -> str:
    return f"""
WITH {_SQL_CDC},
owners AS (SELECT chunk_md5, count(DISTINCT doc_id) AS nd
           FROM chunks GROUP BY chunk_md5),
fl AS (SELECT c.doc_id, c.chunk_len, o.nd > 1 AS is_dup
       FROM chunks c JOIN owners o ON c.chunk_md5 = o.chunk_md5)
SELECT s.source,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN fl.is_dup THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_chunks,
       CAST(sum(CASE WHEN fl.is_dup THEN fl.chunk_len ELSE 0 END)
            AS BIGINT) AS dup_len,
       CAST(sum(fl.chunk_len) AS BIGINT) AS total_len
FROM fl JOIN documents s ON fl.doc_id = s.doc_id
GROUP BY s.source
"""


@query("pipe_cdc_dedup", oracle=_cdc_dedup_oracle())
def pipe_cdc_dedup(spark, sf_dir):
    """Chunk-level dedup report (operators/cdc.py cdc_dup_stats):
    content-defined chunks keyed by md5, a chunk counting as
    duplicate when its hash appears in MORE THAN ONE document
    corpus-wide, aggregated per source — the byte-shift-resistant
    dedup granularity between whole-doc fingerprints and shingle
    families.  Scale: three hash shuffles (ownership count with
    map-side combine — its partitioning reused by the join build
    side — the probe-side repartition, the source aggregate);
    per-hash rows carry counts, never chunk text; the doc→source
    attach is a broadcast."""
    from impala_cut_spark.operators.cdc import cdc_chunk_rows, cdc_dup_stats

    docs = t(spark, sf_dir, "documents")
    chunks = cdc_chunk_rows(docs, arm="poly")
    return cdc_dup_stats(chunks, docs)


# ---------------------------------------------------------------------------
# Crawl-frontier composition (round 12): discovery → politeness → priority
# ---------------------------------------------------------------------------


def _frontier_oracle() -> str:
    """End-to-end replay from already-proven pieces: the link-graph
    host universe (h{d%97}.example) produces the 3-iteration
    fixed-point PageRank exactly as in _host_rank_oracle; candidate
    URLs (1 + d%3 per doc, every (d+i)%3==0 path under the
    disallowed /raw/ prefix) gate through the same per-host policy as
    pipe_robots_gate; surviving URLs score priority = rank_micro div
    crawl_delay — all bigint ops, strict hash."""
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
    for k in range(1, 4):
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
cand AS (
  SELECT doc_id AS d,
         CAST(unnest(range(0, 1 + doc_id % 3)) AS BIGINT) AS i
  FROM documents
),
u AS (
  SELECT d, i,
         'h' || CAST(d % {_H} AS VARCHAR) || '.example' AS host,
         CASE WHEN (d + i) % 3 = 0
              THEN '/raw/' || CAST(d AS VARCHAR) || '/' || CAST(i AS VARCHAR)
              ELSE '/p/' || CAST(d AS VARCHAR) || '/' || CAST(i AS VARCHAR)
              END AS path,
         CAST(1 + (d % {_H}) % 5 AS BIGINT) AS delay
  FROM cand
)
SELECT u.d * 10 + u.i AS url_id, u.host, u.path,
       CAST(r.rank AS BIGINT) AS rank_micro,
       u.delay AS crawl_delay_s,
       CAST(r.rank // u.delay AS BIGINT) AS priority_micro
FROM u JOIN r3 r ON u.host = r.host
WHERE (u.d + u.i) % 3 <> 0
"""


@query("pipe_crawl_frontier", oracle=_frontier_oracle())
def pipe_crawl_frontier(spark, sf_dir):
    """The round-12 CAPSTONE composition — the incremental-crawl
    frontier a web-scale pipeline schedules from, built ENTIRELY
    from this round's proven pieces: candidate URLs (1 + d%3 per
    document, codegen synthesis, every third under the disallowed
    /raw/ prefix) are admission-gated through the REAL RFC 9309
    engine (per-host policy broadcast, longest-match verdicts), the
    link graph of the same host universe feeds the REAL fixed-point
    integer PageRank (3 iterations), and surviving URLs score
    priority = rank_micro div crawl_delay — the rank-weighted,
    politeness-discounted fetch order.  Every stage is bigint-exact,
    so the whole composition strict-hash-matches one DuckDB replay.
    Scale: rank iterations touch only the fixed-size host table; the
    URL volume crosses one broadcast gate and one broadcast rank
    join — it never shuffles."""
    from pyspark.sql import functions as F

    from impala_cut_spark.operators.linkgraph import host_edges, host_rank
    from impala_cut_spark.operators.robots import robots_gate

    docs = t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    h = (d % _H).cast("string")
    host = F.concat(F.lit("h"), h, F.lit(".example"))
    urls = (
        docs.select(d.alias("d"), host.alias("host"),
                    F.explode(F.sequence(F.lit(0), (d % 3).cast("int")))
                    .alias("i"))
        .select(
            (F.col("d") * 10 + F.col("i")).alias("url_id"),
            "host",
            F.when(
                (F.col("d") + F.col("i")) % 3 == 0,
                F.concat(F.lit("/raw/"), F.col("d").cast("string"),
                         F.lit("/"), F.col("i").cast("string")),
            ).otherwise(
                F.concat(F.lit("/p/"), F.col("d").cast("string"),
                         F.lit("/"), F.col("i").cast("string")),
            ).alias("path"),
        )
    )
    hosts = docs.select((d % _H).alias("h")).distinct()
    hv = F.col("h").cast("string")
    robots = hosts.select(
        F.concat(F.lit("h"), hv, F.lit(".example")).alias("host"),
        F.concat(
            F.lit("User-agent: trainbot\n"
                  "Disallow: /raw/\nAllow: /raw/pub/\nCrawl-delay: "),
            (F.lit(1) + F.col("h") % 5).cast("string"),
            F.lit("\n\nUser-agent: *\nDisallow: /\n"),
        ).alias("robots_txt"),
    )
    gated = robots_gate(urls, robots, agent="trainbot-1.0")
    ranks = host_rank(host_edges(_pages(docs)), iterations=3)
    return (
        gated.where(F.col("allowed"))
        .join(F.broadcast(ranks.select(F.col("host").alias("r_host"),
                                       "rank_micro")),
              F.col("host") == F.col("r_host"))
        .select(
            "url_id", "host", "path", "rank_micro",
            F.col("crawl_delay").cast("long").alias("crawl_delay_s"),
            F.expr("rank_micro div cast(crawl_delay as bigint)")
            .alias("priority_micro"),
        )
    )


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer (round 12) — rows-only by design, like BPE
# ---------------------------------------------------------------------------


@query("pipe_tokenize_unigram", oracle=None)
def pipe_tokenize_unigram(spark, sf_dir):
    """SentencePiece-style unigram-LM tokenizer
    (operators/tokenizer.py, round 12): the vocabulary trains with a
    DISTRIBUTED E-step (Viterbi per distinct word executor-side
    against broadcast integer scores, usage aggregated in one
    map-combined shuffle; only the vocab_size-bounded M-step prune
    collects), then the corpus encodes under the frozen vocab —
    per-document token counts, unknown rates, and the segmentation
    witness md5.  Viterbi compares exact rational likelihoods
    (bigint cross-multiplication), so training and encoding are
    bit-deterministic.  Rows-only by design (iterative EM + DP is
    not SQL-expressible — the BPE precedent); correctness is
    property-tested: reconstruction, coverage, determinism, and
    likelihood-optimality vs brute force on short words."""
    from impala_cut_spark.operators.tokenizer import (
        learn_unigram_vocab,
        unigram_encode,
    )

    docs = t(spark, sf_dir, "documents")
    vocab = learn_unigram_vocab(docs, vocab_size=256, em_iters=2)
    return unigram_encode(docs, vocab)


@query("pipe_cdc_chunks_gear", oracle=None)
def pipe_cdc_chunks_gear(spark, sf_dir):
    """The PRODUCTION CDC twin (rows-only, the xxhash-twin
    precedent): the same chunk-row shape as pipe_cdc_chunks but under
    the clamped FastCDC gear hash over utf-8 bytes — stateful min/max
    boundaries, so no SQL replay; pytest pins partition/clamp
    invariants and shift resistance, and the plan-shape identity
    with the oracle twin is test-asserted so the poly arm's plan
    audit covers both."""
    from impala_cut_spark.operators.cdc import cdc_chunk_rows

    docs = t(spark, sf_dir, "documents")
    return cdc_chunk_rows(docs, arm="gear")


# ---------------------------------------------------------------------------
# Parquet footer introspection (round 12) — SURVEY §2.1 footer-first
# ---------------------------------------------------------------------------

#: the flat tables whose leaf paths equal their logical columns (the
#: embeddings list column nests to embedding.list.element and its
#: num_values counts ELEMENTS — covered by the pytest differential,
#: not this oracle row)
_PQ_TABLES = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents"]


def _parquet_meta_oracle() -> str:
    """Footer num_values summed per column must equal the LIVE row
    count of the registered view (flat schemas: one value per row per
    leaf) — replayed via pragma_table_info over the same views."""
    parts = [
        f"""SELECT '{t}' AS table_name, name AS column_path,
       (SELECT CAST(count(*) AS BIGINT) FROM {t}) AS n_values
FROM pragma_table_info('{t}')"""
        for t in _PQ_TABLES
    ]
    return "\nUNION ALL\n".join(parts)


@query("pipe_parquet_meta", oracle=_parquet_meta_oracle())
def pipe_parquet_meta(spark, sf_dir):
    """Parquet footer introspection (sources/parquet_meta.py): the
    reference parses footers FIRST (hdfs-parquet-scanner.cc:52-54;
    SURVEY §2.1) — this row carries that surface as a from-scratch
    thrift-COMPACT FileMetaData walk (varint/zigzag, short-form field
    headers, nested structs/lists), reading ONLY each file's tail.
    The oracle cross-checks footer value counts per column against
    the live row counts of the same views; the full chunk surface
    (codecs, page offsets, compressed sizes) is differentialed
    against DuckDB's parquet_metadata() in pytest.  Scale: one task
    per file, footer-tail reads only, one shuffle for the per-column
    sum."""
    from pyspark.sql import functions as F

    from impala_cut_spark.sources.parquet_meta import parquet_meta_rows

    rows = parquet_meta_rows(spark, sf_dir, _PQ_TABLES)
    return (
        rows.where(F.col("parse_ok"))
        .groupBy("table_name", "column_path")
        .agg(F.sum("num_values").alias("n_values"))
    )
