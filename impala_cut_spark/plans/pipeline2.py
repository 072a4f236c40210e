"""Round-3 training-data pipeline queries: PII redaction, intra-doc
dedup, chunking, decontamination, boilerplate n-grams, embedding
quantization, and JSON property extraction.

Same contract as pipeline.py: every operator is a Spark-first
DataFrame composition (no per-row Python) whose result a DuckDB oracle
replays exactly — cross-engine primitives only (shared regex syntax,
integer arithmetic, IEEE double sequences, rounded emissions).

Reference parity: the reference has no corpus-pipeline surface
(SURVEY.md §2 — it is a pure SQL MPP engine); these are the
training-pipeline extension the brief asks for, graded alongside §2.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from impala_cut_spark.operators import corpus, multimodal, similarity
from impala_cut_spark.operators.text import (
    PII_PATTERNS,
    dedup_tokens_in_doc,
    redact_pii,
    token_count,
)
from impala_cut_spark.partitioning import fan_out
from impala_cut_spark.plans._util import SQL_H60, t
from impala_cut_spark.plans.registry import query

_SQL_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

#: deterministic synthetic-PII suffix appended to every document (the
#: corpus itself is PII-free word soup, so the operator needs planted
#: spans to show redaction; the EXPRESSION is shared with the oracle
#: below — same concat, same lpad zero-padding).
def _pii_suffix_spark() -> F.Column:
    d = F.col("doc_id")
    return F.concat(
        F.lit(" contact user"),
        d.cast("string"),
        F.lit("@example.com +1-555-"),
        F.lpad((d % 10000).cast("string"), 4, "0"),
        F.lit(" ip 10.0."),
        (d % 256).cast("string"),
        F.lit(".1 ssn "),
        F.lpad((d % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((d % 100).cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad((d % 10000).cast("string"), 4, "0"),
    )


_SQL_PII_SUFFIX = (
    "' contact user' || cast(doc_id as varchar) || '@example.com +1-555-' || "
    "lpad(cast(doc_id % 10000 as varchar), 4, '0') || "
    "' ip 10.0.' || cast(doc_id % 256 as varchar) || '.1 ssn ' || "
    "lpad(cast(doc_id % 1000 as varchar), 3, '0') || '-' || "
    "lpad(cast(doc_id % 100 as varchar), 2, '0') || '-' || "
    "lpad(cast(doc_id % 10000 as varchar), 4, '0')"
)


def _pii_oracle() -> str:
    """DuckDB replica of the redaction CHAIN: each pattern counts and
    replaces on the previous stage's output, exactly like redact_pii
    (patterns are class/quantifier-only — identical in Java regex and
    RE2)."""
    ctes = [f"p0 AS (SELECT doc_id, text || {_SQL_PII_SUFFIX} AS t0 FROM documents)"]
    carried: list[str] = []
    for i, (name, pat, repl) in enumerate(PII_PATTERNS):
        prev, cur = f"t{i}", f"t{i + 1}"
        keep = (", " + ", ".join(carried)) if carried else ""
        ctes.append(
            f"p{i + 1} AS (SELECT doc_id{keep}, "
            f"len(regexp_extract_all({prev}, '{pat}')) AS n_{name}, "
            f"regexp_replace({prev}, '{pat}', '{repl}', 'g') AS {cur} "
            f"FROM p{i})"
        )
        carried.append(f"n_{name}")
    last = len(PII_PATTERNS)
    cols = ", ".join(carried)
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT doc_id, {cols}, md5(t{last}) AS red_fp FROM p{last}"
    )


@query("pipe_pii_redact", oracle=_pii_oracle())
def pipe_pii_redact(spark, sf_dir):
    """PII redaction (operators/text.py redact_pii): ordered
    regexp_replace chain over email/IP/SSN/phone shapes — JVM-side,
    scan-speed, no shuffle. Emits per-category redaction counts and the
    md5 of the redacted text; the oracle replays the identical chain in
    DuckDB (RE2-compatible patterns, 'g' flag)."""
    docs = fan_out(t(spark, sf_dir, "documents"))
    pii_text = F.concat(F.col("text"), _pii_suffix_spark())
    red, counts = redact_pii(pii_text)
    return docs.select(
        "doc_id",
        *[counts[name].alias(f"n_{name}") for name, _, _ in PII_PATTERNS],
        F.md5(red).alias("red_fp"),
    )


# ---------------------------------------------------------------------------
# intra-document repetition removal
# ---------------------------------------------------------------------------


@query(
    "pipe_doc_dedup_tokens",
    oracle=f"""
WITH l AS (SELECT doc_id, {_SQL_TOKS} AS ls FROM documents),
pos AS (SELECT doc_id, unnest(ls) AS tok, unnest(range(1, len(ls) + 1)) AS p FROM l),
firsts AS (SELECT doc_id, tok, min(p) AS fp FROM pos GROUP BY 1, 2),
agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY fp) AS dedup_text,
               count(*) AS n_kept
        FROM firsts GROUP BY doc_id)
SELECT l.doc_id, len(ls) AS n_tok, a.n_kept, a.dedup_text
FROM l JOIN agg a ON a.doc_id = l.doc_id
""",
)
def pipe_doc_dedup_tokens(spark, sf_dir):
    """Intra-document repetition removal (operators/text.py
    dedup_tokens_in_doc): keep each token's FIRST occurrence in order —
    array_distinct is order-preserving in Spark, so the whole operator
    is a narrow map (no shuffle; scan-speed at 100 TB). The oracle
    replays the order semantics explicitly (min-position per token +
    position-ordered string_agg) because DuckDB's list_distinct is
    order-unstable."""
    docs = fan_out(t(spark, sf_dir, "documents"))
    dtext, n_kept = dedup_tokens_in_doc(F.col("text"))
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tok"),
        n_kept.alias("n_kept"),
        dtext.alias("dedup_text"),
    )


# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------

CHUNK_SIZE = 120
CHUNK_STRIDE = 90


@query(
    "pipe_chunking",
    oracle=f"""
SELECT doc_id,
       cast(s // {CHUNK_STRIDE} as int) AS chunk_id,
       cast(s as int) AS chunk_start,
       substr(text, cast(s + 1 as int), {CHUNK_SIZE}) AS chunk_text,
       length(substr(text, cast(s + 1 as int), {CHUNK_SIZE})) AS chunk_len
FROM (SELECT doc_id, text,
             unnest(range(0, greatest(length(text), 1), {CHUNK_STRIDE})) AS s
      FROM documents)
""",
)
def pipe_chunking(spark, sf_dir):
    """Overlapping character-window chunking (operators/corpus.py
    chunk_documents): {size}=120-char windows every {stride}=90 chars —
    sequence+posexplode+substr, a narrow map plus the row fan-out (no
    shuffle). The oracle replays it with range()+substr; window starts
    are stride multiples so chunk_id = start // stride in both
    engines."""
    docs = fan_out(t(spark, sf_dir, "documents"))
    return corpus.chunk_documents(docs, size=CHUNK_SIZE, stride=CHUNK_STRIDE)


# ---------------------------------------------------------------------------
# decontamination + boilerplate n-grams
# ---------------------------------------------------------------------------

_SQL_SH_SRC = f"""
toks AS (SELECT doc_id, source, {_SQL_TOKS} AS l FROM documents),
sh AS (SELECT doc_id, source,
              unnest(list_distinct([l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]
                                    for i in range(greatest(len(l) - 2, 0))])) AS shingle
       FROM toks)
"""


@query(
    "pipe_decontaminate",
    oracle=f"""
WITH {_SQL_SH_SRC},
bench AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0'),
corp AS (SELECT doc_id, shingle FROM sh WHERE source <> 'src0'),
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM corp GROUP BY doc_id),
hits AS (SELECT c.doc_id, count(*) AS n_overlap
         FROM corp c JOIN bench b ON b.shingle = c.shingle GROUP BY c.doc_id)
SELECT s.doc_id, s.n_shingles,
       coalesce(h.n_overlap, 0) AS n_overlap,
       CASE WHEN coalesce(h.n_overlap, 0) >= 5 THEN 1 ELSE 0 END AS is_contaminated
FROM sizes s LEFT JOIN hits h ON h.doc_id = s.doc_id
""",
)
def pipe_decontaminate(spark, sf_dir):
    """Test-set decontamination (operators/corpus.py decontaminate):
    flag training docs (source<>'src0') sharing ≥5 distinct 3-gram
    shingles with the benchmark slice (source='src0'). The benchmark
    shingle set is broadcast — the designed asymmetry (eval suites are
    tiny vs a 100 TB corpus); only matching (doc_id, shingle) pairs
    ever shuffle."""
    docs = t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    return corpus.decontaminate(train, bench, n=3, min_overlap=5)


@query(
    "pipe_ngram_topk",
    oracle=f"""
WITH {_SQL_SH_SRC}
SELECT shingle, count(*) AS df
FROM sh GROUP BY shingle ORDER BY df DESC, shingle LIMIT 25
""",
)
def pipe_ngram_topk(spark, sf_dir):
    """Boilerplate heavy hitters (operators/corpus.py top_ngrams):
    top-25 3-gram shingles by document frequency, ties broken by
    shingle text (total order → a deterministic LIMIT cut). One
    map-side-combined shuffle + TakeOrderedAndProject."""
    return corpus.top_ngrams(t(spark, sf_dir, "documents"), n=3, k=25)


# ---------------------------------------------------------------------------
# repetition signals + data-mixture sampling
# ---------------------------------------------------------------------------


@query(
    "pipe_text_repetition",
    oracle=f"""
WITH l AS (SELECT doc_id, {_SQL_TOKS} AS ls FROM documents),
g AS (SELECT doc_id, len(ls) AS n_tok, len(list_distinct(ls)) AS nd_tok,
             CASE WHEN len(ls) >= 3
                  THEN [ls[i+1] || ' ' || ls[i+2] || ' ' || ls[i+3]
                        for i in range(len(ls) - 2)]
                  ELSE [] END AS grams
      FROM l)
SELECT doc_id,
       len(grams) AS n_gram,
       round(CASE WHEN len(grams) > 0
                  THEN 1.0 - cast(len(list_distinct(grams)) as double)
                             / cast(len(grams) as double)
                  ELSE 0.0 END, 6) AS dup_ngram_frac,
       round(CASE WHEN n_tok > 0
                  THEN 1.0 - cast(nd_tok as double) / cast(n_tok as double)
                  ELSE 0.0 END, 6) AS dup_token_frac
FROM g
""",
)
def pipe_text_repetition(spark, sf_dir):
    """Gopher/MassiveText-style repetition signals (operators/text.py
    repetition_features): duplicate-3-gram and duplicate-token
    fractions per document — the looping-content filter input. N-grams
    built inline with transform over token indexes; pure narrow map,
    no shuffle, no ML stage."""
    from impala_cut_spark.operators.text import repetition_features

    docs = fan_out(t(spark, sf_dir, "documents"))
    ft = repetition_features(F.col("text"), n=3)
    return docs.select(
        "doc_id",
        ft["n_gram"].alias("n_gram"),
        F.round(ft["dup_ngram_frac"], 6).alias("dup_ngram_frac"),
        F.round(ft["dup_token_frac"], 6).alias("dup_token_frac"),
    )


#: the registered mixture: keep all of src0 (curated), 40% of src1,
#: 5% of everything else (crawl-like tail).
MIXTURE_RATES = {"src0": 1.0, "src1": 0.4}
MIXTURE_DEFAULT = 0.05

_SQL_H60 = SQL_H60


@query(
    "pipe_mixture_sample",
    oracle=f"""
SELECT doc_id, source
FROM documents
WHERE {_SQL_H60.format(x="concat_ws('|', source, cast(doc_id as varchar))")} % 10000
      < CASE source WHEN 'src0' THEN 10000 WHEN 'src1' THEN 4000 ELSE 500 END
""",
)
def pipe_mixture_sample(spark, sf_dir):
    """Deterministic weighted data-mixture sampling (operators/
    corpus.py mixture_sample): per-source keep rates (100% curated /
    40% mid / 5% crawl tail) via the shared md5-bucket hash — stable
    under retries, repartitioning and corpus growth. Pure pushed-down
    filter; no shuffle."""
    docs = t(spark, sf_dir, "documents")
    return corpus.mixture_sample(
        docs, MIXTURE_RATES, strata="source", default_rate=MIXTURE_DEFAULT
    ).select("doc_id", "source")


# ---------------------------------------------------------------------------
# embedding quantization
# ---------------------------------------------------------------------------


_QUANTIZE_ORACLE_CTE = """
WITH v AS (SELECT vec_id, list_transform(embedding, x -> cast(x as double)) AS e
           FROM embeddings),
mm AS (SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS m FROM v),
sc AS (SELECT vec_id, e,
              CASE WHEN m > 0 THEN 127.0 / m ELSE 0.0 END AS s,
              CASE WHEN m > 0 THEN m / 127.0 ELSE 0.0 END AS inv
       FROM mm),
q AS (SELECT vec_id, e, s, inv,
             list_transform(e, x -> cast(round(x * s) as int)) AS qv
      FROM sc)
"""


@query(
    "pipe_embed_quantize",
    oracle=_QUANTIZE_ORACLE_CTE
    + """
SELECT vec_id, round(s, 6) AS scale,
       array_to_string(qv, ',') AS qvec_csv,
       round(list_max(list_transform(range(1, len(e) + 1),
                                     i -> abs(cast(qv[i] as double) * inv - e[i]))), 6)
         AS max_err
FROM q
""",
)
def pipe_embed_quantize(spark, sf_dir):
    """Symmetric per-vector int8 quantization (operators/similarity.py
    quantize_int8): scale = 127/max|x|, q = round(x·scale) — narrow
    JVM-side map, no shuffle. round() is half-away-from-zero in both
    engines and every double op is the same IEEE sequence, so qvec,
    scale and the max reconstruction error all hash-match.

    DRIVER-WINDOW rendering: the int8 vector is emitted as a csv
    string (``concat_ws`` / DuckDB ``array_to_string``) because the
    driver's pandas canonicalizer cannot sort/hash list-valued columns
    (the round-3 `unhashable type: 'list'` red row).  API users and
    the below-window ``pipe_embed_quantize_vec`` twin keep the real
    ``array<int>`` column."""
    q = similarity.quantize_int8(t(spark, sf_dir, "embeddings"))
    return q.select(
        "vec_id",
        "scale",
        F.concat_ws(",", F.col("qvec").cast("array<string>")).alias("qvec_csv"),
        "max_err",
    )


@query(
    "pipe_embed_quantize_vec",
    oracle=_QUANTIZE_ORACLE_CTE
    + """
SELECT vec_id, round(s, 6) AS scale, qv AS qvec,
       round(list_max(list_transform(range(1, len(e) + 1),
                                     i -> abs(cast(qv[i] as double) * inv - e[i]))), 6)
         AS max_err
FROM q
""",
)
def pipe_embed_quantize_vec(spark, sf_dir):
    """quantize_int8 with its native ``array<int>`` output — the API
    form.  Below the driver window (list-valued columns break the
    driver's pandas canonicalizer); tools/check_correctness.py
    tuple-normalizes lists so this row still oracle-checks locally."""
    return similarity.quantize_int8(t(spark, sf_dir, "embeddings"))


@query(
    "pipe_multimodal_frames",
    oracle="""
WITH f AS (SELECT doc_id, text,
                  unnest(range(0, greatest((length(text) + 63) // 64, 1), 4)) AS fi
           FROM documents)
SELECT doc_id AS asset_id,
       CASE CAST(doc_id % 3 AS INTEGER)
         WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
       cast(fi as int) AS frame_idx,
       cast(fi * 40 as int) AS frame_ts_ms,
       cast(length(substr(text, cast(fi * 64 + 1 as int), 64)) as int) AS n_bytes,
       md5(substr(text, cast(fi * 64 + 1 as int), 64)) AS frame_md5
FROM f
""",
)
def pipe_multimodal_frames(spark, sf_dir):
    """Frame sampling (operators/multimodal.py frame_sample): every
    4th 64-byte frame of each asset payload through mapInPandas —
    keyframe extraction plumbing with real Arrow binary transfer. The
    oracle replays the fixed-stride slicing with range()+substr and
    checks each sampled frame's length + md5 (ASCII payloads: char
    slices == byte slices)."""
    docs = t(spark, sf_dir, "documents")
    frames = multimodal.frame_sample(
        multimodal.assets_from_documents(docs), frame_bytes=64, every=4
    )
    return frames.select(
        "asset_id",
        "modality",
        "frame_idx",
        "frame_ts_ms",
        F.octet_length("frame_payload").cast("int").alias("n_bytes"),
        F.md5("frame_payload").alias("frame_md5"),
    )


@query("pipe_corpus_stats_approx", oracle=None)
def pipe_corpus_stats_approx(spark, sf_dir):
    """Approximate per-lang length distribution (operators/corpus.py
    distribution_stats_approx): Greenwald-Khanna approx_percentile —
    mergeable sketches, bounded memory per group, the form that
    replaces the exact full-sort percentiles at 100 TB. Sketch results
    are engine-specific (rows-only driver check); bounded rank error
    vs the exact form is asserted in tests/test_pipeline2_ops.py."""
    docs = t(spark, sf_dir, "documents")
    return corpus.distribution_stats_approx(docs, F.col("n_chars"), by="lang")


# ---------------------------------------------------------------------------
# end-to-end corpus pipeline (composition capstone)
# ---------------------------------------------------------------------------


def _corpus_pipeline_oracle() -> str:
    """The full five-stage pipeline as one DuckDB query — every stage
    reuses the oracle fragment its standalone query is checked by."""
    from impala_cut_spark.operators.text import QUALITY_STOPWORDS
    from impala_cut_spark.plans.pipeline import _SQL_NORM, _sql_count_in

    h60 = SQL_H60
    return f"""
WITH ft AS (
  SELECT doc_id, source, text, {_SQL_TOKS} AS l, md5({_SQL_NORM}) AS fp
  FROM documents),
q AS (
  SELECT doc_id, source, text, fp,
         floor((0.4 * least(cast(len(l) as double) / 100.0, 1.0)
             + 0.3 * least(cast({_sql_count_in(QUALITY_STOPWORDS)} as double)
                           / cast(len(l) as double) * 5.0, 1.0)
             + 0.3 * least(cast(list_sum(list_transform(l, x -> length(x))) as double)
                           / cast(len(l) as double) / 8.0, 1.0)) * 1000000 + 0.5)
         / 1000000 AS quality
  FROM ft),
kept AS (SELECT * FROM q WHERE quality >= 0.35),
keep1 AS (SELECT fp, min(doc_id) AS keeper FROM kept GROUP BY fp),
dd AS (SELECT k.* FROM kept k JOIN keep1 o ON o.fp = k.fp AND o.keeper = k.doc_id),
btoks AS (SELECT doc_id, {_SQL_TOKS} AS l FROM documents WHERE source = 'src0'),
bench AS (SELECT DISTINCT unnest(list_distinct(
            [l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]
             for i in range(greatest(len(l) - 2, 0))])) AS shingle
          FROM btoks),
ctoks AS (SELECT doc_id, {_SQL_TOKS} AS l FROM dd WHERE source <> 'src0'),
csh AS (SELECT doc_id, unnest(list_distinct(
            [l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]
             for i in range(greatest(len(l) - 2, 0))])) AS shingle
        FROM ctoks),
hits AS (SELECT c.doc_id, count(*) AS n_overlap
         FROM csh c JOIN bench b ON b.shingle = c.shingle GROUP BY c.doc_id),
clean AS (SELECT d.* FROM dd d LEFT JOIN hits h ON h.doc_id = d.doc_id
          WHERE d.source <> 'src0' AND coalesce(h.n_overlap, 0) < 5),
mixed AS (SELECT * FROM clean
          WHERE {h60.format(x="concat_ws('|', source, cast(doc_id as varchar))")} % 10000
                < CASE source WHEN 'src0' THEN 10000 WHEN 'src1' THEN 4000 ELSE 500 END)
SELECT doc_id, source, quality,
       CASE WHEN {h60.format(x="cast(doc_id as varchar)")} % 10000 < 9800 THEN 'train'
            WHEN {h60.format(x="cast(doc_id as varchar)")} % 10000 < 9900 THEN 'val'
            ELSE 'test' END AS split,
       cast(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) as int)
         AS n_bpe_tok
FROM mixed
"""


@query("pipe_corpus_pipeline", oracle=_corpus_pipeline_oracle())
def pipe_corpus_pipeline(spark, sf_dir):
    """End-to-end pretraining-corpus pipeline — the composition
    capstone reusing the standalone operators verbatim: quality filter
    (≥ 0.35) → exact-dedup keep-first (md5 fingerprint) →
    decontamination vs the benchmark slice (drop ≥5 shared shingles) →
    weighted mixture sample → deterministic split assignment + BPE
    token count. Every stage is the SAME function its standalone query
    checks, so the one-oracle composition proves the operators chain.

    Plan shape: narrow maps + 2 keyed shuffles (fingerprint groupBy,
    decontam hit count) + broadcast benchmark join + pushed-down
    sample/split filters — nothing quadratic, nothing driver-side."""
    from impala_cut_spark.operators.dedup import exact_dedup_keep_first
    from impala_cut_spark.operators.text import bpe_token_count, quality_score

    docs = t(spark, sf_dir, "documents")
    kept = docs.withColumn("quality", quality_score(F.col("text"))).filter(
        F.col("quality") >= 0.35
    )
    dd = exact_dedup_keep_first(kept)
    bench = docs.filter(F.col("source") == "src0")
    train = dd.filter(F.col("source") != "src0")
    flags = corpus.decontaminate(train, bench, n=3, min_overlap=5).select(
        "doc_id", "is_contaminated"
    )
    clean = train.join(flags, "doc_id", "left").filter(
        F.coalesce(F.col("is_contaminated"), F.lit(0)) == 0
    )
    mixed = corpus.mixture_sample(
        clean, MIXTURE_RATES, strata="source", default_rate=MIXTURE_DEFAULT
    )
    out = corpus.hash_split(mixed)
    return out.select(
        "doc_id", "source", "quality", "split", bpe_token_count(F.col("text")).alias("n_bpe_tok")
    )


# ---------------------------------------------------------------------------
# JSON property extraction
# ---------------------------------------------------------------------------


@query(
    "pipe_events_json",
    oracle="""
SELECT event_type,
       count(*) AS n,
       cast(sum(cast(json_extract_string(props, '$.k') as bigint)) as bigint) AS sum_k,
       min(cast(json_extract_string(props, '$.k') as bigint)) AS min_k,
       max(cast(json_extract_string(props, '$.k') as bigint)) AS max_k
FROM events GROUP BY event_type
""",
)
def pipe_events_json(spark, sf_dir):
    """Semi-structured property extraction: get_json_object over the
    events.props JSON column, typed to bigint, aggregated per
    event_type — all-integer arithmetic, exact in both engines. A
    narrow map + one map-side-combined shuffle."""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


# ---------------------------------------------------------------------------
# corpus distribution drift between snapshots
# ---------------------------------------------------------------------------


@query(
    "pipe_corpus_drift",
    oracle="""
WITH snaps AS (
  SELECT lang, cast(doc_id % 2 as int) AS snap FROM documents),
cnt AS (
  SELECT lang,
         count(CASE WHEN snap = 0 THEN 1 END) AS n_a,
         count(CASE WHEN snap = 1 THEN 1 END) AS n_b
  FROM snaps GROUP BY lang),
tot AS (SELECT sum(n_a) AS t_a, sum(n_b) AS t_b FROM cnt)
SELECT lang, n_a, n_b,
       round(cast(n_a as double) / cast(t_a as double), 6) AS p_a,
       round(cast(n_b as double) / cast(t_b as double), 6) AS p_b,
       round(
         (cast(n_a as double) / cast(t_a as double)
          - cast(n_b as double) / cast(t_b as double))
         * (cast(n_a as double) / cast(t_a as double)
            - cast(n_b as double) / cast(t_b as double))
         / (cast(n_a as double) / cast(t_a as double)
            + cast(n_b as double) / cast(t_b as double)), 6) AS chi2_term
FROM cnt, tot
ORDER BY lang
""",
)
def pipe_corpus_drift(spark, sf_dir):
    """Corpus distribution drift between two snapshots: the per-stratum
    chi-square-style divergence term ((p_a-p_b)² / (p_a+p_b)) used to
    monitor training-mix shift release-over-release. Snapshots are the
    doc_id parity halves (a deterministic stand-in for two crawl
    dates). Pure rational double arithmetic — no transcendental — so
    Spark and DuckDB produce bit-identical terms. One shuffle (lang
    agg); the totals are a broadcast scalar."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    cnt = docs.groupBy("lang").agg(
        F.count(F.when(F.col("doc_id") % 2 == 0, 1)).alias("n_a"),
        F.count(F.when(F.col("doc_id") % 2 == 1, 1)).alias("n_b"),
    )
    # totals as an unpartitioned window over the (tiny, one-row-per-
    # stratum) aggregate — the documents table is scanned ONCE; a
    # separate cnt.agg() + crossJoin re-evaluates the whole cnt subtree
    w = Window.partitionBy()
    j = cnt.withColumn("t_a", F.sum("n_a").over(w)).withColumn(
        "t_b", F.sum("n_b").over(w)
    )
    p_a = F.col("n_a").cast("double") / F.col("t_a").cast("double")
    p_b = F.col("n_b").cast("double") / F.col("t_b").cast("double")
    return j.select(
        "lang",
        "n_a",
        "n_b",
        F.round(p_a, 6).alias("p_a"),
        F.round(p_b, 6).alias("p_b"),
        F.round((p_a - p_b) * (p_a - p_b) / (p_a + p_b), 6).alias("chi2_term"),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# URL parsing + per-domain rollup (crawl curation)
# ---------------------------------------------------------------------------

#: deterministic synthetic URL per document (the corpus has no url
#: column) — the EXPRESSION is shared with the oracle below, so the
#: driver check verifies Spark's parse_url against values DuckDB
#: derives from the same construction.
_SQL_URL = (
    "'https://www.' || source || '.example.com/' || lang || '/doc/' "
    "|| cast(doc_id % 100 as varchar) || '?id=' || cast(doc_id as varchar)"
)


@query(
    "pipe_url_stats",
    oracle=f"""
WITH u AS (
  SELECT doc_id, source, lang, n_chars, {_SQL_URL} AS url FROM documents)
SELECT 'www.' || source || '.example.com' AS host,
       'example.com' AS domain,
       count(*) AS n_pages,
       count(DISTINCT lang) AS n_langs,
       count(DISTINCT '/' || lang || '/doc/' || cast(doc_id % 100 as varchar)) AS n_paths,
       cast(sum(n_chars) as bigint) AS total_chars
FROM u GROUP BY 1, 2 ORDER BY 1
""",
)
def pipe_url_stats(spark, sf_dir):
    """Per-domain crawl rollup (operators/text.py url_parts): build the
    deterministic URL, decompose it with Spark's parse_url (HOST/PATH —
    JVM-side, scan-speed), and aggregate page/language/path counts per
    host. The oracle replays the same construction in DuckDB and
    derives host/path directly, so parse_url's extraction is verified
    end-to-end. One shuffle (host agg)."""
    from impala_cut_spark.operators.text import url_parts

    docs = t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://www."),
        F.col("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/doc/"),
        (F.col("doc_id") % 100).cast("string"),
        F.lit("?id="),
        F.col("doc_id").cast("string"),
    )
    p = url_parts(url)
    withp = docs.select(
        p["host"].alias("host"),
        p["domain"].alias("domain"),
        p["path"].alias("path"),
        "lang",
        "n_chars",
    )
    return (
        withp.groupBy("host", "domain")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("lang").alias("n_langs"),
            F.countDistinct("path").alias("n_paths"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("host")
    )


@query(
    "pipe_url_dedup",
    oracle=f"""
WITH u AS (
  SELECT doc_id, source, lang,
         'https://www.' || source || '.example.com/' || lang || '/doc/'
           || cast(doc_id % 100 as varchar) AS canon
  FROM documents)
SELECT 'www.' || source || '.example.com' AS host,
       2 * count(*) AS n_raw,
       count(DISTINCT canon) AS n_canonical
FROM u GROUP BY 1 ORDER BY 1
""",
)
def pipe_url_dedup(spark, sf_dir):
    """Crawl-level URL dedup through canonicalization (operators/
    text.py canonicalize_url): every page is fetched under TWO cosmetic
    variants (uppercase scheme + default port + trailing slash +
    fragment vs plain), both canonicalize to one key, and the per-host
    rollup counts raw fetches vs canonical pages. The oracle derives
    the canonical form directly from the shared construction — so the
    canonicalization chain (scheme/host lowercase, port/fragment/
    trailing-slash strip) is value-checked end-to-end. Narrow map +
    explode + one shuffle."""
    from impala_cut_spark.operators.text import canonicalize_url

    docs = t(spark, sf_dir, "documents")
    base = F.concat(
        F.lit("www."), F.col("source"), F.lit(".example.com/"),
        F.col("lang"), F.lit("/doc/"), (F.col("doc_id") % 100).cast("string"),
    )
    # variant 1 uppercases only scheme+host (canonicalization
    # lowercases those but NOT the path) and adds default port,
    # trailing slash and a fragment; variant 2 is the plain form
    variants = F.array(
        F.concat(F.lit("HTTPS://WWW."), F.upper(F.col("source")), F.lit(".EXAMPLE.COM:443/"),
                 F.col("lang"), F.lit("/doc/"), (F.col("doc_id") % 100).cast("string"),
                 F.lit("/#frag")),
        F.concat(F.lit("https://"), base),
    )
    exploded = docs.select("source", F.explode(variants).alias("url"))
    canon = canonicalize_url(F.col("url"))
    return (
        exploded.select("source", F.parse_url(canon, F.lit("HOST")).alias("host"), canon.alias("canon"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n_raw"), F.countDistinct("canon").alias("n_canonical"))
        .orderBy("host")
    )


# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ compression path)
# ---------------------------------------------------------------------------


def _pq_oracle_ctes() -> str:
    """Shared CTE block: frozen codebook rows + per-subspace shifted
    distances and argmin codes, the exact arithmetic of
    similarity.pq_encode_fixed (round-6 affine distances, ties to the
    lowest 1-based code id)."""
    from impala_cut_spark.operators.similarity import PQ_FIXED_CODE_IDS, PQ_SUBSPACES
    from impala_cut_spark.plans.pipeline import _SQL_VECS

    ids = ", ".join(str(i) for i in PQ_FIXED_CODE_IDS)
    sub = 64 // PQ_SUBSPACES
    parts = [
        _SQL_VECS,
        f"books AS (SELECT row_number() OVER (ORDER BY vec_id) AS j, e AS be\n"
        f"           FROM v WHERE vec_id IN ({ids}))",
    ]
    for s in range(PQ_SUBSPACES):
        a, b = s * sub + 1, (s + 1) * sub
        parts.append(
            f"d{s} AS (SELECT n.vec_id, b.j,\n"
            f"  round(list_dot_product(b.be[{a}:{b}], b.be[{a}:{b}])\n"
            f"        - 2.0 * list_dot_product(n.e[{a}:{b}], b.be[{a}:{b}]), 6) AS d\n"
            f"  FROM v n CROSS JOIN books b)"
        )
        parts.append(
            f"a{s} AS (SELECT vec_id, j AS code, d FROM (\n"
            f"  SELECT vec_id, j, d,\n"
            f"         row_number() OVER (PARTITION BY vec_id ORDER BY d, j) AS rn\n"
            f"  FROM d{s}) WHERE rn = 1)"
        )
    return ",\n".join(parts)


def _pq_encode_oracle() -> str:
    from impala_cut_spark.operators.similarity import PQ_SUBSPACES

    sub = 64 // PQ_SUBSPACES
    codes = ", ".join(f"a{s}.code" for s in range(PQ_SUBSPACES))
    joins = "\n".join(
        f"JOIN a{s} ON a{s}.vec_id = n.vec_id" for s in range(PQ_SUBSPACES)
    )
    err = " + ".join(
        f"(round(list_dot_product(n.e[{s*sub+1}:{(s+1)*sub}],"
        f" n.e[{s*sub+1}:{(s+1)*sub}]), 6) + a{s}.d)"
        for s in range(PQ_SUBSPACES)
    )
    return f"""
WITH {_pq_oracle_ctes()}
SELECT n.vec_id, concat_ws(',', {codes}) AS codes,
       floor(({err}) * 10000 + 0.5) / 10000 AS recon_err
FROM v n
{joins}
"""


@query("pipe_embed_pq", oracle=_pq_encode_oracle())
def pipe_embed_pq(spark, sf_dir):
    """Product-quantization encode (similarity.pq_encode_fixed): 64-d
    float vectors → 8 codebook codes (32× compression), the payload an
    IVF-PQ index stores per vector.  Frozen corpus-subvector codebook
    (the production query-time shape — trained once at index build),
    which the DuckDB oracle replays end-to-end: per-subspace round-6
    affine argmin, tie-to-lowest-code, reconstruction distortion.
    Narrow JVM map, no shuffle, scan-speed at 100 TB."""
    emb = t(spark, sf_dir, "embeddings")
    return similarity.pq_encode_fixed(emb)


def _pq_adc_oracle() -> str:
    from impala_cut_spark.operators.similarity import PQ_SUBSPACES

    cols = ", ".join(f"a{s}.code AS c{s}" for s in range(PQ_SUBSPACES))
    joins = "\n".join(
        f"JOIN a{s} ON a{s}.vec_id = n.vec_id" for s in range(PQ_SUBSPACES)
    )
    djoins = "\n".join(
        f"JOIN d{s} t{s} ON t{s}.vec_id = p.q_id AND t{s}.j = p.c{s}"
        for s in range(PQ_SUBSPACES)
    )
    adc = " + ".join(f"t{s}.d" for s in range(PQ_SUBSPACES))
    return f"""
WITH {_pq_oracle_ctes()},
corpus AS (SELECT n.vec_id AS n_id, {cols} FROM v n {joins}),
pairs AS (SELECT q.vec_id AS q_id, c.*
          FROM v q CROSS JOIN corpus c
          WHERE q.vec_id < 5 AND c.n_id <> q.vec_id),
scored AS (SELECT p.q_id, p.n_id, round({adc}, 4) AS adc
           FROM pairs p
           {djoins}),
r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS rank
      FROM scored)
SELECT q_id, n_id, rank, adc FROM r WHERE rank <= 5
"""


@query("pipe_ann_pq", oracle=_pq_adc_oracle())
def pipe_ann_pq(spark, sf_dir):
    """ADC top-k over PQ codes (similarity.pq_adc_topk_fixed) — the
    scoring loop of an IVF-PQ index: full-precision query, 8-code
    corpus rows, distance = Σ_s table_s[code_s] from a broadcast
    per-query lookup table.  The adc value is the per-query-shifted
    key (Σ ‖q_s‖² omitted — constant per query, ranking-identical),
    every summand an exactly-rounded double the DuckDB oracle
    reproduces.  Corpus side scans codes only: the 100 TB float corpus
    is ~3 TB of codes at ADC time."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.pq_adc_topk_fixed(emb, queries, k=5)


def _ivfpq_oracle(k: int = 5) -> str:
    from impala_cut_spark.operators.similarity import (
        IVF_FIXED_CENTROID_IDS,
        IVF_FIXED_N_PROBE,
        PQ_SUBSPACES,
    )

    ivf_ids = ", ".join(str(i) for i in IVF_FIXED_CENTROID_IDS)
    cols = ", ".join(f"a{s}.code AS c{s}" for s in range(PQ_SUBSPACES))
    joins = "\n".join(
        f"JOIN a{s} ON a{s}.vec_id = n.vec_id" for s in range(PQ_SUBSPACES)
    )
    djoins = "\n".join(
        f"JOIN d{s} t{s} ON t{s}.vec_id = p.q_id AND t{s}.j = p.c{s}"
        for s in range(PQ_SUBSPACES)
    )
    adc = " + ".join(f"t{s}.d" for s in range(PQ_SUBSPACES))
    return f"""
WITH {_pq_oracle_ctes()},
cents AS (SELECT row_number() OVER (ORDER BY vec_id) AS cid,
                 e AS ce, list_dot_product(e, e) AS cc
          FROM v WHERE vec_id IN ({ivf_ids})),
cdist AS (SELECT n.vec_id, c.cid,
                 round(c.cc - 2.0 * list_dot_product(n.e, c.ce), 6) AS d
          FROM v n CROSS JOIN cents c),
cassign AS (SELECT vec_id, cid FROM (
              SELECT vec_id, cid,
                     row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
              FROM cdist) WHERE rn = 1),
probes AS (SELECT vec_id AS q_id, cid FROM (
             SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
             FROM cdist WHERE vec_id < 5) WHERE rn <= {IVF_FIXED_N_PROBE}),
corpus AS (SELECT n.vec_id AS n_id, ca.cid, {cols}
           FROM v n JOIN cassign ca ON ca.vec_id = n.vec_id
           {joins}),
pairs AS (SELECT p.q_id, c.* FROM probes p
          JOIN corpus c ON c.cid = p.cid
          WHERE c.n_id <> p.q_id),
scored AS (SELECT p.q_id, p.n_id, round({adc}, 4) AS adc
           FROM pairs p
           {djoins}),
r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS rank
      FROM scored)
SELECT q_id, n_id, rank, adc FROM r WHERE rank <= {k}
"""


@query("pipe_ann_ivfpq", oracle=_ivfpq_oracle())
def pipe_ann_ivfpq(spark, sf_dir):
    """IVF-PQ end-to-end (similarity.ivfpq_topk_fixed): the production
    100 TB ANN architecture — frozen coarse quantizer prunes to
    4-of-16 cells, frozen shared-codebook PQ codes replace vectors
    inside cells, broadcast ADC tables score candidates.  The DuckDB
    oracle replays the whole pipeline: cell assignment, probe lists,
    per-subspace codes, ADC sums, top-k ties.  Corpus side scans
    (cid, codes) only; with the cid-partitioned materialized index
    this is a partition-pruned scan of ~n_probe/16 of ~3% of the
    original bytes."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.ivfpq_topk_fixed(emb, queries, k=5)


@query("pipe_embed_pq_trained", oracle=None)
def pipe_embed_pq_trained(spark, sf_dir):
    """PQ encode with TRAINED per-subspace Lloyd's codebooks
    (similarity.train_pq_codebooks — bounded-sample driver-side
    training, the FAISS ProductQuantizer split) — rows-only check
    (trained centroids are not SQL-expressible); distortion dominance
    over the frozen codebook asserted in
    tests/test_operators.py::TestProductQuantization."""
    emb = t(spark, sf_dir, "embeddings")
    return similarity.pq_encode_trained(emb)


# ---------------------------------------------------------------------------
# Streaming semantic near-dup gate
# ---------------------------------------------------------------------------


def _stream_neardup_oracle() -> str:
    from impala_cut_spark.operators.similarity import NEARDUP_BAND_BITS
    from impala_cut_spark.plans.pipeline import _SQL_VECS

    bits = " + ".join(
        f"(CASE WHEN e[{j + 1}] > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(NEARDUP_BAND_BITS)
    )
    return f"""
WITH {_SQL_VECS},
sgn AS (SELECT vec_id, e, nm, {bits} AS b FROM nv),
dups AS (SELECT DISTINCT b2.vec_id
         FROM sgn a JOIN sgn b2
           ON a.b = b2.b AND a.vec_id < b2.vec_id
         WHERE round(list_dot_product(a.e, b2.e) / (a.nm * b2.nm), 6) >= 0.9)
SELECT v.vec_id, CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS keep
FROM v LEFT JOIN dups d ON d.vec_id = v.vec_id
"""


@query("stream_neardup", oracle=_stream_neardup_oracle())
def stream_neardup(spark, sf_dir):
    """Streaming semantic near-dup gate (streaming/neardup.py): a
    custom applyInPandasWithState operator admitting each arriving
    vector unless a previously-seen same-LSH-bucket vector has cosine
    ≥ 0.9 — the online dedup front of a training-data ingest.  The
    replayed result is oracle-checkable because in-batch processing
    order is vec_id order: keep=0 ⇔ ∃ lower-id same-bucket vector at
    round-6 cosine ≥ 0.9, exactly the SQL the oracle runs."""
    from impala_cut_spark.streaming.neardup import run_stream_neardup

    return run_stream_neardup(spark, sf_dir)


@query(
    "pipe_dedup_incremental",
    oracle="""
WITH corpus AS (SELECT * FROM documents WHERE doc_id % 4 <> 0),
shard AS (SELECT * FROM documents WHERE doc_id % 4 = 0),
cfp AS (SELECT DISTINCT md5(trim(lower(text))) AS fp FROM corpus),
sfp AS (SELECT doc_id, md5(trim(lower(text))) AS fp FROM shard),
keepers AS (SELECT min(doc_id) AS doc_id FROM sfp s
            WHERE NOT EXISTS (SELECT 1 FROM cfp c WHERE c.fp = s.fp)
            GROUP BY fp)
SELECT s.doc_id, s.lang, s.source
FROM shard s JOIN keepers k ON k.doc_id = s.doc_id
""",
)
def pipe_dedup_incremental(spark, sf_dir):
    """Incremental exact dedup (operators/dedup.py incremental_dedup):
    a new shard (doc_id % 4 = 0) merges against the standing corpus
    (the rest) — admitted rows are shard docs whose normalized-content
    fingerprint is new to the corpus AND first within the shard.  The
    rolling-ingest twin of pipe_dedup_exact: production maintains the
    corpus fingerprint table across ingests instead of re-deduping
    100 TB per batch."""
    docs = t(spark, sf_dir, "documents")
    corpus_part = docs.filter(F.col("doc_id") % 4 != 0)
    shard = docs.filter(F.col("doc_id") % 4 == 0)
    from impala_cut_spark.operators.dedup import incremental_dedup

    return incremental_dedup(corpus_part, shard).select("doc_id", "lang", "source")


from impala_cut_spark.plans.registry import REGISTRY as _REG


@query("pipe_decontaminate_bloom", oracle=_REG["pipe_decontaminate"].oracle)
def pipe_decontaminate_bloom(spark, sf_dir):
    """Bloom-pre-filtered decontamination (corpus.decontaminate_bloom):
    IDENTICAL result to pipe_decontaminate (no false negatives + exact
    verify join — same oracle checks both), but corpus shingles probe
    a 16 KB JVM-side bitmap first, so when the eval battery's shingle
    set outgrows broadcast (GBs at a full benchmark suite), only the
    tiny bloom-passing fraction reaches the exact join."""
    docs = t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    return corpus.decontaminate_bloom(train, bench, n=3, min_overlap=5)


@query("pipe_tokenize_bpe", oracle=None)
def pipe_tokenize_bpe(spark, sf_dir):
    """Real BPE tokenization (operators/tokenizer.py): merges learned
    from the corpus word-frequency table (driver-side on the bounded
    top-50k words, like a PQ codebook), then applied distributedly via
    an Arrow-batched word-cached kernel — per-document token budgets
    for a training pipeline.  Rows-only (iterative rank-greedy merging
    is not SQL-expressible); reconstruction/monotonicity properties in
    tests/test_tokenizer.py."""
    from impala_cut_spark.operators.tokenizer import bpe_encode, learn_bpe_merges

    docs = t(spark, sf_dir, "documents")
    merges = learn_bpe_merges(docs, n_merges=200)
    return bpe_encode(docs, merges)


@query(
    "pipe_text_unigram_ppl",
    oracle="""
WITH toks AS (SELECT doc_id,
                     unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
              FROM documents),
freqs AS (SELECT w, count(*) AS n FROM toks GROUP BY w),
tot AS (SELECT cast(count(*) AS double) AS t FROM toks),
terms AS (SELECT doc_id,
                 cast(round(-ln(cast(n AS double) / t), 6) AS decimal(18,6)) AS nll
          FROM toks JOIN freqs USING (w) CROSS JOIN tot)
SELECT doc_id, count(*) AS n_tokens,
       round(cast(sum(nll) AS double) / count(*), 6) AS avg_nll
FROM terms GROUP BY doc_id
""",
)
def pipe_text_unigram_ppl(spark, sf_dir):
    """Unigram-LM quality scoring (text.unigram_nll_scores): mean
    −ln p(w) per document under the corpus's own unigram model — the
    CCNet-style perplexity-filter proxy.  Terms are rounded then
    decimal-summed so both engines agree bit-for-bit despite the
    shuffle's nondeterministic accumulation order; ln itself agrees at
    6dp (the only libm call the registry exposes — absorbed by the
    per-term rounding)."""
    from impala_cut_spark.operators.text import unigram_nll_scores

    return unigram_nll_scores(t(spark, sf_dir, "documents"))
