"""Round-6 training-data pipeline queries: corpus snapshot diff,
temperature-scaled multilingual sampling, bigram-LM Stupid Backoff
perplexity, and a streaming trending top-k.

Same contract as pipeline.py/pipeline2.py/pipeline3.py: Spark-first
DataFrame compositions (no per-row Python) whose results a DuckDB
oracle replays exactly — md5-60bit hashing, integer quotas, and the
6dp-decimal NLL convention are the cross-engine primitives.

Reference parity: the reference has no corpus-pipeline or streaming
surface (SURVEY.md §2 — pure SQL MPP); these are the
training-pipeline extension the brief asks for, graded alongside §2.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from impala_cut_spark.operators import corpus, dedup, text
from impala_cut_spark.plans._util import SQL_H60, t
from impala_cut_spark.plans.registry import query

_SQL_TOKS = "list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '')"

# ---------------------------------------------------------------------------
# corpus snapshot diff
# ---------------------------------------------------------------------------

#: deterministic synthetic "two snapshots" of the documents table:
#: old drops doc_id % 19 == 0, new drops doc_id % 17 == 3 and edits
#: the text of doc_id % 13 == 1 — exercising all four diff statuses
DIFF_OLD_DROP = "doc_id % 19 = 0"
DIFF_NEW_DROP = "doc_id % 17 = 3"
DIFF_EDIT = "doc_id % 13 = 1"

_FP_OLD = SQL_H60.format(x="coalesce(text, '')")
_FP_NEW = SQL_H60.format(
    x=f"CASE WHEN {DIFF_EDIT} THEN coalesce(text, '') || ' v2' ELSE coalesce(text, '') END"
)


@query(
    "pipe_snapshot_diff",
    oracle=f"""
WITH old AS (SELECT doc_id, {_FP_OLD} AS old_fp
             FROM documents WHERE NOT ({DIFF_OLD_DROP})),
     new AS (SELECT doc_id, {_FP_NEW} AS new_fp
             FROM documents WHERE NOT ({DIFF_NEW_DROP}))
SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
       CASE WHEN old_fp IS NULL THEN 'added'
            WHEN new_fp IS NULL THEN 'removed'
            WHEN old_fp = new_fp THEN 'unchanged'
            ELSE 'changed' END AS status,
       old_fp, new_fp
FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
""",
)
def pipe_snapshot_diff(spark, sf_dir):
    """Corpus snapshot diff (operators/corpus.py snapshot_diff): one
    full-outer key join classifying every document as added / removed
    / changed / unchanged between two crawl snapshots — the
    incremental-ingest step that bounds re-tokenize/re-dedup work to
    the delta. The two snapshots are deterministic projections of the
    documents table (drop-mod filters + a text edit), so all four
    statuses appear. ONE key-partitioned shuffle; bucketed snapshot
    storage makes it shuffle-free in production."""
    from impala_cut_spark.operators.dedup import md5_hash60

    docs = t(spark, sf_dir, "documents")
    txt = F.coalesce(F.col("text"), F.lit(""))
    old = docs.where(f"NOT ({DIFF_OLD_DROP})").select(
        "doc_id", md5_hash60(txt).alias("fp")
    )
    new = docs.where(f"NOT ({DIFF_NEW_DROP})").select(
        "doc_id",
        md5_hash60(
            F.when(F.expr(DIFF_EDIT), F.concat(txt, F.lit(" v2"))).otherwise(txt)
        ).alias("fp"),
    )
    return corpus.snapshot_diff(old, new)


# ---------------------------------------------------------------------------
# temperature-scaled multilingual sampling
# ---------------------------------------------------------------------------

TEMP_TARGET_DOCS = 200


@query(
    "pipe_temperature_sample",
    oracle=f"""
WITH h AS (SELECT doc_id, lang,
                  {SQL_H60.format(x="CAST(doc_id AS VARCHAR)")} AS h
           FROM documents),
     n AS (SELECT lang, count(*) AS nl FROM h GROUP BY lang),
     s AS (SELECT lang,
                  CAST(floor(sqrt(CAST(nl AS DOUBLE)) * 1e6) AS BIGINT) AS sl
           FROM n),
     q AS (SELECT lang,
                  CAST(({TEMP_TARGET_DOCS} * sl)
                       // (SELECT CAST(sum(sl) AS BIGINT) FROM s) AS BIGINT) AS quota
           FROM s),
     r AS (SELECT doc_id, lang, h,
                  row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
           FROM h)
SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
FROM r JOIN q USING (lang) WHERE rk <= quota
""",
)
def pipe_temperature_sample(spark, sf_dir):
    """Temperature-scaled multilingual sampling at α = 0.5
    (operators/corpus.py temperature_sample; Conneau & Lample 2019,
    public literature): per-language quotas ∝ sqrt(n_l), documents
    picked by deterministic md5-rank within language. Quotas are
    exact integers (IEEE sqrt is correctly rounded, so floor(sqrt·1e6)
    matches bit-for-bit across Python/JVM/DuckDB); ranks come from the
    epoch_shuffle hash-band two-phase — no per-language global sort.
    The DuckDB oracle computes quotas and ranks with the naive global
    window — same rows by construction."""
    return corpus.temperature_sample(
        t(spark, sf_dir, "documents"), target_docs=TEMP_TARGET_DOCS
    )


# ---------------------------------------------------------------------------
# bigram-LM Stupid Backoff perplexity
# ---------------------------------------------------------------------------


@query(
    "pipe_bigram_ppl",
    oracle=f"""
WITH l AS (SELECT doc_id, {_SQL_TOKS} AS ls FROM documents),
pr AS (SELECT doc_id, ls[i-1] AS w1, ls[i] AS w2
       FROM l, unnest(range(2, len(ls) + 1)) s(i)),
tw AS (SELECT unnest(ls) AS w FROM l
       WHERE doc_id % {text.SB_TRAIN_MOD} <> {text.SB_TRAIN_REM}),
c1 AS (SELECT w, count(*) AS n1 FROM tw GROUP BY w),
c2 AS (SELECT w1, w2, count(*) AS n2 FROM pr
       WHERE doc_id % {text.SB_TRAIN_MOD} <> {text.SB_TRAIN_REM} GROUP BY w1, w2),
tv AS (SELECT CAST(sum(n1) AS DOUBLE) + CAST(count(*) AS DOUBLE) AS tpv FROM c1),
terms AS (SELECT pr.doc_id,
                 CAST(round(-ln(CASE WHEN c2.n2 IS NOT NULL
                                     THEN CAST(c2.n2 AS DOUBLE) / CAST(a.n1 AS DOUBLE)
                                     ELSE {text.SB_ALPHA}
                                          * CAST(coalesce(b.n1, 0) + 1 AS DOUBLE)
                                          / tpv END), 6) AS DECIMAL(18,6)) AS nll
          FROM pr
          LEFT JOIN c2 ON pr.w1 = c2.w1 AND pr.w2 = c2.w2
          LEFT JOIN c1 a ON pr.w1 = a.w
          LEFT JOIN c1 b ON pr.w2 = b.w
          CROSS JOIN tv),
agg AS (SELECT doc_id, count(*) AS nb,
               floor(CAST(sum(nll) AS DOUBLE) / count(*) * 1000000 + 0.5) / 1000000 AS avg_nll
        FROM terms GROUP BY doc_id)
SELECT l.doc_id,
       (l.doc_id % {text.SB_TRAIN_MOD} <> {text.SB_TRAIN_REM}) AS in_train,
       CAST(coalesce(nb, 0) AS BIGINT) AS n_bigrams,
       agg.avg_nll
FROM l LEFT JOIN agg ON l.doc_id = agg.doc_id
""",
)
def pipe_bigram_ppl(spark, sf_dir):
    """Bigram-LM perplexity with Stupid Backoff (operators/text.py
    bigram_nll_scores; Brants et al. 2007, public literature): counts
    from a held-in split (doc_id % 4 ≠ 0), every document scored, so
    unseen bigrams genuinely exercise the α·(c(w)+1)/(T+V) backoff.
    Per-term −ln(p) rounded to 6dp and summed as DECIMAL (the
    registry's order-free convention). Two count shuffles + the
    scoring joins (AQE broadcast/skew) + one per-doc aggregation —
    all linear in corpus size."""
    return text.bigram_nll_scores(t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# streaming trending top-k
# ---------------------------------------------------------------------------

TOPK_K = 3


@query(
    "stream_topk_trending",
    oracle=f"""
WITH c AS (SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
           FROM events GROUP BY 1, 2),
r AS (SELECT hour, event_type, n,
             row_number() OVER (PARTITION BY hour
                                ORDER BY n DESC, event_type ASC) AS rk
      FROM c)
SELECT CAST(hour AS TIMESTAMP) AS hour, event_type, n, CAST(rk AS INT) AS rk
FROM r WHERE rk <= {TOPK_K}
""",
)
def stream_topk_trending(spark, sf_dir):
    """Streaming per-hour trending top-k event types (streaming/
    events.py run_stream_topk_trending): ONE watermarked hourly
    streaming aggregation maintains (hour, type) counts; the
    rank-and-cut leaderboard is a batch window overlay on the
    streamed state (a second aggregation over a streaming agg is
    unsupported by design — and a leaderboard read is a point-in-time
    query). Deterministic tie-break (count DESC, type ASC) keeps the
    finite replay oracle-exact; state is independent of event
    volume."""
    from impala_cut_spark.streaming.events import run_stream_topk_trending

    out = run_stream_topk_trending(spark, sf_dir, k=TOPK_K)
    return out.select(
        F.col("hour").cast("timestamp").alias("hour"),
        "event_type",
        "n",
        F.col("rk").cast("int").alias("rk"),
    )


# ---------------------------------------------------------------------------
# block-level keep-first dedup (paragraph dedup stand-in)
# ---------------------------------------------------------------------------


@query(
    "pipe_dedup_blocks",
    oracle=f"""
WITH l AS (SELECT doc_id, {_SQL_TOKS} AS ls FROM documents),
b AS (SELECT doc_id, CAST(i AS INT) AS block_id,
             ls[CAST(i * {dedup.BLOCK_TOKENS} + 1 AS BIGINT)
                : CAST(i * {dedup.BLOCK_TOKENS} + {dedup.BLOCK_TOKENS} AS BIGINT)] AS btk
      FROM l, unnest(range(0, CAST(ceil(len(ls) / {dedup.BLOCK_TOKENS}.0) AS BIGINT))) s(i)
      WHERE len(ls) >= 1),
f AS (SELECT doc_id, block_id, CAST(len(btk) AS INT) AS n_tok,
             {SQL_H60.format(x="array_to_string(btk, ' ')")} AS fp
      FROM b),
r AS (SELECT doc_id, block_id, n_tok,
             row_number() OVER (PARTITION BY fp
                                ORDER BY doc_id, block_id) AS rk
      FROM f)
SELECT doc_id, block_id, n_tok, (rk = 1) AS keep FROM r
""",
)
def pipe_dedup_blocks(spark, sf_dir):
    """Paragraph-granularity keep-first dedup (operators/dedup.py
    block_dedup_keep_first; the RefinedWeb/FineWeb line-and-paragraph
    dedup stage, public literature): fixed 8-token blocks stand in
    for paragraphs (testdata has no newline structure), each distinct
    block kept only at its globally first (doc_id, block_id)
    occurrence — append-stable. Winner selection is an aggregation +
    fingerprint join-back, NOT a fingerprint-partitioned window, so a
    boilerplate block repeated corpus-wide is an AQE-splittable
    skewed join, not an unsplittable hot window partition. The DuckDB
    oracle uses the naive window — same bits by construction."""
    from impala_cut_spark.operators.dedup import block_dedup_keep_first

    return block_dedup_keep_first(t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# per-language z-score normalization of the quality score
# ---------------------------------------------------------------------------


@query(
    "pipe_score_zscore",
    oracle=f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS l FROM documents),
     ft AS (
       SELECT doc_id,
              CAST(len(l) AS DOUBLE) AS n_tokf,
              CAST(coalesce(list_sum(list_transform(l, x -> length(x))), 0) AS DOUBLE)
                AS sum_len,
              CAST(len(list_filter(l, x -> list_contains(
                  ['the','a','of','and','to','in','is','that','it','for'], x)))
                AS DOUBLE) AS n_stop
       FROM toks),
     sc AS (SELECT doc_id,
                   floor((0.4 * least(n_tokf / 100.0, 1.0)
                         + 0.3 * least((n_stop / n_tokf) * 5.0, 1.0)
                         + 0.3 * least((sum_len / n_tokf) / 8.0, 1.0))
                        * 1000000 + 0.5) / 1000000 AS score
            FROM ft),
     j AS (SELECT sc.doc_id, d.lang, sc.score,
                  CAST(round(sc.score * 1000000) AS BIGINT) AS sm
           FROM sc JOIN documents d ON sc.doc_id = d.doc_id),
     m AS (SELECT lang, count(*) AS n,
                  CAST(sum(sm) AS BIGINT) AS s1,
                  CAST(sum(sm * sm) AS BIGINT) AS s2
           FROM j GROUP BY lang),
     ms AS (SELECT lang, n,
                   CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0 AS mu,
                   CASE WHEN n > 1 AND (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                                        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) > 0
                        THEN sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))
                                  / (1000000.0 * 1000000.0))
                        ELSE 0.0 END AS sd
            FROM m)
SELECT j.doc_id, j.lang, j.score,
       round(CASE WHEN ms.sd > 0.0 THEN (j.score - ms.mu) / ms.sd
                  ELSE 0.0 END, 6) AS z
FROM j JOIN ms ON j.lang = ms.lang
""",
)
def pipe_score_zscore(spark, sf_dir):
    """Per-language z-score normalization of the composite quality
    score (operators/corpus.py zscore_by_group) — the feature-scaling
    step before mixing heterogeneous corpora: raw scores aren't
    comparable across languages, normalized ones are. Group moments
    are EXACT integer aggregates (score is 6dp-rounded upstream, so
    ×1e6 micro-units are lossless BIGINTs; sums are order-free), cast
    to double only in the closed-form μ/σ — both engines then run the
    identical IEEE sequence, so z matches to the 6dp rounding.
    One moments shuffle (#langs rows) + a broadcast join-back; no
    window, no sort."""
    docs = t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        F.col("lang"),
        text.quality_score(F.col("text")).alias("score"),
    )
    return corpus.zscore_by_group(scored)


# ---------------------------------------------------------------------------
# span-level decontamination + per-source reputation gate
# ---------------------------------------------------------------------------

SPAN_K = 8


@query(
    "pipe_decontaminate_spans",
    oracle=f"""
WITH l AS (SELECT doc_id, source, {_SQL_TOKS} AS ls FROM documents),
pos AS (SELECT doc_id, source, i AS p,
               array_to_string(ls[i:i+{SPAN_K - 1}], ' ') AS g
        FROM l, unnest(range(1, greatest(len(ls) - {SPAN_K - 1}, 0) + 1)) s(i)),
bench AS (SELECT DISTINCT g FROM pos WHERE source = 'src0'),
hit AS (SELECT doc_id, p FROM pos JOIN bench USING (g) WHERE source <> 'src0'),
brk AS (SELECT doc_id, p,
               CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p)
                        > {SPAN_K} THEN 1 ELSE 0 END AS b
        FROM hit),
isl AS (SELECT doc_id, p,
               sum(b) OVER (PARTITION BY doc_id ORDER BY p
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        FROM brk),
sp AS (SELECT doc_id, grp, min(p) AS a, max(p) AS bb, count(*) AS nstart
       FROM isl GROUP BY 1, 2),
agg AS (SELECT doc_id, count(*) AS contam_spans,
               CAST(sum(nstart) AS BIGINT) AS contam_pos,
               CAST(sum(bb - a + {SPAN_K}) AS BIGINT) AS contam_tokens
        FROM sp GROUP BY 1)
SELECT l.doc_id, len(ls) AS n_tok,
       coalesce(contam_pos, 0) AS contam_pos,
       coalesce(contam_spans, 0) AS contam_spans,
       coalesce(contam_tokens, 0) AS contam_tokens,
       CASE WHEN coalesce(contam_tokens, 0) > 0 THEN 1 ELSE 0 END
         AS is_contaminated
FROM l LEFT JOIN agg USING (doc_id)
WHERE source <> 'src0'
""",
)
def pipe_decontaminate_spans(spark, sf_dir):
    """Span-level EXACT decontamination (operators/corpus.py
    decontaminate_spans): maximal ≥{k}=8-token spans of a training
    document (source<>'src0') that appear verbatim anywhere in the
    benchmark slice (source='src0') — the cross-corpus form of
    pipe_dedup_substring's suffix-array semantics, localizing a
    benchmark leak to token intervals instead of dropping the whole
    document (pipe_decontaminate's granularity). Benchmark shingles
    broadcast (designed asymmetry), so the corpus positional fan-out
    never shuffles; islands merge per doc_id. The oracle replays the
    hit set and the token-interval merge."""
    docs = t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    return corpus.decontaminate_spans(train, bench, k=SPAN_K)


def _sql_count_in_l(words: list[str]) -> str:
    lst = ", ".join("'" + w.replace("'", "''") + "'" for w in words)
    return f"len(list_filter(l, x -> list_contains([{lst}], x)))"


@query(
    "pipe_source_reputation",
    oracle=f"""
WITH toks AS (SELECT doc_id, source, {_SQL_TOKS} AS l FROM documents),
f AS (SELECT source, len(l) AS n_tok,
             CAST(round(floor((0.4 * least(cast(len(l) as double) / 100.0, 1.0)
                  + 0.3 * least(cast({_sql_count_in_l(text.QUALITY_STOPWORDS)} as double)
                                / cast(len(l) as double) * 5.0, 1.0)
                  + 0.3 * least(cast(list_sum(list_transform(l, x -> length(x))) as double)
                                / cast(len(l) as double) / 8.0, 1.0)) * 1000000 + 0.5)
                  / 1000000 * 1000000) AS BIGINT) AS q_micro
      FROM toks),
agg AS (SELECT source, count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS tok_sum,
               CAST(floor(sum(q_micro) / count(*)) AS BIGINT) AS q_avg_micro,
               CAST(floor(sum(n_tok) * 1000000 / count(*)) AS BIGINT) AS tok_avg_micro
        FROM f GROUP BY 1)
SELECT source, n_docs, tok_sum, q_avg_micro, tok_avg_micro,
       (q_avg_micro >= {corpus.MIN_SOURCE_QUALITY_MICRO}
        AND tok_avg_micro >= {corpus.MIN_SOURCE_TOK_AVG_MICRO}) AS keep,
       CASE WHEN q_avg_micro < {corpus.MIN_SOURCE_QUALITY_MICRO} THEN 'low_quality'
            WHEN tok_avg_micro < {corpus.MIN_SOURCE_TOK_AVG_MICRO} THEN 'short_docs'
            END AS drop_reason
FROM agg
""",
)
def pipe_source_reputation(spark, sf_dir):
    """Host/domain-level reputation gate (operators/corpus.py
    source_reputation): per-source mean heuristic quality and mean
    document length decide whether the WHOLE source is admitted — the
    C4/RefinedWeb host-filter stage that runs before any per-document
    filtering. Integer micro-unit arithmetic end-to-end; 'low_quality'
    outranks 'short_docs' as the drop reason. One source-keyed
    aggregation with map-side partial combine (a Zipf-hot source
    pre-reduces per input partition); the |sources|-row verdict is
    what a pipeline broadcast-joins back for the actual drop."""
    return corpus.source_reputation(t(spark, sf_dir, "documents"))


@query(
    "pipe_benchmark_overlap",
    oracle=f"""
WITH l AS (SELECT doc_id, source, {_SQL_TOKS} AS ls FROM documents),
sh AS (SELECT doc_id, source,
              unnest(list_distinct([array_to_string(ls[i:i+{SPAN_K - 1}], ' ')
                     for i in range(1, greatest(len(ls) - {SPAN_K - 1}, 0) + 1)])) AS g
       FROM l),
corp AS (SELECT DISTINCT g FROM sh WHERE source <> 'src0'),
b AS (SELECT doc_id, g FROM sh WHERE source = 'src0'),
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM b GROUP BY 1),
hits AS (SELECT doc_id, count(*) AS n_hit FROM b JOIN corp USING (g) GROUP BY 1)
SELECT s.doc_id, s.n_shingles,
       CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
       CAST(floor(coalesce(n_hit, 0) * 1000000 / s.n_shingles) AS BIGINT)
         AS overlap_micro
FROM sizes s LEFT JOIN hits USING (doc_id)
""",
)
def pipe_benchmark_overlap(spark, sf_dir):
    """Eval-integrity report (operators/corpus.py benchmark_overlap):
    for each BENCHMARK doc (source='src0'), the fraction of its
    distinct {k}=8-token shingles already present verbatim in the
    training corpus — the reverse direction of pipe_decontaminate,
    telling you which eval items are compromised rather than which
    training docs to drop. The benchmark shingle set broadcasts as a
    map-side semi-filter against the corpus fan-out (the corpus is
    never shuffled at fan-out volume; the DISTINCT that follows is
    bounded by |benchmark shingles|)."""
    docs = t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    return corpus.benchmark_overlap(train, bench, k=SPAN_K)


@query(
    "pipe_decontaminate_clean",
    oracle=f"""
WITH l AS (SELECT doc_id, source, {_SQL_TOKS} AS ls FROM documents),
pos AS (SELECT doc_id, source, i AS p,
               array_to_string(ls[i:i+{SPAN_K - 1}], ' ') AS g
        FROM l, unnest(range(1, greatest(len(ls) - {SPAN_K - 1}, 0) + 1)) s(i)),
bench AS (SELECT DISTINCT g FROM pos WHERE source = 'src0'),
hit AS (SELECT doc_id, p FROM pos JOIN bench USING (g) WHERE source <> 'src0'),
brk AS (SELECT doc_id, p,
               CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p)
                        > {SPAN_K} THEN 1 ELSE 0 END AS b
        FROM hit),
isl AS (SELECT doc_id, p,
               sum(b) OVER (PARTITION BY doc_id ORDER BY p
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        FROM brk),
sp AS (SELECT doc_id, grp, min(p) AS a, max(p) + {SPAN_K} - 1 AS b
       FROM isl GROUP BY 1, 2),
spd AS (SELECT doc_id, list({{'a': a, 'b': b}}) AS spans FROM sp GROUP BY 1)
SELECT l.doc_id, len(ls) AS n_tok,
       CAST(coalesce(list_sum(list_transform(spans, sp -> sp.b - sp.a + 1)), 0)
            AS BIGINT) AS n_removed,
       coalesce(array_to_string([ls[i] for i in range(1, len(ls) + 1)
                        if spans IS NULL
                           OR len(list_filter(spans,
                                  sp -> i >= sp.a AND i <= sp.b)) = 0],
                       ' '), '') AS clean_text
FROM l LEFT JOIN spd USING (doc_id)
WHERE source <> 'src0'
""",
)
def pipe_decontaminate_clean(spark, sf_dir):
    """Span REMOVAL (operators/corpus.py remove_contaminated_spans):
    cut the maximal contaminated token intervals found by
    pipe_decontaminate_spans out of each training document and re-emit
    the cleaned text — Lee-et-al span removal instead of document
    removal. Same broadcast-benchmark + per-doc island-merge profile,
    plus a bounded per-doc span collect and a narrow higher-order
    token filter (no Python, no clean-side explode). The oracle
    replays the interval set and the token surgery via a DuckDB list
    comprehension — including the merged-interval disjointness that
    makes n_removed an exact sum."""
    docs = t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    return corpus.remove_contaminated_spans(train, bench, k=SPAN_K)


# ---------------------------------------------------------------------------
# two-stage retrieval: IVF-PQ candidates + exact cosine re-rank
# ---------------------------------------------------------------------------

RERANK_R = 20
RERANK_K = 5


def _ivfpq_rerank_oracle() -> str:
    from impala_cut_spark.plans.pipeline2 import _ivfpq_oracle

    return f"""
WITH cands AS ({_ivfpq_oracle(RERANK_R)}),
v2 AS (SELECT vec_id, list_transform(embedding, x -> cast(x as double)) AS e
       FROM embeddings),
nv2 AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nm FROM v2),
ex AS (SELECT c.q_id, c.n_id,
              round(list_dot_product(q.e, n.e) / (q.nm * n.nm), 6) AS cos
       FROM cands c
       JOIN nv2 q ON q.vec_id = c.q_id
       JOIN nv2 n ON n.vec_id = c.n_id),
rr AS (SELECT *, row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos DESC, n_id) AS rank
       FROM ex)
SELECT q_id, n_id, rank, cos FROM rr WHERE rank <= {RERANK_K}
"""


@query("pipe_ann_ivfpq_rerank", oracle=_ivfpq_rerank_oracle())
def pipe_ann_ivfpq_rerank(spark, sf_dir):
    """Two-stage retrieval (operators/similarity.py
    ivfpq_rerank_topk_fixed): IVF-PQ generates {r}=20 candidates per
    query by ADC over the probed cells (stage 1 = pipe_ann_ivfpq's
    plan, codes-only cell-pruned scan), then EXACT round-6 cosine over
    the full-precision vectors re-ranks just those candidates to
    top-{k}=5 — FAISS-style search-then-refine, the production pattern
    that buys back the precision PQ codes lose. The refine stage never
    shuffles the corpus: the ≤|Q|·r candidate table (query vectors
    attached) broadcasts into one map-side join keyed by vec_id. The
    oracle nests the full IVF-PQ replay as a CTE and re-ranks with the
    identical fold-order dot product."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    from impala_cut_spark.operators import similarity

    return similarity.ivfpq_rerank_topk_fixed(emb, queries, k=RERANK_K, r=RERANK_R)


# ---------------------------------------------------------------------------
# per-document TF-IDF keyword extraction
# ---------------------------------------------------------------------------

TFIDF_K = 3


@query(
    "pipe_tfidf_keywords",
    oracle=f"""
WITH l AS (SELECT doc_id, {_SQL_TOKS} AS ls FROM documents),
tf AS (SELECT doc_id, unnest(ls) AS term FROM l),
tfa AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2),
dfa AS (SELECT term, count(*) AS df FROM tfa GROUP BY 1),
n AS (SELECT count(*) AS n FROM l),
s AS (SELECT doc_id, term, tf, df,
             round(CAST(tf AS DOUBLE)
                   * ln(CAST(n + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE)), 6)
               AS score
      FROM tfa JOIN dfa USING (term) CROSS JOIN n),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS rk
      FROM s)
SELECT doc_id, term, tf, df, score, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= {TFIDF_K}
""",
)
def pipe_tfidf_keywords(spark, sf_dir):
    """Per-document TF-IDF keywords (operators/retrieval.py
    tfidf_keywords): top-{k}=3 most characteristic terms per document
    — the doc-tagging stage feeding domain classification and cluster
    labeling. tf is one (doc, term) aggregation of the token explode;
    df re-aggregates the tf table (no second corpus pass); N is a
    one-row broadcast; score = round(tf·ln((N+1)/(df+1)), 6) with the
    smoothed idf keeping the log argument integral-rational. Ties cut
    by term text, so the window is total-ordered and the DuckDB oracle
    replays it exactly."""
    from impala_cut_spark.operators import retrieval

    return retrieval.tfidf_keywords(t(spark, sf_dir, "documents"), k=TFIDF_K)


# ---------------------------------------------------------------------------
# streaming token-budget admission gate
# ---------------------------------------------------------------------------


def _stream_budget_oracle() -> str:
    from impala_cut_spark.streaming.budget import BUDGET_TOKENS

    return f"""
WITH l AS (SELECT doc_id, source, len({_SQL_TOKS}) AS n_tok FROM documents),
c AS (SELECT doc_id, source, n_tok,
             sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_tokens
      FROM l)
SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tok,
       CAST(cum_tokens AS BIGINT) AS cum_tokens,
       CAST(CASE WHEN cum_tokens <= {BUDGET_TOKENS} THEN 1 ELSE 0 END AS BIGINT)
         AS admit
FROM c
""".strip()


@query("stream_budget_gate", oracle=_stream_budget_oracle())
def stream_budget_gate(spark, sf_dir):
    """Streaming per-source token-budget admission gate
    (streaming/budget.py): the ONLINE twin of pipe_budget_select —
    each arriving document is admitted iff its source's running token
    total stays under the quota, enforced the moment it lands (the
    per-provider cap of a managed ingest). Custom stateful operator
    (applyInPandasWithState, one BIGINT of state per source — volume-
    independent); token counting stays JVM-side so no text crosses
    the Arrow boundary. Replay order is doc_id within the batch, so
    the oracle is ONE per-source cumulative-sum window."""
    from impala_cut_spark.streaming.budget import run_stream_budget_gate

    return run_stream_budget_gate(spark, sf_dir)


# ---------------------------------------------------------------------------
# cluster canonicalization: keep the highest-quality copy
# ---------------------------------------------------------------------------


def _dedup_canonical_oracle() -> str:
    from impala_cut_spark.plans.registry import REGISTRY

    clusters = REGISTRY["pipe_dedup_clusters"].oracle.strip()
    return f"""
WITH cl AS ({clusters}),
tq AS (SELECT doc_id, {_SQL_TOKS} AS l FROM documents),
q AS (SELECT doc_id,
             CAST(round(floor((0.4 * least(cast(len(l) as double) / 100.0, 1.0)
                  + 0.3 * least(cast({_sql_count_in_l(text.QUALITY_STOPWORDS)} as double)
                                / cast(len(l) as double) * 5.0, 1.0)
                  + 0.3 * least(cast(list_sum(list_transform(l, x -> length(x))) as double)
                                / cast(len(l) as double) / 8.0, 1.0)) * 1000000 + 0.5)
                  / 1000000 * 1000000) AS BIGINT) AS q_micro
      FROM tq),
j AS (SELECT cl.doc_id, cl.cluster_id, q.q_micro
      FROM cl JOIN q ON q.doc_id = cl.doc_id),
r AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
                                   ORDER BY q_micro DESC, doc_id) AS rn
      FROM j)
SELECT doc_id, cluster_id, q_micro, rn = 1 AS keep FROM r
"""


@query("pipe_dedup_canonical", oracle=_dedup_canonical_oracle())
def pipe_dedup_canonical(spark, sf_dir):
    """Cluster canonicalization (operators/dedup.py
    canonical_keeper_by_quality): within every near-dup cluster (the
    pipe_dedup_clusters components) keep the HIGHEST-quality member —
    the 'which copy survives' policy real pipelines apply (the
    cleanest crawl of a page wins, not the first-seen id). Quality in
    integer micro-units; ties fall to the smallest doc_id. One
    cluster-keyed max-struct aggregate + join-back (no window over the
    cluster partition — a boilerplate mega-cluster stays AQE-
    splittable). The oracle nests the full connected-components replay
    as a CTE and re-ranks with a window (cluster sizes are tiny at
    oracle SF)."""
    docs = t(spark, sf_dir, "documents")
    prs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.2).select("id_a", "id_b")
    assignment = dedup.dedup_cluster_assignment(docs, prs)
    return dedup.canonical_keeper_by_quality(docs, assignment)


# ---------------------------------------------------------------------------
# concat-and-chunk sequence construction map
# ---------------------------------------------------------------------------

SEQ_SEED = 0


def _seq_chunks_oracle() -> str:
    h = SQL_H60.format(
        x=f"'{SEQ_SEED}' || chr(31) || CAST(doc_id AS VARCHAR)"
    )
    return f"""
WITH l AS (SELECT doc_id, CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tok FROM documents),
keyed AS (SELECT doc_id, n_tok, {h} AS k FROM l),
o AS (SELECT doc_id, n_tok,
             CAST(coalesce(sum(n_tok) OVER (
                    ORDER BY k % {corpus.SHUFFLE_BUCKETS}, k, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS shuffle_off
      FROM keyed)
SELECT doc_id, shuffle_off, n_tok,
       CASE WHEN n_tok > 0
            THEN shuffle_off // {corpus.SEQ_CHUNK_LEN} END AS first_seq,
       CASE WHEN n_tok > 0
            THEN (shuffle_off + n_tok - 1) // {corpus.SEQ_CHUNK_LEN} END AS last_seq,
       CASE WHEN n_tok > 0
            THEN (shuffle_off + n_tok - 1) // {corpus.SEQ_CHUNK_LEN}
                 - shuffle_off // {corpus.SEQ_CHUNK_LEN} + 1
            ELSE 0 END AS n_seqs
FROM o
"""


@query("pipe_seq_chunks", oracle=_seq_chunks_oracle())
def pipe_seq_chunks(spark, sf_dir):
    """Concat-and-chunk sequence construction map (operators/corpus.py
    sequence_chunks): the corpus concatenated in deterministic
    epoch-shuffle order and cut into fixed {n}=64-token training
    sequences — per document, its global token offset and the
    [first_seq, last_seq] range it occupies (what a sequence writer
    and document-boundary attention mask consume). Global offsets via
    the epoch_shuffle band-offset two-phase applied to TOKEN sums
    (≤64-row collected offset map + within-bucket window) — no global
    sort; the oracle runs the naive global cumulative window, same
    integers by construction."""
    return corpus.sequence_chunks(t(spark, sf_dir, "documents"), seed=SEQ_SEED)
