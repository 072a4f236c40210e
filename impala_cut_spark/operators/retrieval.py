"""Keyword retrieval: BM25 scoring over the documents table — the
lexical complement of the embedding-similarity family (similarity.py
covers dense ANN; this covers the sparse/keyword side every retrieval
stack pairs with it).

Reference parity: the reference has no retrieval surface (pure SQL
MPP, SURVEY.md §2) — this is a training/eval-pipeline extension
(mining documents for benchmark-related keywords, lexical dedup
probes, hybrid-retrieval data curation).

Cross-engine determinism: the only transcendental is idf's ln(),
rounded to 6 dp before use (the pipe_text_unigram_ppl trick); all
other arithmetic is rational on already-rounded doubles, and the
per-document sum of term scores goes through decimal(18,6) so the
shuffle's accumulation order cannot perturb the result. Fully
DuckDB-replayable.

Scale design: the query-term filter lands right after the tokenize
explode (and the term list is a literal IN — tiny); document lengths
are one groupBy over the same exploded stream; corpus totals (N,
avgdl) are a one-row broadcast; the per-(doc, term) join is on the
few-row term-stats side, broadcast. One doc_id shuffle end-to-end —
no step grows faster than the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from impala_cut_spark.operators.text import tokens

#: Robertson/Lucene defaults
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k documents by BM25 score for a bag of query terms.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    with the Lucene/BM25+ idf  ln(1 + (N − df + 0.5)/(df + 0.5)).

    Output: (doc_id, n_terms_matched, score), ties broken by doc_id so
    the LIMIT cut is total-ordered and oracle-checkable.
    """
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    totals = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )

    tf = (
        tok.filter(F.col("tok").isin(list(query_terms)))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))

    n = F.col("n_docs").cast("double")
    idf = F.round(
        F.log(F.lit(1.0) + (n - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))),
        6,
    )
    stats = df_t.crossJoin(F.broadcast(totals)).select(
        "tok", "df", "n_docs", "sum_dl", idf.alias("idf")
    )

    scored = (
        tf.join(F.broadcast(stats), "tok")
        .join(dl, "doc_id")
        .withColumn(
            "norm_dl",
            F.col("dl").cast("double")
            * F.col("n_docs").cast("double")
            / F.col("sum_dl").cast("double"),
        )
        .withColumn(
            "term_score",
            F.round(
                F.col("idf")
                * (F.col("tf").cast("double") * F.lit(k1 + 1.0))
                / (
                    F.col("tf").cast("double")
                    + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("norm_dl"))
                ),
                6,
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_matched"),
            F.round(
                F.sum(F.col("term_score").cast("decimal(18,6)")).cast("double"), 6
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def rrf_fuse(
    lexical: DataFrame,
    dense: DataFrame,
    c: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al. 2009) of two ranked
    retrieval arms: rrf(d) = Σ_arm 1/(c + rank_arm(d)), missing arm
    contributing 0 — the standard hybrid lexical+dense combiner.

    Inputs: two (doc_id, rank) frames (1-based ranks, total-ordered).
    Pure rational arithmetic (one division per arm, one two-term sum),
    so the result is bit-identical cross-engine with no rounding.

    Scale: both arms are top-N lists (tiny by construction); the full
    outer join and final sort are driver-scale no matter the corpus.
    """
    a = lexical.select(F.col("doc_id"), F.col("rank").alias("rank_lex"))
    b = dense.select(F.col("doc_id"), F.col("rank").alias("rank_dense"))
    fused = a.join(b, "doc_id", "full_outer").select(
        "doc_id",
        "rank_lex",
        "rank_dense",
        (
            F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("rank_lex")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("rank_dense")), F.lit(0.0))
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(k)
