"""Corpus-management operators: deterministic splits, stratified
sampling, and exact distribution statistics over the ``documents``
table — the bookkeeping half of a training-data pipeline (the heavy
transforms live in dedup.py / similarity.py / text.py).

Everything here is a pure DataFrame composition over cross-engine
primitives (md5-derived integer hashing, linear-interpolation
percentiles), so every operator is DuckDB-oracle-checkable.

Reference parity: the reference has no corpus surface (pure SQL MPP,
SURVEY.md §2) — this is the training-pipeline extension.

Scale notes: split/sample are stateless narrow maps (no shuffle — the
assignment is a hash of the row itself, so it is reproducible under
retries, repartitioning, and incremental re-runs, unlike
``df.randomSplit``/``df.sample`` whose results depend on partition
layout and seed plumbing); quantiles are one exact-percentile
aggregation (single shuffle; at 100 TB swap in approx_percentile and
keep the exact form as the small-SF oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from impala_cut_spark.operators.dedup import md5_hash60

#: resolution of the split/sample buckets: fractions are expressed in
#: basis points (1/10_000), exact in both engines.
BUCKETS = 10_000


def split_bucket(key: Column) -> Column:
    """Deterministic bucket in [0, BUCKETS): md5-derived 60-bit hash of
    the key, mod BUCKETS. Identical in DuckDB (see md5_hash60)."""
    return md5_hash60(key) % BUCKETS


def hash_split(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    key: str = "doc_id",
) -> DataFrame:
    """Assign every row a deterministic train/val/test split.

    The split is a pure function of the row key — re-running on a
    grown corpus never reassigns an existing row (the property that
    makes hash splits the standard over random splits for training
    pipelines: no test-set leakage across incremental builds).
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    bucket = split_bucket(F.col(key).cast("string"))
    expr: Column | None = None
    cum = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        cum += w
        cond = bucket < int(round(cum * BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return docs.withColumn("split", expr)


def stratified_sample(
    docs: DataFrame, fraction: float, strata: str = "lang", key: str = "doc_id"
) -> DataFrame:
    """Deterministic ~fraction sample WITHIN each stratum.

    The bucket hash mixes the stratum value with the key (joined with
    a ``|`` separator so ``('ab','c')`` and ``('a','bc')`` hash
    differently), so the same doc_id draws independently across strata
    definitions, and each stratum is sampled at the same rate
    regardless of its size (what plain hash-sampling of the key gives
    globally but not per-group when strata correlate with the key).
    """
    bucket = split_bucket(F.concat_ws("|", F.col(strata), F.col(key).cast("string")))
    return docs.filter(bucket < int(round(fraction * BUCKETS)))


def distribution_stats(
    docs: DataFrame, value: Column, by: str = "lang", percentiles: list[float] | None = None
) -> DataFrame:
    """Exact per-group distribution stats of ``value``: count, mean,
    and linear-interpolation percentiles (Spark ``percentile`` ==
    DuckDB ``quantile_cont`` — both implement the classic R-7/linear
    rule, verified by the pipe_corpus_stats oracle).
    """
    ps = percentiles or [0.25, 0.5, 0.75, 0.95]
    v = value.alias("_v")
    aggs = [
        F.count(F.col("_v")).alias("n"),
        F.round(F.avg("_v"), 6).alias("mean"),
    ] + [
        F.round(F.expr(f"percentile(_v, {p})"), 6).alias(f"p{int(p * 100)}")
        for p in ps
    ]
    return docs.select(F.col(by), v).groupBy(by).agg(*aggs)
