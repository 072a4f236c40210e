"""Similarity search over the ``embeddings`` table (array<float> vecs).

- cosine machinery built from F.zip_with / F.aggregate (JVM-side,
  strictly left-to-right fold → bit-identical with the oracle's
  sequential list accumulation).
- brute_force_topk — exact baseline: query×corpus join, windowed top-k.
- embedding_neardup_pairs — exact all-pairs cosine ≥ τ (self-join).
- lsh_topk — the 100 TB scale path: random-hyperplane signatures
  bucket the corpus; search only same/near buckets.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from impala_cut_spark.partitioning import fan_out


def dot(a: Column, b: Column) -> Column:
    """Σ a[i]·b[i] as a strict left fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def with_norm(df: DataFrame, vec: str = "embedding") -> DataFrame:
    return df.withColumn("_norm", norm(F.col(vec)))


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    return dot(a, b) / (norm_a * norm_b)


def brute_force_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Scale: O(|Q|·|corpus|) — correct baseline and right answer when
    |Q| is small (the corpus side streams; queries broadcast). The
    window top-k never materializes the full sorted list.
    """
    corpus = with_norm(fan_out(embeddings)).select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("n_vec"), F.col("_norm").alias("n_norm")
    )
    q = F.broadcast(
        with_norm(queries).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"), F.col("_norm").alias("q_norm")
        )
    )
    scored = corpus.crossJoin(q).filter(F.col("n_id") != F.col("q_id")).select(
        "q_id",
        "n_id",
        F.round(
            cosine(F.col("q_vec"), F.col("n_vec"), F.col("q_norm"), F.col("n_norm")), 6
        ).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "cos")
    )


def embedding_neardup_pairs(embeddings: DataFrame, threshold: float = 0.9) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold (id_a < id_b).

    Scale: the quadratic baseline — at 100 TB use lsh_topk's bucketing
    to restrict the pair space first; this exact form is the oracle.
    """
    a = with_norm(fan_out(embeddings)).select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("vec_a"), F.col("_norm").alias("norm_a")
    )
    b = with_norm(embeddings).select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vec_b"), F.col("_norm").alias("norm_b")
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b")).select(
        "id_a",
        "id_b",
        F.round(cosine(F.col("vec_a"), F.col("vec_b"), F.col("norm_a"), F.col("norm_b")), 6).alias(
            "cos"
        ),
    )
    return pairs.filter(F.col("cos") >= threshold)


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (random hyperplanes, deterministic seed)
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    return np.random.RandomState(seed).normal(size=(n_planes, dim)).astype(np.float64)


def hyperplane_signature(df: DataFrame, dim: int, n_planes: int = 12, vec: str = "embedding") -> DataFrame:
    """Append an int bucket = sign-bit signature under n_planes random
    hyperplanes. Pure column expressions (the plane matrix is folded
    into the plan as literals — no Python in the executor)."""
    planes = _hyperplanes(dim, n_planes)
    sig = F.lit(0).cast("bigint")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                F.col(vec),
                F.array(*[F.lit(float(x)) for x in planes[p]]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << p).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return df.withColumn("bucket", sig)


def lsh_topk(
    embeddings: DataFrame, queries: DataFrame, dim: int, k: int = 5, n_planes: int = 8
) -> DataFrame:
    """ANN top-k: compare each query only against corpus vectors in the
    SAME hyperplane bucket.

    Scale: the corpus is hash-partitioned by bucket (a pre-computable,
    materializable index); each query probes one partition instead of
    the full corpus. Recall < 1 by construction — measured against
    brute_force_topk in tests/test_similarity.py. Multi-probe (flip one
    bit) would raise recall at 2× probe cost.
    """
    corpus = hyperplane_signature(with_norm(fan_out(embeddings)), dim, n_planes).select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("n_vec"),
        F.col("_norm").alias("n_norm"),
        "bucket",
    )
    q = hyperplane_signature(with_norm(queries), dim, n_planes).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        F.col("_norm").alias("q_norm"),
        "bucket",
    )
    scored = corpus.join(F.broadcast(q), "bucket").filter(F.col("n_id") != F.col("q_id")).select(
        "q_id",
        "n_id",
        F.round(
            cosine(F.col("q_vec"), F.col("n_vec"), F.col("q_norm"), F.col("n_norm")), 6
        ).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "cos")
    )


# ---------------------------------------------------------------------------
# IVF ANN: k-means coarse quantizer + probe-nearest-lists search
# ---------------------------------------------------------------------------


def _nearest_centroid(vec: Column, cents: np.ndarray) -> Column:
    """1-based index of the L2-nearest centroid, as pure column
    expressions: argmin_c(||v-c||²) = argmin_c(c·c − 2·v·c)."""
    scores = F.array(
        *[
            F.lit(float(c @ c)) - 2.0 * dot(vec, F.array(*[F.lit(float(x)) for x in c]))
            for c in cents
        ]
    )
    return F.array_position(scores, F.array_min(scores)).cast("int")


def train_ivf_centroids(
    embeddings: DataFrame,
    dim: int,
    n_centroids: int = 16,
    iters: int = 4,
    vec: str = "embedding",
    sample_size: int = 20_000,
) -> np.ndarray:
    """Lloyd's k-means on a deterministic corpus SAMPLE, driver-side —
    the coarse quantizer of an IVF index.

    This is the FAISS-style split: the quantizer trains on a bounded
    sample in memory (one collect of ≤ sample_size vectors, then numpy
    Lloyd's — microseconds), and the CLUSTER ASSIGNMENT is the
    distributed pass. Training distributedly was strictly worse: every
    iteration re-built a fresh k×dim literal expression tree (new
    centroids → new plan → full recompile) plus a driver round-trip.
    At 100 TB the sample cap is also what makes training feasible at
    all — the quantizer doesn't need every vector.

    Deterministic: sample = evenly spaced vec_ids, init = evenly
    spaced sample rows.
    """
    n = embeddings.count()
    step = max(n // sample_size, 1)
    rows = (
        embeddings.filter(F.col("vec_id") % step == 0)
        .orderBy("vec_id")
        .select(vec)
        .limit(sample_size)
        .collect()
    )
    X = np.array([r[0] for r in rows], dtype=np.float64)
    cents = X[:: max(len(X) // n_centroids, 1)][:n_centroids].copy()

    for _ in range(iters):
        # ||x-c||² = x·x − 2 x·c + c·c; argmin over c drops x·x
        d2 = -2.0 * X @ cents.T + np.sum(cents * cents, axis=1)
        assign = np.argmin(d2, axis=1)
        for cid in range(len(cents)):
            members = X[assign == cid]
            if len(members):
                cents[cid] = members.mean(axis=0)
    return cents


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF ANN top-k: corpus vectors are bucketed by nearest centroid
    (the inverted lists); each query scans only its ``n_probe`` nearest
    lists.

    Scale: the assignment is a materializable index — at 100 TB write
    the corpus partitioned/bucketed by cid once, then each query is a
    partition-pruned scan of n_probe/n_centroids of the data. Recall
    measured against brute force in tests/test_operators.py.
    """
    cents = train_ivf_centroids(embeddings, dim, n_centroids)

    corpus = with_norm(embeddings).withColumn(
        "cid", _nearest_centroid(F.col("embedding"), cents)
    ).select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("n_vec"),
        F.col("_norm").alias("n_norm"),
        "cid",
    )
    # per-query distances to every centroid → n_probe nearest lists
    qdists = F.array(
        *[
            F.lit(float(c @ c)) - 2.0 * dot(F.col("embedding"), F.array(*[F.lit(float(x)) for x in c]))
            for c in cents
        ]
    )
    probes = F.slice(
        F.transform(
            F.array_sort(
                F.transform(qdists, lambda d, i: F.struct(d.alias("d"), (i + 1).alias("cid")))
            ),
            lambda s: s["cid"],
        ),
        1,
        n_probe,
    )
    q = (
        with_norm(queries)
        .withColumn("cid", F.explode(probes))
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_vec"),
            F.col("_norm").alias("q_norm"),
            "cid",
        )
    )
    scored = corpus.join(F.broadcast(q), "cid").filter(F.col("n_id") != F.col("q_id")).select(
        "q_id",
        "n_id",
        F.round(
            cosine(F.col("q_vec"), F.col("n_vec"), F.col("q_norm"), F.col("n_norm")), 6
        ).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "cos")
    )
