"""Streaming semantic near-duplicate filter over an embedding stream.

A custom stateful operator the reference has no analogue for (SURVEY
§2.9 — streaming built as the Spark-native extension): as vectors
arrive, each is admitted (keep=1) or rejected (keep=0) depending on
whether a PREVIOUSLY-SEEN vector in the same LSH bucket has cosine ≥
threshold — the streaming twin of the batch SemDeDup/near-dup
operators, i.e. an online dedup gate in front of a training-data
ingest pipeline.

Design:

- Bucketing: ONE sign-band bucket per vector (band 0 of
  similarity.sign_band_buckets — coordinate-sign bits, an exact
  integer both engines reproduce).  A single band trades recall for a
  single stateful stage; production recall runs NEARDUP_BANDS copies
  of this operator in parallel (one per band) and ORs the dup flags —
  same state total, one extra union stage.
- State: per-bucket matrix of admitted-or-rejected vectors seen so
  far, via ``applyInPandasWithState`` (the same custom-stateful
  mechanism as streaming/sessions.py).  Within a micro-batch, rows
  process in vec_id order, so "previously seen" is exactly the
  lower-vec_id predicate of the batch operator — which is what makes
  the replayed result ORACLE-CHECKABLE against plain SQL.
- Arithmetic: einsum (optimize=False) sequential dots + round-6 —
  the same cross-engine cosine contract as operators/similarity.py.
- State lifetime: a corpus-dedup gate retains bucket state for the
  stream's life BY DESIGN (the dedup horizon is the corpus); where a
  bounded horizon is wanted, register the same function with an
  event-time timeout exactly as sessions.py does — the timeout is a
  parameter of applyInPandasWithState, not a different operator.

Scale: state shards by bucket key across executors; per-bucket state
is the vectors of ONE bucket (256 buckets at 8 bits — size buckets to
the corpus with more bits/bands exactly like the batch operator).  A
quantized state (PQ codes via similarity.pq_encode_fixed, ADC
screening) drops state bytes ~32× when buckets grow hot.
"""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from impala_cut_spark.operators.similarity import NEARDUP_BAND_BITS

_counter = itertools.count()

_OUT_SCHEMA = "vec_id long, keep int"
_STATE_SCHEMA = "ids array<long>, vecs array<array<double>>"


def _band0_bucket(vec) -> F.Column:
    """Band-0 sign bucket: packs the sign bits of coordinates
    [0, NEARDUP_BAND_BITS) — similarity.sign_band_buckets band 0."""
    bits = F.lit(0)
    for j in range(NEARDUP_BAND_BITS):
        bits = bits + F.when(vec[j] > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bits


def _dedup_group(key, pdfs, state: GroupState):
    threshold = 0.9
    if state.exists:
        ids, vecs = state.get
        ids = list(ids)
        M = np.array([list(v) for v in vecs], dtype=np.float64)
    else:
        ids, M = [], np.zeros((0, 0), dtype=np.float64)
    out_ids: list[int] = []
    out_keep: list[int] = []
    for pdf in pdfs:
        pdf = pdf.sort_values("vec_id")  # arrival order within the batch
        for vid, emb in zip(pdf["vec_id"], pdf["embedding"]):
            v = np.asarray(emb, dtype=np.float64)
            if M.size:
                # sequential-accumulation dots (cross-engine contract)
                dots = np.einsum("ij,j->i", M, v)
                nm = np.sqrt(np.einsum("ij,ij->i", M, M))
                nv = np.sqrt(np.einsum("j,j->", v, v))
                cos = np.round(dots / (nm * nv), 6)
                dup = bool((cos >= threshold).any())
            else:
                dup = False
            out_ids.append(int(vid))
            out_keep.append(0 if dup else 1)
            # EVERY seen vector joins the state (the batch predicate
            # compares against all lower ids, duplicates included)
            M = v[None, :] if not M.size else np.vstack([M, v])
            ids.append(int(vid))
    state.update((ids, [[float(x) for x in row] for row in M]))
    yield pd.DataFrame({"vec_id": out_ids, "keep": out_keep})


def stream_embedding_neardup(vectors: DataFrame) -> DataFrame:
    """The streaming dedup gate: vectors (vec_id, embedding) →
    (vec_id, keep).  ``vectors`` may be a stream or a batch frame (the
    grouping API is identical — same function both ways, like
    sessions.py)."""
    bucketed = vectors.withColumn("bucket", _band0_bucket(F.col("embedding")))
    return (
        bucketed.groupBy("bucket")
        .applyInPandasWithState(
            _dedup_group,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def embeddings_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings.parquet as a file-source stream."""
    schema = spark.read.parquet(f"{sf_dir}/embeddings.parquet").schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
    )


def run_stream_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the embeddings table through the streaming gate to
    completion (memory sink, single micro-batch) and return the
    (vec_id, keep) table — oracle-checkable: keep=0 ⇔ a lower-vec_id
    same-bucket vector has round-6 cosine ≥ 0.9."""
    name = f"emb_neardup_{next(_counter)}"
    q = (
        stream_embedding_neardup(embeddings_stream(spark, sf_dir))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select("vec_id", "keep")
