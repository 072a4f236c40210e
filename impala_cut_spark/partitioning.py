"""Partitioning helpers.

``fan_out`` fixes the small-source / expensive-derivation case: a scan
of a few under-split files (one row group ⇒ one Spark split) serializes
downstream per-row compute on one core. Operators whose per-row work
dominates their shuffle cost (tokenization, shingling, hashing, vector
math, Arrow UDF batches) call it before the heavy projection.

Deliberately conditional: when the source already provides at least
cluster parallelism (the 100 TB case — thousands of splits), it is a
no-op, so no shuffle is added at scale. The reference has the same
split-driven parallelism model (scan-range assignment,
``be/src/runtime/plan-fragment-executor.cc`` + scanner-thread pools in
``be/src/exec/hdfs-scan-node.h:77-95``); Spark's equivalent knob is
partition count, which is what we adjust here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, multiplier: int = 1, min_bytes: int = 0) -> DataFrame:
    """Round-robin repartition up to ``cores × multiplier`` partitions,
    only when the source is visibly under-split — never coalesces,
    never shuffles an already-parallel source.

    Under-split detection uses ``df.inputFiles()`` (cheap metadata; no
    ``df.rdd`` plan conversion, which would analyze the plan twice per
    call).  A file-backed plan with >= cores input files is assumed
    already parallel — at 100 TB every table has thousands of splits,
    making this a guaranteed no-op there; the repartition fires only in
    the few-files/one-row-group case it exists for.

    ``min_bytes`` (opt-in): callers whose per-row work is an
    Arrow-batched numpy kernel (cost ∝ bytes, not rows×interpretation)
    can skip the round-robin shuffle when the local source is smaller
    than this — the repartition+worker spin-up costs more than the
    compute it parallelizes. Callers with JVM-interpreted per-row hot
    loops (tokenize/shingle/explode) keep the default 0 = always fan
    out an under-split source."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * multiplier
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if len(files) >= target:
        return df
    if not files:
        # Non-file-backed plan (createDataFrame, post-exchange input):
        # inputFiles() is empty, not "one split" — fall back to the
        # actual partition count and only repartition when genuinely
        # under-split (ADVICE r2 #2: don't add a redundant round-robin
        # shuffle to an already-parallel in-memory source).
        try:
            if df.rdd.getNumPartitions() >= target:
                return df
        except Exception:
            pass
    if min_bytes and files and all(f.startswith("file:") for f in files):
        import os

        try:
            total = sum(os.path.getsize(f[len("file:") :]) for f in files)
        except OSError:
            total = min_bytes
        if total < min_bytes:
            return df
    return df.repartition(target)
