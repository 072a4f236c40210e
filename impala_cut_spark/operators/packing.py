"""Greedy sequence packing: concatenate documents into fixed-token
bins — the pretraining batch-construction step (sequences of
``max_tokens`` built from whole documents, order-preserving).

The packing fold (running fill; open a new bin when the next doc
would overflow) is inherently sequential, so it cannot be a window
cumsum — this is the textbook ``applyInPandas`` case (SURVEY §2
extension: custom stateful operator):

- Documents are first assigned to independent PACK GROUPS by a
  deterministic key hash. Groups are the unit of parallelism: the
  sequential fold runs per group, and groups scale with the corpus
  (100 TB ⇒ pick n_groups ≈ the shuffle parallelism you want; the
  fold inside a group is O(group size) with O(1) state).
- Within a group the fold is ordered by doc_id, so the result is a
  pure function of the corpus — reproducible under retries and
  repartitioning, and replayable by the DuckDB oracle as a recursive
  CTE (plans/pipeline.py pipe_pack_greedy).

Oversized documents (n_tok > max_tokens) occupy a bin alone — the
standard drop-or-truncate decision is left downstream, the packer
never silently drops.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from impala_cut_spark.operators.text import bpe_token_count


def pack_greedy(
    docs: DataFrame,
    max_tokens: int = 256,
    n_groups: int = 64,
    key: str = "doc_id",
    n_tok: Column | None = None,
) -> DataFrame:
    """(doc_id, grp, n_tok, pack_id): greedy order-preserving packing.

    ``pack_id`` is 0-based within each group; (grp, pack_id) is the
    global bin identity. ``n_tok`` defaults to the BPE-ish regex token
    count (operators/text.py) — the same count both engines compute.
    """
    counted = docs.select(
        F.col(key).alias("doc_id"),
        (F.col(key) % n_groups).cast("int").alias("grp"),
        (n_tok if n_tok is not None else bpe_token_count(F.col("text")))
        .cast("int")
        .alias("n_tok"),
    )

    def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        packs = []
        fill, pack = 0, 0
        first = True
        for n in pdf["n_tok"]:
            if not first and fill + n > max_tokens:
                pack += 1
                fill = 0
            fill += int(n)
            first = False
            packs.append(pack)
        pdf["pack_id"] = pd.Series(packs, dtype="int64")
        return pdf

    return counted.groupBy("grp").applyInPandas(
        _fold, schema="doc_id bigint, grp int, n_tok int, pack_id bigint"
    )


def pack_stats(packed: DataFrame, max_tokens: int = 256) -> DataFrame:
    """Per-bin utilization: (grp, pack_id, n_docs, fill, util)."""
    return packed.groupBy("grp", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("fill"),
        F.round(F.sum("n_tok").cast("double") / max_tokens, 6).alias("util"),
    )
