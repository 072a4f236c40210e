"""Streaming token-budget admission gate — the ONLINE twin of the
batch greedy selection (operators/corpus.py budget_select): documents
arrive on the ingest feed and each source's running token total gates
admission the moment a document lands, instead of re-ranking a
finished corpus.  The quota-enforcement front of a managed ingest
(per-provider/per-crawl token caps).

Custom stateful operator via ``applyInPandasWithState`` (the same
pattern as streaming/neardup.py and sessions): state per source is ONE
BIGINT (the running token total) — independent of document volume, the
smallest possible streaming state.

Cross-engine contract: processing order within a micro-batch is doc_id
order (the replayed single-batch run is therefore a pure function of
the table), so admit ⇔ the doc_id-ordered per-source cumulative token
sum INCLUDING the document stays ≤ budget — exactly one SQL window,
which is what the DuckDB oracle runs.

Reference parity: the reference is batch-only (SURVEY.md §2);
extension surface.
"""

from __future__ import annotations

import itertools

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType, StringType

#: per-source token budget: sized so that at sf0.01 (~25 docs / ~1.4k
#: tokens per source) roughly half of each source is admitted — both
#: gate outcomes appear at every test SF.
BUDGET_TOKENS = 800

_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("n_tok", LongType()),
        StructField("cum_tokens", LongType()),
        StructField("admit", LongType()),
    ]
)
_STATE_SCHEMA = StructType([StructField("total", LongType())])

_counter = itertools.count()


def _budget_group(key, pdfs, state: GroupState):
    budget = BUDGET_TOKENS
    total = state.get[0] if state.exists else 0
    (source,) = key
    # A group arrives as an ITERATOR of Arrow chunks in arbitrary
    # post-shuffle order; the doc_id-order contract holds per batch, so
    # accumulate every chunk first, then sort ONCE (same pattern as
    # streaming/sessions.py).  Sorting chunk-by-chunk would fold the
    # cumulative sum out of order whenever a source spans chunks.
    pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("doc_id")
    out: list[tuple[int, str, int, int, int]] = []
    for did, n in zip(pdf["doc_id"], pdf["n_tok"]):
        total += int(n)
        out.append((int(did), source, int(n), total, 1 if total <= budget else 0))
    state.update((total,))
    yield pd.DataFrame(out, columns=["doc_id", "source", "n_tok", "cum_tokens", "admit"])


def stream_budget_gate(docs: DataFrame) -> DataFrame:
    """(doc_id, source, text) → (doc_id, source, n_tok, cum_tokens,
    admit).  ``docs`` may be a stream or a batch frame (identical
    grouping API both ways).  Token counting happens JVM-side BEFORE
    the stateful operator — the Python state function only folds
    integers, so per-batch Python work is O(rows), no text crosses the
    Arrow boundary."""
    from impala_cut_spark.operators.text import token_count

    sized = docs.select(
        "doc_id",
        "source",
        token_count(F.coalesce(F.col("text"), F.lit(""))).cast("long").alias("n_tok"),
    )
    return sized.groupBy("source").applyInPandasWithState(
        _budget_group,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet as a file-source stream."""
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def run_stream_budget_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the documents table through the gate to completion
    (memory sink, single micro-batch) and return the admission table —
    oracle-checkable: admit ⇔ per-source doc_id-ordered cumulative
    token sum ≤ budget."""
    name = f"docs_budget_{next(_counter)}"
    q = (
        stream_budget_gate(documents_stream(spark, sf_dir))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select("doc_id", "source", "n_tok", "cum_tokens", "admit")
