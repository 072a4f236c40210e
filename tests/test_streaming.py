"""Structured Streaming rollup vs its batch twin.

The reference has no streaming surface (SURVEY.md §2.9); this is part
of the training-pipeline extension. The finite file-source replay must
produce exactly the batch answer.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from impala_cut_spark.sources.catalog import load_table
from impala_cut_spark.streaming.events import run_hourly_rollup


def test_stream_rollup_equals_batch(spark, sf_dir):
    streamed = run_hourly_rollup(spark, sf_dir)

    events = load_table(spark, sf_dir, "events")
    batch = (
        events.groupBy(
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("hour"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
    )

    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b
