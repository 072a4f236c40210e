"""Custom stateful sessionization (applyInPandasWithState) must emit
exactly the sessions the built-in session_window computes in batch.

Watermark mechanics: a session only closes when the event-time
watermark passes last_event + gap, so the replay appends two sentinel
files (far-future events) processed as separate micro-batches
(maxFilesPerTrigger=1) to push the watermark across every real
session's timeout.
"""

from __future__ import annotations

import os
import time

import pytest

from pyspark.sql import functions as F

from impala_cut_spark.sources.catalog import load_table
from impala_cut_spark.streaming.sessions import sessionize_stateful, user_sessions

GAP = "30 minutes"


def test_stateful_sessions_equal_batch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    max_ts = events.agg(F.max("ts")).collect()[0][0]

    # file 1: the real events; files 2-3: one sentinel per user pushing
    # the watermark +10h then +20h so every real session times out
    src = tmp_path / "stream_src"
    users = events.select("user_id").distinct()
    events.coalesce(1).write.parquet(str(src / "f1"))
    for i, hours in enumerate((10, 20), start=2):
        users.withColumn(
            "ts", F.lit(max_ts).cast("timestamp") + F.expr(f"interval {hours} hours")
        ).withColumn("value", F.lit(0.0)).select("user_id", "ts", "value").coalesce(
            1
        ).write.parquet(str(src / f"f{i}"))

    # flatten into one dir with increasing mtimes (file-source ordering)
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    t0 = time.time()
    for i in (1, 2, 3):
        for f in (src / f"f{i}").glob("*.parquet"):
            dst = stream_dir / f"{i}_{f.name}"
            dst.write_bytes(f.read_bytes())
            os.utime(dst, (t0 + i, t0 + i))

    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stream_dir))
    )
    q = (
        sessionize_stateful(stream, GAP)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_test")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    emitted = spark.table("sess_test").filter(F.col("session_start") <= F.lit(max_ts))
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.total_value)
        for r in emitted.collect()
    }
    expected = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.total_value)
        for r in user_sessions(events, GAP).collect()
    }
    assert len(got) == len(expected)
    assert got == expected
