"""Sessionization of the events table — batch + custom stateful stream.

The reference engine is batch-only (SURVEY.md §2.9); these are
training-pipeline extensions:

- ``user_sessions``       — gap-based session aggregation with Spark's
  built-in ``session_window`` (works in batch AND streaming). The
  batch form is oracle-checked against a DuckDB gaps-and-islands
  rewrite (plans/pipeline.py).
- ``sessionize_stateful`` — the same semantics as a CUSTOM stateful
  operator via ``applyInPandasWithState`` (event-time timeout closes a
  session when the watermark passes start-of-gap): the template for
  stateful logic Spark has no builtin for.

Scale: both shuffle once on user_id. Streaming state is one small
struct per open session per user, bounded by the watermark horizon;
``applyInPandasWithState`` state is per-group and partitioned across
executors like any keyed state store.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

DEFAULT_GAP = "30 minutes"


def user_sessions(events: DataFrame, gap: str = DEFAULT_GAP) -> DataFrame:
    """Per-user gap sessions: (user_id, session_start, session_end,
    n_events, total_value) via the built-in session_window."""
    return (
        events.groupBy(F.session_window(F.col("ts"), gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            # session_window.end is last event + gap; emit the last
            # event time so the oracle needs no gap arithmetic
            F.col("last_ts").cast("timestamp_ntz").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


_STATE_SCHEMA = StructType(
    [
        StructField("start", LongType()),  # epoch micros
        StructField("last", LongType()),
        StructField("n", LongType()),
        StructField("total_cents", LongType()),
    ]
)

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _gap_micros(gap: str) -> int:
    n, unit = gap.split()
    per = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60, "hour": 3600, "hours": 3600}
    return int(n) * per[unit] * 1_000_000


def make_sessionizer(gap: str = DEFAULT_GAP):
    """The applyInPandasWithState function: merges a user's new events
    into the open session, emits closed sessions. Event-time timeout
    fires when the watermark passes last_event + gap."""
    gap_us = _gap_micros(gap)

    def sessionize(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last, unit="us")],
                    "n_events": [n],
                    "total_value": [total / 100.0],
                }
            )
            return

        rows = pd.concat(list(pdfs)).sort_values("ts")
        # normalize to epoch-µs regardless of the Arrow batch's unit
        ts_us = rows["ts"].values.astype("datetime64[ns]").astype("int64") // 1000
        # exact money arithmetic: integer cents (== decimal(12,2) sums)
        cents = (rows["value"].astype("float64") * 100).round().astype("int64")

        closed: list[tuple] = []
        if state.exists:
            start, last, n, total = state.get
        else:
            start = last = int(ts_us[0])
            n, total = 0, 0
        for t_us, v in zip(ts_us, cents):
            t_us = int(t_us)
            # a new session starts only when the gap is STRICTLY
            # exceeded: session_window merges an event landing exactly
            # at last+gap (verified by the randomized differential in
            # tests/test_differential.py — the >= form diverged on
            # exact-gap boundaries)
            if n > 0 and t_us - last > gap_us:
                closed.append((start, last, n, total))
                start, n, total = t_us, 0, 0
            last = t_us
            n += 1
            total += int(v)
        state.update((start, last, n, total))
        # close the session once the event-time watermark passes the gap
        state.setTimeoutTimestamp((last + gap_us) // 1000 + 1)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _, _ in closed],
                    "n_events": [n_ for _, _, n_, _ in closed],
                    "total_value": [tc / 100.0 for _, _, _, tc in closed],
                }
            )

    return sessionize


def sessionize_stateful(events_stream: DataFrame, gap: str = DEFAULT_GAP) -> DataFrame:
    """Custom stateful sessionization over a (streaming) events frame
    with event-time column ``ts`` (TIMESTAMP)."""
    return (
        events_stream.withWatermark("ts", gap)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_sessionizer(gap),
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_stateful_sessions(
    spark: SparkSession, sf_dir: str, gap: str = DEFAULT_GAP
) -> DataFrame:
    """Replay events through the custom stateful sessionizer to
    completion and return the closed sessions as a batch DataFrame.

    Event-time watermark mechanics: a session only emits when the
    watermark passes last_event + gap, so the replay appends sentinel
    far-future events (one per user) in separate micro-batches
    (maxFilesPerTrigger=1) to drive every real session's timeout;
    sentinel sessions are filtered out of the result.
    """
    import itertools
    import os
    import tempfile
    import time as _time

    from impala_cut_spark.sources.catalog import load_table

    events = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    users = events.select("user_id").distinct()

    tmp = tempfile.mkdtemp(prefix="sess_replay_")
    stage = os.path.join(tmp, "stage")
    stream_dir = os.path.join(tmp, "stream")
    os.makedirs(stream_dir)
    events.coalesce(1).write.parquet(os.path.join(stage, "f1"))
    for i, hours in enumerate((10, 20), start=2):
        users.withColumn(
            "ts", F.lit(max_ts).cast("timestamp") + F.expr(f"interval {hours} hours")
        ).withColumn("value", F.lit(0.0)).select("user_id", "ts", "value").coalesce(
            1
        ).write.parquet(os.path.join(stage, f"f{i}"))
    t0 = _time.time()
    for i in (1, 2, 3):
        d = os.path.join(stage, f"f{i}")
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                dst = os.path.join(stream_dir, f"{i}_{f}")
                with open(os.path.join(d, f), "rb") as fh, open(dst, "wb") as out:
                    out.write(fh.read())
                os.utime(dst, (t0 + i, t0 + i))

    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    name = f"sess_replay_{next(_replay_counter)}"
    q = (
        sessionize_stateful(stream, gap)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .filter(F.col("session_start") <= F.lit(max_ts))
        .select(
            "user_id",
            F.col("session_start").cast("timestamp_ntz"),
            F.col("session_end").cast("timestamp_ntz"),
            "n_events",
            "total_value",
        )
    )


import itertools as _itertools  # noqa: E402

_replay_counter = _itertools.count()
