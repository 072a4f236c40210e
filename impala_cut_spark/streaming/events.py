"""Streaming rollup of the events table.

Replays ``events.parquet`` through the file stream source and runs a
watermarked tumbling-window aggregation — the Structured Streaming
twin of cov_events_daily. The memory sink + processAllAvailable makes
it synchronously testable; swapping source/sink to Kafka + a real sink
is configuration, not code.

Scale: streaming state is keyed by (window, event_type) — bounded by
the watermark horizon; the file source shards by files, so a 100 TB
backfill parallelizes across executors exactly like the batch scan.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_counter = itertools.count()


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a stream, with the same ns→µs ts normalization
    as the batch catalog (sources/catalog.py)."""
    # TIMESTAMP(NANOS) parquet needs nanosAsLong on any session (the
    # driver builds its own) — same runtime conf the batch catalog sets.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")  # file source needs a dir
        .parquet(sf_dir)
    )
    ts_type = dict(raw.dtypes).get("ts", "")
    if ts_type == "bigint":
        # TimestampType (not NTZ): watermarks require TIMESTAMP; session
        # TZ is pinned UTC so wall-clock values match the batch catalog.
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type.startswith("timestamp_ntz"):
        # TIMESTAMP(MICROS) parquet reads as NTZ; watermarks require
        # TIMESTAMP — UTC session TZ keeps wall-clock values identical.
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour window per event_type: count + exact-decimal sum."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
    )


def stream_rollup_to_parquet(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Append-mode windowed rollup streamed into a parquet table — the
    Structured-Streaming twin of the INSERT sink (hdfs-table-sink.cc
    semantics: files land atomically per epoch; the checkpoint gives
    exactly-once).

    Append mode emits a window only once the watermark passes its end
    — this IS the late-data policy: events later than ``watermark``
    are dropped, everything else lands exactly once. On a finite
    replay the trailing windows inside the watermark horizon stay
    open (correctly) and never emit.
    """
    q = (
        hourly_rollup(events_stream(spark, sf_dir), watermark)
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("hour"),
            "event_type",
            "n",
            "total_value",
        )
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(out_dir)


def stream_dedup(events: DataFrame, keys: list[str], watermark: str = "1 hour") -> DataFrame:
    """Streaming deduplication: keep the first event per key, dropping
    duplicates that arrive within the watermark horizon
    (``dropDuplicatesWithinWatermark`` — bounded state, unlike plain
    dropDuplicates whose key state never expires).

    Scale: state is one entry per in-horizon key, evicted as the
    watermark advances — the streaming twin of the batch exact-dedup
    operator (operators/dedup.py); at 100 TB/day ingest the horizon
    bounds memory regardless of total corpus size.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def run_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay events through streaming dedup on (user_id, event_type),
    then aggregate the kept rows per type.

    The finite replay is a single micro-batch (watermark never
    advances mid-batch), so the kept set is exactly the distinct keys
    — making the result oracle-checkable: count per event_type equals
    batch COUNT(DISTINCT user_id).
    """
    name = f"events_dedup_{next(_counter)}"
    q = (
        stream_dedup(events_stream(spark, sf_dir), ["user_id", "event_type"])
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
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("event_type")
    )


def run_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the streaming rollup to completion over the finite file
    source and return the result as a (batch) DataFrame."""
    name = f"events_hourly_{next(_counter)}"
    q = (
        hourly_rollup(events_stream(spark, sf_dir))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
        F.col("win.start").cast("timestamp_ntz").alias("hour"),
        "event_type",
        "n",
        "total_value",
    )


def sliding_rollup(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window rollup: every event lands in window/slide
    overlapping windows (here 4) — the rate-monitoring shape tumbling
    windows can't express (a spike straddling a tumbling boundary
    halves; sliding windows see it whole).

    Scale: state is (#open windows × #keys) — window/slide × the
    tumbling equivalent, still watermark-bounded; Spark expands each
    event to its windows BEFORE the shuffle, so shuffle volume is
    window/slide × linear (no self-join)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
    )


def run_sliding_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the sliding rollup to completion over the finite replay."""
    name = f"events_sliding_{next(_counter)}"
    q = (
        sliding_rollup(events_stream(spark, sf_dir))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
        F.col("win.start").cast("timestamp_ntz").alias("win_start"),
        "event_type",
        "n",
        "total_value",
    )


def stream_stream_attribution(
    clicks: DataFrame, purchases: DataFrame, horizon: str = "30 minutes"
) -> DataFrame:
    """Stream-stream INNER join: attribute each purchase to the same
    user's click(s) in the preceding ``horizon`` — the canonical
    watermarked stream-stream join (state on both sides, bounded by
    watermark + the time-range condition).

    Scale: state per side is only the watermark horizon's events,
    co-partitioned by user_id; the range condition lets Spark expire
    rows deterministically — the 100 TB-stream-safe join shape.
    """
    c = (
        clicks.withWatermark("ts", horizon)
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"))
    )
    p = (
        purchases.withWatermark("ts", horizon)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    return c.join(
        p,
        F.expr(
            "c_user = p_user AND purchase_ts >= click_ts "
            f"AND purchase_ts <= click_ts + interval {horizon}"
        ),
    )


def run_stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the events stream through the click→purchase attribution
    join and aggregate attributed purchases per user — deterministic on
    a finite replay (every in-horizon pair emits exactly once)."""
    name = f"events_attr_{next(_counter)}"
    clicks = events_stream(spark, sf_dir).filter(F.col("event_type") == "click")
    purchases = events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    q = (
        stream_stream_attribution(clicks, purchases)
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
        .groupBy(F.col("c_user").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_attributed"),
            F.sum(F.col("purchase_value").cast("decimal(12,2)")).cast("double").alias("attributed_value"),
        )
        .orderBy("user_id")
    )


def stream_static_enrich(
    events: DataFrame, dim: DataFrame, join_expr, how: str = "left"
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against
    the (batch) dimension — STATELESS, unlike stream-stream joins (no
    watermark bookkeeping, no join state store; Spark re-plans the
    static side per micro-batch, so a small dim broadcasts).

    Scale: the canonical "enrich the firehose with the user table"
    topology — state cost is zero on the stream side, and the static
    side follows normal batch join strategy (broadcast under the
    threshold, shuffled otherwise)."""
    return events.join(F.broadcast(dim), join_expr, how)


def run_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay events through a stream-static enrichment against the
    customer dimension (user_id → c_custkey), then aggregate revenue
    per market segment over the enriched sink — oracle-checkable as a
    plain batch join+agg."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    ev = events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    enriched = stream_static_enrich(
        ev, cust, F.col("user_id") == F.col("c_custkey")
    ).select("event_id", "user_id", "value", "c_mktsegment")
    name = f"events_enrich_{next(_counter)}"
    q = (
        enriched.writeStream.outputMode("append")
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
        .groupBy(F.coalesce("c_mktsegment", F.lit("(none)")).alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("revenue"),
        )
        .orderBy("segment")
    )


def windowed_type_counts(
    events: DataFrame, window: str = "1 day", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window event-type counts — the streaming state behind
    the drift monitor. One watermarked aggregation; state is one row
    per (window, type) inside the horizon."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def run_stream_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming distribution-drift monitor: per tumbling day, each
    event type's share of the window vs its share of the whole stream
    (the training-mix monitoring pattern of pipe_corpus_drift, moved
    onto the live ingest feed).

    Topology: ONE watermarked streaming aggregation maintains the
    (window, type) counts; the divergence overlay — window totals,
    baseline shares, the per-stratum rational chi-square-style term —
    is a batch computation over the streamed state (Structured
    Streaming forbids a second aggregation in the same query, and the
    overlay needs the FULL baseline anyway). Per-stratum terms use
    pure rational double arithmetic (no transcendental, no
    cross-stratum sum), so every row is bit-identical cross-engine.

    At scale: the streaming side shuffles only (window, type) partial
    counts; the overlay input is #windows × #types rows — trivial
    regardless of event volume.
    """
    from pyspark.sql import Window as W

    name = f"events_drift_{next(_counter)}"
    q = (
        windowed_type_counts(events_stream(spark, sf_dir))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    counts = spark.table(name).select(
        F.col("win.start").cast("timestamp_ntz").alias("day"), "event_type", "n"
    )
    win_tot = F.sum("n").over(W.partitionBy("day"))
    base_tot = F.sum("n").over(W.partitionBy())
    base_n = F.sum("n").over(W.partitionBy("event_type"))
    p_win = F.col("n").cast("double") / F.col("win_total").cast("double")
    p_base = F.col("base_n").cast("double") / F.col("base_total").cast("double")
    term = (p_win - p_base) * (p_win - p_base) / (p_win + p_base)
    return (
        counts.select(
            "day",
            "event_type",
            "n",
            win_tot.alias("win_total"),
            base_n.alias("base_n"),
            base_tot.alias("base_total"),
        )
        .select(
            "day",
            "event_type",
            "n",
            "win_total",
            F.round(p_win, 6).alias("p_win"),
            F.round(p_base, 6).alias("p_base"),
            F.round(term, 6).alias("drift_term"),
        )
    )


def run_stream_topk_trending(
    spark: SparkSession, sf_dir: str, k: int = 3
) -> DataFrame:
    """Streaming per-hour trending top-k event types — the live
    "what's hot right now" leaderboard over the ingest feed.

    Topology: ONE watermarked streaming aggregation maintains the
    (hour, type) counts (the same state shape as the drift monitor);
    the rank-and-cut overlay is a batch window over the streamed
    state (Structured Streaming forbids ranking on top of a streaming
    aggregation in one query, and a leaderboard read IS a point-in-
    time query). Ties break deterministically (count DESC, type ASC).

    At scale: streaming state and shuffle are (hour × #types) partial
    counts — independent of event volume; the overlay ranks #types
    rows per hour partition, trivially parallel across hours. The
    top-k per group never needs a global sort.
    """
    from pyspark.sql import Window as W

    name = f"events_topk_{next(_counter)}"
    q = (
        windowed_type_counts(events_stream(spark, sf_dir), window="1 hour")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    counts = spark.table(name).select(
        F.col("win.start").cast("timestamp_ntz").alias("hour"), "event_type", "n"
    )
    rk = F.row_number().over(
        W.partitionBy("hour").orderBy(F.col("n").desc(), "event_type")
    )
    return counts.withColumn("rk", rk).where(F.col("rk") <= k)
