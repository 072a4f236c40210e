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


def test_sliding_rollup_equals_batch_window_expansion(spark, sf_dir):
    """Every event must appear in exactly window/slide = 4 sliding
    windows, and the streamed result must equal the batch F.window
    aggregation (same expansion, batch execution)."""
    from impala_cut_spark.streaming.events import run_sliding_rollup

    streamed = run_sliding_rollup(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    batch = (
        events.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("win"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b
    # 4× expansion invariant
    assert sum(r[2] for r in s) == 4 * events.count()


def test_stream_append_sink_emits_closed_windows(spark, sf_dir, tmp_path):
    """Append-mode parquet sink: exactly the watermark-closed windows
    land, each matching the batch rollup; trailing windows inside the
    watermark horizon stay open and must NOT emit."""
    from impala_cut_spark.streaming.events import stream_rollup_to_parquet

    written = stream_rollup_to_parquet(
        spark,
        sf_dir,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        watermark="2 hours",
    )

    events = load_table(spark, sf_dir, "events")
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    batch = (
        events.groupBy(
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("hour"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
    )

    got = {tuple(r) for r in written.select("hour", "event_type", "n", "total_value").collect()}
    want_all = {tuple(r) for r in batch.collect()}
    assert got, "append sink wrote nothing"
    assert got <= want_all  # every emitted row matches batch exactly
    # nothing newer than the watermark horizon may have been emitted
    import datetime

    horizon = max_ts - datetime.timedelta(hours=2)
    assert all(row[0] <= horizon for row in got)
    # and everything strictly older than the horizon's previous hour emitted
    closed = {t for t in want_all if t[0] < horizon.replace(minute=0, second=0, microsecond=0)}
    assert closed <= got


def test_stream_dedup_drops_real_duplicates(spark, tmp_path):
    """dropDuplicatesWithinWatermark must collapse genuine duplicate
    rows: replay a corpus where every event appears 3x and assert the
    kept set equals the distinct keys."""
    import datetime

    from impala_cut_spark.streaming.events import events_stream, stream_dedup

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for copy in range(3):
        for u in range(10):
            for et in ("view", "click"):
                rows.append(
                    (eid, base + datetime.timedelta(minutes=u), u, et, 1.0, "{}")
                )
                eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    src = str(tmp_path / "dups")
    df.coalesce(1).write.parquet(src)
    import os, glob

    part = glob.glob(f"{src}/part-*.parquet")[0]
    os.rename(part, f"{src}/events.parquet")  # match the source's glob

    kept = (
        stream_dedup(events_stream(spark, src), ["user_id", "event_type"])
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_dups_test")
        .start()
    )
    try:
        kept.processAllAvailable()
    finally:
        kept.stop()
    out = spark.table("dedup_dups_test")
    assert out.count() == 20  # 10 users x 2 types, 60 inputs collapsed
    assert out.select("user_id", "event_type").distinct().count() == 20


def test_stream_static_enrich_equals_batch_join(spark, sf_dir):
    """Stream-static enrichment (stateless dim join per micro-batch)
    must agree with the equivalent batch join+agg."""
    import pyspark.sql.functions as F

    from impala_cut_spark.streaming.events import run_stream_enrich

    got = {(r.segment, r.n, r.revenue) for r in run_stream_enrich(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.drop("ts")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    batch = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(cust), cust.c_custkey == ev.user_id, "left")
        .groupBy(F.coalesce("c_mktsegment", F.lit("(none)")).alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("revenue"),
        )
    )
    want = {(r.segment, r.n, r.revenue) for r in batch.collect()}
    assert got == want


class TestStreamNeardup:
    def test_state_persists_across_micro_batches(self, spark, tmp_path):
        """The dedup gate must reject a near-duplicate arriving in a
        LATER micro-batch (per-bucket state carries across batches) —
        maxFilesPerTrigger=1 forces one parquet file per batch."""
        import numpy as np

        dim = 64
        rng = np.random.RandomState(5)
        base = rng.randn(dim)
        base /= np.linalg.norm(base)
        other = rng.randn(dim)
        other /= np.linalg.norm(other)
        if all(np.sign(other[:8]) == np.sign(base[:8])):
            other[0] = -other[0]  # force a different band-0 bucket
        near = base * 0.99  # same signs, cosine 1.0

        src = tmp_path / "src"
        src.mkdir()

        def write_one(i, rows):
            df = spark.createDataFrame(
                [(int(vid), [float(x) for x in v]) for vid, v in rows],
                "vec_id long, embedding array<double>",
            )
            df.coalesce(1).write.parquet(str(src / f"f{i}"))

        write_one(0, [(0, base), (1, other)])
        write_one(1, [(2, near), (3, other * 0.98)])

        from impala_cut_spark.streaming.neardup import stream_embedding_neardup

        stream = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "f*"))
        )
        q = (
            stream_embedding_neardup(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("neardup_mb")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {r.vec_id: r.keep for r in spark.table("neardup_mb").collect()}
        # batch-1 vectors admitted; their batch-2 near-copies rejected
        assert got == {0: 1, 1: 1, 2: 0, 3: 0}, got


def test_stream_drift_equals_batch_and_is_calibrated(spark, sf_dir):
    """run_stream_drift: the streamed (window, type) state plus the
    batch divergence overlay equals the same computation done fully in
    batch; terms are nonnegative, bounded by |p_win - p_base|, and a
    window whose mix matches the baseline would score ~0."""
    from pyspark.sql import Window as W

    from impala_cut_spark.streaming.events import run_stream_drift

    got = run_stream_drift(spark, sf_dir)
    rows = got.collect()
    assert rows, "drift monitor produced no windows"
    for r in rows:
        assert 0.0 <= r["drift_term"] <= abs(r["p_win"] - r["p_base"]) + 1e-9, r
        assert abs(r["p_win"] * 0 + r["p_base"]) <= 1.0

    # batch replay of the identical overlay
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts = F.col("ts")
    if dict(ev.dtypes).get("ts") == "bigint":
        ts = F.timestamp_micros(F.expr("ts div 1000"))
    cnt = (
        ev.select(F.date_trunc("day", ts).cast("timestamp_ntz").alias("day"), "event_type")
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    win_tot = F.sum("n").over(W.partitionBy("day"))
    base_n = F.sum("n").over(W.partitionBy("event_type"))
    base_tot = F.sum("n").over(W.partitionBy())
    p_win = F.col("n").cast("double") / F.col("wt").cast("double")
    p_base = F.col("bn").cast("double") / F.col("bt").cast("double")
    exp = {
        (r["day"], r["event_type"]): (r["n"], r["t"])
        for r in cnt.select(
            "day", "event_type", "n",
            win_tot.alias("wt"), base_n.alias("bn"), base_tot.alias("bt"),
        )
        .select(
            "day", "event_type", "n",
            F.round((p_win - p_base) * (p_win - p_base) / (p_win + p_base), 6).alias("t"),
        )
        .collect()
    }
    assert len(rows) == len(exp)
    for r in rows:
        n, t = exp[(r["day"], r["event_type"])]
        assert r["n"] == n and r["drift_term"] == t, r
