"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Run directly: ``python bench.py``. Per-query wall time covers plan
construction + execution to a driver-side count (results are small
aggregates; count() forces the full pipeline without result transfer
cost dominating).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _noise_sentinel(rounds: int = 1_000_000) -> float:
    """Fixed single-thread CPU kernel (chained md5 of a 64-byte block):
    identical work every run, so its wall time moves ONLY with host
    conditions (CPU steal, thermal, contention) — never with engine
    changes.  Timed at bench start AND end and recorded in the JSON so
    a round-over-round wall regression can be attributed: sentinel flat
    → code effect; sentinel inflated the same way → host drift
    (r9 verdict #1: the round-9 numbers were taken under ~20-30%
    ambient steal this kernel would have exposed).  Quiet-window
    reference on this box: ~0.50 s (BASELINE.md round-10 note)."""
    t0 = time.perf_counter()
    h = b"\x00" * 64
    import hashlib

    for _ in range(rounds):
        h = hashlib.md5(h).digest()
    return round(time.perf_counter() - t0, 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sentinel_start = _noise_sentinel()

    from impala_cut_spark.session import build_session
    from impala_cut_spark.plans import REGISTRY

    # shuffle partitions sized to the SF, not the core count (BASELINE.md):
    # at sf0.1 per-task scheduling overhead beats parallelism width, and
    # cpus/2 measured consistently faster on the similarity-join headliners
    # (minhash 1.9->1.6s, jaccard 1.9->1.6s) with joins neutral; AQE still
    # coalesces below that when volumes allow. At 100 TB this knob scales
    # UP with data (partitions sized to keep shuffle blocks ~128MB).
    # Round-6 re-measure (quiet window, interleaved 16/32/16/32, min-of-2
    # per config): s16 total 15.04s vs s32 15.66s — jaccard 1.47 vs 1.89,
    # minhash 1.45 vs 1.61, TPC rows within noise. Same-config pass
    # variance was 15.21-17.48s (±14%), which alone covers the r5 driver
    # run's +7%; the 16 pin stands on two independent quiet-window A/Bs.
    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE", max(8, int(cpus) // 2)))
    spark = build_session(
        app_name="impala-cut-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle,
    )
    spark.sparkContext.setLogLevel("ERROR")

    headline = {n: s for n, s in REGISTRY.items() if s.headline}

    # Warm the JVM + parquet footers once so per-query numbers measure
    # the engine, not first-touch JIT/classloading (BASELINE.md: sf0.1
    # is dominated by fixed overhead otherwise).
    warm = next(iter(headline.values()))
    warm.spark(spark, sf_dir).count()

    # Warm-up-aware timing (round-11 verdict Next #1): a query's
    # whole-stage-codegen unit reaches JIT steady state only after
    # ~8-10 executions (measured on pipe_dedup_substring — runs 1-8
    # read 1.1-3× steady state as C2 tiers compile and the heap
    # grows), so the old min-of-3 systematically sampled the warm-up
    # tail and produced three consecutive rounds of false perf flags
    # (jaccard r9, substring r10, minhash r11).  Per query: WARMUPS
    # untimed executions first, then min-of-3 timed — the steady
    # state, which is what the 100 TB design point amortizes to (a
    # production stage executes its codegen unit thousands of times
    # per task batch, not three).  cold_sec (the first warm-up
    # execution, codegen compile included) is reported alongside so
    # first-touch latency stays visible round over round.
    WARMUPS = 8
    times: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name, spec in headline.items():
        for i in range(WARMUPS):
            # EVERY execution starts with an empty SQL cache (r12): the
            # catalog's table-plan memo makes repeated constructions
            # plan-identical, so Spark's CacheManager would otherwise
            # resolve a later run's operator-internal .persist() to the
            # PREVIOUS run's materialized blocks — the timed min-of-3
            # would read warm-up results instead of computing from the
            # parquet inputs.  Clearing per run keeps the contract:
            # each invocation computes everything from storage.
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).count()
            if i == 0:
                cold[name] = round(time.perf_counter() - t0, 4)
        per_run = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).count()
            per_run.append(time.perf_counter() - t0)
        times[name] = round(min(per_run), 4)
        # drop the last run's intermediates so later queries aren't
        # timed under earlier queries' cache pressure
        spark.catalog.clearCache()

    # DuckDB proxy baseline beside each Spark number (warm, min-of-3 —
    # the same methodology the judge uses against BASELINE.md) for
    # self-serve ratio tracking round over round.
    duck: dict[str, float] = {}
    try:
        import duckdb

        con = duckdb.connect()
        con.execute(f"SET threads TO {int(cpus)}")
        for tname in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split():
            con.sql(
                f"CREATE VIEW {tname} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{tname}.parquet')"
            )
        for name, spec in headline.items():
            if not spec.oracle:
                continue
            # two untimed warm-ups for symmetry (DuckDB has no JIT
            # tiering — steady state arrives within 2-3 executions,
            # the warm-ups just take first-touch I/O out of the min)
            for _ in range(2):
                con.sql(spec.oracle).fetchall()
            per_run = []
            for _ in range(3):
                t0 = time.perf_counter()
                con.sql(spec.oracle).fetchall()
                per_run.append(time.perf_counter() - t0)
            duck[name] = round(min(per_run), 4)
    except Exception:
        duck = {}

    sentinel_end = _noise_sentinel()

    # Same-window Spark/DuckDB ratio over the oracle-bearing subset:
    # both engines measured minutes apart under the SAME host
    # conditions, so the ratio is immune to the ambient-steal drift
    # that moved round-9 wall numbers ±30% (r9 verdict #1b) — treat
    # THIS as the headline round-over-round comparison, wall seconds
    # as the secondary absolute.
    common = [n for n in times if n in duck]
    spark_common = sum(times[n] for n in common)
    duck_common = sum(duck[n] for n in common)
    ratios = {
        n: round(times[n] / duck[n], 3) for n in common if duck[n] > 0
    }

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": round(sum(times.values()), 4),
                "unit": "sec",
                "queries": times,
                "cold_first_run": cold,
                "warmups_per_query": WARMUPS,
                "duckdb_proxy": duck,
                "proxy_ratio": round(spark_common / duck_common, 3)
                if duck_common
                else None,
                "proxy_ratio_per_query": ratios,
                "noise_sentinel": {
                    "start_sec": sentinel_start,
                    "end_sec": sentinel_end,
                    "quiet_ref_sec": 0.50,
                },
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
