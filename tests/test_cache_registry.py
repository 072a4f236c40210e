"""Session-scoped bounded persist registry (operators/_cache.py) and
the concurrency contract it buys the thrift/HS2-served operators:
overlapping calls must not unpersist each other's still-lazy cached
tables (r7 verdict "what's wrong" #2 — the module-global caches in
bm25_topk / bigram_nll_scores raced under concurrent clients)."""

from __future__ import annotations

import threading

from pyspark.storagelevel import StorageLevel


def _is_persisted(df) -> bool:
    lvl = df.storageLevel
    return lvl.useMemory or lvl.useDisk


def test_register_persisted_bounds_slot(spark):
    from impala_cut_spark.operators._cache import register_persisted

    frames = []
    for i in range(3):
        df = spark.range(5).selectExpr(f"id + {i} as v").persist(StorageLevel.MEMORY_AND_DISK)
        df.count()
        register_persisted(df, "test_slot_bound", keep=2)
        frames.append(df)
    # keep=2: the OLDEST entry was evicted, the two newest survive
    assert not _is_persisted(frames[0])
    assert _is_persisted(frames[1]) and _is_persisted(frames[2])
    # slots are independent — a different slot never evicts this one
    other = spark.range(3).persist(StorageLevel.MEMORY_AND_DISK)
    register_persisted(other, "test_slot_other", keep=2)
    assert _is_persisted(frames[2])
    for df in frames[1:] + [other]:
        df.unpersist()


def test_register_persisted_sweeps_stopped_sessions(spark):
    """Entries whose session has been stopped are dropped on the next
    register call: without the sweep, dead sessions' queues pin their
    DataFrames (and thus the session objects) forever, and a recycled
    id() could alias a fresh session onto a dead session's queue."""
    from collections import deque

    from impala_cut_spark.operators import _cache
    from impala_cut_spark.operators._cache import _SLOTS, register_persisted

    class _DeadSC:
        _jsc = None  # what SparkContext.stop() leaves behind

    class _DeadSession:
        _sc = _DeadSC()

    class _DeadFrame:
        sparkSession = _DeadSession()

    dead_key = (id(_DeadFrame.sparkSession), "test_slot_dead")
    with _cache._LOCK:
        _SLOTS[dead_key] = deque([_DeadFrame()])
    live = spark.range(4).persist(StorageLevel.MEMORY_AND_DISK)
    register_persisted(live, "test_slot_sweep", keep=2)
    assert dead_key not in _SLOTS  # dead session's queue swept
    assert _is_persisted(live)  # live entry untouched
    live.unpersist()
    with _cache._LOCK:
        _SLOTS.pop((id(spark), "test_slot_sweep"), None)


def test_overlapping_bm25_calls_keep_both_caches(spark, sf_dir):
    """The r7 form unpersisted the PREVIOUS call's tf table on entry:
    build A's (lazy) result, make call B, then consume A — A's tf must
    still be persisted (no forced recompute) and both results must
    match their sequential ground truth."""
    from impala_cut_spark.operators._cache import _SLOTS
    from impala_cut_spark.operators.retrieval import bm25_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expect_a = sorted(map(tuple, bm25_topk(docs, ["hash", "join"], k=10).collect()))
    expect_b = sorted(map(tuple, bm25_topk(docs, ["stream"], k=10).collect()))

    res_a = bm25_topk(docs, ["hash", "join"], k=10)  # lazy — not yet consumed
    res_b = bm25_topk(docs, ["stream"], k=10)  # overlapping second call
    q = _SLOTS[(id(spark), "bm25_tf")]
    assert len(q) == 2 and all(_is_persisted(tf) for tf in q)
    assert sorted(map(tuple, res_a.collect())) == expect_a
    assert sorted(map(tuple, res_b.collect())) == expect_b


def test_threaded_bm25_calls_are_correct(spark, sf_dir):
    """Two genuinely concurrent callers (the shared-session thrift
    serving shape): each thread plans AND consumes its own bm25 under
    contention; results equal the sequential ground truth."""
    from impala_cut_spark.operators.retrieval import bm25_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    terms = {"a": ["hash", "join"], "b": ["stream", "scan"]}
    expect = {
        k: sorted(map(tuple, bm25_topk(docs, t, k=10).collect()))
        for k, t in terms.items()
    }
    got: dict[str, list] = {}
    errs: list[Exception] = []

    def run(key: str) -> None:
        try:
            for _ in range(3):
                got[key] = sorted(
                    map(tuple, bm25_topk(docs, terms[key], k=10).collect())
                )
        except Exception as e:  # noqa: BLE001 — surfaced by the assert
            errs.append(e)

    threads = [threading.Thread(target=run, args=(k,)) for k in terms]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert got == expect


def test_threaded_bigram_calls_are_correct(spark, sf_dir):
    """Same contract for the bigram LM's persisted unigram counts."""
    from impala_cut_spark.operators.text import bigram_nll_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expect = sorted(map(tuple, bigram_nll_scores(docs).collect()))
    got: list = [None, None]
    errs: list[Exception] = []

    def run(i: int) -> None:
        try:
            got[i] = sorted(map(tuple, bigram_nll_scores(docs).collect()))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert got[0] == expect and got[1] == expect
