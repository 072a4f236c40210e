"""Session-scoped bounded registry for operator-internal persisted tables.

Several operators persist an intermediate table that their RETURNED
(lazy) DataFrame still references — BM25's query-term tf table, the
bigram LM's unigram counts, DSIR's hashed-feature stream.  The frame
cannot be unpersisted inside the operator (the consumer has not run
yet), so the operators bound the leak by releasing old entries on
subsequent calls.

The round-7 form was a module-global holding exactly the previous
call's table, unpersisted on entry — a plain race once the thrift/HS2
servers invite concurrent clients onto one shared SparkSession: client
A's entry unpersists the table client B's still-unexecuted plan needs
(recompute, not wrongness — persisted frames re-materialize on demand —
but a needless full recompute and an unsynchronized global).

This registry replaces it (r7 verdict "what's wrong" #2):

- entries are keyed by (SparkSession, slot), so independent sessions
  (tests spin up several) never interact;
- each slot keeps the ``keep`` most recent tables (default 2) and
  unpersists only what falls off the end — with keep >= the number of
  concurrent callers, no caller's table is ever released by another
  call that overlapped it, and a sequential caller's table survives
  exactly one follow-up call (time enough to consume the lazy result);
- all bookkeeping is behind one lock; the unpersist itself runs outside
  it (it can block on the JVM).

The leak stays bounded by contract: at most ``keep`` tables per
(session, slot), each small by construction (tf holds query-term match
rows, c1 holds the train-split vocabulary, DSIR feats is the largest —
see its docstring for the 100 TB accounting).
"""

from __future__ import annotations

import threading
from collections import deque

_LOCK = threading.Lock()
_SLOTS: dict[tuple[int, str], deque] = {}

#: tables retained per (session, slot).  2 = the current call plus one
#: overlapping/preceding call; raise via the ``keep`` argument if an
#: operator expects wider concurrency fan-in.
KEEP = 2


def _is_stopped(sess) -> bool:
    """True once SparkSession.stop() ran (SparkContext.stop nulls _jsc)."""
    try:
        return getattr(sess._sc, "_jsc", None) is None
    except Exception:
        return True


def register_persisted(df, slot: str, keep: int = KEEP):
    """Track a just-persisted DataFrame; evict (unpersist) the oldest
    entries beyond ``keep`` for the same (session, slot).  Returns
    ``df`` for chaining.

    Same-plan registrations coalesce into one queue slot: Spark's
    CacheManager keys cached data by the canonicalized plan, so
    ``persist()`` on a plan that is already cached reuses the SAME
    cache entry — if the queue held both frames, evicting the older
    one would unpersist the newer one's data too (found by
    tests/test_cache_registry.py on first run).

    Each call also sweeps entries whose session has been stopped
    (tests spin up several sessions): without the sweep the queues pin
    dead sessions' DataFrames forever, and — because the pinned frame
    pins its session object — a fresh session could never reuse the
    id() a dead-but-listed one still occupies, yet the stale queue
    would still be consulted if it somehow did.  Stopped entries are
    dropped without unpersist (their JVM is gone)."""
    key = (id(df.sparkSession), slot)
    evicted = []
    with _LOCK:
        for k in [k for k, q in _SLOTS.items() if q and _is_stopped(q[0].sparkSession)]:
            del _SLOTS[k]
        q = _SLOTS.setdefault(key, deque())
        for existing in list(q):
            try:
                same = existing.sameSemantics(df)
            except Exception:  # foreign/stopped session — not the same
                same = False
            if same:
                q.remove(existing)
        q.append(df)
        while len(q) > keep:
            evicted.append(q.popleft())
    for old in evicted:
        try:
            old.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass
    return df
