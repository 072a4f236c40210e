"""Operator-level invariants for the round-6 pipeline operators
(snapshot diff, temperature sampling, bigram Stupid Backoff,
streaming trending top-k). Registry/oracle equivalence is covered by
tests/test_correctness.py; these pin semantics the SQL oracle can't
express — diff-status geometry, quota math and temperature monotonicity,
backoff-path selection, and the streaming/batch overlay split.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from impala_cut_spark.operators import corpus, text


def _snap(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, fp bigint")


# -- snapshot diff ----------------------------------------------------------


def test_snapshot_diff_all_statuses(spark):
    old = _snap(spark, [(1, 10), (2, 20), (3, 30)])
    new = _snap(spark, [(2, 20), (3, 31), (4, 40)])
    got = {r["doc_id"]: r for r in corpus.snapshot_diff(old, new).collect()}
    assert got[1]["status"] == "removed" and got[1]["new_fp"] is None
    assert got[2]["status"] == "unchanged"
    assert got[3]["status"] == "changed" and (got[3]["old_fp"], got[3]["new_fp"]) == (30, 31)
    assert got[4]["status"] == "added" and got[4]["old_fp"] is None
    assert len(got) == 4


def test_snapshot_diff_is_one_shuffle(spark):
    old = _snap(spark, [(1, 10)])
    new = _snap(spark, [(1, 10)])
    plan = corpus.snapshot_diff(old, new)._jdf.queryExecution().executedPlan().toString()
    # full-outer on the key: no broadcast-nested-loop / cartesian fallback
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


# -- temperature sampling ---------------------------------------------------


def _docs_langs(spark, sizes: dict[str, int]):
    rows, i = [], 0
    for lang, n in sizes.items():
        for _ in range(n):
            rows.append((i, lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id bigint, lang string")


def test_temperature_quota_math(spark):
    """Quotas follow floor(target·s_l/Σs) with s_l = floor(sqrt(n_l)·1e6):
    a 4:1 corpus samples 2:1 at α=0.5 — low-resource up-sampled."""
    docs = _docs_langs(spark, {"en": 400, "zh": 100})
    out = corpus.temperature_sample(docs, target_docs=90).groupBy("lang").count()
    got = {r["lang"]: r["count"] for r in out.collect()}
    s_en, s_zh = math.floor(math.sqrt(400.0) * 1e6), math.floor(math.sqrt(100.0) * 1e6)
    assert got["en"] == (90 * s_en) // (s_en + s_zh)  # 60
    assert got["zh"] == (90 * s_zh) // (s_en + s_zh)  # 30


def test_temperature_sample_deterministic_and_bounded(spark):
    docs = _docs_langs(spark, {"en": 50, "fr": 10})
    a = sorted(r["doc_id"] for r in corpus.temperature_sample(docs, 20).collect())
    b = sorted(r["doc_id"] for r in corpus.temperature_sample(docs, 20).collect())
    assert a == b  # pure function of doc_id — retry-safe
    assert len(a) <= 20
    # ranks are 1..quota within each language
    rows = corpus.temperature_sample(docs, 20).collect()
    for lang in ("en", "fr"):
        rks = sorted(r["rk"] for r in rows if r["lang"] == lang)
        assert rks == list(range(1, len(rks) + 1))


# -- bigram Stupid Backoff --------------------------------------------------


def test_bigram_backoff_paths(spark):
    """doc_id=0 is held OUT of training (0 % 4 == 0): its unseen
    bigrams must score via the α·(c(w)+1)/(T+V) backoff, while a doc
    repeating a trained bigram scores c2/c1 exactly."""
    docs = spark.createDataFrame(
        [(0, "x y"), (1, "a b"), (2, "a b"), (3, "a c")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in text.bigram_nll_scores(docs).collect()}
    assert got[0]["in_train"] is False and got[1]["in_train"] is True
    # train tokens: a b a b a c → T=6, V=3; c2(a,b)=2, c1(a)=3
    seen = -math.log(2.0 / 3.0)
    assert abs(got[1]["avg_nll"] - round(seen, 6)) < 1e-9
    # doc 0: bigram (x,y) unseen, x and y OOV → 0.4·(0+1)/(6+3)
    backoff = -math.log(0.4 * 1.0 / 9.0)
    assert abs(got[0]["avg_nll"] - round(backoff, 6)) < 1e-9


def test_bigram_short_docs_null(spark):
    docs = spark.createDataFrame(
        [(0, "solo"), (1, None), (2, "a b")], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: r for r in text.bigram_nll_scores(docs).collect()}
    for d in (0, 1):
        assert got[d]["n_bigrams"] == 0 and got[d]["avg_nll"] is None
    assert got[2]["n_bigrams"] == 1


# -- streaming trending top-k ----------------------------------------------


def test_stream_topk_trending_matches_batch(spark, sf_dir):
    """Finite replay of the streaming leaderboard equals the batch
    top-k with the same deterministic tie-break."""
    from impala_cut_spark.streaming.events import run_stream_topk_trending

    got = run_stream_topk_trending(spark, sf_dir, k=2)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("hour").orderBy(F.col("n").desc(), "event_type")
            ),
        )
        .where(F.col("rk") <= 2)
    )
    g = {(r["hour"], r["rk"]): (r["event_type"], r["n"]) for r in got.collect()}
    b = {(r["hour"], r["rk"]): (r["event_type"], r["n"]) for r in batch.collect()}
    # compare on string-rendered hour to dodge tz-type mismatch
    assert len(g) == len(b)
    gs = {(str(k[0]), k[1]): v for k, v in g.items()}
    bs = {(str(k[0]), k[1]): v for k, v in b.items()}
    assert gs == bs


# -- block-level keep-first dedup -------------------------------------------


def test_block_dedup_keep_first_semantics(spark):
    from impala_cut_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            (0, "a b c d e f g h x1 x2"),     # block0 = a..h, block1 = x1 x2
            (1, "a b c d e f g h y1 y2"),     # block0 duplicates doc0's block0
            (2, "z1 z2 z3"),
        ],
        "doc_id bigint, text string",
    )
    rows = {(r["doc_id"], r["block_id"]): r for r in dedup.block_dedup_keep_first(docs).collect()}
    assert rows[(0, 0)]["keep"] is True          # first occurrence wins
    assert rows[(1, 0)]["keep"] is False         # later duplicate dropped
    assert rows[(0, 1)]["keep"] is True and rows[(1, 1)]["keep"] is True
    assert rows[(2, 0)]["keep"] is True and rows[(2, 0)]["n_tok"] == 3
    assert rows[(0, 1)]["n_tok"] == 2            # trailing partial block


def test_block_dedup_append_stable(spark):
    """Appending documents never flips a previously-kept block —
    keep-first is a pure function of the global (doc_id, block_id)
    minimum, which appends (larger doc_ids) cannot lower."""
    from impala_cut_spark.operators import dedup

    base = [(0, "a b c d e f g h"), (1, "p q r s t u v w")]
    more = base + [(5, "a b c d e f g h")]
    d1 = spark.createDataFrame(base, "doc_id bigint, text string")
    d2 = spark.createDataFrame(more, "doc_id bigint, text string")
    k1 = {(r["doc_id"], r["block_id"]): r["keep"] for r in dedup.block_dedup_keep_first(d1).collect()}
    k2 = {(r["doc_id"], r["block_id"]): r["keep"] for r in dedup.block_dedup_keep_first(d2).collect()}
    for key, kept in k1.items():
        assert k2[key] == kept
    assert k2[(5, 0)] is False


# -- per-group z-score ------------------------------------------------------


def test_zscore_moments_and_degenerate_groups(spark):
    docs = spark.createDataFrame(
        [(0, "en", 0.2), (1, "en", 0.4), (2, "en", 0.6),
         (3, "fr", 0.5),                       # singleton group -> z = 0
         (4, "de", 0.3), (5, "de", 0.3)],      # zero variance -> z = 0
        "doc_id bigint, lang string, score double",
    )
    got = {r["doc_id"]: r["z"] for r in corpus.zscore_by_group(docs).collect()}
    # en: mean 0.4, sample sd 0.2 -> z = -1, 0, 1
    assert got[0] == -1.0 and got[1] == 0.0 and got[2] == 1.0
    assert got[3] == 0.0
    assert got[4] == 0.0 and got[5] == 0.0


def test_zscore_broadcast_no_window(spark):
    docs = spark.createDataFrame(
        [(0, "en", 0.2), (1, "en", 0.4)], "doc_id bigint, lang string, score double"
    )
    plan = corpus.zscore_by_group(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # moments + join-back, not a per-group window


# -- property-based invariants (hypothesis) ---------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.dictionaries(
        st.sampled_from(["en", "fr", "de", "zh", "es"]),
        st.integers(min_value=1, max_value=40),
        min_size=1,
        max_size=4,
    ),
    target=st.integers(min_value=0, max_value=60),
)
def test_temperature_sample_quota_invariants(spark, sizes, target):
    """For ANY language mix and target: selection never exceeds the
    target, never exceeds a language's population, and matches the
    integer quota formula exactly."""
    import math

    docs = _docs_langs(spark, sizes)
    got = corpus.temperature_sample(docs, target_docs=target).groupBy("lang").count()
    counts = {r["lang"]: r["count"] for r in got.collect()}
    s = {L: math.floor(math.sqrt(float(n)) * 1e6) for L, n in sizes.items()}
    tot = max(sum(s.values()), 1)
    for lang, n in sizes.items():
        want = min((target * s[lang]) // tot, n)
        assert counts.get(lang, 0) == want
    assert sum(counts.values()) <= target


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(
            st.sampled_from(["en", "fr"]),
            st.integers(min_value=0, max_value=1_000_000),
        ),
        min_size=2,
        max_size=30,
    )
)
def test_zscore_population_invariants(spark, data):
    """Group z-scores always sum to ~0 (non-degenerate groups) and are
    scale-free: z is invariant under the micro-unit quantization the
    operator uses internally."""
    rows = [(i, lang, m / 1e6) for i, (lang, m) in enumerate(data)]
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string, score double")
    out = corpus.zscore_by_group(docs).collect()
    by_lang: dict[str, list[float]] = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r["z"])
    for lang, zs in by_lang.items():
        if len(zs) > 1 and max(zs) != min(zs):
            assert abs(sum(zs)) < 1e-3 * len(zs)
        else:
            assert all(z == 0.0 for z in zs)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=20
        ).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
def test_block_dedup_exactly_one_keeper_per_fingerprint(spark, texts):
    """Every distinct block content keeps EXACTLY one occurrence, and
    it is the (doc_id, block_id)-smallest one."""
    from impala_cut_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    out = dd.block_dedup_keep_first(docs, block_tokens=4).collect()
    # rebuild content per (doc, block) to group occurrences
    content: dict[tuple[int, int], str] = {}
    for i, txt in enumerate(texts):
        tk = [x for x in txt.split(" ") if x]
        for b in range(0, (len(tk) + 3) // 4):
            content[(i, b)] = " ".join(tk[b * 4 : b * 4 + 4])
    groups: dict[str, list[tuple[int, int, bool]]] = {}
    for r in out:
        key = content[(r["doc_id"], r["block_id"])]
        groups.setdefault(key, []).append((r["doc_id"], r["block_id"], r["keep"]))
    for occurrences in groups.values():
        keepers = [(d, b) for d, b, k in occurrences if k]
        assert keepers == [min((d, b) for d, b, _ in occurrences)]
