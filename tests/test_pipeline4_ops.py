"""Operator-level invariants for the round-6 pipeline operators
(snapshot diff, temperature sampling, bigram Stupid Backoff,
streaming trending top-k). Registry/oracle equivalence is covered by
tests/test_correctness.py; these pin semantics the SQL oracle can't
express — diff-status geometry, quota math and temperature monotonicity,
backoff-path selection, and the streaming/batch overlay split.
"""

from __future__ import annotations

import math

import pytest

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


@pytest.mark.slow
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


# -- span-level decontamination ---------------------------------------------


def _txt_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_decontaminate_spans_localizes_leak(spark):
    """A doc embedding a verbatim 10-token benchmark passage yields one
    maximal span covering exactly those 10 tokens; clean docs zero."""
    bench_txt = " ".join(f"b{i}" for i in range(10))
    bench = _txt_docs(spark, [(100, bench_txt)])
    docs = _txt_docs(
        spark,
        [
            (1, "x1 x2 x3 " + bench_txt + " y1 y2"),   # leak in the middle
            (2, " ".join(f"z{i}" for i in range(20))),  # clean
            (3, "too short"),                           # < k tokens
        ],
    )
    got = {r["doc_id"]: r for r in corpus.decontaminate_spans(docs, bench, k=8).collect()}
    assert got[1]["contam_spans"] == 1
    assert got[1]["contam_tokens"] == 10
    assert got[1]["contam_pos"] == 3  # starts 4,5,6 (10-8+1 starts)
    assert got[1]["is_contaminated"] == 1
    assert got[2]["contam_tokens"] == 0 and got[2]["is_contaminated"] == 0
    assert got[3]["n_tok"] == 2 and got[3]["contam_tokens"] == 0
    assert len(got) == 3


def test_decontaminate_spans_merges_overlapping_hits(spark):
    """Two benchmark passages whose matches overlap/touch in token
    space (start gap <= k) merge into ONE maximal span; a gap > k
    keeps two spans."""
    toks = [f"w{i}" for i in range(40)]
    bench = _txt_docs(
        spark,
        [
            (100, " ".join(toks[0:12])),    # covers tokens 1..12
            (101, " ".join(toks[8:20])),    # covers tokens 9..20 — overlaps
            (102, " ".join(toks[30:40])),   # covers tokens 31..40 — gap > k
        ],
    )
    docs = _txt_docs(spark, [(1, " ".join(toks))])
    row = corpus.decontaminate_spans(docs, bench, k=8).collect()[0]
    assert row["contam_spans"] == 2
    # span A tokens 1..20 (20), span B tokens 31..40 (10)
    assert row["contam_tokens"] == 30


def test_decontaminate_spans_benchmark_is_broadcast(spark):
    bench = _txt_docs(spark, [(100, "a b c d e f g h")])
    docs = _txt_docs(spark, [(1, "a b c d e f g h i")])
    out = corpus.decontaminate_spans(docs, bench, k=8)
    out.collect()  # finalize the adaptive plan before inspecting joins
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE echoes the pre-adaptive plan below
    assert "BroadcastHashJoin" in final and "SortMergeJoin" not in final


# -- per-source reputation gate ---------------------------------------------


def test_source_reputation_gates_and_reasons(spark):
    """Quality bar outranks the length bar; sources clearing both are
    kept with NULL drop_reason; aggregates are exact integers."""
    stop_rich = ("the a of and to in is that it for " * 8).strip()  # 80 toks, all stopwords
    junk = "qqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqq"  # 1 long junk token
    rows = []
    for i in range(4):
        rows.append((i, "good", stop_rich))            # long + stopword-rich
    for i in range(4, 8):
        rows.append((i, "spam", junk))                 # short + low quality
    for i in range(8, 12):
        rows.append((i, "terse", stop_rich + " " + junk))  # quality ok?  81 toks
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    got = {r["source"]: r for r in corpus.source_reputation(docs).collect()}
    g = got["good"]
    assert g["n_docs"] == 4 and g["tok_sum"] == 320
    assert g["tok_avg_micro"] == 80_000_000
    assert g["keep"] and g["drop_reason"] is None
    s = got["spam"]
    # 1 token, zero stopwords, avg_tok_len 40: quality = .4*.01 + 0 + .3 = .304
    assert s["q_avg_micro"] == 304_000
    assert not s["keep"] and s["drop_reason"] == "low_quality"
    assert not got["terse"]["keep"] or got["terse"]["drop_reason"] is None


def test_source_reputation_short_docs_reason(spark):
    """A source passing the quality bar but under the length bar drops
    as short_docs (the second arm of the precedence order)."""
    stop_rich = ("the a of and to in is that it for " * 6).strip()  # 60 toks
    short = ("the a of and to in is that it for " * 4).strip()      # 40 toks
    rows = [(0, "long", stop_rich), (1, "short", short)]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    got = {r["source"]: r for r in corpus.source_reputation(docs).collect()}
    assert got["long"]["keep"] and got["long"]["drop_reason"] is None
    assert got["short"]["drop_reason"] == "short_docs"


# -- benchmark-overlap report -------------------------------------------------


def test_benchmark_overlap_fractions(spark):
    """A benchmark doc fully inside the corpus reports 1.0; a disjoint
    one 0; a half-leaked one the exact floor-micro fraction."""
    leaked = " ".join(f"a{i}" for i in range(12))      # 5 distinct 8-shingles
    half = " ".join(f"a{i}" for i in range(8)) + " " + " ".join(f"q{i}" for i in range(8))
    corpus_docs = _txt_docs(spark, [(1, "pre " + leaked + " post")])
    bench = _txt_docs(
        spark,
        [
            (100, leaked),                                  # fully leaked
            (101, " ".join(f"z{i}" for i in range(12))),    # disjoint
            (102, half),                                    # leading 8-gram leaked
        ],
    )
    got = {r["doc_id"]: r for r in corpus.benchmark_overlap(corpus_docs, bench, k=8).collect()}
    assert got[100]["overlap_micro"] == 1_000_000 and got[100]["n_hit"] == got[100]["n_shingles"]
    assert got[101]["n_hit"] == 0 and got[101]["overlap_micro"] == 0
    h = got[102]
    assert h["n_shingles"] == 9 and h["n_hit"] == 1       # only the a0..a7 window matches
    assert h["overlap_micro"] == 1_000_000 // 9
    assert len(got) == 3


# -- span removal -------------------------------------------------------------


def test_remove_contaminated_spans_surgery(spark):
    """The contaminated interval is cut exactly; clean docs pass
    through verbatim; a fully-covered doc empties."""
    bench_txt = " ".join(f"b{i}" for i in range(10))
    bench = _txt_docs(spark, [(100, bench_txt)])
    clean = " ".join(f"z{i}" for i in range(15))
    docs = _txt_docs(
        spark,
        [
            (1, "x1 x2 x3 " + bench_txt + " y1 y2"),
            (2, clean),
            (3, bench_txt),
        ],
    )
    got = {r["doc_id"]: r for r in corpus.remove_contaminated_spans(docs, bench, k=8).collect()}
    assert got[1]["clean_text"] == "x1 x2 x3 y1 y2" and got[1]["n_removed"] == 10
    assert got[2]["clean_text"] == clean and got[2]["n_removed"] == 0
    assert got[3]["clean_text"] == "" and got[3]["n_removed"] == 10
    assert all(r["n_tok"] - r["n_removed"] == len([t for t in r["clean_text"].split(" ") if t])
               for r in got.values())


def test_remove_spans_consistent_with_decontaminate_spans(spark):
    """n_removed == decontaminate_spans' contam_tokens on the same
    input (the two operators share the island merge)."""
    toks = [f"w{i}" for i in range(40)]
    bench = _txt_docs(spark, [(100, " ".join(toks[0:12])), (101, " ".join(toks[25:40]))])
    docs = _txt_docs(spark, [(1, " ".join(toks)), (2, " ".join(reversed(toks)))])
    removed = {r["doc_id"]: r["n_removed"]
               for r in corpus.remove_contaminated_spans(docs, bench, k=8).collect()}
    spans = {r["doc_id"]: r["contam_tokens"]
             for r in corpus.decontaminate_spans(docs, bench, k=8).collect()}
    assert removed == spans


# -- two-stage retrieval (IVF-PQ + exact rerank) ------------------------------


@pytest.mark.slow
def test_ivfpq_rerank_refines_within_candidates(spark, sf_dir):
    """The reranked top-k is (a) a subset of the stage-1 candidate
    set, (b) ordered by EXACT cosine, and (c) at least as good as raw
    IVF-PQ order at every rank position (same candidate pool, exact
    metric)."""
    from impala_cut_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    cands = similarity.ivfpq_topk_fixed(emb, queries, k=20)
    rer = similarity.ivfpq_rerank_topk_fixed(emb, queries, k=5, r=20)
    cand_set = {(r["q_id"], r["n_id"]) for r in cands.collect()}
    rows = rer.collect()
    assert {(r["q_id"], r["n_id"]) for r in rows} <= cand_set
    by_q: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["q_id"], r["rank"])):
        by_q.setdefault(r["q_id"], []).append(r)
    for q, rs in by_q.items():
        cos = [r["cos"] for r in rs]
        assert cos == sorted(cos, reverse=True)      # exact-cosine order
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))


@pytest.mark.slow
def test_ivfpq_rerank_corpus_not_shuffled(spark, sf_dir):
    """Stage 2's corpus join is a broadcast hash join — the full
    vector scan is never exchanged."""
    from impala_cut_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = similarity.ivfpq_rerank_topk_fixed(emb, emb.filter(F.col("vec_id") < 2), k=3, r=5)
    out.collect()
    final = out._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final


# -- TF-IDF keywords ----------------------------------------------------------


def test_tfidf_keywords_math_and_cut(spark):
    """Hand-checked scores: a term unique to one doc outranks the
    corpus-wide term; k cuts per doc; tie falls to term text."""
    import math as m

    from impala_cut_spark.operators import retrieval

    docs = spark.createDataFrame(
        [
            (0, "common rare rare"),     # rare: tf=2 df=1; common: tf=1 df=3
            (1, "common solo"),
            (2, "common"),
        ],
        "doc_id bigint, text string",
    )
    rows = retrieval.tfidf_keywords(docs, k=2).collect()
    got = {(r["doc_id"], r["term"]): r for r in rows}
    rare = got[(0, "rare")]
    assert rare["rk"] == 1 and rare["tf"] == 2 and rare["df"] == 1
    assert abs(rare["score"] - round(2 * m.log(4 / 2), 6)) < 1e-9
    assert got[(0, "common")]["rk"] == 2
    assert abs(got[(0, "common")]["score"] - round(m.log(4 / 4), 6)) < 1e-9  # 0.0
    assert got[(1, "solo")]["rk"] == 1                   # beats common's idf 0
    assert all(r["rk"] <= 2 for r in rows)
    doc2 = [r for r in rows if r["doc_id"] == 2]
    assert len(doc2) == 1 and doc2[0]["term"] == "common"


# -- streaming token-budget gate ----------------------------------------------


def test_stream_budget_gate_matches_batch_cumsum(spark, sf_dir):
    """Replayed gate equals the batch per-source cumulative-sum rule,
    and both admit outcomes actually occur."""
    from impala_cut_spark.operators.text import token_count
    from impala_cut_spark.streaming.budget import BUDGET_TOKENS, run_stream_budget_gate

    got = {r["doc_id"]: r for r in run_stream_budget_gate(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sized = docs.select(
        "doc_id", "source",
        token_count(F.coalesce(F.col("text"), F.lit(""))).cast("long").alias("n_tok"),
    )
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    batch = sized.withColumn("cum", F.sum("n_tok").over(w)).collect()
    assert len(batch) == len(got)
    admits = {0: 0, 1: 0}
    for r in batch:
        g = got[r["doc_id"]]
        assert g["cum_tokens"] == r["cum"] and g["n_tok"] == r["n_tok"]
        expected = 1 if r["cum"] <= BUDGET_TOKENS else 0
        assert g["admit"] == expected
        admits[expected] += 1
    assert admits[0] > 0 and admits[1] > 0  # both outcomes exercised


def test_stream_budget_state_is_one_long_per_source(spark):
    """The state schema carries exactly one BIGINT — volume-independent
    streaming state (the scale contract of the gate)."""
    from impala_cut_spark.streaming import budget

    assert [f.dataType.typeName() for f in budget._STATE_SCHEMA.fields] == ["long"]
    assert len(budget._STATE_SCHEMA.fields) == 1


# -- cluster canonicalization -------------------------------------------------


def test_canonical_keeper_prefers_quality_then_min_id(spark):
    from impala_cut_spark.operators import dedup as dd

    stop_rich = ("the a of and to in is that it for " * 8).strip()  # high quality
    junk = "zz"                                                      # low quality
    docs = spark.createDataFrame(
        [(1, junk), (2, stop_rich), (3, stop_rich), (9, junk)],
        "doc_id bigint, text string",
    )
    assign = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (9, 9)], "doc_id bigint, cluster_id bigint"
    )
    got = {r["doc_id"]: r for r in dd.canonical_keeper_by_quality(docs, assign).collect()}
    # quality beats the lower id; tie between 2 and 3 falls to min id
    assert got[2]["keep"] and not got[1]["keep"] and not got[3]["keep"]
    assert got[9]["keep"]  # singleton cluster keeps itself
    assert got[2]["q_micro"] == got[3]["q_micro"] > got[1]["q_micro"]


def test_canonical_exactly_one_keeper_per_cluster(spark, sf_dir):
    from impala_cut_spark.operators import dedup as dd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    prs = dd.ngram_jaccard_pairs(docs, n=3, threshold=0.2).select("id_a", "id_b")
    out = dd.canonical_keeper_by_quality(docs, dd.dedup_cluster_assignment(docs, prs))
    per = out.groupBy("cluster_id").agg(
        F.sum(F.col("keep").cast("int")).alias("k"), F.count("*").alias("n")
    )
    assert per.filter(F.col("k") != 1).count() == 0  # exactly one keeper each


# -- concat-and-chunk sequence map --------------------------------------------


def test_seq_chunks_tile_token_axis(spark, sf_dir):
    """Documents tile the concatenated token axis exactly: sorted by
    shuffle_off, each offset equals the previous offset + its n_tok
    (no gaps, no overlaps), and seq ranges are the floor-div closed
    form."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = sorted(corpus.sequence_chunks(docs).collect(), key=lambda r: r["shuffle_off"])
    acc = 0
    for r in rows:
        assert r["shuffle_off"] == acc
        acc += r["n_tok"]
        if r["n_tok"] > 0:
            assert r["first_seq"] == r["shuffle_off"] // corpus.SEQ_CHUNK_LEN
            assert r["last_seq"] == (r["shuffle_off"] + r["n_tok"] - 1) // corpus.SEQ_CHUNK_LEN
            assert r["n_seqs"] == r["last_seq"] - r["first_seq"] + 1
    assert acc == sum(r["n_tok"] for r in rows)
    assert any(r["n_seqs"] > 1 for r in rows)   # docs genuinely straddle sequences


def test_seq_chunks_zero_token_and_determinism(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, " "), (4, "d " * 70)],
        "doc_id bigint, text string",
    )
    a = {r["doc_id"]: r for r in corpus.sequence_chunks(docs).collect()}
    b = {r["doc_id"]: r for r in corpus.sequence_chunks(docs).collect()}
    assert {k: tuple(v) for k, v in a.items()} == {k: tuple(v) for k, v in b.items()}
    for d in (2, 3):
        assert a[d]["n_tok"] == 0 and a[d]["first_seq"] is None and a[d]["n_seqs"] == 0
    assert a[4]["n_tok"] == 70 and a[4]["n_seqs"] >= 2  # spans a boundary


# -- property-based invariants for the decontamination family ----------------


@pytest.mark.slow
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    corpus_toks=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d", "e"]), min_size=0, max_size=24)
        .map(" ".join),
        min_size=1,
        max_size=6,
    ),
    bench_toks=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d", "e"]), min_size=4, max_size=16)
        .map(" ".join),
        min_size=1,
        max_size=3,
    ),
)
def test_span_family_invariants(spark, corpus_toks, bench_toks):
    """For ANY corpus/benchmark over a tiny alphabet (k=4 so overlaps
    are common): (1) remove_contaminated_spans' n_removed equals
    decontaminate_spans' contam_tokens doc-by-doc (shared island
    merge); (2) clean_text token count == n_tok - n_removed; (3) no
    benchmark k-gram survives in any cleaned text; (4) contam_tokens
    <= n_tok."""
    k = 4
    docs = _txt_docs(spark, list(enumerate(corpus_toks)))
    bench = _txt_docs(spark, [(100 + i, t) for i, t in enumerate(bench_toks)])
    spans = {r["doc_id"]: r for r in corpus.decontaminate_spans(docs, bench, k=k).collect()}
    removed = {r["doc_id"]: r for r in corpus.remove_contaminated_spans(docs, bench, k=k).collect()}
    bench_grams = set()
    for t in bench_toks:
        tk = [x for x in t.split(" ") if x]
        bench_grams |= {" ".join(tk[i : i + k]) for i in range(len(tk) - k + 1)}
    for d, sp in spans.items():
        rm = removed[d]
        assert rm["n_removed"] == sp["contam_tokens"] <= sp["n_tok"]
        clean = [x for x in rm["clean_text"].split(" ") if x]
        assert len(clean) == sp["n_tok"] - sp["contam_tokens"]
        leftover = {" ".join(clean[i : i + k]) for i in range(len(clean) - k + 1)}
        # NOTE: removing spans can CREATE new adjacencies (the cut
        # edges become neighbors), so only untouched docs must be
        # verbatim benchmark-k-gram free — and on those, clean text
        # is the original, so any surviving benchmark gram would mean
        # the span detector missed a hit
        if rm["n_removed"] == 0:
            assert not (leftover & bench_grams)


def test_stream_budget_gate_multichunk_group_folds_in_doc_id_order(spark):
    """Round-6 advice: applyInPandasWithState delivers a group as an
    ITERATOR of Arrow chunks in arbitrary post-shuffle order — a
    source spanning chunks must still fold its cumulative sum in
    doc_id order (chunks are concatenated THEN sorted once, not
    sorted chunk-by-chunk). Forced here with a 7-row Arrow batch cap
    and an input deliberately ordered to interleave doc_ids."""
    from impala_cut_spark.streaming.budget import stream_budget_gate

    import tempfile

    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prior = spark.conf.get(conf, None)
    spark.conf.set(conf, "7")
    try:
        # 60 docs, one source, 10 tokens each; interleaved ids so the
        # raw file order is NOT doc_id order
        rows = [(int(i), "s0", "tok " * 10) for i in range(60)]
        rows = rows[1::2][::-1] + rows[0::2]  # odd desc, then even asc
        docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
        with tempfile.TemporaryDirectory() as td:
            docs.coalesce(1).write.mode("overwrite").parquet(f"{td}/documents.parquet")
            schema = spark.read.parquet(f"{td}/documents.parquet").schema
            stream = spark.readStream.schema(schema).parquet(f"{td}/documents.parquet")
            q = (
                stream_budget_gate(stream)
                .writeStream.outputMode("append")
                .format("memory")
                .queryName("budget_multichunk")
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
            got = {
                r["doc_id"]: r
                for r in spark.table("budget_multichunk").collect()
            }
        assert len(got) == 60
        for i in range(60):
            assert got[i]["cum_tokens"] == (i + 1) * 10, i
    finally:
        if prior is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, prior)
