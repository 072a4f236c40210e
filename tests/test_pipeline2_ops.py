"""Property tests for the round-3 pipeline operators (pipeline2.py
registry equivalence is covered by tests/test_correctness.py; these
pin the operator-level invariants the SQL oracle can't express)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from impala_cut_spark.operators import corpus, similarity
from impala_cut_spark.operators.text import PII_PATTERNS, dedup_tokens_in_doc, redact_pii
from impala_cut_spark.plans._util import t


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return t(spark, sf_dir, "documents").cache()


def test_chunking_covers_text_exactly(spark, docs):
    """Every chunk is a verbatim slice at its declared offset, chunk 0
    starts at 0, consecutive starts step by the stride, and the final
    chunk reaches the end of the document."""
    size, stride = 50, 30
    rows = corpus.chunk_documents(docs.limit(20), size=size, stride=stride).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.limit(20).collect()}
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(texts)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        text = texts[doc_id]
        for i, c in enumerate(chunks):
            assert c["chunk_id"] == i
            assert c["chunk_start"] == i * stride
            assert c["chunk_text"] == text[c["chunk_start"]: c["chunk_start"] + size]
            assert c["chunk_len"] == len(c["chunk_text"]) <= size
        last = chunks[-1]
        assert last["chunk_start"] + last["chunk_len"] == len(text)


def test_dedup_tokens_first_occurrence_order(spark, docs):
    """Kept tokens are unique, appear in first-occurrence order, and
    the operator is idempotent."""
    dtext, n_kept = dedup_tokens_in_doc(F.col("text"))
    rows = (
        docs.limit(50)
        .select("doc_id", "text", dtext.alias("d"), n_kept.alias("k"))
        .collect()
    )
    for r in rows:
        orig = [x for x in r["text"].split(" ") if x]
        kept = r["d"].split(" ") if r["d"] else []
        assert len(kept) == len(set(kept)) == r["k"]
        # python-side reference: first occurrences in order
        seen, expect = set(), []
        for tok in orig:
            if tok not in seen:
                seen.add(tok)
                expect.append(tok)
        assert kept == expect
    # idempotence: dedup of dedup_text is itself
    dd = docs.limit(50).select(dtext.alias("text"))
    d2, _ = dedup_tokens_in_doc(F.col("text"))
    again = dd.select(F.col("text").alias("a"), d2.alias("b")).collect()
    assert all(r["a"] == r["b"] for r in again)


def test_redact_pii_leaves_no_matches(spark):
    """After redaction, no PII pattern matches anywhere, and each count
    equals the number of spans planted."""
    samples = [
        ("reach me at jo.doe+x@my-site.co.uk thanks", {"email": 1}),
        ("servers 10.0.0.1 and 192.168.255.254 are up", {"ip": 2}),
        ("ssn 123-45-6789 on file", {"ssn": 1}),
        ("call +1-555-0100 now", {"phone": 1}),
        ("a@b.io 1.2.3.4 999-88-7777 +44-207-9460", {"email": 1, "ip": 1, "ssn": 1, "phone": 1}),
        ("no pii here at all", {}),
    ]
    df = spark.createDataFrame([(s,) for s, _ in samples], "text string")
    red, counts = redact_pii(F.col("text"))
    out = df.select(
        red.alias("red"), *[counts[n].alias(n) for n, _, _ in PII_PATTERNS]
    ).collect()
    for (text, expected), r in zip(samples, out):
        for name, pat, _ in PII_PATTERNS:
            assert not re.search(pat, r["red"]), (text, name, r["red"])
            assert r[name] == expected.get(name, 0), (text, name)


def test_decontaminate_flags_planted_overlap(spark):
    """A training doc sharing a long span with a benchmark doc is
    flagged; unrelated docs are not; benchmark docs never appear."""
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    clean_text = "one two three four five six seven eight nine ten"
    dirty_text = "intro words then alpha beta gamma delta epsilon zeta eta closing"
    rows = [(1, bench_text), (2, dirty_text), (3, clean_text)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bench = df.filter(F.col("doc_id") == 1)
    train = df.filter(F.col("doc_id") != 1)
    out = {r["doc_id"]: r for r in corpus.decontaminate(train, bench, n=3, min_overlap=5).collect()}
    assert set(out) == {2, 3}
    assert out[2]["is_contaminated"] == 1 and out[2]["n_overlap"] >= 5
    assert out[3]["is_contaminated"] == 0 and out[3]["n_overlap"] == 0


def test_top_ngrams_ordering(spark, docs):
    rows = corpus.top_ngrams(docs, n=3, k=10).collect()
    assert len(rows) == 10
    dfs = [r["df"] for r in rows]
    assert dfs == sorted(dfs, reverse=True)
    # ties (equal df) must be in shingle order
    for a, b in zip(rows, rows[1:]):
        if a["df"] == b["df"]:
            assert a["shingle"] < b["shingle"]


def test_repetition_features_reference(spark):
    """dup fractions against a python reference on crafted docs,
    including the <n-token edge case."""
    from impala_cut_spark.operators.text import repetition_features

    samples = ["a b a b a b", "x y z w", "one two", "", "q q q q q q"]
    df = spark.createDataFrame([(s,) for s in samples], "text string")
    ft = repetition_features(F.col("text"), n=3)
    rows = df.select(
        ft["n_gram"].alias("g"), ft["dup_ngram_frac"].alias("dg"), ft["dup_token_frac"].alias("dt")
    ).collect()
    for s, r in zip(samples, rows):
        toks = [x for x in s.split(" ") if x]
        grams = [" ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 0))]
        assert r["g"] == len(grams)
        exp_dg = 1.0 - len(set(grams)) / len(grams) if grams else 0.0
        exp_dt = 1.0 - len(set(toks)) / len(toks) if toks else 0.0
        assert r["dg"] == pytest.approx(exp_dg)
        assert r["dt"] == pytest.approx(exp_dt)


def test_mixture_sample_rates(spark, docs):
    """Per-source keep rates honored: rate-1.0 strata keep everything,
    rate-0 strata drop everything, and the sample is a determinstic
    subset (re-run identical)."""
    out = corpus.mixture_sample(docs, {"src0": 1.0, "src1": 0.0}, strata="source", default_rate=0.1)
    got = out.groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in got}
    total = {r["source"]: r["count"] for r in docs.groupBy("source").count().collect()}
    assert counts.get("src0") == total["src0"]
    assert "src1" not in counts
    again = {
        r["source"]: r["count"]
        for r in corpus.mixture_sample(
            docs, {"src0": 1.0, "src1": 0.0}, strata="source", default_rate=0.1
        ).groupBy("source").count().collect()
    }
    assert counts == again


def test_frame_sample_reconstructs_payload(spark, docs):
    """every=1 frames concatenate back to the exact payload; every=4
    keeps exactly the 0,4,8,... stride of those frames."""
    from impala_cut_spark.operators import multimodal

    assets = multimodal.assets_from_documents(docs.limit(10))
    payloads = {r["asset_id"]: bytes(r["payload"]) for r in assets.collect()}
    all_frames = multimodal.frame_sample(assets, frame_bytes=64, every=1).collect()
    by_asset: dict[int, list] = {}
    for r in all_frames:
        by_asset.setdefault(r["asset_id"], []).append(r)
    for aid, frames in by_asset.items():
        frames.sort(key=lambda r: r["frame_idx"])
        assert b"".join(bytes(f["frame_payload"]) for f in frames) == payloads[aid]
        assert [f["frame_ts_ms"] for f in frames] == [f["frame_idx"] * 40 for f in frames]
    sampled = multimodal.frame_sample(assets, frame_bytes=64, every=4).collect()
    skeys = {(r["asset_id"], r["frame_idx"]) for r in sampled}
    expect = {
        (r["asset_id"], r["frame_idx"]) for r in all_frames if r["frame_idx"] % 4 == 0
    }
    assert skeys == expect


def test_approx_percentiles_within_rank_error(spark, docs):
    """approx_percentile at accuracy=10000 must land within a small
    RANK neighborhood of the exact percentile for every group/p."""
    exact = {
        r["lang"]: r
        for r in corpus.distribution_stats(docs, F.col("n_chars"), by="lang").collect()
    }
    approx = {
        r["lang"]: r
        for r in corpus.distribution_stats_approx(docs, F.col("n_chars"), by="lang").collect()
    }
    values = {
        lang: sorted(
            x["n_chars"] for x in docs.filter(F.col("lang") == lang).select("n_chars").collect()
        )
        for lang in exact
    }
    assert set(exact) == set(approx)
    for lang in exact:
        vs = values[lang]
        n = len(vs)
        for p, col in [(0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (0.95, "p95")]:
            a = approx[lang][col]
            # rank of the approx answer must be within 1% of target rank
            import bisect

            lo = bisect.bisect_left(vs, a)
            hi = bisect.bisect_right(vs, a)
            target = p * (n - 1)
            assert lo - 1 <= target + 0.01 * n and hi >= target - 0.01 * n, (
                lang,
                col,
                a,
                exact[lang][col],
            )


def test_quantize_int8_bounds(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings").limit(100)
    out = similarity.quantize_int8(emb).collect()
    orig = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    assert len(out) == 100
    for r in out:
        assert all(-127 <= q <= 127 for q in r["qvec"])
        m = max(abs(x) for x in orig[r["vec_id"]])
        # reconstruction error of symmetric rounding: ≤ half a step
        assert r["max_err"] <= m / 254.0 + 1e-6
        assert r["scale"] == pytest.approx(127.0 / m, rel=1e-4)
