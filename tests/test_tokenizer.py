"""BPE tokenizer (operators/tokenizer.py): the properties that pin a
correct byte-pair encoder without an SQL oracle."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from impala_cut_spark.operators.tokenizer import (
    bpe_encode,
    learn_bpe_merges,
    segment_word,
    word_frequencies,
)
from impala_cut_spark.sources.catalog import load_table


def _ranks(merges):
    return {p: i for i, p in enumerate(merges)}


class TestSegmentWord:
    def test_zero_merges_is_character_segmentation(self):
        assert segment_word("hello", {}) == list("hello")

    def test_single_merge(self):
        assert segment_word("aab", _ranks([("a", "a")])) == ["aa", "b"]

    def test_rank_order_wins(self):
        # ("l","l") ranks before ("e","l"): hello -> h e ll o
        r = _ranks([("l", "l"), ("e", "l")])
        assert segment_word("hello", r) == ["h", "e", "ll", "o"]
        # reversed ranks: ("e","l") first -> h el l o
        r2 = _ranks([("e", "l"), ("l", "l")])
        assert segment_word("hello", r2) == ["h", "el", "l", "o"]

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet="abcde", min_size=1, max_size=24), st.integers(0, 50))
    def test_reconstruction_and_monotonicity(self, word, n):
        """tokens always concatenate back to the word, and more merges
        never increase the token count."""
        merges = [("a", "b"), ("b", "c"), ("ab", "c"), ("c", "d"), ("d", "e"),
                  ("a", "a"), ("aa", "aa"), ("e", "a"), ("cd", "e"), ("b", "b")]
        prev = None
        for k in range(0, min(n, len(merges)) + 1):
            toks = segment_word(word, _ranks(merges[:k]))
            assert "".join(toks) == word
            if prev is not None:
                assert len(toks) <= prev
            prev = len(toks)


class TestLearnAndEncode:
    def test_learned_merges_reduce_corpus_tokens(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents").limit(200).cache()
        merges = learn_bpe_merges(docs, n_merges=100)
        # learning stops early when every vocab word is fully merged
        # (small corpus); it must still produce a substantial table
        assert 20 < len(merges) <= 100
        none = bpe_encode(docs, []).agg({"n_bpe_tokens": "sum"}).collect()[0][0]
        some = bpe_encode(docs, merges).agg({"n_bpe_tokens": "sum"}).collect()[0][0]
        assert some < none  # merges learned from this corpus must bite
        # zero merges == character count of the pre-tokenized words
        chars = (
            bpe_encode(docs, [])
            .selectExpr("sum(cast(round(chars_per_token * n_bpe_tokens) as bigint)) s")
            .collect()[0][0]
        )
        assert chars == none  # 1 char per token when no merges exist

    def test_word_frequencies_deterministic_and_ranked(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents").limit(100)
        a = word_frequencies(docs, max_words=50)
        b = word_frequencies(docs, max_words=50)
        assert a == b
        counts = [n for _, n in a]
        assert counts == sorted(counts, reverse=True)


class TestUnigram:
    SC = {"low": 100, "er": 80, "lower": 30,
          "l": 5, "o": 5, "w": 5, "e": 5, "r": 5, "x": 5}

    def test_viterbi_prefers_likely_merge(self):
        from impala_cut_spark.operators.tokenizer import (
            viterbi_segment_unigram,
        )

        assert viterbi_segment_unigram("lower", self.SC) == ["low", "er"]
        assert viterbi_segment_unigram("er", self.SC) == ["er"]

    def test_viterbi_reconstruction_and_unknowns(self):
        from impala_cut_spark.operators.tokenizer import (
            viterbi_segment_unigram,
        )

        for w in ("lower", "lowerlower", "zzz", "xlowerz", ""):
            seg = viterbi_segment_unigram(w, self.SC)
            assert "".join(seg) == w

    def test_viterbi_matches_bruteforce_likelihood(self):
        """Exhaustive check on short words: the DP's segmentation has
        maximal likelihood prod/T^k among ALL segmentations."""
        from itertools import combinations

        from impala_cut_spark.operators.tokenizer import (
            viterbi_segment_unigram,
        )

        sc = self.SC
        T = sum(sc.values())

        def lik(seg):
            p = 1
            for piece in seg:
                s = sc.get(piece)
                if s is None:
                    if len(piece) > 1:
                        return None
                    s = 1
                p *= s
            return (p, len(seg))

        for w in ("lower", "erlow", "xxer", "wolre"):
            best = viterbi_segment_unigram(w, sc)
            bp, bk = lik(best)
            for cuts in range(len(w)):
                for pos in combinations(range(1, len(w)), cuts):
                    seg = [w[a:b] for a, b in
                           zip((0,) + pos, pos + (len(w),))]
                    r = lik(seg)
                    if r is None:
                        continue
                    p, k = r
                    # best likelihood: bp/T^bk >= p/T^k exactly
                    assert bp * T**k >= p * T**bk

    def test_learn_and_encode_deterministic(self, spark):
        from impala_cut_spark.operators.tokenizer import (
            learn_unigram_vocab,
            unigram_encode,
        )

        df = spark.createDataFrame(
            [(i, "the lower tower shower " * 3) for i in range(4)]
            + [(9, "unrelated words here")],
            "doc_id bigint, text string",
        )
        v1 = learn_unigram_vocab(df, vocab_size=64, em_iters=2)
        v2 = learn_unigram_vocab(df, vocab_size=64, em_iters=2)
        assert v1 == v2  # bit-deterministic training
        # single-char coverage guarantee
        chars = {c for _, t in df.collect() for w in t.split() for c in w}
        assert chars <= set(v1)
        rows = {r.doc_id: r for r in unigram_encode(df, v1).collect()}
        assert rows[0].n_tokens == rows[1].n_tokens
        assert rows[0].stream_md5 == rows[1].stream_md5
        assert rows[0].n_words == 12
        # a shared suffix family should compress below char count
        assert rows[0].n_tokens < sum(
            len(w) for w in ("the lower tower shower " * 3).split())
        assert rows[9].n_unk == 0  # all chars covered by singles


def test_unigram_long_word_capped():
    """r12 hardening: a pathological unbroken 'word' (minified JS,
    base64 blob) segments in bounded slices instead of feeding an
    O(len²) exact-bigint Viterbi."""
    import time

    from impala_cut_spark.operators.tokenizer import (
        MAX_WORD_LEN,
        _segment_capped,
        viterbi_segment_unigram,
    )

    sc = {chr(c): 2 for c in range(97, 123)}
    T = sum(sc.values())
    t0 = time.time()
    seg = _segment_capped("a" * 50_000, sc, 6, T)
    assert time.time() - t0 < 5.0
    assert "".join(seg) == "a" * 50_000
    # below the cap the slice path and the direct path agree
    w = "abcdef" * 10
    assert len(w) <= MAX_WORD_LEN
    assert _segment_capped(w, sc, 6, T) == viterbi_segment_unigram(
        w, sc, max_piece_len=6, total=T)
