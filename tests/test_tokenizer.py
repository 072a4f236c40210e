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
