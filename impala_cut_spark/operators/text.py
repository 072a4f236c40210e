"""Text analysis operators over the ``documents`` table.

All built from pyspark.sql.functions (whole-stage codegen, no Python
in the hot path): tokenization, counting, quality scoring, language
ID, fingerprinting. Deterministic and DuckDB-expressible → every one
is oracle-checked (plans/pipeline.py).

Scale: each operator is a narrow map over the documents scan — no
shuffle at all until an aggregation consumes the result. At 100 TB
these run at parquet-scan speed.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language stopword lists for the n-gram/stopword heuristic
#: language-ID (public common-word lists; order = tie-break precedence)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "un", "une", "dans"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "就", "不", "人"],
}

QUALITY_STOPWORDS = LANG_STOPWORDS["en"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization, empty tokens dropped."""
    return F.filter(F.split(text, " "), lambda x: x != "")


def normalized(text: Column) -> Column:
    """Canonical form for exact-dedup fingerprints: lowercase, strip
    non-alphanumerics, collapse whitespace."""
    lowered = F.lower(text)
    stripped = F.regexp_replace(lowered, "[^a-z0-9 ]", "")
    return F.trim(F.regexp_replace(stripped, " +", " "))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (md5 is bit-identical across engines → oracle-checkable; xxhash64
    via functions.fnv_hash for engine-internal hashing)."""
    return F.md5(normalized(text))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


#: BPE-ish pre-tokenization pattern (GPT-2-style word/number/punct
#: splitting, simplified to ASCII classes): letter runs, digit runs,
#: and single punctuation marks each count as one token. The class
#: syntax is identical in Java regex (Spark) and RE2 (DuckDB), so the
#: count is oracle-checkable.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(text: Column) -> Column:
    """Token count under BPE-ish regex pre-tokenization — the
    LLM-pipeline budget estimator (whitespace counting undercounts
    punctuation-heavy text)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), F.lit(0)))


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def _count_in(toks: Column, words: list[str]) -> Column:
    """Multiset count of tokens that appear in ``words``."""
    return F.size(F.filter(toks, lambda x: reduce(lambda a, b: a | b, [x == w for w in words])))


def quality_features(text: Column) -> dict[str, Column]:
    """Length/stopword/shape features. All integer-derived arithmetic →
    bit-identical across engines."""
    toks = tokens(text)
    n_tok = F.size(toks)
    n_char = F.length(text)
    sum_tok_len = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
    n_stop = _count_in(toks, QUALITY_STOPWORDS)
    return {
        "n_char": n_char,
        "n_tok": n_tok,
        "n_distinct_tok": F.size(F.array_distinct(toks)),
        "avg_tok_len": sum_tok_len.cast("double") / n_tok.cast("double"),
        "stop_ratio": n_stop.cast("double") / n_tok.cast("double"),
    }


def quality_score(text: Column) -> Column:
    """Composite quality score in [0,1]: favors documents long enough,
    with natural function-word density and word shape (heuristic in the
    spirit of C4/Gopher text-quality rules)."""
    ft = quality_features(text)
    len_term = F.least(ft["n_tok"].cast("double") / F.lit(100.0), F.lit(1.0))
    stop_term = F.least(ft["stop_ratio"] * F.lit(5.0), F.lit(1.0))
    shape_term = F.least(ft["avg_tok_len"] / F.lit(8.0), F.lit(1.0))
    return F.round(
        F.lit(0.4) * len_term + F.lit(0.3) * stop_term + F.lit(0.3) * shape_term, 6
    )


def lang_id(text: Column) -> Column:
    """Stopword-vote language ID. Ties broken by fixed language order
    (strictly-greater comparison against running best)."""
    toks = tokens(text)
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang, words in LANG_STOPWORDS.items():
        hits = _count_in(toks, words)
        is_better = hits > best_hits
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(is_better, hits).otherwise(best_hits)
    return best_lang
