"""Deduplication operators over the ``documents`` table.

Four strategies, each a pure DataFrame composition:

- exact           — hash-groupBy on a normalized fingerprint.
- ngram Jaccard   — EXACT set-similarity join via an inverted
                    shingle index (explode → equi-join → count), the
                    classic sparse-similarity-join plan. Oracle-checked.
- MinHash + LSH   — shingle → 64 minhashes → banded bucket join →
                    candidate pairs → exact-Jaccard verification. The
                    100 TB scale path (candidates ≪ n²).
- SimHash         — 64-bit signature; pigeonhole block join (4×16-bit
                    blocks) finds ALL pairs with hamming ≤ 3 without
                    an n² comparison, then verifies hamming exactly.

MinHash/SimHash use xxhash64 (engine-internal hash, not reproducible
in DuckDB) → rows-only driver check; tests/test_dedup.py verifies
them against the exact-Jaccard ground truth.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from impala_cut_spark.operators.text import fingerprint, normalized, tokens

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """One row per distinct normalized content: keeper = min doc_id.

    Scale: single shuffle on the 128-bit fingerprint (uniform key, no
    skew); partial agg collapses duplicates map-side.
    """
    return (
        docs.select(F.col("doc_id"), fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n_dups"))
    )


def exact_dedup_keep_first(docs: DataFrame) -> DataFrame:
    """Deduplicated documents (keeper rows only)."""
    keepers = exact_dedup_groups(docs).select(F.col("keeper").alias("doc_id"))
    return docs.join(keepers, "doc_id", "left_semi")


# ---------------------------------------------------------------------------
# shingles + exact n-gram Jaccard similarity join
# ---------------------------------------------------------------------------


def shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) with DISTINCT word-n-gram shingles per doc."""
    toks = tokens(F.col("text"))
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", *[F.get(toks, i + k) for k in range(n)]),
    )
    return docs.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("shingle")
    )


def _pair_jaccard(sh: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard over an inverted index: join docs sharing a
    shingle, count common, |A∪B| = |A|+|B|−common.

    Scale: the join key is the shingle — document frequency of word
    3-grams is Zipfian but bounded; AQE skew-join splits hot shingles.
    Output pairs are grouped on (a, b) — integers, uniform.
    """
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sz_a = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    jac = F.col("n_common").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("n_common")
    ).cast("double")
    return (
        common.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.2) -> DataFrame:
    """EXACT near-duplicate pairs by word-n-gram Jaccard ≥ threshold."""
    return _pair_jaccard(shingles(docs, n), threshold)


# ---------------------------------------------------------------------------
# MinHash + LSH (the at-scale near-dup path)
# ---------------------------------------------------------------------------

NUM_HASHES = 64
BAND_SIZE = 4  # 16 bands × 4 rows: ~P(candidate) = 1-(1-j^4)^16


def minhash_signatures(sh: DataFrame, num_hashes: int = NUM_HASHES) -> DataFrame:
    """(doc_id, mh_0..mh_{k-1}): min over shingles of xxhash64(shingle, seed).

    One explode + one groupBy — the signature is k aggregations over
    the same shuffle, not k passes.
    """
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"mh_{i}") for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(sig: DataFrame, band_size: int = BAND_SIZE) -> DataFrame:
    """Banded LSH: docs agreeing on any band become a candidate pair.

    Scale: bucket keys are 64-bit hashes of band tuples — collisions
    group only near-identical bands. The union of per-band self-joins
    is computed as one explode(bands)→groupBy join, so the shuffle
    volume is (#docs × #bands) rows, linear in corpus size.
    """
    num_hashes = len([c for c in sig.columns if c.startswith("mh_")])
    n_bands = num_hashes // band_size
    bands = F.array(
        *[
            F.xxhash64(*[F.col(f"mh_{b * band_size + r}") for r in range(band_size)], F.lit(b))
            for b in range(n_bands)
        ]
    )
    buckets = sig.select("doc_id", F.posexplode(bands).alias("band", "bucket"))
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.2) -> DataFrame:
    """MinHash-LSH candidates verified with exact Jaccard — same output
    contract as ngram_jaccard_pairs, but candidate generation is O(n)
    instead of an inverted-index join over every shared shingle."""
    sh = shingles(docs, n)
    cands = lsh_candidate_pairs(minhash_signatures(sh))
    # verify candidates only: semi-join the inverted index down to
    # candidate docs, then exact Jaccard on that restricted set
    cand_docs = cands.select(F.col("id_a").alias("doc_id")).union(
        cands.select(F.col("id_b"))
    ).distinct()
    sh_small = sh.join(cand_docs, "doc_id", "left_semi")
    exact = _pair_jaccard(sh_small, threshold)
    return exact.join(cands, ["id_a", "id_b"], "left_semi")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 64
SIMHASH_BLOCKS = 4  # pigeonhole: hamming ≤ 3 ⇒ ≥1 of 4 blocks equal


def simhash(docs: DataFrame) -> DataFrame:
    """(doc_id, sig): 64-bit SimHash over distinct tokens.

    bit_i(sig) = sign of Σ_tokens (bit_i(xxhash64(token)) ? +1 : −1).
    Computed as explode → 64 conditional sums → bit-pack; one shuffle
    on doc_id.
    """
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    def _bit(i: int):
        # bit 63 is the sign bit of BIGINT — its mask is the negative literal
        return F.lit(1 << i if i < 63 else -(1 << 63)).cast("bigint")

    sums = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(_bit(i)) != 0, 1).otherwise(-1)
            ).alias(f"s_{i}")
            for i in range(SIMHASH_BITS)
        ]
    )
    sig = reduce(
        lambda acc, i: acc
        + F.when(F.col(f"s_{i}") > 0, _bit(i)).otherwise(F.lit(0).cast("bigint")),
        range(SIMHASH_BITS),
        F.lit(0).cast("bigint"),
    )
    return sums.select("doc_id", sig.alias("sig"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """ALL pairs with hamming(sig_a, sig_b) ≤ max_hamming.

    Scale: pigeonhole — split the 64-bit signature into
    ``max_hamming+1`` blocks; any pair within the distance budget must
    agree exactly on ≥1 block, so an equi-join per block finds every
    such pair with NO quadratic comparison. Exact (no false negatives),
    then hamming verified on the narrow candidate set.
    """
    n_blocks = max_hamming + 1
    width = SIMHASH_BITS // n_blocks
    sigs = simhash(docs)
    blocks = F.array(
        *[
            F.shiftright(F.col("sig"), b * width).bitwiseAND(F.lit((1 << width) - 1).cast("bigint"))
            for b in range(n_blocks)
        ]
    )
    bl = sigs.select("doc_id", "sig", F.posexplode(blocks).alias("blk", "val"))
    a = bl.alias("a")
    b = bl.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cands.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
