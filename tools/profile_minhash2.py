"""Minhash variant bake-off round 2: no-persist exchange reuse, and a
cross-engine md5 band key (narrow like xxhash64 buckets but
DuckDB-replayable, unlike them).

Run: python tools/profile_minhash2.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F
from pyspark import StorageLevel

from impala_cut_spark.session import build_session
from impala_cut_spark.operators import dedup

SF = "/root/testdata/sf0.1"


def timed(label, fn, n=3):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:55s} {best:7.3f}s", flush=True)
    return best


def band_cands_md5(sig, band_size=4):
    """Band key = md5-60bit of the comma-joined band tuple: 8-byte
    shuffle rows AND cross-engine replayable."""
    num_hashes = len([c for c in sig.columns if c.startswith("mh_")])
    n_bands = num_hashes // band_size
    bands = F.array(
        *[
            dedup.md5_hash60(
                F.concat_ws(
                    ",",
                    F.lit(b),
                    *[F.col(f"mh_{b * band_size + r}") for r in range(band_size)],
                )
            )
            for b in range(n_bands)
        ]
    )
    buckets = sig.select("doc_id", F.posexplode(bands).alias("band", "bucket"))
    return dedup.candidate_pairs_from_groups(buckets)


def run(spark, label, persist, band_mode):
    def fn():
        spark.catalog.clearCache()
        sh = dedup.shingles(spark.read.parquet(f"{SF}/documents.parquet"), 3)
        pre, aggs = dedup._minhash_pre_aggs(sh, 64, "md5_affine")
        pd = pre.groupBy("doc_id").agg(F.collect_set("shingle").alias("shset"), *aggs)
        if persist:
            pd = pd.persist(StorageLevel.MEMORY_AND_DISK)
        if band_mode == "exact":
            cands = dedup.lsh_candidate_pairs(pd, exact_bands=True)
        elif band_mode == "md5":
            cands = band_cands_md5(pd)
        else:
            cands = dedup.lsh_candidate_pairs(pd, exact_bands=False)
        out = dedup._verify_with_docsets(pd.select("doc_id", "shset"), cands, 0.2)
        n = out.count()
        if persist:
            pd.unpersist()
        return n

    timed(label, fn)
    return fn


def main():
    spark = build_session(
        app_name="minhash-profile2", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF}/documents.parquet").count()

    run(spark, "A persist + exact bands (registered today)", True, "exact")
    run(spark, "B no-persist + exact bands", False, "exact")
    run(spark, "C no-persist + md5 band keys", False, "md5")
    run(spark, "D persist + md5 band keys", True, "md5")
    run(spark, "E no-persist + xxhash bands (ref)", False, "xx")

    # result-equality check: md5 band keys must give the same verified
    # pairs as exact band tuples (collision-free in practice)
    sh = dedup.shingles(spark.read.parquet(f"{SF}/documents.parquet"), 3)
    pre, aggs = dedup._minhash_pre_aggs(sh, 64, "md5_affine")
    pd = pre.groupBy("doc_id").agg(F.collect_set("shingle").alias("shset"), *aggs)
    a = dedup._verify_with_docsets(
        pd.select("doc_id", "shset"), dedup.lsh_candidate_pairs(pd, exact_bands=True), 0.2
    )
    b = dedup._verify_with_docsets(
        pd.select("doc_id", "shset"), band_cands_md5(pd), 0.2
    )
    sa = {(r.id_a, r.id_b) for r in a.collect()}
    sb = {(r.id_a, r.id_b) for r in b.collect()}
    print("exact-band pairs:", len(sa), "md5-band pairs:", len(sb), "equal:", sa == sb)

    # plan check for exchange reuse in the no-persist form
    cands = band_cands_md5(pd)
    out = dedup._verify_with_docsets(pd.select("doc_id", "shset"), cands, 0.2)
    out.count()
    p = out._jdf.queryExecution().executedPlan().toString()
    print("ReusedExchange in no-persist plan:", p.count("ReusedExchange"))

    spark.stop()


if __name__ == "__main__":
    main()


def main2():
    spark = build_session(
        app_name="minhash-profile3", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF}/documents.parquet").count()

    def variant_F():
        spark.catalog.clearCache()
        sh = dedup.shingles(spark.read.parquet(f"{SF}/documents.parquet"), 3).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        pre, aggs = dedup._minhash_pre_aggs(sh, 64, "md5_affine")
        sig = pre.groupBy("doc_id").agg(*aggs)
        cands = band_cands_md5(sig).persist(StorageLevel.MEMORY_AND_DISK)
        cands.count()
        ids = cands.select(F.col("id_a").alias("doc_id")).union(
            cands.select(F.col("id_b").alias("doc_id"))
        ).distinct()
        docsets = (
            sh.join(F.broadcast(ids), "doc_id", "semi")
            .groupBy("doc_id")
            .agg(F.collect_set("shingle").alias("shset"))
        )
        out = dedup._verify_with_docsets(docsets, cands, 0.2)
        n = out.count()
        sh.unpersist(); cands.unpersist()
        return n

    timed("F sh-persist + sparse docsets + md5 bands", variant_F)

    def variant_G():  # D again as the baseline in this session
        spark.catalog.clearCache()
        sh = dedup.shingles(spark.read.parquet(f"{SF}/documents.parquet"), 3)
        pre, aggs = dedup._minhash_pre_aggs(sh, 64, "md5_affine")
        pd = pre.groupBy("doc_id").agg(F.collect_set("shingle").alias("shset"), *aggs).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        cands = band_cands_md5(pd)
        out = dedup._verify_with_docsets(pd.select("doc_id", "shset"), cands, 0.2)
        n = out.count()
        pd.unpersist()
        return n

    timed("G fused shset + md5 bands + persist (=D)", variant_G)
    print("F pairs:", variant_F(), "G pairs:", variant_G())
    spark.stop()


if __name__ == "__main__" and "--f" in sys.argv:
    main2()
