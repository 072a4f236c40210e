"""One-off profiling harness for the minhash constant factor
(VERDICT r3 next-round #3): time each pipeline stage and several
variants at sf0.1 to find where the 3.9s goes.

Run: python tools/profile_minhash.py
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
    print(f"{label:55s} {best:7.3f}s")
    return best


def main():
    spark = build_session(
        app_name="minhash-profile", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.count()  # warm

    def clear():
        spark.catalog.clearCache()

    # stage 0: shingle build + explode only
    timed("shingles scan+explode (count)", lambda: dedup.shingles(docs, 3).count())

    # stage 1: docsets only (collect_set groupBy)
    def docsets_only():
        sh = dedup.shingles(docs, 3)
        sh.groupBy("doc_id").agg(F.collect_set("shingle").alias("shset")).count()

    timed("groupBy collect_set only", docsets_only)

    # stage 2: + 64 md5-affine min aggs (fused per_doc, no LSH/verify)
    def per_doc(hash_family, num_hashes=64):
        sh = dedup.shingles(docs, 3)
        pre, aggs = dedup._minhash_pre_aggs(sh, num_hashes, hash_family)
        return pre.groupBy("doc_id").agg(
            F.collect_set("shingle").alias("shset"), *aggs
        )

    timed("per_doc md5_affine 64h", lambda: per_doc("md5_affine").count())
    timed("per_doc xxhash64 64h", lambda: per_doc("xxhash64").count())
    timed("per_doc md5_affine 32h", lambda: per_doc("md5_affine", 32).count())

    # stage 3: full pipelines
    def full(hash_family, exact_bands=None):
        clear()
        sh = dedup.shingles(docs, 3)
        pre, aggs = dedup._minhash_pre_aggs(sh, 64, hash_family)
        pd = (
            pre.groupBy("doc_id")
            .agg(F.collect_set("shingle").alias("shset"), *aggs)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        eb = (hash_family == "md5_affine") if exact_bands is None else exact_bands
        cands = dedup.lsh_candidate_pairs(pd, exact_bands=eb)
        out = dedup._verify_with_docsets(pd.select("doc_id", "shset"), cands, 0.2)
        out.count()
        pd.unpersist()

    timed("FULL md5_affine exact_bands (registered)", lambda: full("md5_affine"))
    timed("FULL md5_affine hashed bands", lambda: full("md5_affine", exact_bands=False))
    timed("FULL xxhash64 hashed bands (twin)", lambda: full("xxhash64"))

    # variant: no persist (rebuild per_doc for cands + verify)
    def full_nopersist():
        clear()
        sh = dedup.shingles(docs, 3)
        pre, aggs = dedup._minhash_pre_aggs(sh, 64, "md5_affine")
        pd = pre.groupBy("doc_id").agg(F.collect_set("shingle").alias("shset"), *aggs)
        cands = dedup.lsh_candidate_pairs(pd, exact_bands=True)
        out = dedup._verify_with_docsets(pd.select("doc_id", "shset"), cands, 0.2)
        out.count()

    timed("FULL md5_affine no persist", full_nopersist)

    # variant: candidates-only (how much is verify?)
    def cands_only(eb):
        clear()
        sh = dedup.shingles(docs, 3)
        pre, aggs = dedup._minhash_pre_aggs(sh, 64, "md5_affine")
        pd = pre.groupBy("doc_id").agg(*aggs)
        dedup.lsh_candidate_pairs(pd, exact_bands=eb).count()

    timed("signatures+LSH cands only, exact bands", lambda: cands_only(True))
    timed("signatures+LSH cands only, hashed bands", lambda: cands_only(False))

    spark.stop()


if __name__ == "__main__":
    main()
