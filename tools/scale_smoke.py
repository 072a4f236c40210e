"""Scale-smoke harness: measure how the headline operators scale when
the data grows 10× — the local, measurable stand-in for the "would
this survive 100×?" question the 100 TB design targets.

Builds a ~sf1 replica set in /tmp by unioning the sf0.1 tables 10×
with key offsets (documents get a per-replica prefix token so the
corpus doesn't become 10 exact copies — that would quadratically
inflate dedup pair counts and measure skew, not scaling), then runs a
spread of operator families at BOTH scales and reports the wall-clock
ratio next to the 10× data ratio.

A ratio ≈ 10 (or below, as fixed per-query overhead amortizes) means
the plan is linear in the data — shuffles keyed correctly, no
quadratic candidate stage, no driver-side collect growing with the
corpus. Ratios well above 10 flag a scale problem.

    python tools/scale_smoke.py            # writes SCALE.md + prints JSON

Replicated tables: lineitem, orders, events, documents, embeddings
(the ones the smoke queries touch). Output: SCALE.md at the repo root.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/scale_sf1"
REPLICAS = 10

#: query name -> family label (all from the registry, run unchanged)
SMOKE = {
    "tpch_q1": "scan+agg (1 shuffle)",
    "tpch_q6": "pushed-down scan (0 shuffles)",
    "tpch_q18": "join + HAVING-on-merge agg",
    "pipe_text_all": "text features (narrow map)",
    "pipe_dedup_exact": "exact dedup (1 shuffle)",
    "pipe_dedup_minhash": "MinHash+LSH (3 shuffles, linear volume)",
    "pipe_dedup_jaccard": "exact Jaccard SSJ (inverted index + df-cap)",
    "pipe_decontaminate": "decontamination (broadcast benchmark shingles)",
    "pipe_ann_topk": "brute-force ANN (mapInPandas kernel)",
    "pipe_sessions": "sessionization (1 shuffle)",
    "pipe_events_json": "JSON extract + agg",
    "pipe_mixture_sample": "mixture sample (pushed filter)",
    # round-4 families
    "pipe_embed_pq": "PQ encode (narrow map, frozen codebook)",
    "pipe_ann_ivfpq": "IVF-PQ search (cell prune + code ADC)",
    "pipe_embed_semdedup": "SemDeDup (cell-bounded cosine self-join)",
    # round-5 families
    "pipe_dedup_substring": "substring-span dedup (shingle agg+join + doc islands)",
    "pipe_quality_classifier": "hashed-linear quality filter (narrow map)",
    "pipe_epoch_shuffle": "epoch shuffle (bucket-major two-phase rank)",
    "pipe_decontaminate_neardup": "near-dup decontamination (broadcast MinHash probe)",
    # round-6 families
    "pipe_bm25": "BM25 retrieval (pre-explode term filter, 4 shuffles)",
    "pipe_gopher_rules": "Gopher rule bundle (narrow map)",
    "pipe_budget_select": "token-budget selection (band two-phase)",
    "pipe_ppl_terciles": "per-lang perplexity terciles (band two-phase)",
    "pipe_snapshot_diff": "snapshot diff (1 full-outer key shuffle)",
    "pipe_temperature_sample": "temperature sampling (hash-band two-phase)",
    "pipe_bigram_ppl": "bigram Stupid-Backoff ppl (count + scoring joins)",
    "pipe_score_zscore": "per-lang z-score (moments + broadcast join-back)",
    "pipe_dedup_blocks": "block dedup keep-first (min-struct agg + join-back)",
    "pipe_decontaminate_spans": "span decontamination (broadcast bench + doc islands)",
    "pipe_source_reputation": "per-source reputation gate (one source-keyed agg)",
    "pipe_decontaminate_clean": "span removal (broadcast bench + HOF token surgery)",
    "pipe_benchmark_overlap": "benchmark overlap report (semi-filtered corpus side)",
    "pipe_ann_ivfpq_rerank": "IVF-PQ + exact rerank (broadcast candidate refine)",
    "pipe_tfidf_keywords": "TF-IDF keywords (tf agg + df re-agg + doc top-k)",
    "pipe_dedup_canonical": "cluster canonicalization (max-struct agg + join-back)",
    "pipe_seq_chunks": "concat-and-chunk sequence map (band-offset two-phase)",
}

#: table -> {column: key_domain}. Columns sharing a domain shift by the
#: SAME offset, so every replica preserves referential integrity (the
#: orders⋈lineitem⋈customer joins in replica i match exactly like the
#: original — without this, FK joins misalign and the smoke measures a
#: different selectivity at the big scale).
KEYS = {
    "lineitem": {"l_orderkey": "order"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "customer": {"c_custkey": "cust"},
    "events": {"event_id": "event"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}


def build_replicas(spark) -> None:
    from pyspark.sql import functions as F

    from impala_cut_spark.sources.catalog import load_table

    dst = Path(DST)
    if dst.exists():
        shutil.rmtree(dst)
    dst.mkdir(parents=True)
    # one offset per key DOMAIN = max over every column in the domain
    dom_max: dict[str, int] = {}
    for name, cols in KEYS.items():
        base = load_table(spark, SRC, name)
        for col, dom in cols.items():
            m = int(base.agg(F.max(F.col(col))).collect()[0][0])
            dom_max[dom] = max(dom_max.get(dom, 0), m)
    offs = {dom: m + 1 for dom, m in dom_max.items()}
    for name, cols in KEYS.items():
        base = load_table(spark, SRC, name)
        parts = []
        for i in range(REPLICAS):
            r = base
            for col, dom in cols.items():
                r = r.withColumn(col, F.col(col) + F.lit(i * offs[dom]))
            if name == "documents" and i > 0:
                # tag EVERY token with the replica id: replica i shares
                # ZERO shingles with any other replica, so the corpus is
                # 10 disjoint shards with the original's internal dup
                # structure — dup pairs grow 10× (linear). A weaker
                # perturbation (one prefix token) left replicas at
                # Jaccard ≈0.97 vs their originals: every doc gained 9
                # near-duplicates and the measured "scaling" was the
                # ~100× growth of TRUE OUTPUT PAIRS, not operator cost
                # (the smoke's own first finding).
                r = r.withColumn(
                    "text", F.regexp_replace("text", "(^| )", f"$1r{i}x")
                )
            parts.append(r)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        out.write.mode("overwrite").parquet(f"{DST}/{name}.parquet")
        print(f"replicated {name}: {REPLICAS}x", flush=True)


def time_one(spark, sf_dir: str, name: str) -> float:
    from impala_cut_spark.plans import REGISTRY

    t0 = time.time()
    REGISTRY[name].spark(spark, sf_dir).collect()
    return time.time() - t0


def main() -> None:
    from impala_cut_spark.session import build_session

    spark = build_session(app_name="scale-smoke", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    build_replicas(spark)
    time.sleep(10)  # let replica-write writeback settle before timing
    names = list(SMOKE)
    # per-query small→big back-to-back (same JVM warmth and machine
    # load for both scales), and TWO temporally-spread passes with a
    # per-(query, scale) min: a slow phase — GC storm, noisy-neighbor
    # CPU steal — hits consecutive attempts together, so spreading the
    # repeats across passes is what actually de-noises the ratio
    # (observed: whole-phase 5-15s swings on this box).
    small: dict[str, float] = {}
    big: dict[str, float] = {}
    for rnd in range(2):
        for name in names:
            s = time_one(spark, SRC, name)
            b = time_one(spark, DST, name)
            small[name] = round(min(small.get(name, s), s), 3)
            big[name] = round(min(big.get(name, b), b), 3)
            print(f"  pass{rnd} {name}: sf0.1 {s:.2f}s  ~sf1 {b:.2f}s", flush=True)

    rows = []
    for name in names:
        ratio = big[name] / small[name] if small[name] > 0 else float("nan")
        rows.append((name, SMOKE[name], small[name], big[name], round(ratio, 1)))

    lines = [
        "# SCALE — 10× growth smoke (tools/scale_smoke.py)\n",
        f"\nsf0.1 → {REPLICAS}× replicas (~sf1), local[32], per-(query, scale) min over two temporally-spread passes.",
        "\nLinear-at-scale bar: wall ratio ≤ ~10 (fixed per-query overhead",
        " amortizes, so healthy ratios are usually BELOW the data ratio).\n",
        "\n| query | family | sf0.1 s | ~sf1 s | ratio (data=10×) |\n|---|---|---|---|---|\n",
    ]
    for name, fam, s, b, r in rows:
        flag = "" if r <= 12 else " ⚠"
        lines.append(f"| {name} | {fam} | {s} | {b} | {r}×{flag} |\n")
    out_path = REPO / "SCALE.md"
    prior = out_path.read_text() if out_path.exists() else ""
    # keep the hand-written methodology section across regenerations
    if "## Methodology" in prior:
        lines.append("\n" + prior[prior.index("## Methodology"):])
    out_path.write_text("".join(lines))
    print(json.dumps({"small": small, "big": big}))
    print("wrote SCALE.md")


if __name__ == "__main__":
    main()
