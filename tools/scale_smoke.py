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

    python tools/scale_smoke.py            # main 10× table (rewrites its section)
    python tools/scale_smoke.py --skew     # skew-stress section (r6 verdict #6)
    python tools/scale_smoke.py --x100     # 100× spot-check section (r6 verdict #8)

Replicated tables: lineitem, orders, events, documents, embeddings
(the ones the smoke queries touch). Output: SCALE.md at the repo root
— each mode rewrites only its own section, so the three evidence
blocks (plus the hand-written Methodology) survive regenerations.
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
    # round-7 families
    "pipe_semdedup_auto": "SemDeDup, production cells≈√N (broadcast-join assignment)",
    "pipe_dsir_weights": "DSIR selection (persisted feature stream, broadcast buckets)",
    "pipe_dup_block_share": "dup-block share gate (two-level fp agg + join-back)",
    "pipe_dedup_weights": "SoftDeDup 1/n weights (cluster agg + join-back)",
    "pipe_ngram_novelty": "n-gram novelty curve (first-seen agg + join-back)",
    "pipe_ann_recall": "ANN recall@5 report (10 probes vs corpus, 2 searches + join)",
    # round-8 families
    "pipe_warc_ingest": "WARC build+parse round-trip (narrow map, no shuffle)",
    "pipe_crawl_extract": "crawl front-end WARC→HTTP→HTML→text (map + codegen chain)",
    "pipe_multimodal_codec": "PNG/GIF/PPM/TIFF/JPEG encode+decode round-trip (narrow map)",
    # round-9 families
    "pipe_multimodal_audio": "MP3 frame-header metadata walk (narrow map, no shuffle)",
    "pipe_crawl_images": "crawl-image path WARC→HTTP→decode (narrow map, no shuffle)",
    # round-11 window newcomers (r10 verdict #2 cohort)
    "pipe_asof": "as-of join (union-scan + last-before fold, 1 shuffle)",
    "pipe_sample_stratified": "stratified sample (per-stratum hash-rank)",
    "pipe_split_hash": "deterministic hash split (narrow map)",
    "pipe_pack_greedy": "sequence packing (first-fit bins)",
    "pipe_chunking": "overlap chunking (posexplode + substr)",
}

#: per-row root-cause notes (r6 verdict #3/#4: every outlier ratio
#: carries its explanation IN SCALE.md, regenerations included)
NOTES = {
    "pipe_dedup_exact": (
        "≈7× is the compute-bound floor, not a scaling defect: the md5 "
        "fingerprint kernel ALONE reproduces the ratio (isolated r7 probe: "
        "0.375s → 2.571s = 6.9×) — hashing every text byte is pure linear "
        "CPU, and at sf0.1 the query is so cheap (~0.4s) that almost no "
        "fixed overhead is left to amortize. No super-linear term exists: "
        "the only shuffle carries one ~60-byte fingerprint row per doc."
    ),
    "pipe_dedup_blocks": (
        "same kernel economics as dedup_exact (tokenize + per-8-token-block "
        "md5 dominates); the r6 4.6× row caught a noisy pass — isolated r7 "
        "re-measure: 1.15s → 2.80s = 2.4× (same-config spread is ±30% under "
        "load, BASELINE.md round-5/6 notes)."
    ),
    "pipe_embed_semdedup": (
        "frozen FIXED-16-cell variant: within-cell pair work is quadratic "
        "by construction at a fixed cell count — kept as the oracle-pinned "
        "test value; the production √N rule is wired as pipe_semdedup_auto."
    ),
    "pipe_tfidf_keywords": (
        "3.1× is amortized fixed overhead over linear work, not a "
        "super-linear term: every stage shuffles (doc_id/term, count) "
        "rows whose volume grows exactly with the corpus, and the "
        "per-doc top-k window holds one document's term list — at sf1 "
        "the ~1.3s sf0.1 floor still hides most of the growth.  r8 "
        "also persisted the tf table (it fed both the df re-agg and "
        "the scoring join unpersisted, so the corpus was "
        "tokenized+exploded twice — the same defect bm25/dsir had)."
    ),
    "pipe_semdedup_auto": (
        "total work is Θ(N^1.5) BY THE PAPER'S DESIGN (cells≈√N balances "
        "assignment against pair work), so this row's honest bar is "
        "10^1.5 ≈ 31×, not 10×; the point of the rule is the ABSOLUTE "
        "big-scale cost: ~29M distance evaluations at 10× versus the "
        "fixed-16-cell variant's ~225M."
    ),
}

#: skew-stress fixture (r6 verdict #6): ONE hot 8-token shingle/block
#: prepended to ~30% of documents — the Zipf-boilerplate case the
#: agg+join-back dedup rework claims AQE can absorb. 8 tokens = one
#: full block (dedup.BLOCK_TOKENS) = one full substring shingle (k=8).
HOT_PREFIX = "terms of service apply to all content herein"
SKEW_QUERIES = {
    "pipe_dedup_substring": "substring-span dedup (hot shingle in 30% of docs)",
    "pipe_dedup_blocks": "block dedup (hot first block in 30% of docs)",
    "pipe_dedup_canonical": "canonicalization (minhash clusters under hot prefix)",
}
SKEW_DST = "/tmp/scale_skew"

#: identical-docs stress (r7 verdict #2): ~30% of documents replaced by
#: ONE byte-identical boilerplate text — the pathological LSH bucket
#: (every band / every pigeonhole block collides) that the
#: count-then-collect rework in candidate_pairs_from_groups must drop
#: at COUNT granularity, before any collect_set buffer materializes the
#: bucket's id array.  Output semantics are the documented cap
#: behavior: the boilerplate bucket exceeds MAX_BUCKET, so its pairs
#: are deliberately not emitted (a key shared by 30% of the corpus
#: carries no discriminating signal).
IDENT_TEXT = (
    "this website uses cookies to ensure you get the best experience "
    "on our website by continuing to browse the site you are agreeing "
    "to our use of cookies and our terms of service please review our "
    "privacy policy for details about how we collect and process data"
)
IDENT_QUERIES = {
    "pipe_dedup_minhash": "MinHash+LSH (all 16 bands collide on 30% of docs)",
    "pipe_dedup_simhash": "SimHash pigeonhole (all 4 blocks collide on 30% of docs)",
}
IDENT_DST = "/tmp/scale_ident"

#: 100× spot-check (r6 verdict #8): validate that the 10× amortization
#: story extrapolates — documents-only replicas at 100× (~sf10).
X100_QUERIES = {
    "pipe_dedup_substring": "substring-span dedup",
    "pipe_dedup_minhash": "MinHash+LSH dedup",
    "pipe_budget_select": "token-budget selection",
    # r8 verdict #6: the crawl front-end is new and had only 10× evidence
    "pipe_crawl_extract": "crawl front-end (WARC→HTTP→HTML→text)",
    # r9: the crawl-image integration row rides the same fixture
    "pipe_crawl_images": "crawl-image path (WARC→HTTP→image decode)",
    # r9 verdict #6: the MP3 frame-header walk had only 10× evidence
    "pipe_multimodal_audio": "MP3 frame-header walk (ID3 skip + ISO 11172-3)",
    # r10: the VP8L round-trip row rides the same documents fixture
    "pipe_multimodal_webp": "WebP VP8L encode+decode round-trip (narrow map)",
    # r11: the encoded-crawl and animation rows ride the same fixture
    "pipe_crawl_encoded": "crawl wire codings (chunked + gzip/deflate/br/zstd)",
    "pipe_multimodal_anim": "animated GIF/WebP mux+demux+composition",
    # r11 (second batch): the document-ingestion newcomers with real
    # per-row decode cost (exif/license are trivial maps)
    "pipe_pdf_extract": "PDF typeset+extract round-trip (COS/xref/text path)",
    "pipe_archive_ingest": "zip/tar archive explode (from-scratch readers)",
    "pipe_epub_extract": "EPUB books (demux + codegen strip + spine shuffle)",
    # r12 (r11 verdict Next #6): the composed code-dataset pipeline —
    # the one new row with a SHUFFLE in its family (per-member rows
    # into one doc-keyed agg); expect archive-ingest-dominated wall
    "pipe_code_pipeline": "code pipeline (tar.gz repos → license gate → repo agg)",
    # r12-born heavy families: iterative graph rank (per-iteration
    # shuffles over a FIXED-size host table — wall should grow far
    # below data), OOXML decode, EBML walk, chunk-dedup shuffles
    "pipe_host_rank": "host PageRank (3 fixed-point iterations, broadcast ranks)",
    "pipe_office_extract": "DOCX/XLSX build+extract round-trip (zip+XML)",
    "pipe_video_mkv": "Matroska metadata walk (EBML VINT parse)",
    "pipe_cdc_dedup": "content-defined chunk dedup (hash-keyed shuffles)",
}
X100_DST = "/tmp/scale_sf10"
X100_REPLICAS = 100

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


def replace_section(text: str, header: str, block: str) -> str:
    """Rewrite only `header`'s section (to the next '## ' or EOF);
    insert before '## Methodology' (or append) if absent."""
    i = text.find(header)
    if i >= 0:
        j = text.find("\n## ", i + len(header))
        end = len(text) if j < 0 else j + 1
        return text[:i] + block + text[end:]
    k = text.find("## Methodology")
    if k >= 0:
        return text[:k] + block + "\n" + text[k:]
    return text + "\n" + block


def build_skew_docs(spark, src_docs: str, dst_dir: str) -> None:
    """documents with HOT_PREFIX prepended to doc_id % 10 < 3 (~30%)."""
    from pyspark.sql import functions as F

    dst = Path(dst_dir)
    if dst.exists():
        shutil.rmtree(dst)
    dst.mkdir(parents=True)
    docs = spark.read.parquet(src_docs)
    out = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 < 3,
            F.concat(F.lit(HOT_PREFIX + " "), F.coalesce(F.col("text"), F.lit(""))),
        ).otherwise(F.col("text")),
    )
    out.write.mode("overwrite").parquet(f"{dst_dir}/documents.parquet")


def build_ident_docs(spark, src_docs: str, dst_dir: str) -> None:
    """documents with text REPLACED by IDENT_TEXT for doc_id % 10 < 3
    (~30% byte-identical docs — one giant every-band LSH bucket)."""
    from pyspark.sql import functions as F

    dst = Path(dst_dir)
    if dst.exists():
        shutil.rmtree(dst)
    dst.mkdir(parents=True)
    docs = spark.read.parquet(src_docs)
    out = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 10 < 3, F.lit(IDENT_TEXT)).otherwise(
            F.col("text")
        ),
    )
    out.write.mode("overwrite").parquet(f"{dst_dir}/documents.parquet")


def run_skew(spark) -> None:
    """Skew stress: the three agg+join-back dedup families on the
    uniform ~sf1 corpus vs the same corpus with one hot shingle/block
    in 30% of docs.  Bar (r6 verdict #6): skew ≤ 2× uniform."""
    if not Path(f"{DST}/documents.parquet").exists():
        build_replicas(spark)
    build_skew_docs(spark, f"{DST}/documents.parquet", SKEW_DST)
    build_ident_docs(spark, f"{DST}/documents.parquet", IDENT_DST)
    uni: dict[str, float] = {}
    skw: dict[str, float] = {}
    for rnd in range(2):
        for name in SKEW_QUERIES:
            u = time_one(spark, DST, name)
            s = time_one(spark, SKEW_DST, name)
            uni[name] = round(min(uni.get(name, u), u), 3)
            skw[name] = round(min(skw.get(name, s), s), 3)
            print(f"  pass{rnd} {name}: uniform {u:.2f}s  skew {s:.2f}s", flush=True)
        for name in IDENT_QUERIES:
            u = time_one(spark, DST, name)
            s = time_one(spark, IDENT_DST, name)
            uni[name] = round(min(uni.get(name, u), u), 3)
            skw[name] = round(min(skw.get(name, s), s), 3)
            print(f"  pass{rnd} {name}: uniform {u:.2f}s  ident {s:.2f}s", flush=True)
    lines = [
        "## Skew stress (tools/scale_smoke.py --skew)\n\n",
        f"~sf1 uniform corpus vs the same corpus with ONE hot 8-token prefix\n"
        f"(= one full block / one full k=8 shingle) on ~30% of documents —\n"
        f"the Zipf-boilerplate case the r6 agg+join-back rework claims the\n"
        f"map-side combine + AQE skew-split absorb.  Bar: skew ≤ 2× uniform.\n\n"
        f"Fixture finding (round 7): the FIRST run of this fixture caught a\n"
        f"real flaw — MAX_SHINGLE_DF was 100k, a no-op even on the skewed\n"
        f"60k-doc corpus, so the canonicalization pipeline's Jaccard pair\n"
        f"generation ground one df=18k boilerplate shingle into ~160M\n"
        f"candidate pairs (13s → 304s).  The cap is now 10k (still a strict\n"
        f"no-op at every oracle SF): the boilerplate shingle is dropped\n"
        f"outright, and the numbers below are the post-fix re-measure.\n\n",
        "| query | family | uniform s | skew s | skew/uniform |\n|---|---|---|---|---|\n",
    ]
    for name, fam in SKEW_QUERIES.items():
        r = round(skw[name] / uni[name], 2) if uni[name] > 0 else float("nan")
        flag = "" if r <= 2.0 else " ⚠"
        lines.append(f"| {name} | {fam} | {uni[name]} | {skw[name]} | {r}×{flag} |\n")
    lines.append(
        "\n### Identical-docs stress (round 8)\n\n"
        "Same uniform corpus vs ~30% of documents replaced by ONE\n"
        "byte-identical boilerplate text: the pathological LSH bucket where\n"
        "EVERY minhash band / EVERY simhash pigeonhole block collides on\n"
        "~30% of the corpus.  Exercises the r8 count-then-collect rework in\n"
        "candidate_pairs_from_groups — the over-cap bucket is dropped from a\n"
        "(key, count) aggregate before any collect_set id array exists, so\n"
        "no single aggregation buffer ever holds the 30%-of-corpus id list.\n"
        "Bar: ident ≤ 2× uniform.  (Round 9 re-attributed simhash's absolute\n"
        "cost: the 64 per-bit aggregate sums were REPLACED by 16 packed-lane\n"
        "sums — 4 bit-position counts in the 16-bit lanes of one BIGINT via\n"
        "sum((h >>> j) & 0x0001000100010001), majority tests on the\n"
        "aggregated per-DOC row, signatures bit-identical — but a direct A/B\n"
        "showed the signature aggregation was never the bottleneck: old form\n"
        "~1.3-2.8s, packed form ~1.2-1.4s on this ~sf1 corpus (both warm).\n"
        "The ~40-50s total is the PAIR stage and it is output-volume-bound:\n"
        "3.5M verified hamming<=3 pairs (~70/doc — the synthetic corpus is\n"
        "near-dup dense), so the wall tracks true output size, which no\n"
        "operator rework can shrink.  The packed form is kept: 17 vs 65\n"
        "aggregation buffers per group cuts per-doc hash-agg state ~4x.)\n\n"
        "| query | family | uniform s | ident s | ident/uniform |\n|---|---|---|---|---|\n"
    )
    for name, fam in IDENT_QUERIES.items():
        r = round(skw[name] / uni[name], 2) if uni[name] > 0 else float("nan")
        flag = "" if r <= 2.0 else " ⚠"
        lines.append(f"| {name} | {fam} | {uni[name]} | {skw[name]} | {r}×{flag} |\n")
    lines.append("\n")
    _patch_scale("## Skew stress", "".join(lines))
    print(json.dumps({"uniform": uni, "skew": skw}))


SEMDEDUP30_DST = "/tmp/scale_semdedup30"
SEMDEDUP30_REPLICAS = 30


def run_semdedup30(spark) -> None:
    """Θ(N^1.5) pin (r7 verdict #7): pipe_semdedup_auto at 30×
    embeddings replicas.  The √N cell rule makes total work
    (assignment + within-cell pairs) ~N^1.5 by design, so the honest
    bar at 30× data is 30^1.5 ≈ 164× wall — expected far below as
    fixed overhead amortizes.  Replica methodology matches the main
    10× smoke (vec_id offsets, vectors unperturbed)."""
    from pyspark.sql import functions as F

    dst = Path(SEMDEDUP30_DST)
    if dst.exists():
        shutil.rmtree(dst)
    dst.mkdir(parents=True)
    base = spark.read.parquet(f"{SRC}/embeddings.parquet")
    off = int(base.agg(F.max("vec_id")).collect()[0][0]) + 1
    parts = [
        base.withColumn("vec_id", F.col("vec_id") + F.lit(i * off))
        for i in range(SEMDEDUP30_REPLICAS)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{SEMDEDUP30_DST}/embeddings.parquet"
    )
    print(f"replicated embeddings: {SEMDEDUP30_REPLICAS}x", flush=True)
    small: float | None = None
    big: float | None = None
    for rnd in range(2):
        s = time_one(spark, SRC, "pipe_semdedup_auto")
        b = time_one(spark, SEMDEDUP30_DST, "pipe_semdedup_auto")
        small = round(min(small, s), 3) if small is not None else round(s, 3)
        big = round(min(big, b), 3) if big is not None else round(b, 3)
        print(f"  pass{rnd} pipe_semdedup_auto: sf0.1 {s:.2f}s  30x {b:.2f}s", flush=True)
    ratio = round(big / small, 1)
    flag = "" if ratio <= 164 else " ⚠"
    block = (
        "## Θ(N^1.5) pin (tools/scale_smoke.py --semdedup30)\n\n"
        "pipe_semdedup_auto at 30× embeddings replicas (same replica\n"
        "methodology as the main smoke).  The √N cell rule sets total work\n"
        "— centroid assignment plus within-cell pair scans — at ~N^1.5 BY\n"
        "THE PAPER'S DESIGN, so the honest bar at 30× data is 30^1.5 ≈ 164×\n"
        "wall; a ratio far below it means the implementation carries no\n"
        "hidden super-N^1.5 term (and fixed overhead still amortizes).\n\n"
        "| query | sf0.1 s | 30× s | ratio (bar 164×) |\n|---|---|---|---|\n"
        f"| pipe_semdedup_auto | {small} | {big} | {ratio}×{flag} |\n\n"
    )
    _patch_scale("## Θ(N^1.5) pin", block)
    print(json.dumps({"small": small, "big": big, "ratio": ratio}))


def build_x100_docs(spark) -> None:
    from pyspark.sql import functions as F

    dst = Path(X100_DST)
    if dst.exists():
        shutil.rmtree(dst)
    dst.mkdir(parents=True)
    base = spark.read.parquet(f"{SRC}/documents.parquet")
    off = int(base.agg(F.max("doc_id")).collect()[0][0]) + 1
    parts = []
    for i in range(X100_REPLICAS):
        r = base.withColumn("doc_id", F.col("doc_id") + F.lit(i * off))
        if i > 0:  # disjoint shingle shards — the 10× builder's rule
            r = r.withColumn("text", F.regexp_replace("text", "(^| )", f"$1r{i}x"))
        parts.append(r)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    out.repartition(64).write.mode("overwrite").parquet(
        f"{X100_DST}/documents.parquet"
    )
    print(f"replicated documents: {X100_REPLICAS}x", flush=True)


def run_x100(spark) -> None:
    """100× spot-check: three representative families at ~sf10 —
    validates the 10× amortization story extrapolates (bar: wall
    ratio ≤ 100 = the data ratio)."""
    build_x100_docs(spark)
    time.sleep(5)
    small: dict[str, float] = {}
    big: dict[str, float] = {}
    for rnd in range(2):
        for name in X100_QUERIES:
            s = time_one(spark, SRC, name)
            b = time_one(spark, X100_DST, name)
            small[name] = round(min(small.get(name, s), s), 3)
            big[name] = round(min(big.get(name, b), b), 3)
            print(f"  pass{rnd} {name}: sf0.1 {s:.2f}s  ~sf10 {b:.2f}s", flush=True)
    lines = [
        "## 100× spot-check (tools/scale_smoke.py --x100)\n\n",
        "sf0.1 → 100× documents replicas (~sf10, disjoint shingle shards,\n"
        "min-of-2 temporally-spread passes).  Bar: wall ratio ≤ 100 (the\n"
        "data ratio) — fixed overhead keeps amortizing, so healthy rows\n"
        "land far below it.\n\n",
        "| query | family | sf0.1 s | ~sf10 s | ratio (data=100×) |\n|---|---|---|---|---|\n",
    ]
    for name, fam in X100_QUERIES.items():
        r = round(big[name] / small[name], 1) if small[name] > 0 else float("nan")
        flag = "" if r <= 100 else " ⚠"
        lines.append(f"| {name} | {fam} | {small[name]} | {big[name]} | {r}×{flag} |\n")
    lines.append("\n")
    _patch_scale("## 100× spot-check", "".join(lines))
    print(json.dumps({"small": small, "big": big}))


def _patch_scale(header: str, block: str) -> None:
    out_path = REPO / "SCALE.md"
    prior = out_path.read_text() if out_path.exists() else ""
    out_path.write_text(replace_section(prior, header, block))
    print(f"wrote SCALE.md section {header!r}")


def main() -> None:
    from impala_cut_spark.session import build_session

    spark = build_session(app_name="scale-smoke", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    if "--skew" in sys.argv:
        run_skew(spark)
        return
    if "--x100" in sys.argv:
        run_x100(spark)
        return
    if "--semdedup30" in sys.argv:
        run_semdedup30(spark)
        return

    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")
    if only and Path(f"{DST}/documents.parquet").exists():
        pass  # reuse the standing replicas for a row-patch run
    else:
        build_replicas(spark)
        time.sleep(10)  # let replica-write writeback settle before timing
    names = [n for n in SMOKE if n in only] if only else list(SMOKE)
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

    if only:
        # row-patch mode: replace (or append before the table's end)
        # just the measured rows, leaving the rest of the table intact
        out_path = REPO / "SCALE.md"
        text = out_path.read_text()
        for name, fam, s, b, r in rows:
            flag = "" if r <= 12 else " ⚠"
            mark = " †" if name in NOTES else ""
            new_line = f"| {name}{mark} | {fam} | {s} | {b} | {r}×{flag} |"
            old_start = f"| {name} "
            alt_start = f"| {name} †"
            lines_ = text.splitlines()
            hit = None
            for i, ln in enumerate(lines_):
                if ln.startswith(old_start) or ln.startswith(alt_start):
                    hit = i
                    break
            if hit is not None:
                lines_[hit] = new_line
            else:  # append after the last 10×-table row
                last = max(
                    i for i, ln in enumerate(lines_)
                    if ln.startswith("| ") and "ratio" not in ln
                    and i < lines_.index("### Notes")
                )
                lines_.insert(last + 1, new_line)
            text = "\n".join(lines_) + ("\n" if text.endswith("\n") else "")
        out_path.write_text(text)
        print(json.dumps({"small": small, "big": big}))
        print("patched SCALE.md rows")
        return

    lines = [
        "# SCALE — 10× growth smoke (tools/scale_smoke.py)\n",
        f"\nsf0.1 → {REPLICAS}× replicas (~sf1), local[32], per-(query, scale) min over two temporally-spread passes.",
        "\nLinear-at-scale bar: wall ratio ≤ ~10 (fixed per-query overhead",
        " amortizes, so healthy ratios are usually BELOW the data ratio).",
        "\nRows marked † carry a root-cause note below the table.\n",
        "\n| query | family | sf0.1 s | ~sf1 s | ratio (data=10×) |\n|---|---|---|---|---|\n",
    ]
    for name, fam, s, b, r in rows:
        flag = "" if r <= 12 else " ⚠"
        mark = " †" if name in NOTES else ""
        lines.append(f"| {name}{mark} | {fam} | {s} | {b} | {r}×{flag} |\n")
    lines.append("\n### Notes\n\n")
    for name, note in NOTES.items():
        lines.append(f"- **{name}** — {note}\n")
    lines.append("\n")
    out_path = REPO / "SCALE.md"
    prior = out_path.read_text() if out_path.exists() else ""
    # section-aware rewrite: the main block spans from the top to the
    # first preserved section ('## Skew stress' / '## 100× spot-check'
    # / '## Methodology'); everything after survives
    cut = len(prior)
    for h in ("## Skew stress", "## 100× spot-check", "## Methodology"):
        i = prior.find(h)
        if i >= 0:
            cut = min(cut, i)
    out_path.write_text("".join(lines) + ("\n" + prior[cut:] if cut < len(prior) else ""))
    print(json.dumps({"small": small, "big": big}))
    print("wrote SCALE.md")


if __name__ == "__main__":
    main()
