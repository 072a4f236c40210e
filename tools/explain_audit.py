"""Generate PLANS.md: executed physical plans for the headline queries
with the scale-relevant lines highlighted.

Usage: python tools/explain_audit.py [sf_dir]

For each headline query (plus the pipeline scale paths) this runs the
query at the given SF, captures the AQE FINAL plan (post-execution),
and extracts the lines that answer the 100 TB questions: where are the
exchanges, which joins broadcast, did predicates reach the scan, where
does whole-stage codegen span. The full plans stay out of git — the
audit keeps the signal lines only.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

AUDIT = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q9",
    "tpch_q10",
    "tpch_q18",
    "tpch_q21",
    "cov_topn",
    "cov_events_daily",
    "pipe_dedup_exact",
    "pipe_dedup_jaccard",
    "pipe_dedup_minhash",
    "pipe_ann_topk",
    "pipe_ann_ivf",
    "pipe_embed_neardup",
    "tpcds_q3",
    "tpcds_q19",
    "tpcds_q42",
    "tpcds_q59",
    "tpcds_q65",
    "cov_join_all",
    "pipe_decontaminate",
    "pipe_pii_redact",
    "pipe_embed_quantize",
    "pipe_chunking",
    "pipe_doc_dedup_tokens",
    "pipe_ngram_topk",
    "pipe_events_json",
    "pipe_text_repetition",
    "pipe_mixture_sample",
    "pipe_multimodal_frames",
    "pipe_corpus_stats_approx",
    "pipe_corpus_pipeline",
    "perf_string_like",
    "perf_agg_types",
    "perf_grep_scan",
    "perf_web_revenue",
    "pipe_corpus_drift",
    "pipe_url_stats",
    "pipe_url_dedup",
    "pipe_dedup_substring",
    "pipe_quality_classifier",
    "pipe_epoch_shuffle",
    # round-6 additions
    "pipe_bigram_ppl",
    "pipe_snapshot_diff",
    "pipe_temperature_sample",
    "pipe_dedup_blocks",
    "pipe_score_zscore",
    "pipe_decontaminate_spans",
    "pipe_source_reputation",
    "pipe_decontaminate_clean",
    "pipe_benchmark_overlap",
    "pipe_ann_ivfpq_rerank",
    "pipe_tfidf_keywords",
    "pipe_dedup_canonical",
    "pipe_seq_chunks",
    # round-7 additions
    "pipe_semdedup_auto",
    "pipe_dsir_weights",
    "pipe_dup_block_share",
    "pipe_dedup_weights",
    "pipe_bm25",
    "tpch_q7",
    "tpcds_q34",
    "tpcds_q52",
    "tpcds_q96",
    # round-8 additions: the two-phase LSH cap rework (minhash +
    # simhash), the newly window-witnessed composition/novelty rows,
    # and the last never-seen TPC shape
    "pipe_dedup_simhash",
    "pipe_ann_recall",
    "pipe_ngram_novelty",
    "tpcds_q55",
    # round-11 additions: the rotated-in Tier-B cohort plus the two
    # rows whose plans changed this round (cov_text_exact grew the
    # multiline join arm; pipe_multimodal_webp repartitions before
    # the codec kernel)
    "pipe_asof",
    "pipe_sample_stratified",
    "pipe_split_hash",
    "pipe_pack_greedy",
    "tpcds_q7",
    "tpcds_q63",
    "cov_text_exact",
    "pipe_multimodal_webp",
    # second-r11 additions: the four rows born this round (encoded
    # crawl, animation composition, HEIF prune, PDF ingestion) — all
    # narrow maps whose audit proves the no-shuffle claim
    "pipe_crawl_encoded",
    "pipe_multimodal_anim",
    "pipe_multimodal_heif",
    "pipe_pdf_extract",
    "pipe_multimodal_exif",
    "pipe_archive_ingest",
    "pipe_license_detect",
    "pipe_audio_containers",
    "pipe_epub_extract",
    "pipe_markdown_extract",
    "pipe_code_pipeline",
    "pipe_html_meta",
    "pipe_subtitle_extract",
    # round-12 additions: the link-graph/PageRank pair (the audit
    # proves the edges-stay-put iteration shape), the crawl
    # politeness/discovery rows, Office/Matroska ingestion, CDC
    # dedup shuffles, and the frontier capstone composition
    "pipe_link_graph",
    "pipe_host_rank",
    "pipe_robots_gate",
    "pipe_sitemap_urls",
    "pipe_feed_extract",
    "pipe_office_extract",
    "pipe_video_mkv",
    "pipe_cdc_chunks",
    "pipe_cdc_dedup",
    "pipe_crawl_frontier",
]


def audit_names(registry) -> list[str]:
    """The hand-picked AUDIT list plus EVERY bench headliner (round-5
    verdict #3: a promoted headliner must never ship without a PLANS.md
    section again)."""
    extra = sorted(n for n, s in registry.items() if s.headline and n not in AUDIT)
    return AUDIT + extra

SIGNAL = re.compile(
    r"Join|Exchange|HashAggregate|TakeOrderedAndProject|Sort |FileScan|"
    r"InMemoryTableScan|Generate|Window|Expand|MapInPandas|ArrowEvalPython"
)


def signal_lines(plan: str, limit: int = 28) -> list[str]:
    out = []
    for line in plan.splitlines():
        if SIGNAL.search(line):
            clean = line.rstrip()
            # trim the very long expression dumps but keep operator + keys
            if len(clean) > 160:
                clean = clean[:157] + "..."
            # escape control bytes (the exact-text scan plans embed the
            # literal \x00 sentinel chars, which turn PLANS.md binary)
            clean = "".join(
                c if c == "\t" or ord(c) >= 32 else f"\\x{ord(c):02x}"
                for c in clean
            )
            out.append(clean)
        if len(out) >= limit:
            out.append("   ... (trimmed)")
            break
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from impala_cut_spark.plans import REGISTRY
    from impala_cut_spark.session import build_session

    spark = build_session(app_name="explain-audit", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    parts = [
        "# PLANS — executed physical plans (AQE final), signal lines only\n",
        f"\nGenerated by `tools/explain_audit.py` at `{sf_dir}` — regenerate after",
        " plan-affecting changes. Full `.explain('formatted')` available per",
        " query via `REGISTRY[name].spark(spark, sf).explain('formatted')`.\n",
    ]
    for name in audit_names(REGISTRY):
        spec = REGISTRY[name]
        df = spec.spark(spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
        n_ex = plan.count("Exchange hashpartitioning")
        n_bc = plan.count("BroadcastHashJoin")
        n_cg = len(set(re.findall(r"\*\((\d+)\)", plan)))
        parts.append(f"\n## {name}\n")
        parts.append(f"\nshuffles={n_ex} broadcast_joins={n_bc} codegen_spans={n_cg}\n\n```\n")
        parts.extend(l + "\n" for l in signal_lines(plan))
        parts.append("```\n")
    (REPO / "PLANS.md").write_text("".join(parts))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
