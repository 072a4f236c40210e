"""Maintenance rewrites (sources/maintenance.py): compaction file
sizing and the measured row-group-pruning effect of clustered writes."""

from __future__ import annotations

from pyspark.sql import functions as F

from impala_cut_spark.sources.catalog import load_table
from impala_cut_spark.sources.maintenance import (
    clustered_write,
    compact_small_files,
    dir_parquet_bytes,
    parquet_file_count,
    rowgroup_spans,
)


def test_compaction_merges_small_files(spark, sf_dir, tmp_path):
    src = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(40).write.parquet(src)  # simulate a streaming ingest
    assert parquet_file_count(src) == 40
    n = compact_small_files(spark, src, out, target_bytes=dir_parquet_bytes(src) // 3)
    assert n == 3
    assert parquet_file_count(out) == 3
    # lossless: same rows
    assert spark.read.parquet(out).count() == ev.count()
    # even: no output file dominates (repartition round-robins)
    import os

    sizes = sorted(
        os.path.getsize(os.path.join(out, f))
        for f in os.listdir(out)
        if f.endswith(".parquet")
    )
    assert sizes[-1] < 2 * sizes[0], sizes


def test_clustered_write_tightens_rowgroup_spans(spark, sf_dir, tmp_path):
    """The point of clustering, measured from parquet footers: total
    per-row-group key span shrinks by >5× vs the unclustered layout,
    so a key-range filter can skip most row groups."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    un = str(tmp_path / "unclustered")
    cl = str(tmp_path / "clustered")
    ev.repartition(8).write.parquet(un)  # hash-scattered: every file spans everything
    clustered_write(ev, cl, ["user_id"], n_files=8)
    span = lambda ss: sum(hi - lo for lo, hi in ss)
    s_un, s_cl = span(rowgroup_spans(un, "user_id")), span(rowgroup_spans(cl, "user_id"))
    assert s_cl * 5 < s_un, (s_cl, s_un)
    assert spark.read.parquet(cl).count() == ev.count()


def test_clustered_table_scan_prunes_io(spark, sf_dir, tmp_path):
    """End-to-end: a range filter over the clustered table reads fewer
    parquet row groups than over the scattered one (numOutputRows of
    the scan after row-group pruning differ; exact pruning is a
    parquet-reader metric, so assert via the footer spans overlapping
    the predicate instead — deterministic and reader-independent)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    cl = str(tmp_path / "clustered2")
    clustered_write(ev, cl, ["user_id"], n_files=8)
    allg = rowgroup_spans(cl, "user_id")
    dom_lo = min(a for a, _ in allg)
    dom_hi = max(b for _, b in allg)
    # a ~5%-of-domain range predicate
    lo = dom_lo
    hi = dom_lo + max(1, (dom_hi - dom_lo) // 20)
    touched = [(a, b) for a, b in allg if not (b < lo or a > hi)]
    assert len(touched) <= max(1, len(allg) // 4), (len(touched), len(allg))
    got = spark.read.parquet(cl).filter(
        (F.col("user_id") >= lo) & (F.col("user_id") <= hi)
    )
    want = ev.filter((F.col("user_id") >= lo) & (F.col("user_id") <= hi))
    assert got.count() == want.count()
