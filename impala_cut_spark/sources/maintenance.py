"""Table-maintenance operators: small-file compaction and clustered
(sort-ordered) rewrites.

Neither exists in the reference (its 2013-era surface predates file
compaction DDL), but both are table-stakes for the 100 TB pipelines
this engine targets: streaming ingests and dynamic-partition inserts
produce small files that throttle scans (one task per tiny file,
footer overhead per file), and unclustered data defeats parquet
row-group min/max pruning.  Both are expressed as plain Spark
write-side plans — no custom machinery.

- ``compact_small_files``: rewrite a parquet directory into
  ~target-sized files.  File count = ceil(bytes/target) from the real
  on-disk size; the rewrite uses ``repartition(n)`` (round-robin,
  even output sizes).  At cluster scale the same rewrite is what
  OPTIMIZE/rewrite_data_files jobs do per partition.
- ``clustered_write``: range-repartition + in-partition sort on the
  cluster columns before writing, so each parquet row group covers a
  NARROW slice of the cluster key — readers filtering on that key
  skip whole row groups/files via min/max stats.  The effect is
  measured, not assumed: tests compute per-row-group key spans from
  the parquet footers and assert clustering tightens them.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def dir_parquet_bytes(path: str) -> int:
    """Total bytes of parquet data files under ``path`` (driver-side
    metadata walk — no data read)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def parquet_file_count(path: str) -> int:
    return sum(
        1
        for _root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def compact_small_files(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite the parquet table at ``path`` into ``out_path`` with
    ~``target_bytes`` files; returns the chosen file count.

    Sizing reads only file-system metadata.  ``repartition`` (not
    ``coalesce``) so output files are EVEN — coalesce concatenates
    input partitions and reproduces the skew that made the files small
    in the first place.
    """
    n = max(1, math.ceil(dir_parquet_bytes(path) / target_bytes))
    spark.read.parquet(path).repartition(n).write.mode("overwrite").parquet(out_path)
    return n


def clustered_write(df: DataFrame, path: str, cluster_cols: list[str], n_files: int | None = None) -> None:
    """Write ``df`` clustered on ``cluster_cols``: range-partitioned
    across files AND sorted within each, so row-group min/max spans on
    the cluster key are narrow and disjoint — the layout that makes
    parquet predicate pushdown actually skip IO.
    """
    cols = [df[c] for c in cluster_cols]
    part = df.repartitionByRange(*(([n_files] if n_files else []) + cols))
    part.sortWithinPartitions(*cols).write.mode("overwrite").parquet(path)


def rowgroup_spans(path: str, column: str) -> list[tuple[float, float]]:
    """(min, max) of ``column`` for every row group under ``path`` —
    read from parquet FOOTERS only.  The measurement tool for
    clustered_write's claim (and a useful audit for any table)."""
    import pyarrow.parquet as pq

    spans: list[tuple[float, float]] = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            ci = names[column]
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(ci).statistics
                if st is not None and st.has_min_max:
                    spans.append((st.min, st.max))
    return spans
