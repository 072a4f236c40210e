"""impala_cut_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of rampage644/impala-cut (early Apache Impala).

Architecture (SURVEY.md §7): one thin Python layer over Spark SQL.

- ``session``   — SparkSession bootstrap with scale-oriented defaults
                  (AQE, broadcast thresholds, pushdown, UTC).
- ``dialect``   — small Impala-SQL → Spark-SQL rewrite layer (hints,
                  DIV, function renames, default null ordering).
- ``functions`` — compat function registry (Impala builtins Spark lacks
                  or renames), registered as inlined SQL UDFs where
                  possible so they stay JVM-side and codegen-friendly.
- ``sources``   — table catalog over parquet/text/avro + insert/CTAS
                  write paths mirroring HdfsTableSink semantics.
- ``plans``     — query library: TPC-H-style and functional-coverage
                  queries used for correctness + bench.
- ``operators`` — data-pipeline operators beyond the reference surface:
                  dedup (exact/minhash/simhash/jaccard/embedding),
                  similarity search, text analysis, multimodal plumbing.
- ``streaming`` — Structured Streaming surface (absent in the
                  reference, provided as engine extension).

Everything query-shaped is expressed with the DataFrame/SQL API so
Catalyst owns optimization; no custom physical operators.
"""

from impala_cut_spark.session import build_session, ImpalaSession

__all__ = ["build_session", "ImpalaSession"]
__version__ = "0.1.0"
