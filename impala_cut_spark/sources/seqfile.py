"""SequenceFile text scanner/writer (SURVEY §2.1 "skip-or" row).

The reference reads Hive's classic text-in-SequenceFile layout with a
dedicated scanner (``/root/reference/be/src/exec/hdfs-sequence-scanner.cc``
— record-oriented Writable container, each value one delimited text
row; its second-most-exercised scan format in
``tests/query_test/test_scanners_all_table_formats.py``).  Spark has
no DataFrame reader for it, but the public Hadoop-RDD API does:
``sc.sequenceFile`` materializes (key, value) pairs through the real
Hadoop ``SequenceFile.Reader`` — splittable, codec-aware (a
block-compressed file decompresses transparently), executor-side.

The DataFrame bridge parses each text value with ``F.from_csv`` — the
same JVM CSV parser, delimiter/escape/``\\N``-null semantics as the
text scanner (sources/sinks.py read_text_table), so a table stored as
SequenceFile and the same table stored as plain text parse
identically.

Scale note: the rows cross Python once (Pyrolite pair deserialization
— the documented cost of the legacy-format path); everything after
``toDF`` is JVM-side, and the scan itself is split-parallel like any
Hadoop input. For hot data, convert once to parquet (the reference
gives the same guidance for its legacy formats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NULL = "\\N"  # text-converter.inline.h:41 null sentinel


def write_sequencefile_text(
    df: DataFrame,
    path: str,
    sep: str = ",",
    escape: str = "\\",
    codec: str | None = None,
) -> None:
    """Write ``df`` as a text-payload SequenceFile: key = a meaningless
    record number (Hive writes row offsets; readers ignore it), value =
    the ``\\N``-null delimited rendering of the row — byte-compatible
    with what read_text_table parses.  ``codec``: a Hadoop codec class
    name (e.g. ``org.apache.hadoop.io.compress.SnappyCodec``) for a
    record-compressed file — the reference's scanner matrix compression
    axis (snap/block, def/block, gzip)."""
    line = F.to_csv(
        # to_csv gives the SAME quoting/escape rules from_csv expects;
        # whitespace preservation is the reference's text-writer rule
        # (sinks.py write_text_table — Spark's csv writer trims both
        # ends by default)
        F.struct(*df.columns),
        {
            "sep": sep,
            "escape": escape,
            "nullValue": _NULL,
            "ignoreLeadingWhiteSpace": "false",
            "ignoreTrailingWhiteSpace": "false",
        },
    )
    lines = df.select(line.alias("line"))
    pairs = lines.rdd.map(lambda r: (0, r.line))
    pairs.saveAsSequenceFile(path, compressionCodecClass=codec)


def read_sequencefile_text(
    spark: SparkSession,
    path: str,
    schema: str,
    sep: str = ",",
    escape: str = "\\",
) -> DataFrame:
    """Scan a text-payload SequenceFile into a DataFrame with
    ``schema`` (DDL string), hdfs-sequence-scanner.cc parity: keys are
    discarded, each value parses as one delimited text row with the
    ``\\N`` null sentinel."""
    rdd = spark.sparkContext.sequenceFile(path).map(lambda kv: (kv[1],))
    lines = spark.createDataFrame(rdd, "line string")
    parsed = lines.select(
        F.from_csv(
            F.col("line"),
            schema,
            {"sep": sep, "escape": escape, "nullValue": _NULL},
        ).alias("r")
    )
    return parsed.select("r.*")
