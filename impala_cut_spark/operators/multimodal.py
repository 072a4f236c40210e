"""Multimodal-column plumbing: opaque ``binary`` payloads + typed metadata.

The container has no image/audio codecs, so DECODE IS STUBBED
(``decode_image`` raises NotImplementedError; ``fake_features`` is the
deterministic stand-in) — but the Spark-side plumbing is real and
tested: schema, Arrow batch shape, mapInPandas signatures, and the
partitioning story all match what a production decode would use.

Scale: payloads stay in the executor as Arrow binary buffers; the
feature extractor is a mapInPandas over size-bounded batches
(spark.sql.execution.arrow.maxRecordsPerBatch) so one huge image
can't blow a batch. Metadata-only predicates prune before any decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from impala_cut_spark.partitioning import fan_out

#: schema of a multimodal asset table
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Fabricate a deterministic asset table from documents: the utf-8
    text bytes stand in for an encoded media payload."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("doc_id") % 3 + 1).cast("int")).alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        (F.col("n_chars") % 640).cast("int").alias("width"),
        (F.col("n_chars") % 480).cast("int").alias("height"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """Real decode requires PIL/libjpeg — not in this container."""
    raise NotImplementedError(
        "image decode stub: install pillow and replace with PIL.Image.open"
    )


def fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for an embedding/feature extractor:
    bucketed byte histogram, L1-normalized."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
    total = hist.sum()
    return (hist / total if total else hist.astype(np.float64)).astype(np.float64)


def extract_features(assets: DataFrame) -> DataFrame:
    """mapInPandas feature extraction — the production shape: Arrow
    batches in, one feature row per asset out, no driver involvement."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_features(p if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "features": [f.tolist() for f in feats],
                }
            )

    return fan_out(assets).mapInPandas(_extract, FEATURE_SCHEMA)


def resize_stub(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes payloads through a mapInPandas stage and
    rewrites metadata. The pixel work is the documented stub."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["width"] = np.int32(width)
            out["height"] = np.int32(height)
            yield out

    return assets.mapInPandas(_resize, ASSET_SCHEMA)
