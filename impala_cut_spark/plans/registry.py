"""Central query registry.

Each entry pairs a Spark DataFrame builder with (where SQL-expressible)
a DuckDB oracle SQL string — the correctness contract of the driver
(CORRECTNESS_r{N}.json) and of tests/test_correctness.py.

Cross-engine determinism rules (every query must obey):
- money/quantity aggregates: cast to exact DECIMAL before SUM; convert
  to DOUBLE only at the very end (identical value → identical hash).
- AVG: never the builtin (engine FP accumulation order differs) —
  always exact decimal SUM / COUNT in both engines.
- LIMIT/top-k: always a deterministic total tiebreak order.
- timestamps: compare/emit at µs precision (events ns truncated on
  scan in both engines) or cast to DATE.
- column names identical on both sides (driver sorts by name).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, None → rows-only check
    headline: bool = False  # include in bench.py
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, headline: bool = False):
    """Decorator registering fn(spark, sf_dir) -> DataFrame."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(
            name=name, spark=fn, oracle=oracle, headline=headline, doc=fn.__doc__ or ""
        )
        return fn

    return deco
