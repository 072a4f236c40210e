"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``    — flagship query (TPC-H Q1 shape) at sf0.001.
- ``queries()``       — every implemented operator/query from
                        SURVEY.md §2 + the pipeline extensions
                        (impala_cut_spark/plans/*).
- ``oracle_sql()``    — DuckDB-equivalent SQL per query where the
                        semantics are SQL-expressible; hash-compared
                        by the driver at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registry():
    from impala_cut_spark.plans import REGISTRY

    return REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from impala_cut_spark.functions.registry import register_all

    register_all(spark)
    return _registry()["tpch_q1"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark for name, spec in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each SQL-expressible query."""
    return {
        name: spec.oracle for name, spec in _registry().items() if spec.oracle is not None
    }
