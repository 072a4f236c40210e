"""User-defined function surface (SURVEY.md §2.10).

The reference supports native C++ UDFs/UDAs loaded from HDFS
(``/root/reference/be/src/udf/udf.h`` FunctionContext/AnyVal ABI,
``be/src/exprs/native-udf-expr.h``, lib-cache) plus Hive Java UDFs
(``be/src/exprs/hive-udf-call.h``), with
``CREATE [AGGREGATE] FUNCTION … SYMBOL=…`` DDL
(``fe/src/main/cup/sql-parser.y:686-710``).

The Spark-native equivalents registered here:

- scalar Python UDF  → ``create_function`` (Arrow-optimized when the
  session enables it; row-at-a-time Python otherwise)
- vectorized scalar  → ``create_function(..., vectorized=True)``
  (pandas_udf: Arrow batches, the 10-100× path — use for hot loops)
- UDA                → ``create_aggregate_function`` (pandas GROUPED_AGG:
  the init/update/merge/serialize/finalize state machine of
  agg-fn-evaluator.h collapses to a whole-partition reduce + Spark's
  partial/final merge)
- Hive Java UDF jars → ``create_java_function``
  (spark.udf.registerJavaFunction — native in Spark)

Scale: Python UDFs serialize batches across the JVM↔Python boundary —
always prefer builtins; when unavoidable, vectorized=True keeps the
transfer Arrow-batched. A UDF registered here is shipped to executors
by Spark (the reference's lib-cache equivalent is the Spark artifact
distribution machinery — not rebuilt).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession

#: registry of function name → kind (mirrors SHOW FUNCTIONS)
_created: dict[str, str] = {}


def create_function(
    spark: SparkSession,
    name: str,
    fn: Callable,
    return_type: str,
    vectorized: bool = False,
) -> None:
    """CREATE FUNCTION name(...) — scalar UDF.

    ``vectorized=True`` registers a pandas_udf (fn takes/returns
    pandas.Series) — Arrow-batched, the production path for per-row
    Python logic.
    """
    if vectorized:
        from pyspark.sql.functions import pandas_udf

        spark.udf.register(name, pandas_udf(fn, return_type))
    else:
        spark.udf.register(name, fn, return_type)
    _created[name.lower()] = "scalar"


def create_aggregate_function(
    spark: SparkSession,
    name: str,
    fn: Callable,
    return_type: str,
) -> None:
    """CREATE AGGREGATE FUNCTION — UDA via pandas GROUPED_AGG.

    ``fn`` receives one pandas.Series per argument covering a whole
    group and returns the aggregate scalar; Spark handles the
    partial/merge phases (agg-fn-evaluator.h's Update/Merge/Finalize
    split is internal to the GROUPED_AGG execution).
    """
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    spark.udf.register(name, pandas_udf(fn, return_type, PandasUDFType.GROUPED_AGG))
    _created[name.lower()] = "aggregate"


def create_java_function(
    spark: SparkSession, name: str, class_name: str, return_type: str | None = None
) -> None:
    """Hive Java UDF (hive-udf-call.h parity) — the jar must be on the
    session classpath (``spark.jars``)."""
    spark.udf.registerJavaFunction(name, class_name, return_type)
    _created[name.lower()] = "java"


def drop_function(spark: SparkSession, name: str) -> None:
    """DROP FUNCTION (sql-parser.y:934-940). Spark has no unregister —
    we rebind the name to a poison function that raises, and drop it
    from SHOW FUNCTIONS."""
    kind = _created.pop(name.lower(), None)
    if kind is None:
        raise ValueError(f"function {name!r} was not created by this surface")

    def _dropped(*_args):
        raise RuntimeError(f"function {name!r} has been dropped")

    spark.udf.register(name, _dropped, "string")


def show_functions() -> dict[str, str]:
    """SHOW FUNCTIONS over the user-created set (builtins live in
    Spark's own registry — ``spark.catalog.listFunctions``)."""
    return dict(_created)
