"""Query library: every entry feeds __spark_entry__.queries()/oracle_sql().

Import side effect: importing the submodules populates the REGISTRY.
"""

from impala_cut_spark.plans.registry import REGISTRY, QuerySpec, query

from impala_cut_spark.plans import tpch  # noqa: E402,F401
from impala_cut_spark.plans import tpch2  # noqa: E402,F401
from impala_cut_spark.plans import coverage  # noqa: E402,F401
from impala_cut_spark.plans import pipeline  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "query"]
