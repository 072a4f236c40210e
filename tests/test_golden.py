"""Run every golden ``.test`` case through the Impala-dialect surface.

Reference mechanism: ``/root/reference/tests/common/impala_test_suite.py:208``
(verify_raw_results) executing ``testdata/workloads/**/queries/*.test``.
"""

from __future__ import annotations

import pytest

from golden_runner import collect_cases, run_case

CASES = collect_cases()


@pytest.fixture(scope="module")
def isession(spark):
    from impala_cut_spark.session import ImpalaSession
    from impala_cut_spark.sources.catalog import register_views

    s = ImpalaSession(spark)
    register_views(spark, "/root/testdata/sf0.001")
    return s


@pytest.mark.parametrize("case", CASES, ids=[c.id for c in CASES])
def test_golden(isession, case):
    run_case(isession, case)
