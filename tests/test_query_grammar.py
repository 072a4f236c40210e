"""Grammar-driven random-query differential: Spark engine vs DuckDB.

Reference mechanism: `/root/reference/tests/comparison/query_generator.py:91`
(QueryGenerator.create_query) + `discrepancy_searcher.py` — random
SELECTs (joins, inline views, CTEs, scalar expression trees, GROUP
BY / HAVING / DISTINCT, IN / EXISTS subqueries, UNION, ORDER BY ...
LIMIT OFFSET) executed against a live oracle and diffed.

The grammar lives in `tools/query_grammar.py`; every query it emits is
deterministic cross-engine by construction (see its module docstring),
so a fixed seed range is a stable CI gate — and the same tool doubles
as an open-ended discrepancy searcher:

    python tools/query_grammar.py --queries 1000 --seed 0
"""

from __future__ import annotations

import random

import pytest

#: slow tier: property fuzz over the query grammar — run with `pytest -m slow`
pytestmark = pytest.mark.slow

from query_grammar import (
    SCHEMA,
    LiteralPool,
    QueryGen,
    install_oracle_macros,
    run_one,
)

N_SEEDS = 120


@pytest.fixture(scope="module")
def isession(spark):
    from impala_cut_spark.session import ImpalaSession
    from impala_cut_spark.sources.catalog import register_views

    register_views(spark, "/root/testdata/sf0.001")
    return ImpalaSession(spark)


@pytest.fixture(scope="module")
def pool(oracle):
    install_oracle_macros(oracle)
    return LiteralPool("/root/testdata/sf0.001", oracle)


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_grammar_query_matches_duckdb(seed, isession, oracle, pool):
    q = QueryGen(random.Random(seed), pool).create_query(depth=2)
    msg = run_one(isession, oracle, q.sql, q.fuzzy)
    assert msg is None, f"{msg}\n{q.sql}"


def test_grammar_covers_language_features(pool):
    """The grammar actually exercises the language: joins of every
    kind, aggregation, HAVING, DISTINCT, subqueries, CTEs, unions,
    LIMIT, and the Impala function surface all appear. Scanned over a
    wider seed range than the executed window — generation is free,
    and the CLI sweeps execute these seeds too."""
    sqls = [
        QueryGen(random.Random(s), pool).create_query(depth=2).sql
        for s in range(500)
    ]
    blob = "\n".join(sqls)
    for feature in [
        " JOIN ",
        "LEFT JOIN",
        "RIGHT JOIN",
        "FULL JOIN",
        "GROUP BY",
        "HAVING",
        "DISTINCT",
        "UNION",
        "EXISTS (",
        "IN (SELECT",
        "WITH cte",
        "ORDER BY",
        "LIMIT",
        "CASE WHEN",
        "BETWEEN",
        "LIKE",
        # Impala function surface (DuckDB sees the ORACLE_MACROS twins)
        "strleft(",
        "zeroifnull(",
        "quotient(",
        "unix_timestamp(",
        "days_add(",
        "truncate(",
        "nvl(",
        "to_date(",
        "fmod(",
        "sqrt(",
        "var_samp(",
        "(SELECT min(",  # uncorrelated scalar-subquery comparison
        # grammar v3 (round-6): wider string/timestamp surface
        "replace(",
        "split_part(",
        "concat_ws(",
        "ascii(",
        "weeks_add(",
        "minutes_add(",
        "years_add(",
    ]:
        assert feature in blob, f"grammar window never produced {feature!r}"
    # every TPC-H table participates
    for t in SCHEMA:
        assert f"FROM {t} " in blob or f"JOIN {t} " in blob, t


@pytest.mark.parametrize("seed", range(12))
def test_grammar_insert_roundtrip_matches_duckdb(seed, isession, oracle, pool):
    """Grammar v3 (round-6): CTAS + INSERT...SELECT round-trips — the
    generated query materializes through the Impala-dialect CTAS and
    INSERT DML path in Spark and natively in DuckDB, and the doubled
    tables read back identical. Distinct seed space from the SELECT
    window (offset by 10_000) so the two gates never share a query."""
    from query_grammar import run_insert_roundtrip

    q = QueryGen(random.Random(10_000 + seed), pool).create_query(depth=2)
    msg = run_insert_roundtrip(
        isession, oracle, q, name=f"grammar_rt_{seed}"
    )
    assert msg is None, f"{msg}\n{q.sql}"


@pytest.mark.parametrize("seed", [402, 1940, 2943])
def test_sweep_found_regressions(seed, isession, oracle, pool):
    """Seeds where the round-6 3200-seed sweep caught real findings:
    402 — Impala fmod must be DOUBLE, not Spark's mod-with-DECIMAL-
    literal (dialect fix); 1940 — DuckDB split_part returns '' on NULL
    input where Impala/Spark propagate NULL (grammar NULL pin);
    2943 — comparator fuzzy-sort ties fell back to engine-specific
    input order (two-level sort key). Pinned so none regresses."""
    q = QueryGen(random.Random(seed), pool).create_query(depth=2)
    msg = run_one(isession, oracle, q.sql, q.fuzzy)
    assert msg is None, f"{msg}\n{q.sql}"


def test_session_fuzz_clean_window(isession, oracle, pool):
    """Grammar v4 (round-7): a fixed window of the STATEFUL session
    fuzz — SET/UNSET option mutations, codec-rotated CTAS round-trips,
    view DDL persistence and plain compares interleaved on one live
    session (tools/query_grammar.py --session). The CLI sweeps a much
    wider range; this pins a deterministic slice in CI."""
    import argparse

    from query_grammar import run_session_fuzz

    args = argparse.Namespace(
        seed=20_000, queries=25, depth=2, verbose=False
    )
    assert run_session_fuzz(isession, oracle, pool, args) == 0
