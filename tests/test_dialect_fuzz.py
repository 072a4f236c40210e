"""Hypothesis fuzz for the dialect rewriter (dialect.py): the
hand-rolled token-level rewrites must be IDEMPOTENT (fixpoint — a
rewritten statement passed back through the rewriter is unchanged) and
must never touch the inside of string literals, whatever Impala-isms
those literals contain. The reference's parser gets this for free from
a real grammar (sql-parser.y); a rewriter needs it fuzzed."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from impala_cut_spark.dialect import rewrite

#: literal contents chosen to look like the rewriter's own targets
TRICKY_LITERALS = [
    "a DIV b",
    "isnull(x, y)",
    "order by ts desc",
    "[broadcast]",
    "[shuffle] join",
    "interval 3 days",
    "nvl(a,b)",
    "group_concat(x)",
    "partitioned by (",
    "straight_join",
    "it''s",
    "  double  spaced  ",
    "zeroifnull",
    "STORED AS AVRO",
]

fn_call = st.sampled_from(
    [
        "isnull(l_tax, 0)",
        "nvl(l_tax, 0)",
        "zeroifnull(l_tax)",
        "strleft(l_returnflag, 1)",
        "group_concat(l_returnflag)",
        "ndv(l_orderkey)",
        "fnv_hash(l_returnflag)",
        "l_orderkey DIV 7",
        "l_quantity % 5",
        "now() + interval 3 days",
        "from_unixtime(0, 'yyyy-MM-dd')",
    ]
)


@st.composite
def impala_stmt(draw):
    lit = draw(st.sampled_from(TRICKY_LITERALS))
    call = draw(fn_call)
    hint = draw(st.sampled_from(["", " [broadcast]", " [shuffle]"]))
    order = draw(st.sampled_from(["", " order by 1 desc", " order by c1, c2 desc"]))
    join = draw(st.booleans())
    base = f"select {call} as c1, '{lit}' as c2 from lineitem"
    if join:
        base += f" join{hint} orders on l_orderkey = o_orderkey"
    return base + order


@settings(max_examples=200, deadline=None)
@given(sql=impala_stmt())
def test_rewrite_idempotent_and_literal_safe(sql):
    once = rewrite(sql)
    twice = rewrite(once)
    assert once == twice, f"not a fixpoint:\n  in: {sql}\n  1x: {once}\n  2x: {twice}"
    # every generated literal must survive verbatim (quote-aware scan
    # is the mechanism; this is the behavior)
    for lit in TRICKY_LITERALS:
        if f"'{lit}'" in sql:
            assert f"'{lit}'" in once, f"literal mangled:\n  in: {sql}\n  out: {once}"


@pytest.fixture(scope="module")
def views(spark, sf_dir):
    from impala_cut_spark.sources.catalog import register_views

    register_views(spark, sf_dir)


@settings(
    max_examples=50,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(sql=impala_stmt())
def test_rewrite_runs_on_spark(sql, spark, sf_dir, views):
    """Rewritten statements must actually parse and run on Spark (the
    fuzz surface is drawn from the supported dialect)."""
    from impala_cut_spark.session import ImpalaSession

    s = ImpalaSession(spark)
    assert s.sql(sql).limit(3).collect() is not None
