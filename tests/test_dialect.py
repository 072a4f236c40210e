"""Unit tests for the Impala→Spark dialect rewriter (pure strings).

Models the reference's parser tests
(fe/src/test/java/com/cloudera/impala/analysis/ParserTest.java) at the
rewrite layer — we assert on the emitted Spark SQL, not an AST.
"""

from __future__ import annotations

from impala_cut_spark.dialect import (
    rewrite,
    rewrite_calls,
    rewrite_hints,
    rewrite_null_ordering,
)


class TestCallRewrites:
    def test_isnull_two_arg_is_nvl(self):
        assert rewrite_calls("select isnull(a, b) from t") == "select nvl(a, b) from t"

    def test_isnull_one_arg_is_predicate(self):
        assert rewrite_calls("select isnull(a) from t") == "select (a IS NULL) from t"

    def test_zeroifnull_nullifzero(self):
        assert rewrite_calls("select zeroifnull(x)") == "select coalesce(x, 0)"
        assert rewrite_calls("select nullifzero(x)") == "select nullif(x, 0)"

    def test_nested_calls_converge(self):
        out = rewrite_calls("select zeroifnull(isnull(a, b))")
        assert out == "select coalesce(nvl(a, b), 0)"

    def test_string_literal_untouched(self):
        sql = "select 'isnull(a,b)' as lit"
        assert rewrite_calls(sql) == sql

    def test_not_a_call_untouched(self):
        sql = "select isnull from t"  # bare identifier, no parens
        assert rewrite_calls(sql) == sql

    def test_args_with_nested_parens_and_commas(self):
        out = rewrite_calls("select isnull(f(a, b), g(c))")
        assert out == "select nvl(f(a, b), g(c))"

    def test_ndv_and_group_concat(self):
        assert rewrite_calls("select ndv(x)") == "select approx_count_distinct(x)"
        out = rewrite_calls("select group_concat(s, '|')")
        assert out == "select array_join(sort_array(collect_list(s)), '|')"

    def test_case_insensitive(self):
        assert rewrite_calls("select ISNULL(a, b)") == "select nvl(a, b)"


class TestHints:
    def test_broadcast_hint(self):
        sql, hints = rewrite_hints("select * from a join [broadcast] b on a.x = b.x")
        assert hints == ["BROADCAST(b)"]
        assert "[broadcast]" not in sql.lower()

    def test_shuffle_hint_with_alias(self):
        sql, hints = rewrite_hints("select * from a join [shuffle] big_table bt on a.x = bt.x")
        assert hints == ["SHUFFLE_HASH(bt)"]

    def test_full_rewrite_places_hint_after_select(self):
        out = rewrite("select * from a join [broadcast] b on a.x = b.x")
        assert out.lower().startswith("select /*+ broadcast(b) */")

    def test_straight_join_stripped(self):
        sql, _ = rewrite_hints("select straight_join * from a, b")
        assert "straight_join" not in sql.lower()

    def test_hints_inside_string_literals_untouched(self):
        src = "select 'join [broadcast] x' as a, 'straight_join y' as b from t"
        sql, hints = rewrite_hints(src)
        assert sql == src
        assert hints == []

    def test_hint_rewrite_then_literal_preserved(self):
        src = (
            "select 'straight_join z' lit from a join [broadcast] b on a.x = b.x"
        )
        sql, hints = rewrite_hints(src)
        assert "'straight_join z'" in sql
        assert hints == ["BROADCAST(b)"]


class TestNullOrdering:
    def test_asc_gets_nulls_last(self):
        out = rewrite_null_ordering("select x from t order by x")
        assert "NULLS LAST" in out

    def test_desc_gets_nulls_first(self):
        out = rewrite_null_ordering("select x from t order by x desc")
        assert "NULLS FIRST" in out

    def test_explicit_nulls_preserved(self):
        sql = "select x from t order by x desc nulls last"
        out = rewrite_null_ordering(sql)
        assert out.count("nulls") + out.count("NULLS") == 1

    def test_multiple_keys(self):
        out = rewrite_null_ordering("select * from t order by a, b desc, c limit 5")
        assert out.index("NULLS LAST") < out.index("NULLS FIRST")
        assert out.rstrip().endswith("limit 5")

    def test_order_by_in_string_untouched(self):
        sql = "select 'order by x' as lit from t"
        assert rewrite_null_ordering(sql) == sql

    def test_subquery_scoping(self):
        out = rewrite_null_ordering(
            "select * from (select x from t order by x limit 3) v order by x desc"
        )
        # inner ASC key and outer DESC key each get their own default
        assert "x NULLS LAST" in out
        assert "x desc NULLS FIRST" in out


class TestAdviceRound2Fixes:
    """Regressions for ADVICE.md round-1 findings."""

    def test_many_calls_all_rewritten(self):
        # >8 Impala-only calls in one statement (old loop capped at 8)
        expr = ", ".join(f"isnull(a{i}, b{i})" for i in range(20))
        out = rewrite_calls(f"select {expr} from t")
        assert "isnull" not in out
        assert out.count("nvl(") == 20

    def test_line_comment_quote_does_not_poison_state(self):
        sql = "select isnull(a, b) -- don't reorder\n, isnull(c, d) from t"
        out = rewrite_calls(sql)
        assert "isnull" not in out
        assert "don't reorder" in out

    def test_block_comment_quote_does_not_poison_state(self):
        sql = "select /* can't */ isnull(a, b) from t"
        assert rewrite_calls(sql) == "select /* can't */ nvl(a, b) from t"

    def test_call_inside_comment_untouched(self):
        sql = "select a -- isnull(a, b)\nfrom t"
        assert rewrite_calls(sql) == sql

    def test_nulls_named_column_still_gets_injection(self):
        out = rewrite_null_ordering("select * from t order by nulls_cnt")
        assert "nulls_cnt NULLS LAST" in out

    def test_trailing_line_comment_does_not_swallow_injection(self):
        """An ORDER BY key followed by a `-- …` comment must get its
        NULLS clause BEFORE the comment (round-6: a naive append landed
        inside the comment, silently dropping the null ordering and
        swallowing anything appended after — e.g. a default LIMIT)."""
        out = rewrite_null_ordering("select a from t order by a -- note")
        assert "a NULLS LAST -- note" in out
        out = rewrite_null_ordering("select a from t order by a desc -- note")
        assert "a desc NULLS FIRST -- note" in out
        # comment on a non-final key: its newline keeps later keys intact
        out = rewrite_null_ordering("select a from t order by a -- n\n, b desc")
        assert "a NULLS LAST -- n\n" in out and "b desc NULLS FIRST" in out
        # a self-terminating block comment appends after, unharmed
        out = rewrite_null_ordering("select a from t order by a /* c */")
        assert "/* c */ NULLS LAST" in out

    def test_shell_split_respects_quotes(self):
        from impala_cut_spark.shell import split_statements

        parts = [s.strip() for s in split_statements("select 'a;b'; select 1;") if s.strip()]
        assert parts == ["select 'a;b'", "select 1"]

    def test_shell_split_respects_comments(self):
        from impala_cut_spark.shell import split_statements

        parts = [s.strip() for s in split_statements("select 1 -- x;y\n; select 2;") if s.strip()]
        assert parts == ["select 1 -- x;y", "select 2"]


class TestReviewRegressionFixes:
    """Round-3 self-review findings: rewriter edge cases that crashed
    or corrupted statements."""

    def test_create_view_tolerates_any_whitespace(self):
        from impala_cut_spark.dialect import rewrite_statements

        for sql in (
            "CREATE  VIEW v AS SELECT 1",
            "create\tview v as select 1",
            "create\n view v as select 1",
        ):
            out = rewrite_statements(sql)
            assert out.startswith("CREATE TEMPORARY VIEW v"), out

    def test_create_view_qualified_name_clear_error(self):
        import pytest

        from impala_cut_spark.dialect import rewrite_statements

        with pytest.raises(ValueError, match="unqualified"):
            rewrite_statements("create view db1.v as select 1")
        with pytest.raises(ValueError, match="unqualified"):
            rewrite_statements("alter view db1.v as select 2")

    def test_csv_mode_injection_skips_string_literals(self):
        out = rewrite("select 'x using csv y' as c from t", csv_mode="FAILFAST")
        assert out == "select 'x using csv y' as c from t"

    def test_csv_mode_injection_still_applies_to_ddl(self):
        out = rewrite(
            "create table t (a int) stored as textfile", csv_mode="FAILFAST"
        )
        assert "mode 'FAILFAST'" in out
        # merges into an existing OPTIONS list exactly once
        out2 = rewrite(
            "create table t (a int) row format delimited fields terminated by '|' "
            "stored as textfile",
            csv_mode="FAILFAST",
        )
        assert out2.count("OPTIONS") == 1 and "mode 'FAILFAST'" in out2
