"""Shell surface (impala-shell parity, SURVEY §3): statement dispatch,
table formatting, SET/EXPLAIN/USE, error recovery, multi-statement
input."""

from __future__ import annotations

import io

import pytest

from impala_cut_spark.session import ImpalaSession
from impala_cut_spark.shell import execute_line, format_table, repl
from impala_cut_spark.sources.catalog import register_views


@pytest.fixture(scope="module")
def sess(spark, sf_dir):
    register_views(spark, sf_dir)
    return ImpalaSession(spark)


def test_format_table_nulls_and_padding():
    out = format_table(["a", "bee"], [(1, None), (22, "x")])
    lines = out.splitlines()
    assert lines[1] == "| a  | bee  |"
    assert "NULL" in out and "(2 rows)" in out


def test_select_statement(sess):
    out = execute_line(sess, "select count(*) as n from region")
    assert "| n |" in out and "| 5 |" in out


def test_set_and_show_options(sess):
    execute_line(sess, "set batch_size=1024")
    assert "batch_size=1024" in execute_line(sess, "set")


def test_explain_levels(sess):
    out = execute_line(sess, "explain minimal select count(*) from nation")
    assert "HashAggregate" in out
    out = execute_line(sess, "explain select count(*) from nation")
    assert "(1)" in out  # formatted (standard) level


def test_quit_raises_eof(sess):
    with pytest.raises(EOFError):
        execute_line(sess, "quit")


def test_repl_pipeline_recovers_from_errors(sess):
    stdin = io.StringIO(
        "select 1 as one;\nselec broken;\nselect 2 as two;\nquit;\n"
    )
    stdout = io.StringIO()
    repl(sess, stdin=stdin, stdout=stdout)
    out = stdout.getvalue()
    assert "| one |" in out
    assert "ERROR: ParseException" in out
    assert "| two |" in out  # shell survived the error
