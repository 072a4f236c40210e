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


def test_delimited_output_format():
    from impala_cut_spark.shell import format_delimited

    rows = [(1, "a"), (2, None)]
    assert format_delimited(["k", "v"], rows) == "1\ta\n2\tNULL"
    assert (
        format_delimited(["k", "v"], rows, delim="|", header=True)
        == "k|v\n1|a\n2|NULL"
    )


def test_execute_line_delimited(sess):
    from impala_cut_spark.shell import execute_line

    out = execute_line(
        sess, "select 1 as a, 'x' as b", delimited=True, delim=",", header=True
    )
    assert out == "a,b\n1,x"


def test_batch_query_file_flags(sess, tmp_path, monkeypatch, capsys):
    """-f + -B + --output_delimiter + -o mirror the reference shell's
    batch mode (impala_shell.py:1208-1253)."""
    import impala_cut_spark.shell as sh

    qf = tmp_path / "batch.sql"
    qf.write_text("select 1 as a; select 'x;y' as s;")
    of = tmp_path / "out.txt"
    monkeypatch.setattr(sh, "ImpalaSession", lambda: sess)
    rc = sh.main([
        "-f", str(qf), "-B", "--output_delimiter", "|", "--print_header", "-o", str(of),
    ])
    assert rc == 0
    assert of.read_text() == "a\n1\ns\nx;y\n"


def test_batch_ignore_query_failure(sess, tmp_path, monkeypatch):
    import impala_cut_spark.shell as sh

    qf = tmp_path / "bad.sql"
    qf.write_text("select no_col from nation; select 2 as ok;")
    of = tmp_path / "out.txt"
    monkeypatch.setattr(sh, "ImpalaSession", lambda: sess)
    rc = sh.main(["-f", str(qf), "-B", "-o", str(of), "-c"])
    assert rc == 1  # failure reported
    assert of.read_text() == "2\n"  # but later statements still ran


def test_version_and_history_commands(sess):
    from impala_cut_spark.shell import execute_line

    assert "Spark" in execute_line(sess, "version")
    execute_line(sess, "select 1 as one")
    hist = execute_line(sess, "history")
    assert "select 1 as one" in hist and "version" in hist


def test_shell_remote_mode_over_thrift(spark, sf_dir, capsys):
    """--connect HOST:PORT: the shell drives a Beeswax thrift server
    over the wire (the reference shell's real architecture: -i impalad,
    thrift TSV results)."""
    from impala_cut_spark.session import ImpalaSession
    from impala_cut_spark.shell import main
    from impala_cut_spark.sources.catalog import register_views
    from impala_cut_spark.thrift_server import BeeswaxThriftServer

    register_views(spark, sf_dir)
    srv = BeeswaxThriftServer(ImpalaSession(spark))
    srv.serve_background()
    try:
        rc = main(
            ["--connect", f"{srv.host}:{srv.port}", "-B", "--print_header",
             "-q", "select n_nationkey, n_name from nation order by n_nationkey limit 2"]
        )
        out = capsys.readouterr().out
        assert rc == 0
        assert out.splitlines()[:3] == [
            "n_nationkey\tn_name", "0\tNATION_0", "1\tNATION_1",
        ]
        # NULL sentinel + error path survive the wire
        rc = main(
            ["--connect", f"{srv.host}:{srv.port}", "-B",
             "-q", "select cast(null as int) n; select 1 one",
             "-c"]
        )
        out = capsys.readouterr().out
        assert rc == 0 and out.splitlines() == ["NULL", "1"]
    finally:
        srv.shutdown()


def test_shell_profile_and_summary_and_unset(spark, sf_dir, capsys):
    """profile / summary / unset / shell commands (impala_shell.py
    do_profile:925, do_summary:494, do_unset:549, do_shell:213)."""
    from impala_cut_spark.session import ImpalaSession
    from impala_cut_spark.shell import execute_line
    from impala_cut_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    sess = ImpalaSession(spark)
    assert "No previous query" in execute_line(sess, "profile")
    execute_line(sess, "select r_regionkey, count(*) n from region group by 1 order by 1")
    prof = execute_line(sess, "profile")
    assert "HashAggregate" in prof or "Aggregate" in prof
    summ = execute_line(sess, "summary")
    assert "Operator" in summ and "#Rows" in summ
    assert "Aggregate" in summ
    # unset reverts a mapped option
    execute_line(sess, "set num_nodes=1") if "num_nodes" in getattr(sess, "_OPTION_MAP", {}) else None
    execute_line(sess, "set explain_level=3")
    assert "explain_level" in sess.options()
    assert "Unsetting" in execute_line(sess, "unset explain_level")
    assert "explain_level" not in sess.options()
    assert "No option called" in execute_line(sess, "unset explain_level")
    # shell command passthrough
    assert execute_line(sess, "shell echo hi-there") == "hi-there"
    assert execute_line(sess, "!echo bang") == "bang"


def test_remote_session_set_unset_and_shipped_options(spark, sf_dir):
    """Remote mode: `unset k` must not raise AttributeError
    (RemoteBeeswaxSession lacked unset_option before round 5), and SET
    options ship with each query via Query.configuration so the server
    actually honors them."""
    from impala_cut_spark.session import ImpalaSession
    from impala_cut_spark.shell import RemoteBeeswaxSession, execute_line
    from impala_cut_spark.sources.catalog import register_views
    from impala_cut_spark.thrift_server import BeeswaxThriftServer

    register_views(spark, sf_dir)
    srv = BeeswaxThriftServer(ImpalaSession(spark))
    srv.serve_background()
    try:
        sess = RemoteBeeswaxSession(srv.host, srv.port)
        assert "set to" in execute_line(sess, "set default_order_by_limit=2")
        # the option rides Query.configuration and the server honors it
        # for that query (2 rows despite no LIMIT in the text)...
        rows = sess.sql("select n_nationkey from nation order by n_nationkey").collect()
        assert len(rows) == 2
        # ...but per-query scoped: it does not stick on the shared
        # server session for other clients (round-5 advice)
        assert "default_order_by_limit" not in srv.session.options()
        assert "set to" in execute_line(sess, "set foo=7")
        sess.sql("select 1 as one")
        assert execute_line(sess, "unset foo") == "Unsetting foo"
        assert "foo" not in sess.options()
        assert "No option called foo" in execute_line(sess, "unset foo")
        sess.close()
    finally:
        srv.shutdown()
