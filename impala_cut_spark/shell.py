"""Interactive shell — the ``impala-shell`` surface (SURVEY.md §3).

The reference's shell (``/root/reference/shell/impala_shell.py``)
connects over thrift Beeswax and provides: SQL execution with tabular
output, ``SET key=value`` query options, ``EXPLAIN``, ``USE``,
``HELP``/``QUIT``, and multi-line statements terminated by ``;``.
This shell provides the same surface over an in-process
ImpalaSession. Run: ``python -m impala_cut_spark.shell [--sf-dir D]``.
"""

from __future__ import annotations

import argparse
import sys

from impala_cut_spark.session import ImpalaSession

PROMPT = "impala-spark> "
CONT = "            > "


def format_table(cols: list[str], rows: list[tuple], max_rows: int = 100) -> str:
    """Plain-text table in the shell's +---+ style."""
    shown = rows[:max_rows]
    cells = [[("NULL" if v is None else str(v)) for v in r] for r in shown]
    widths = [
        max(len(c), *(len(row[i]) for row in cells)) if cells else len(c)
        for i, c in enumerate(cols)
    ]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [sep, "| " + " | ".join(c.ljust(w) for c, w in zip(cols, widths)) + " |", sep]
    for row in cells:
        out.append("| " + " | ".join(v.ljust(w) for v, w in zip(row, widths)) + " |")
    out.append(sep)
    if len(rows) > max_rows:
        out.append(f"({len(rows)} rows, showing first {max_rows})")
    else:
        out.append(f"({len(rows)} rows)")
    return "\n".join(out)


def format_delimited(
    cols: list[str], rows: list[tuple], delim: str = "\t", header: bool = False
) -> str:
    """impala-shell -B / --output_delimiter / --print_header output:
    one row per line, no table art (shell/impala_shell.py
    write_delimited path)."""
    lines = [delim.join(cols)] if header else []
    lines += [
        delim.join("NULL" if v is None else str(v) for v in r) for r in rows
    ]
    return "\n".join(lines)


def _exec_summary(df) -> str:
    """Per-operator exec summary of an executed DataFrame — the Spark
    analogue of the reference's exec summary table (impala-shell
    `summary`: Operator / #Rows / Detail per plan node, runtime
    metrics from the coordinator).  Walks the AQE-final physical plan
    via py4j and prints each node with its SQLMetrics."""
    plan = df._jdf.queryExecution().executedPlan()
    try:
        root = plan.finalPhysicalPlan()
    except Exception:  # noqa: BLE001 — non-AQE root
        root = plan
    rows: list[tuple] = []

    def metrics(node) -> dict:
        m = {}
        try:
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                m[kv._1()] = kv._2().value()
        except Exception:  # noqa: BLE001 — metric-less node
            pass
        return m

    def walk(node, depth: int) -> None:
        m = metrics(node)
        detail = ", ".join(
            f"{k}={v}" for k, v in sorted(m.items()) if k != "numOutputRows" and v
        )
        rows.append(
            ("  " * depth + node.nodeName(), str(m.get("numOutputRows", "")), detail[:60])
        )
        try:
            inner = node.plan()  # QueryStageExec wraps its stage plan
            walk(inner, depth + 1)
            return
        except Exception:  # noqa: BLE001 — ordinary node
            pass
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i), depth + 1)

    walk(root, 0)
    return format_table(["Operator", "#Rows", "Detail"], rows, max_rows=200)


def execute_line(
    sess: ImpalaSession,
    stmt: str,
    delimited: bool = False,
    delim: str = "\t",
    header: bool = False,
) -> str:
    """One statement → printable result (the shell's command dispatch:
    impala_shell.py do_* methods)."""
    s = stmt.strip().rstrip(";").strip()
    if not s:
        return ""
    low = s.lower()
    if low not in ("history",):
        hist = getattr(sess, "_shell_history", None)
        if hist is None:
            hist = []
            sess._shell_history = hist
        hist.append(s)
    if low in ("quit", "exit"):
        raise EOFError
    if low == "help":
        return (
            "statements: any Impala-dialect SQL; SET k=v; SET; UNSET k; "
            "EXPLAIN [minimal|standard|extended|verbose] <query>; USE db; "
            "profile; summary; shell <cmd> (or !<cmd>); version; history; quit"
        )
    if low == "version":
        # reference: do_version prints the build string (impala_shell.py)
        from pyspark import __version__ as spark_version

        return f"impala-cut-spark shell, engine Spark {spark_version}"
    if low == "history":
        # reference: do_history replays readline history
        return "\n".join(
            f"[{i}] {h}" for i, h in enumerate(getattr(sess, "_shell_history", []), 1)
        ) or "(empty history)"
    if low == "set":
        opts = sess.options()
        return "\n".join(f"{k}={v}" for k, v in sorted(opts.items())) or "(no options set)"
    if low.startswith("set ") and "=" in s:
        k, v = s[4:].split("=", 1)
        sess.set_option(k.strip(), v.strip())
        return f"{k.strip()} set to {v.strip()}"
    if low.startswith("unset "):
        # reference do_unset (impala_shell.py:549)
        k = s[6:].strip().lower()
        if k in sess.options():
            sess.unset_option(k)
            return f"Unsetting {k}"
        return f"No option called {k} is set"
    if low.startswith("shell ") or s.startswith("!"):
        # reference do_shell (impala_shell.py:213): run an OS command
        import subprocess

        cmd = s[6:] if low.startswith("shell ") else s[1:]
        r = subprocess.run(cmd, shell=True, capture_output=True, text=True)
        return (r.stdout + r.stderr).rstrip()
    if low == "profile":
        # reference do_profile (impala_shell.py:925): runtime profile of
        # the LAST query.  Spark analogue: the AQE-final executed plan
        # (per-node runtime choices materialized after execution).
        last = getattr(sess, "_last_df", None)
        if last is None:
            return "No previous query available to profile"
        return last._jdf.queryExecution().executedPlan().toString()
    if low == "summary":
        # reference do_summary (impala_shell.py:494): per-operator
        # exec summary table. Spark analogue: the executed-plan
        # operator tree with each node's runtime metrics.
        last = getattr(sess, "_last_df", None)
        if last is None:
            return "Could not retrieve summary for query."
        return _exec_summary(last)
    if low.startswith("explain "):
        rest = s[8:].strip()
        level = "standard"
        first = rest.split(None, 1)[0].lower() if rest else ""
        if first in ("minimal", "standard", "extended", "verbose"):
            level, rest = first, rest.split(None, 1)[1]
        return sess.explain(rest, level)
    df = sess.sql(s)
    rows = [tuple(r) for r in df.collect()]
    # remember the last result for `profile` / `summary` (the
    # reference keeps last_query_handle); remote results carry no plan
    sess._last_df = df if hasattr(df, "_jdf") else None
    if delimited:
        return format_delimited(df.columns, rows, delim, header)
    return format_table(df.columns, rows)


def split_statements(text: str) -> list[str]:
    """Split buffered input on ';' quote- and comment-aware, so
    ``SELECT 'a;b'`` stays one statement (reference impala-shell does
    quote-aware splitting; shell/impala_shell.py cmdloop)."""
    from impala_cut_spark.dialect import _scan_strings

    stmts, start = [], 0
    for i, c, in_str in _scan_strings(text):
        if c == ";" and not in_str:
            stmts.append(text[start:i])
            start = i + 1
    stmts.append(text[start:])
    return stmts


def repl(sess: ImpalaSession, stdin=None, stdout=None) -> None:
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    buf: list[str] = []
    interactive = stdin.isatty()
    while True:
        if interactive:
            stdout.write(CONT if buf else PROMPT)
            stdout.flush()
        line = stdin.readline()
        if not line:
            break
        buf.append(line)
        joined = "".join(buf)
        if not joined.strip():
            buf = []
            continue
        if not joined.rstrip().endswith(";") and interactive:
            continue  # multi-line statement, keep reading
        buf = []
        for stmt in split_statements(joined):
            if not stmt.strip():
                continue
            try:
                out = execute_line(sess, stmt)
            except EOFError:
                return
            except Exception as e:  # surface the engine error, keep the shell
                first = next((ln for ln in str(e).splitlines() if ln.strip()), "")
                out = f"ERROR: {type(e).__name__}: {first}"
            if out:
                stdout.write(out + "\n")
                stdout.flush()


class _RemoteResult:
    """Duck-typed stand-in for a DataFrame result in remote mode."""

    def __init__(self, columns: list[str], rows: list[tuple]):
        self.columns = columns
        self._rows = rows

    def collect(self) -> list[tuple]:
        return self._rows


class RemoteBeeswaxSession:
    """execute_line-compatible session backed by a BeeswaxThriftClient
    — the reference shell's actual architecture (impala_shell.py
    connects to impalad over thrift Beeswax; values arrive as the
    Beeswax TSV ASCII rendering, so every cell is a string and NULL
    is the literal sentinel — same as the reference shell displays)."""

    def __init__(self, host: str, port: int):
        from impala_cut_spark.thrift_server import BeeswaxThriftClient

        self._client = BeeswaxThriftClient(host, port)
        self._options: dict[str, str] = {}

    def sql(self, stmt: str) -> _RemoteResult:
        c = self._client
        # ship SET options with the query (Query.configuration), like
        # the reference shell does — the server applies them, so SET
        # is not merely client-local in remote mode
        h = c.query(stmt, [f"{k}={v}" for k, v in sorted(self._options.items())])
        try:
            cols, rows = [], []
            while True:
                fr = c.fetch(h)
                cols = fr["columns"]
                for line in fr["data"]:
                    rows.append(
                        tuple(None if v == "NULL" else v for v in line.split("\t"))
                    )
                if not fr["has_more"]:
                    break
        finally:
            c.close_query(h)
        return _RemoteResult(cols, rows)

    def explain(self, stmt: str, level: str = "standard") -> str:
        # beeswax explain() carries no level (beeswax.thrift) — the
        # reference shell has the same limitation over this API
        return self._client.explain(stmt)

    def set_option(self, k: str, v: str) -> None:
        self._options[k] = v

    def unset_option(self, k: str) -> None:
        # the local ImpalaSession has this; without it `unset k` in
        # remote mode raised AttributeError through the repl
        self._options.pop(k, None)

    def options(self) -> dict[str, str]:
        return dict(self._options)

    def close(self) -> None:
        self._client.close()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="impala-cut-spark shell")
    ap.add_argument("--sf-dir", default=None, help="register testdata tables from this dir")
    ap.add_argument(
        "-i", "--connect", default=None, metavar="HOST:PORT",
        help="connect to a running Beeswax thrift server instead of "
        "starting an in-process engine (the reference shell's -i impalad)",
    )
    ap.add_argument("-q", "--query", default=None, help="execute one statement and exit")
    # batch-mode flags mirroring the reference shell
    # (shell/impala_shell.py:1208-1253 option surface)
    ap.add_argument("-f", "--query_file", default=None, help="run ';'-separated statements from this file and exit")
    ap.add_argument("-B", "--delimited", action="store_true", help="delimited output instead of the table format")
    ap.add_argument("--output_delimiter", default="\t", help="field delimiter for -B output (default tab)")
    ap.add_argument("--print_header", action="store_true", help="print column names in -B output")
    ap.add_argument("-o", "--output_file", default=None, help="write query output to this file")
    ap.add_argument("-d", "--database", default=None, help="USE this database on startup")
    ap.add_argument("-c", "--ignore_query_failure", action="store_true", help="continue past failing statements in batch mode")
    args = ap.parse_args(argv)

    if args.connect:
        host, _, port = args.connect.rpartition(":")
        sess = RemoteBeeswaxSession(host or "127.0.0.1", int(port))
    else:
        sess = ImpalaSession()
        sess.spark.sparkContext.setLogLevel("ERROR")
        if args.sf_dir:
            from impala_cut_spark.sources.catalog import register_views

            register_views(sess.spark, args.sf_dir)
    if args.database:
        sess.sql(f"USE {args.database}")

    batch_text = None
    if args.query is not None:
        batch_text = args.query
    elif args.query_file is not None:
        with open(args.query_file) as fh:
            batch_text = fh.read()
    if batch_text is not None:
        sink = open(args.output_file, "w") if args.output_file else sys.stdout
        rc = 0
        try:
            for stmt in split_statements(batch_text):
                if not stmt.strip():
                    continue
                try:
                    out = execute_line(
                        sess, stmt, args.delimited, args.output_delimiter, args.print_header
                    )
                except EOFError:
                    break
                except Exception as e:  # noqa: BLE001 — batch error policy
                    sys.stderr.write(f"ERROR: {e}\n")
                    rc = 1
                    if args.ignore_query_failure:
                        continue
                    break
                if out:
                    sink.write(out + "\n")
        finally:
            if sink is not sys.stdout:
                sink.close()
        return rc
    repl(sess)
    return 0


if __name__ == "__main__":
    sys.exit(main())
