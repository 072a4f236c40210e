"""Capture golden RESULTS/TYPES for tests/golden/*.test query files.

Usage: python tools/gen_goldens.py tests/golden/joins.test [...]

For each ``---- QUERY`` block lacking a ``---- RESULTS`` section (or
with ``--refresh``, every block): run the query's values through the
DuckDB oracle (independent of the engine under test) and its types
through the engine (Spark), then write both back into the file. If a
block carries an ``---- ORACLE`` section, that DuckDB-dialect SQL
supplies the values instead (for Impala-dialect queries DuckDB cannot
parse). Generation fails loudly if Spark and DuckDB disagree on row
count — a differential check at capture time; the committed goldens
then pin the values for regression.

Mirrors how the reference captured its golden corpora from a trusted
run (/root/reference/tests/common/test_result_verifier.py).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def capture(path: Path, refresh: bool = False) -> None:
    import duckdb

    from golden_runner import format_row, parse_test_file, spark_types
    from impala_cut_spark.session import ImpalaSession, build_session
    from impala_cut_spark.sources.catalog import register_views

    spark = build_session(app_name="gen-goldens", master="local[8]", shuffle_partitions=8)
    session = ImpalaSession(spark)
    register_views(spark, SF_DIR)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    text = path.read_text()
    blocks = re.split(r"(^====.*$)", text, flags=re.M)
    # blocks alternates [prefix, ====, block, ====, block, ...]
    out_parts: list[str] = []
    for part in blocks:
        if part.startswith("====") or "---- QUERY" not in part:
            out_parts.append(part)
            continue
        out_parts.append(_fill_block(part, session, con, spark_types, format_row, refresh))
    path.write_text("".join(out_parts))
    print(f"wrote {path}")


def _fill_block(block: str, session, con, spark_types, format_row, refresh: bool) -> str:
    sections: dict[str, list[str]] = {}
    order: list[str] = []
    current = None
    header: dict[str, str] = {}
    for line in block.splitlines(keepends=True):
        m = re.match(r"^----\s*(\w+)\s*(?::\s*(.*))?$", line.rstrip("\n"))
        if m:
            current = m.group(1).upper()
            header[current] = line
            sections[current] = []
            order.append(current)
            continue
        if current is None:
            header.setdefault("_PRE", "")
            header["_PRE"] += line
        else:
            sections[current].append(line)
    if "RESULTS" in sections and any(l.strip() for l in sections["RESULTS"]) and not refresh:
        return block

    qlines = [
        l for l in "".join(sections.get("QUERY", [])).splitlines() if not l.lstrip().startswith("#")
    ]
    query = "\n".join(qlines).strip()
    oracle_sql = "\n".join(
        l for l in "".join(sections.get("ORACLE", [])).splitlines() if not l.lstrip().startswith("#")
    ).strip()

    # ---- SETUP runs on BOTH engines (plain-SQL DDL like CREATE VIEW);
    # engine-specific setup (STORED AS …) needs an ORACLE section whose
    # setup-equivalent DuckDB can express, or hand-pinned RESULTS.
    if "SETUP" in sections:
        from impala_cut_spark.shell import split_statements

        raw = "\n".join(
            l
            for l in "".join(sections["SETUP"]).splitlines()
            if not l.lstrip().startswith("#")
        )
        for stmt in split_statements(raw):
            if not stmt.strip():
                continue
            session.sql(stmt)
            con.sql(stmt)

    sdf = session.sql(query)
    types = spark_types(sdf)
    srows = sdf.collect()
    drows = con.sql(oracle_sql or query).fetchall()
    if len(srows) != len(drows):
        raise SystemExit(
            f"capture mismatch for block:\n{query}\n"
            f" spark rows={len(srows)} duckdb rows={len(drows)}"
        )
    lines = [format_row(r, types) for r in drows]
    # unordered queries: store sorted (runner sorts both sides anyway)
    if not re.search(r"order\s+by", re.sub(r"\([^()]*\)", "", query), re.I):
        lines.sort()

    out = [header.get("_PRE", "")]
    for name in order:
        if name in ("RESULTS", "TYPES"):
            continue
        out.append(header[name])
        out.append("".join(sections[name]))
    out.append("---- TYPES\n")
    out.append(", ".join(types) + "\n")
    out.append("---- RESULTS\n")
    out.append("\n".join(lines) + ("\n" if lines else ""))
    return "".join(out)


if __name__ == "__main__":
    refresh = "--refresh" in sys.argv
    for arg in sys.argv[1:]:
        if arg.startswith("--"):
            continue
        capture(Path(arg), refresh)
