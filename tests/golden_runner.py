"""Golden-file runner for the reference's ``.test`` query-test format.

Mirrors the reference's E2E mechanism (SURVEY.md §5): test files are
``====``-separated blocks with ``---- QUERY``, ``---- TYPES`` and
``---- RESULTS`` sections (format per
``/root/reference/tests/common/impala_test_suite.py:208`` and
``test_result_verifier.py``). Queries run through the Impala-dialect
``ImpalaSession.sql`` surface; results compare cell-by-cell against the
pinned golden rows (float/double with relative tolerance, strings
single-quoted, bare NULL).

Golden files live in ``tests/golden/``. Table-based goldens are
captured from the DuckDB oracle by ``tools/gen_goldens.py``;
expression goldens (FROM-less SELECTs) are hand-authored to pin
dialect semantics.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from pathlib import Path

GOLDEN_DIR = Path(__file__).resolve().parent / "golden"

#: malformed-input fixture files (data-errors corpus) — referenced from
#: .test files as ${FIXTURES}/<path>
FIXTURES_DIR = Path(__file__).resolve().parent / "fixtures"

# Spark simpleString dtype -> reference type name (be/src/runtime/types.h:27-48)
_SPARK_TO_IMPALA = {
    "boolean": "boolean",
    "tinyint": "tinyint",
    "smallint": "smallint",
    "int": "int",
    "bigint": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "timestamp": "timestamp",
    "date": "timestamp",  # dialect has no DATE; timestamp covers it
}


@dataclass
class GoldenCase:
    file: str
    index: int
    name: str
    query: str
    types: list[str] | None = None
    results: list[str] = field(default_factory=list)
    ordered: bool = False  # outermost ORDER BY -> positional compare
    setup: list[str] = field(default_factory=list)  # stmts run before QUERY
    catch: str | None = None  # expected-error substring (reference CATCH)

    @property
    def id(self) -> str:
        return f"{self.file}#{self.index}-{self.name}" if self.name else f"{self.file}#{self.index}"


def parse_test_file(path: Path) -> list[GoldenCase]:
    cases: list[GoldenCase] = []
    blocks = re.split(r"^====.*$", path.read_text(), flags=re.M)
    idx = 0
    for block in blocks:
        if "---- QUERY" not in block:
            continue
        sections: dict[str, list[str]] = {}
        current: str | None = None
        name = ""
        for line in block.splitlines():
            m = re.match(r"^----\s*(\w+)\s*(?::\s*(.*))?$", line)
            if m:
                current = m.group(1).upper()
                sections[current] = []
                if current == "QUERY" and m.group(2):
                    name = m.group(2).strip()
                continue
            if current is not None:
                sections[current].append(line)
        qlines = [l for l in sections.get("QUERY", []) if not l.lstrip().startswith("#")]
        query = "\n".join(qlines).strip().replace("${FIXTURES}", str(FIXTURES_DIR))
        if not query:
            continue
        # ---- CATCH: expected-error substring (the reference test
        # format's CATCH section — impala_test_suite.py); the case
        # passes iff running it raises an error containing the text
        catch = None
        if "CATCH" in sections:
            catch = "\n".join(
                l for l in sections["CATCH"] if not l.lstrip().startswith("#")
            ).strip() or None
        types = None
        if "TYPES" in sections:
            tline = " ".join(sections["TYPES"]).strip()
            if tline:
                # split on commas outside parens (decimal(p,s))
                types = [t.strip().lower() for t in re.split(r",(?![^()]*\))", tline)]
        results = [l for l in sections.get("RESULTS", []) if l.strip() != ""]
        # ---- SETUP: ';'-separated statements (DDL/DML) run before the
        # query — the reference insert.test's RESET analogue, expressed
        # as real SQL (quote-aware split, comments allowed)
        setup: list[str] = []
        if "SETUP" in sections:
            from impala_cut_spark.shell import split_statements

            raw = "\n".join(
                l for l in sections["SETUP"] if not l.lstrip().startswith("#")
            ).replace("${FIXTURES}", str(FIXTURES_DIR))
            setup = [st.strip() for st in split_statements(raw) if st.strip()]
        # ORDER BY in the outermost query (not inside a subquery paren) -> ordered
        depth, ordered = 0, False
        for tok in re.finditer(r"[()]|order\s+by", _strip_strings(query), re.I):
            t = tok.group(0)
            if t == "(":
                depth += 1
            elif t == ")":
                depth -= 1
            elif depth == 0:
                ordered = True
        cases.append(
            GoldenCase(path.name, idx, name, query, types, results, ordered, setup, catch)
        )
        idx += 1
    return cases


def _strip_strings(sql: str) -> str:
    return re.sub(r"'(?:[^'\\]|\\.)*'", "''", sql)


def collect_cases() -> list[GoldenCase]:
    out: list[GoldenCase] = []
    for f in sorted(GOLDEN_DIR.glob("*.test")):
        out.extend(parse_test_file(f))
    return out


# ---------------------------------------------------------------------------
# result formatting — one canonical cell text per value
# ---------------------------------------------------------------------------


def format_cell(v, typ: str) -> str:
    if v is None:
        return "NULL"
    if typ == "boolean":
        return "true" if v else "false"
    if typ in ("float", "double"):
        if isinstance(v, float) and math.isnan(v):
            return "NaN"
        if isinstance(v, float) and math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        return repr(float(v))
    if typ == "timestamp":
        s = v.isoformat(sep=" ")
        return s[:-3] if s.endswith("000") and "." in s else s
    if typ == "string":
        return "'" + str(v).replace("'", "''") + "'"
    if typ.startswith("decimal"):
        return str(v)
    return str(v)


def format_row(row, types: list[str]) -> str:
    return ",".join(format_cell(v, t) for v, t in zip(row, types))


def split_cells(line: str) -> list[str]:
    """Split a golden row on commas outside single-quoted strings."""
    cells, buf, in_str, i = [], [], False, 0
    while i < len(line):
        ch = line[i]
        if in_str:
            if ch == "'":
                if i + 1 < len(line) and line[i + 1] == "'":
                    buf.append("''")
                    i += 2
                    continue
                in_str = False
            buf.append(ch)
        else:
            if ch == "'":
                in_str = True
                buf.append(ch)
            elif ch == ",":
                cells.append("".join(buf).strip())
                buf = []
            else:
                buf.append(ch)
        i += 1
    cells.append("".join(buf).strip())
    return cells


def cells_match(expected: str, actual: str, typ: str) -> bool:
    if expected == actual:
        return True
    if typ in ("float", "double", "") or typ.startswith("decimal"):
        try:
            e, a = float(expected), float(actual)
        except ValueError:
            return False
        if math.isnan(e) and math.isnan(a):
            return True
        return math.isclose(e, a, rel_tol=1e-6, abs_tol=1e-9)
    if typ == "timestamp":
        # tolerate trailing-zero subsecond differences
        return expected.rstrip("0").rstrip(".") == actual.rstrip("0").rstrip(".")
    return False


def spark_types(df) -> list[str]:
    out = []
    for _, dt in df.dtypes:
        if dt.startswith("decimal"):
            out.append(dt)
        else:
            out.append(_SPARK_TO_IMPALA.get(dt, dt))
    return out


def run_case(session, case: GoldenCase) -> None:
    """Execute one golden case; raise AssertionError with a diff on mismatch."""
    if case.catch is not None:
        # expected-error case: setup + query + materialization must
        # raise, and the message must carry the pinned substring
        try:
            for stmt in case.setup:
                session.sql(stmt)
            session.sql(case.query).collect()
        except AssertionError:
            raise
        except Exception as e:  # noqa: BLE001 — any engine error qualifies
            assert case.catch in str(e), (
                f"{case.id}: error does not contain CATCH text\n"
                f" expected substring: {case.catch}\n   actual: {str(e)[:500]}"
            )
            return
        raise AssertionError(f"{case.id}: expected an error containing {case.catch!r}")
    for stmt in case.setup:
        session.sql(stmt)
    df = session.sql(case.query)
    actual_types = spark_types(df)
    if case.types is not None:
        assert actual_types == case.types, (
            f"{case.id}: TYPES mismatch\n expected: {case.types}\n   actual: {actual_types}"
        )
    rows = [format_row(r, actual_types) for r in df.collect()]
    expected = list(case.results)
    assert len(rows) == len(expected), (
        f"{case.id}: row count {len(rows)} != expected {len(expected)}\n"
        f" expected:\n  " + "\n  ".join(expected[:10]) + "\n actual:\n  " + "\n  ".join(rows[:10])
    )
    if not case.ordered:
        rows, expected = sorted(rows), sorted(expected)
    for rn, (exp_line, act_line) in enumerate(zip(expected, rows)):
        exps, acts = split_cells(exp_line), split_cells(act_line)
        assert len(exps) == len(acts), (
            f"{case.id} row {rn}: cell count {len(acts)} != {len(exps)}\n"
            f" expected: {exp_line}\n   actual: {act_line}"
        )
        for cn, (e, a) in enumerate(zip(exps, acts)):
            typ = actual_types[cn] if cn < len(actual_types) else ""
            assert cells_match(e, a, typ), (
                f"{case.id} row {rn} col {cn} ({typ}):"
                f" expected {e!r}, got {a!r}\n full expected: {exp_line}\n full actual:   {act_line}"
            )
