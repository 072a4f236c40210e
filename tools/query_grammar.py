"""Grammar-driven random query generation against a live oracle.

Re-expresses the reference's random-query comparison harness
(`/root/reference/tests/comparison/query_generator.py:91`
`QueryGenerator.create_query`, `model_translator.py`,
`discrepancy_searcher.py`) for the Spark engine: a seeded generator
composes random SELECT queries — joins (INNER/LEFT/RIGHT/FULL),
inline views, WITH clauses, scalar expression trees, aggregation with
GROUP BY / HAVING / DISTINCT, IN / EXISTS subqueries, UNION [ALL],
ORDER BY ... LIMIT OFFSET — over the TPC-H tables, runs each through
the Impala-dialect surface (`ImpalaSession.sql` → dialect rewrite →
Catalyst) AND through DuckDB, and compares the full result multisets.

Unlike the reference (which leans on a human triaging known-flaky
discrepancies), every query this grammar emits is *deterministic
cross-engine by construction*:

- Aggregates over doubles (sum/avg) are order-dependent in their last
  ulps, so expressions are tagged ``fuzzy`` and may only reach the
  outermost SELECT list (compared with relative tolerance), never a
  WHERE / HAVING / join condition / GROUP BY, and never an ORDER BY
  key under a LIMIT.
- min/max/count and sums of bounded integers are exact and usable
  anywhere.
- ``double -> int`` casts are never generated (DuckDB rounds, Spark
  truncates); ``/`` denominators are NULLIF-guarded (both engines
  then yield NULL); ``%`` and ``*`` stay on bounded integers so
  BIGINT sums cannot overflow (Spark wraps, DuckDB widens to
  HUGEINT).
- ORDER BY under LIMIT always covers every output column with
  explicit NULLS FIRST/LAST, so ties at the cut are between identical
  rows and the multiset is unique.

Usage (the discrepancy-searcher twin):

    python tools/query_grammar.py --queries 200 --seed 0 [--sf DIR] [-v]
    python tools/query_grammar.py --insert ...   # CTAS + INSERT round-trips
    python tools/query_grammar.py --session ...  # v4 stateful session fuzz

Grammar v4 (round 7, r6 verdict #7): ``--session`` mirrors the
reference discrepancy searcher's STATEFUL runs — one persistent
ImpalaSession across all seeds, interleaving (seeded, reproducible):
SET/UNSET query-option mutations (DEFAULT_ORDER_BY_LIMIT with an
immediate truncation-semantics micro-check, PARQUET_COMPRESSION_CODEC
rotating the codec under subsequent CTAS round-trips, DISABLE_CODEGEN
flipping whole-stage codegen under plain compares, byte-size and
no-op options), CREATE VIEW persistence (views created from generated
queries are re-queried at later steps, after unrelated option
mutations), CTAS + INSERT…SELECT round-trips, and plain differential
compares — all against the same live DuckDB oracle.

Exit code 1 + a repro dump on the first mismatch. The pytest entry
(`tests/test_query_grammar.py`) runs a fixed seed range so CI is
deterministic.
"""

from __future__ import annotations

import math
import random
from dataclasses import dataclass, field, replace

# --- schema model ---------------------------------------------------------

#: column -> (kind, subtype, join-domain). kind: num|str|ts. subtype for
#: num: int|float. Join domains follow the TPC-H FK graph.
SCHEMA: dict[str, dict[str, tuple[str, str, str | None]]] = {
    "region": {
        "r_regionkey": ("num", "int", "regionkey"),
        "r_name": ("str", "", None),
    },
    "nation": {
        "n_nationkey": ("num", "int", "nationkey"),
        "n_name": ("str", "", None),
        "n_regionkey": ("num", "int", "regionkey"),
    },
    "customer": {
        "c_custkey": ("num", "int", "custkey"),
        "c_name": ("str", "", None),
        "c_nationkey": ("num", "int", "nationkey"),
        "c_acctbal": ("num", "float", None),
        "c_mktsegment": ("str", "", None),
    },
    "supplier": {
        "s_suppkey": ("num", "int", "suppkey"),
        "s_name": ("str", "", None),
        "s_nationkey": ("num", "int", "nationkey"),
        "s_acctbal": ("num", "float", None),
    },
    "part": {
        "p_partkey": ("num", "int", "partkey"),
        "p_name": ("str", "", None),
        "p_brand": ("str", "", None),
        "p_type": ("str", "", None),
        "p_size": ("num", "int", None),
        "p_retailprice": ("num", "float", None),
    },
    "orders": {
        "o_orderkey": ("num", "int", "orderkey"),
        "o_custkey": ("num", "int", "custkey"),
        "o_orderstatus": ("str", "", None),
        "o_totalprice": ("num", "float", None),
        "o_orderdate": ("ts", "", None),
        "o_orderpriority": ("str", "", None),
    },
    "lineitem": {
        "l_orderkey": ("num", "int", "orderkey"),
        "l_partkey": ("num", "int", "partkey"),
        "l_suppkey": ("num", "int", "suppkey"),
        "l_linenumber": ("num", "int", None),
        "l_quantity": ("num", "float", None),
        "l_extendedprice": ("num", "float", None),
        "l_discount": ("num", "float", None),
        "l_tax": ("num", "float", None),
        "l_returnflag": ("str", "", None),
        "l_linestatus": ("str", "", None),
        "l_shipdate": ("ts", "", None),
    },
}

#: big tables excluded from FULL-join fan-out pairings
TABLES = list(SCHEMA)


@dataclass
class Col:
    alias: str  # table alias that owns it
    name: str
    kind: str  # num | str | ts
    sub: str  # int | float | ''
    domain: str | None

    @property
    def sql(self) -> str:
        return f"{self.alias}.{self.name}"


@dataclass
class Expr:
    sql: str
    kind: str  # num | str | ts | bool
    sub: str = ""  # int | float | '' (num only)
    fuzzy: bool = False  # order-dependent float aggregate in lineage
    agg: bool = False  # contains an aggregate function


@dataclass
class TableRef:
    """A table or inline view in a FROM clause, with its visible columns."""

    alias: str
    sql: str  # rendered `name alias` or `(subquery) alias`
    cols: list[Col] = field(default_factory=list)


class LiteralPool:
    """Deterministic per-column literal samples, pulled once from the
    parquet data (evenly spaced distinct values, ordered) so generated
    predicates are selective rather than degenerate."""

    def __init__(self, sf_dir: str, con=None):
        import duckdb

        self.vals: dict[tuple[str, str], list] = {}
        own = con is None
        if own:
            con = duckdb.connect()
        for t, cols in SCHEMA.items():
            for c in cols:
                rows = con.sql(
                    f"SELECT DISTINCT {c} FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet') "
                    f"WHERE {c} IS NOT NULL ORDER BY {c}"
                ).fetchall()
                n = len(rows)
                idxs = sorted({0, n // 8, n // 4, n // 2, (3 * n) // 4, n - 1}) if n else []
                self.vals[(t, c)] = [rows[i][0] for i in idxs]
        if own:
            con.close()

    def pick(self, rng: random.Random, table: str, col: str):
        vs = self.vals.get((table, col)) or [0]
        return vs[rng.randrange(len(vs))]


#: DuckDB macro definitions that teach the oracle the Impala function
#: surface (the model-translator role of the reference's
#: `tests/comparison/model_translator.py`): each macro re-expresses an
#: Impala builtin that our dialect layer (impala_cut_spark/dialect.py
#: CALL_REWRITES) implements on Spark, with Impala's exact semantics
#: (probed side-by-side before being admitted to the grammar).
#: `isnull` cannot be macro'd (DuckDB parser keyword) — the grammar
#: emits the equivalent `nvl` instead.
ORACLE_MACROS = [
    "CREATE OR REPLACE MACRO zeroifnull(x) AS coalesce(x, 0)",
    "CREATE OR REPLACE MACRO nullifzero(x) AS nullif(x, 0)",
    "CREATE OR REPLACE MACRO nvl(a, b) AS coalesce(a, b)",
    "CREATE OR REPLACE MACRO strleft(s, n) AS left(s, CAST(n AS BIGINT))",
    "CREATE OR REPLACE MACRO strright(s, n) AS right(s, CAST(n AS BIGINT))",
    "CREATE OR REPLACE MACRO locate(sub, s) AS instr(s, sub)",
    "CREATE OR REPLACE MACRO quotient(a, b) AS CAST(a AS BIGINT) // CAST(b AS BIGINT)",
    "CREATE OR REPLACE MACRO to_date(t) AS strftime(CAST(t AS TIMESTAMP), '%Y-%m-%d')",
    "CREATE OR REPLACE MACRO days_add(t, n) AS CAST(t AS TIMESTAMP) + to_days(CAST(n AS INT))",
    "CREATE OR REPLACE MACRO months_add(t, n) AS CAST(t AS TIMESTAMP) + to_months(CAST(n AS INT))",
    "CREATE OR REPLACE MACRO hours_add(t, n) AS CAST(t AS TIMESTAMP) + to_hours(CAST(n AS INT))",
    "CREATE OR REPLACE MACRO adddate(t, n) AS CAST(t AS TIMESTAMP) + to_days(CAST(n AS INT))",
    "CREATE OR REPLACE MACRO days_sub(t, n) AS CAST(t AS TIMESTAMP) - to_days(CAST(n AS INT))",
    "CREATE OR REPLACE MACRO unix_timestamp(t) AS CAST(epoch(CAST(t AS TIMESTAMP)) AS BIGINT)",
    "CREATE OR REPLACE MACRO from_unixtime(n) AS "
    "strftime(to_timestamp(CAST(n AS BIGINT)), '%Y-%m-%d %H:%M:%S')",
    "CREATE OR REPLACE MACRO truncate(x, d) AS trunc(x * pow(10, d)) / pow(10, d)",
    "CREATE OR REPLACE MACRO max_smallint() AS CAST(32767 AS SMALLINT)",
    "CREATE OR REPLACE MACRO min_smallint() AS CAST(-32768 AS SMALLINT)",
    "CREATE OR REPLACE MACRO max_tinyint() AS CAST(127 AS TINYINT)",
    # grammar v3 (round-6): the rest of the interval-arithmetic family
    "CREATE OR REPLACE MACRO weeks_add(t, n) AS "
    "CAST(t AS TIMESTAMP) + to_days(CAST(7 * n AS INT))",
    "CREATE OR REPLACE MACRO minutes_add(t, n) AS "
    "CAST(t AS TIMESTAMP) + to_minutes(CAST(n AS INT))",
    "CREATE OR REPLACE MACRO seconds_add(t, n) AS "
    "CAST(t AS TIMESTAMP) + to_seconds(CAST(n AS INT))",
    "CREATE OR REPLACE MACRO years_add(t, n) AS "
    "CAST(t AS TIMESTAMP) + to_years(CAST(n AS INT))",
    "CREATE OR REPLACE MACRO date_sub(t, n) AS "
    "CAST(t AS TIMESTAMP) - to_days(CAST(n AS INT))",
]


def install_oracle_macros(con) -> None:
    for m in ORACLE_MACROS:
        con.sql(m)


def _null_pin(arg_sqls: list[str], inner: str) -> str:
    """Render Impala's any-NULL-in → NULL-out function semantics in
    engine-neutral SQL (identical result in Impala-dialect Spark and
    DuckDB)."""
    cond = " OR ".join(f"{a} IS NULL" for a in arg_sqls)
    return f"(CASE WHEN {cond} THEN NULL ELSE {inner} END)"


def render_literal(v, kind: str) -> str:
    import datetime

    if v is None:
        return "NULL"
    if kind == "str":
        s = str(v).replace("'", "''")
        return f"'{s}'"
    if kind == "ts":
        if isinstance(v, datetime.datetime):
            return f"TIMESTAMP '{v.strftime('%Y-%m-%d %H:%M:%S')}'"
        return f"TIMESTAMP '{v} 00:00:00'"
    if isinstance(v, float):
        return repr(v)
    return str(v)


# --- the generator --------------------------------------------------------


class QueryGen:
    """Seeded random query composer (reference parity:
    `tests/comparison/query_generator.py:93` create_query)."""

    def __init__(self, rng: random.Random, pool: LiteralPool):
        self.rng = rng
        self.pool = pool
        self._alias_n = 0
        self._cte_n = 0

    # -- helpers

    def _next_alias(self) -> str:
        self._alias_n += 1
        return f"t{self._alias_n}"

    def _chance(self, n: int) -> bool:
        return self.rng.randrange(n) == 0

    def _col_owner_table(self, col: Col, refs: list[TableRef]) -> str | None:
        """Base table name for literal sampling (None for view columns)."""
        for t, cols in SCHEMA.items():
            if col.name in cols and SCHEMA[t][col.name][:2] == (col.kind, col.sub):
                return t
        return None

    def _literal_for(self, col: Col) -> str:
        t = self._col_owner_table(col, [])
        if t is None:  # derived (view/CTE) column — typed fallback
            if col.kind == "ts":
                return "TIMESTAMP '1995-06-17 00:00:00'"
            return "0" if col.kind == "num" else "'a'"
        return render_literal(self.pool.pick(self.rng, t, col.name), col.kind)

    # -- scalar expressions (always exact / deterministic)

    def _pick_col(self, refs: list[TableRef], kind: str, sub: str | None = None) -> Col | None:
        cands = [
            c
            for r in refs
            for c in r.cols
            if c.kind == kind and (sub is None or c.sub == sub)
        ]
        return self.rng.choice(cands) if cands else None

    def num_expr(self, refs: list[TableRef], depth: int) -> Expr | None:
        r = self.rng
        if depth <= 0 or self._chance(2):
            c = self._pick_col(refs, "num")
            if c is None:
                return None
            return Expr(c.sql, "num", c.sub)
        roll = r.randrange(15)
        if roll == 14:  # ascii: first-codepoint, 0 on '' in both engines
            s = self.str_expr(refs, depth - 1)
            if s is None:
                return None
            return Expr(f"ascii({s.sql})", "num", "int")
        if roll == 0:  # literal (occasionally an Impala type-constant fn)
            if self._chance(8):
                # BIGINT-cast: DuckDB would keep INT16 through
                # arithmetic and raise on overflow where Impala/Spark
                # promote
                fn = r.choice(["max_smallint()", "min_smallint()", "max_tinyint()"])
                return Expr(f"CAST({fn} AS BIGINT)", "num", "int")
            return Expr(str(r.randrange(1, 100)), "num", "int")
        if roll == 1:  # + / -
            a, b = self.num_expr(refs, depth - 1), self.num_expr(refs, depth - 1)
            if a is None or b is None:
                return None
            op = r.choice(["+", "-"])
            sub = "int" if a.sub == "int" and b.sub == "int" else "float"
            return Expr(f"({a.sql} {op} {b.sql})", "num", sub)
        if roll == 2:  # bounded multiply (keeps BIGINT sums overflow-free)
            a = self.num_expr(refs, depth - 1)
            if a is None:
                return None
            return Expr(f"({r.randrange(2, 20)} * {a.sql})", "num", a.sub)
        if roll == 3:  # guarded division -> float
            a, b = self.num_expr(refs, depth - 1), self.num_expr(refs, depth - 1)
            if a is None or b is None:
                return None
            return Expr(f"({a.sql} / NULLIF({b.sql}, 0))", "num", "float")
        if roll == 4:  # modulo, ints only
            c = self._pick_col(refs, "num", "int")
            if c is None:
                return None
            return Expr(f"({c.sql} % {r.randrange(2, 30)})", "num", "int")
        if roll == 5:  # unary num funcs
            a = self.num_expr(refs, depth - 1)
            if a is None:
                return None
            fn = r.choice(["abs", "floor", "ceil"])
            sub = a.sub if fn == "abs" else "int"
            return Expr(f"{fn}({a.sql})", "num", sub)
        if roll == 6:  # string -> int: length / instr / locate
            s = self.str_expr(refs, depth - 1)
            if s is None:
                return None
            sub_roll = r.randrange(3)
            if sub_roll == 0:
                return Expr(f"length({s.sql})", "num", "int")
            needle = r.choice(["a", "e", "er", "#1", "o"])
            if sub_roll == 1:
                return Expr(f"instr({s.sql}, '{needle}')", "num", "int")
            return Expr(f"locate('{needle}', {s.sql})", "num", "int")
        if roll == 8:  # Impala null-plumbing: zeroifnull / nullifzero
            a = self.num_expr(refs, depth - 1)
            if a is None:
                return None
            fn = r.choice(["zeroifnull", "nullifzero"])
            return Expr(f"{fn}({a.sql})", "num", a.sub)
        if roll == 9:  # quotient / fmod against a nonzero literal
            if self._chance(2):
                c = self._pick_col(refs, "num", "int")
                if c is None:
                    return None
                # raw nonnegative column + positive divisor: floor- vs
                # truncate-division agree
                return Expr(f"quotient({c.sql}, {r.randrange(2, 30)})", "num", "int")
            a = self.num_expr(refs, depth - 1)
            if a is None:
                return None
            # abs(): DuckDB's fmod is floored (always-positive) on a
            # negative dividend; Impala/Spark keep C semantics (sign of
            # dividend) — only the non-negative domain is comparable
            return Expr(f"fmod(abs({a.sql}), {r.randrange(2, 9)}.5)", "num", "float")
        if roll == 10:  # timestamp field extraction
            ts = self.ts_expr(refs, depth - 1)
            if ts is None:
                return None
            fn = r.choice(["year", "month", "day", "hour", "minute", "second"])
            return Expr(f"{fn}({ts.sql})", "num", "int")
        if roll == 11:  # epoch seconds
            ts = self.ts_expr(refs, depth - 1)
            if ts is None:
                return None
            return Expr(f"unix_timestamp({ts.sql})", "num", "int")
        if roll == 12:  # Impala truncate(x, d) — toward zero
            a = self.num_expr(refs, depth - 1)
            if a is None:
                return None
            return Expr(f"truncate({a.sql}, {r.randrange(0, 4)})", "num", "float")
        if roll == 13:  # sqrt: correctly-rounded IEEE op, exact cross-engine
            a = self.num_expr(refs, depth - 1)
            if a is None:
                return None
            return Expr(f"sqrt(abs({a.sql}))", "num", "float")
        # least/greatest — Impala returns NULL when ANY argument is
        # NULL (reference be/src/exprs/expr-test.cc greatest tests);
        # DuckDB skips NULLs, so pin the Impala semantics explicitly
        # in the shared SQL
        a, b = self.num_expr(refs, depth - 1), self.num_expr(refs, depth - 1)
        if a is None or b is None:
            return None
        fn = r.choice(["least", "greatest"])
        sub = "int" if a.sub == "int" and b.sub == "int" else "float"
        return Expr(_null_pin([a.sql, b.sql], f"{fn}({a.sql}, {b.sql})"), "num", sub)

    def str_expr(self, refs: list[TableRef], depth: int) -> Expr | None:
        r = self.rng
        if depth <= 0 or self._chance(2):
            c = self._pick_col(refs, "str")
            if c is None:
                return None
            return Expr(c.sql, "str")
        roll = r.randrange(12)
        if roll == 0:
            c = self._pick_col(refs, "str")
            if c is None:
                return None
            return Expr(self._literal_for(c), "str")
        if roll == 10:  # replace / split_part (grammar v3)
            a = self.str_expr(refs, depth - 1)
            if a is None:
                return None
            if self._chance(2):
                x, y = r.choice([("a", "@"), ("e", ""), ("er", "ER"), ("1", "one")])
                return Expr(f"replace({a.sql}, '{x}', '{y}')", "str")
            # 1-based; out-of-range yields '' in Spark and DuckDB
            # alike — but NULL input propagates NULL in Impala/Spark
            # while DuckDB returns '' (sweep seed 1940), so pin the
            # Impala semantics in the shared SQL
            inner = f"split_part({a.sql}, '{r.choice(['#', 'e', ' '])}', {r.randrange(1, 4)})"
            return Expr(_null_pin([a.sql], inner), "str")
        if roll == 11:  # concat_ws: Impala returns NULL on any-NULL arg
            # (dialect.py CALL_REWRITES pins it); DuckDB skips NULLs, so
            # the shared SQL pins the Impala semantics explicitly
            a, b = self.str_expr(refs, depth - 1), self.str_expr(refs, depth - 1)
            if a is None or b is None:
                return None
            return Expr(
                _null_pin([a.sql, b.sql], f"concat_ws('-', {a.sql}, {b.sql})"), "str"
            )
        if roll == 6:  # strleft / strright
            a = self.str_expr(refs, depth - 1)
            if a is None:
                return None
            fn = r.choice(["strleft", "strright"])
            return Expr(f"{fn}({a.sql}, {r.randrange(0, 9)})", "str")
        if roll == 7:  # nvl / lpad / rpad / repeat / reverse
            a = self.str_expr(refs, depth - 1)
            if a is None:
                return None
            sub_roll = r.randrange(4)
            if sub_roll == 0:
                return Expr(f"nvl({a.sql}, 'missing')", "str")
            if sub_roll == 1:
                fn = r.choice(["lpad", "rpad"])
                return Expr(f"{fn}({a.sql}, {r.randrange(1, 13)}, 'xy')", "str")
            if sub_roll == 2:
                return Expr(f"repeat(substr({a.sql}, 1, 4), {r.randrange(1, 4)})", "str")
            return Expr(f"reverse({a.sql})", "str")
        if roll == 8:  # timestamp renderers: to_date / dayname / from_unixtime
            ts = self.ts_expr(refs, depth - 1)
            if ts is None:
                return None
            sub_roll = r.randrange(3)
            if sub_roll == 0:
                return Expr(f"to_date({ts.sql})", "str")
            if sub_roll == 1:
                return Expr(f"dayname({ts.sql})", "str")
            return Expr(
                f"from_unixtime(unix_timestamp({ts.sql}) + {r.randrange(0, 90000)})",
                "str",
            )
        if roll == 9:  # Impala interval arithmetic rendered back to num/str path
            ts = self.ts_expr(refs, depth - 1)
            if ts is None:
                return None
            fn = r.choice(["days_add", "months_add", "hours_add", "adddate", "days_sub"])
            return Expr(f"to_date({fn}({ts.sql}, {r.randrange(0, 40)}))", "str")
        if roll == 1:
            a = self.str_expr(refs, depth - 1)
            if a is None:
                return None
            return Expr(f"{r.choice(['upper', 'lower', 'trim'])}({a.sql})", "str")
        if roll == 2:
            a = self.str_expr(refs, depth - 1)
            if a is None:
                return None
            return Expr(f"substr({a.sql}, {r.randrange(1, 5)}, {r.randrange(1, 9)})", "str")
        if roll == 3:
            # concat: NULL-propagating in Impala and Spark, NULL-
            # skipping in DuckDB — pin the Impala semantics
            a, b = self.str_expr(refs, depth - 1), self.str_expr(refs, depth - 1)
            if a is None or b is None:
                return None
            return Expr(
                _null_pin([a.sql, b.sql], f"concat({a.sql}, '#', {b.sql})"), "str"
            )
        if roll == 4:  # int -> string cast (float casts render differently)
            a = self.num_expr(refs, depth - 1)
            if a is None or a.sub != "int":
                return None
            # inner BIGINT cast: int-subtype exprs are integer-VALUED,
            # but DuckDB types floor()/ceil() of a double as DOUBLE and
            # would render "45.0" where Spark's BIGINT renders "45"
            return Expr(f"CAST(CAST({a.sql} AS BIGINT) AS STRING)", "str")
        # case-when
        p = self.bool_expr(refs, depth - 1)
        a, b = self.str_expr(refs, depth - 1), self.str_expr(refs, depth - 1)
        if p is None or a is None or b is None:
            return None
        return Expr(f"(CASE WHEN {p.sql} THEN {a.sql} ELSE {b.sql} END)", "str")

    def ts_expr(self, refs: list[TableRef], depth: int) -> Expr | None:
        c = self._pick_col(refs, "ts")
        if c is None:
            return None
        if self._chance(4):
            return Expr(self._literal_for(c), "ts")
        if depth > 0 and self._chance(4):  # Impala interval arithmetic
            fn = self.rng.choice(
                ["days_add", "months_add", "hours_add", "days_sub",
                 "weeks_add", "minutes_add", "seconds_add", "years_add",
                 "date_sub"]
            )
            return Expr(f"{fn}({c.sql}, {self.rng.randrange(0, 40)})", "ts")
        return Expr(c.sql, "ts")

    def any_scalar(self, refs: list[TableRef], depth: int) -> Expr | None:
        kind = self.rng.choice(["num", "num", "str", "ts"])
        if kind == "num":
            return self.num_expr(refs, depth)
        if kind == "str":
            return self.str_expr(refs, depth)
        return self.ts_expr(refs, depth)

    # -- boolean expressions

    def bool_expr(self, refs: list[TableRef], depth: int, allow_subquery: bool = False) -> Expr | None:
        r = self.rng
        if depth > 0 and self._chance(3):
            a = self.bool_expr(refs, depth - 1, allow_subquery)
            b = self.bool_expr(refs, depth - 1, allow_subquery)
            if a is None or b is None:
                return None
            op = r.choice(["AND", "OR"])
            neg = "NOT " if self._chance(5) else ""
            return Expr(f"{neg}({a.sql} {op} {b.sql})", "bool")
        roll = r.randrange(10)
        if roll in (0, 1, 2):  # numeric comparison vs data literal
            c = self._pick_col(refs, "num")
            if c is None:
                return None
            op = r.choice(["=", "<>", "<", "<=", ">", ">="])
            return Expr(f"{c.sql} {op} {self._literal_for(c)}", "bool")
        if roll == 3:  # expr-vs-expr comparison (exact scalars only)
            a = self.num_expr(refs, depth - 1)
            b = self.num_expr(refs, depth - 1)
            if a is None or b is None:
                return None
            op = r.choice(["<", "<=", ">", ">="])
            return Expr(f"{a.sql} {op} {b.sql}", "bool")
        if roll == 4:  # string comparison / LIKE
            c = self._pick_col(refs, "str")
            if c is None:
                return None
            if self._chance(2):
                import re as _re

                lit = self._literal_for(c)[1:-1]
                frag = lit[: self.rng.randrange(1, max(2, min(6, len(lit) or 1)))] if lit else "a"
                frag = _re.sub(r"[%_'\\\\]", "", frag) or "a"
                pat = self.rng.choice([f"{frag}%", f"%{frag}%", f"%{frag}"])
                neg = "NOT " if self._chance(4) else ""
                return Expr(f"{c.sql} {neg}LIKE '{pat}'", "bool")
            op = r.choice(["=", "<>", "<", ">"])
            return Expr(f"{c.sql} {op} {self._literal_for(c)}", "bool")
        if roll == 5:  # BETWEEN
            c = self._pick_col(refs, "num") or self._pick_col(refs, "ts")
            if c is None:
                return None
            a, b = self._literal_for(c), self._literal_for(c)
            return Expr(f"{c.sql} BETWEEN least({a}, {b}) AND greatest({a}, {b})", "bool")
        if roll == 6:  # IN literal list
            c = self._pick_col(refs, "num") or self._pick_col(refs, "str")
            if c is None:
                return None
            lits = ", ".join(self._literal_for(c) for _ in range(r.randrange(2, 5)))
            neg = "NOT " if self._chance(4) else ""
            return Expr(f"{c.sql} {neg}IN ({lits})", "bool")
        if roll == 7:  # IS [NOT] NULL (real NULLs arrive via outer joins)
            c = self._pick_col(refs, r.choice(["num", "str"]))
            if c is None:
                return None
            neg = "NOT " if self._chance(2) else ""
            return Expr(f"{c.sql} IS {neg}NULL", "bool")
        if roll == 8:  # ts comparison
            c = self._pick_col(refs, "ts")
            if c is None:
                return None
            op = r.choice(["<", "<=", ">", ">=", "="])
            return Expr(f"{c.sql} {op} {self._literal_for(c)}", "bool")
        # subqueries (WHERE-level only): uncorrelated IN / correlated
        # EXISTS / uncorrelated scalar comparison
        if allow_subquery:
            if self._chance(3):  # scalar subquery: col <op> (SELECT agg ...)
                c = self._pick_col(refs, "num")
                t2 = r.choice(TABLES)
                al = self._next_alias()
                inner = self._pick_col(
                    [TableRef(al, "", _table_cols(t2, al))], "num"
                )
                if c is not None and inner is not None:
                    # exact aggregates only (min/max/count) — a fuzzy
                    # avg/sum-of-double threshold could flip rows
                    fn = r.choice(["min", "max", "count"])
                    op = r.choice(["<", "<=", ">", ">=", "<>"])
                    return Expr(
                        f"{c.sql} {op} (SELECT {fn}({inner.sql}) FROM {t2} {al})",
                        "bool",
                    )
            c = self._pick_col(refs, "num")
            if c is not None and c.domain is not None:
                others = [
                    (t, n)
                    for t, cols in SCHEMA.items()
                    for n, meta in cols.items()
                    if meta[2] == c.domain
                ]
                t, n = r.choice(others)
                al = self._next_alias()
                if self._chance(2):  # correlated EXISTS
                    extra = ""
                    sc = self._pick_col(
                        [TableRef(al, "", _table_cols(t, al))], r.choice(["num", "str"])
                    )
                    if sc is not None and self._chance(2):
                        extra = f" AND {sc.sql} {r.choice(['<', '>', '<>'])} {self._literal_for(sc)}"
                    neg = "NOT " if self._chance(3) else ""
                    return Expr(
                        f"{neg}EXISTS (SELECT 1 FROM {t} {al} WHERE {al}.{n} = {c.sql}{extra})",
                        "bool",
                    )
                inner_pred = ""
                sc = self._pick_col([TableRef(al, "", _table_cols(t, al))], "num")
                if sc is not None and self._chance(2):
                    inner_pred = f" WHERE {sc.sql} {r.choice(['<', '>'])} {self._literal_for(sc)}"
                neg = "NOT " if self._chance(4) else ""
                return Expr(
                    f"{c.sql} {neg}IN (SELECT {al}.{n} FROM {t} {al}{inner_pred})", "bool"
                )
        c = self._pick_col(refs, "num")
        if c is None:
            return None
        return Expr(f"{c.sql} >= {self._literal_for(c)}", "bool")

    # -- aggregates

    def agg_expr(self, refs: list[TableRef], depth: int) -> Expr | None:
        r = self.rng
        roll = r.randrange(7)
        if roll == 0:
            return Expr("count(*)", "num", "int", agg=True)
        if roll == 1:
            e = self.any_scalar(refs, 1)
            if e is None:
                return None
            d = "DISTINCT " if self._chance(3) else ""
            return Expr(f"count({d}{e.sql})", "num", "int", agg=True)
        if roll in (2, 3):  # min / max: order-independent on any type
            e = self.any_scalar(refs, depth - 1)
            if e is None:
                return None
            return Expr(f"{r.choice(['min', 'max'])}({e.sql})", e.kind, e.sub, agg=True)
        if roll == 4:  # exact integer sum
            e = self.num_expr(refs, depth - 1)
            if e is None or e.sub != "int":
                return None
            return Expr(f"sum({e.sql})", "num", "int", agg=True)
        if roll == 5:  # float sum — order-dependent => fuzzy
            e = self.num_expr(refs, depth - 1)
            if e is None:
                return None
            return Expr(f"sum({e.sql})", "num", "float", agg=True, fuzzy=e.sub == "float")
        e = self.num_expr(refs, 1)
        if e is None:
            return None
        fn = self.rng.choice(["avg", "avg", "var_samp", "stddev_samp"])
        return Expr(f"{fn}({e.sql})", "num", "float", agg=True, fuzzy=True)

    # -- FROM clause

    def _make_table_ref(self, depth: int, ctes: dict[str, list[Col]]) -> TableRef:
        r = self.rng
        al = self._next_alias()
        if ctes and self._chance(4):
            name = r.choice(list(ctes))
            cols = [replace(c, alias=al) for c in ctes[name]]
            return TableRef(al, f"{name} {al}", cols)
        if depth > 0 and self._chance(6):  # inline view
            q = self.create_query(depth - 1, ctes, inner=True)
            # fuzzy (order-dependent float-agg) view columns stay
            # invisible upstream: they must never reach a predicate,
            # join condition, or group key
            cols = [
                replace(c, alias=al)
                for c, fz in zip(q.out_cols, q.fuzzy)
                if not fz
            ]
            if cols:
                return TableRef(al, f"({q.sql}) {al}", cols)
        t = r.choice(TABLES)
        return TableRef(al, f"{t} {al}", _table_cols(t, al))

    def _join_cond(self, left: list[TableRef], right: TableRef) -> str | None:
        cands = []
        for lr in left:
            for lc in lr.cols:
                if lc.domain is None:
                    continue
                for rc in right.cols:
                    if rc.domain == lc.domain:
                        cands.append((lc, rc))
        if not cands:
            return None
        lc, rc = self.rng.choice(cands)
        cond = f"{lc.sql} = {rc.sql}"
        if self._chance(4):  # extra non-equi conjunct
            e = self.bool_expr(left + [right], 1)
            if e is not None:
                cond += f" AND {e.sql}"
        return cond

    # -- the query

    def create_query(
        self,
        depth: int,
        ctes: dict[str, list[Col]] | None = None,
        inner: bool = False,
        sig: list[tuple[str, str]] | None = None,
    ) -> "GenQuery":
        r = self.rng
        ctes = dict(ctes or {})

        with_sql = ""
        if not inner and self._chance(6):
            name = f"cte{self._cte_n}"
            self._cte_n += 1
            cq = self.create_query(max(0, depth - 1), inner=True)
            visible = [
                replace(c, alias="")
                for c, fz in zip(cq.out_cols, cq.fuzzy)
                if not fz
            ]
            if visible:
                with_sql = f"WITH {name} AS ({cq.sql}) "
                ctes[name] = visible

        refs = [self._make_table_ref(depth, ctes)]
        joins: list[str] = []
        n_joins = 0
        while n_joins < 3 and self._chance(2):
            right = self._make_table_ref(max(0, depth - 1), ctes)
            cond = self._join_cond(refs, right)
            if cond is None:
                break
            kind = r.choice(
                ["JOIN", "JOIN", "JOIN", "LEFT JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"]
            )
            joins.append(f"{kind} {right.sql} ON {cond}")
            refs.append(right)
            n_joins += 1

        # select items; signature-matched for UNION partners
        items: list[Expr] = []
        if sig is not None:
            for kind, sub in sig:
                e = (
                    self.num_expr(refs, depth)
                    if kind == "num"
                    else self.str_expr(refs, depth)
                    if kind == "str"
                    else self.ts_expr(refs, depth)
                )
                if e is None:  # fall back to a typed literal
                    e = Expr(
                        {"num": "0", "str": "'x'", "ts": "TIMESTAMP '1995-01-01 00:00:00'"}[kind],
                        kind,
                        sub,
                    )
                if kind == "num" and sub == "float" and e.sub == "int":
                    e = Expr(f"CAST({e.sql} AS DOUBLE)", "num", "float")
                items.append(e)
            do_agg = False
        else:
            do_agg = self._chance(3)
            n_items = r.randrange(1, 5)
            for _ in range(n_items):
                if do_agg and (not items or self._chance(2)):
                    e = self.agg_expr(refs, 2)
                else:
                    e = self.any_scalar(refs, 2 if not inner else 1)
                if e is not None:
                    items.append(e)
            if not items:
                items = [Expr("count(*)", "num", "int", agg=True)] if do_agg else [
                    Expr(refs[0].cols[0].sql, refs[0].cols[0].kind, refs[0].cols[0].sub)
                ]

        agg_items = [e for e in items if e.agg]
        non_agg = [e for e in items if not e.agg]

        where = None
        if self._chance(2):
            where = self.bool_expr(refs, 2, allow_subquery=not inner)

        # group by select-list ordinals: grouping by expression text
        # would misparse bare integer-literal items as ordinals
        group_by = (
            [str(i + 1) for i, e in enumerate(items) if not e.agg]
            if agg_items and non_agg
            else []
        )
        having = None
        if agg_items and self._chance(3):
            # exact aggregates only: a fuzzy threshold would flip rows
            h = self.agg_expr(refs, 1)
            if h is not None and not h.fuzzy and h.kind == "num":
                having = f"{h.sql} {r.choice(['>', '>=', '<'])} {r.randrange(0, 50)}"

        distinct = ""
        if not agg_items and self._chance(8):
            distinct = "DISTINCT "

        aliased = ", ".join(f"{e.sql} AS c{i}" for i, e in enumerate(items))
        sql = f"{with_sql}SELECT {distinct}{aliased} FROM {refs[0].sql}"
        for j in joins:
            sql += f" {j}"
        if where is not None:
            sql += f" WHERE {where.sql}"
        if group_by:
            sql += f" GROUP BY {', '.join(group_by)}"
        if having is not None:
            sql += f" HAVING {having}"

        # UNION partner with a matching type signature
        if sig is None and not inner and self._chance(6):
            part_sig = [(e.kind, e.sub) for e in items]
            uq = self.create_query(max(0, depth - 1), inner=True, sig=part_sig)
            op = "UNION ALL" if self._chance(2) else "UNION"
            if op == "UNION" and any(e.fuzzy for e in items):
                op = "UNION ALL"  # fuzzy values must not drive dedup
            sql = f"{sql} {op} {uq.sql}"

        # ORDER BY + LIMIT: only when every output column is exact, and
        # always over ALL columns (ties at the cut are identical rows).
        # Never on a UNION partner — its un-parenthesized ORDER BY
        # would bind to the whole union, sorting the outer (possibly
        # fuzzy) columns.
        if sig is None and not any(e.fuzzy for e in items) and self._chance(3):
            keys = ", ".join(
                f"{i + 1} {d} {n}"
                for i, (d, n) in enumerate(
                    (r.choice([("ASC", "NULLS LAST"), ("DESC", "NULLS FIRST")]))
                    for _ in items
                )
            )
            lim = r.randrange(1, 60)
            off = f" OFFSET {r.randrange(0, 10)}" if self._chance(4) else ""
            sql += f" ORDER BY {keys} LIMIT {lim}{off}"

        out_cols = [
            Col("", f"c{i}", e.kind, e.sub, _out_domain(e, refs)) for i, e in enumerate(items)
        ]
        return GenQuery(sql=sql, out_cols=out_cols, fuzzy=[e.fuzzy for e in items])


def _table_cols(t: str, alias: str) -> list[Col]:
    return [Col(alias, n, k, s, d) for n, (k, s, d) in SCHEMA[t].items()]


def _out_domain(e: Expr, refs: list[TableRef]) -> str | None:
    """Preserve the join domain when a select item is a bare key column,
    so inline views / CTEs stay joinable upstream."""
    for r in refs:
        for c in r.cols:
            if e.sql == c.sql:
                return c.domain
    return None


@dataclass
class GenQuery:
    sql: str
    out_cols: list[Col]
    fuzzy: list[bool]


# --- comparison -----------------------------------------------------------


def _norm(v):
    import datetime
    from decimal import Decimal

    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, bool):
        return int(v)
    if hasattr(v, "item"):
        return _norm(v.item())
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat() + " 00:00:00"
    return v


def _sort_key(row, fuzzy):
    # Alignment must never depend on a fuzzy value's low bits (they
    # differ between engines), and must never leave ties to Python's
    # stable sort (that keeps engine-specific input order — sweep seed
    # 2943).  So the key is three-tier:
    #   1. every EXACT cell at full precision (bit-identical
    #      cross-engine — rows differing anywhere exact always align
    #      by this tier; sweep seed 922 showed a fuzzy tier-1 key
    #      misaligns two different groups with near-equal averages),
    #   2. fuzzy cells at coarse 6-sig-digit precision (stable under
    #      low-bit noise),
    #   3. fuzzy cells at full precision as the last-resort tie-break
    #      (rows reaching this tier are equal on ALL exact cells and
    #      coarsely equal on fuzzy ones; if noise flips a pair here,
    #      the crossed pairs still compare within tolerance).
    exact, coarse, fine = [], [], []
    for j, v in enumerate(row):
        fz = fuzzy[j] if fuzzy and j < len(fuzzy) else True
        if v is None:
            cell = (0, "")
        elif isinstance(v, (int, float)):
            cell = (1, f"{float(v):.17g}")
        else:
            cell = (2, str(v))
        if fz and isinstance(v, (int, float)):
            coarse.append((1, f"{float(v):.6g}"))
            fine.append(cell)
        else:
            exact.append(cell)
    return (exact, coarse, fine)


def _cells_equal(a, b, fz: bool) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        tol = 1e-8 if fz else 1e-12
        return math.isclose(fa, fb, rel_tol=tol, abs_tol=tol)
    return a == b


def compare_results(spark_rows, duck_rows, fuzzy=None) -> str | None:
    """None if multisets match (fuzzy columns with tolerance), else a message."""
    key = lambda r: _sort_key(r, fuzzy)  # noqa: E731
    a = sorted(([_norm(v) for v in r] for r in spark_rows), key=key)
    b = sorted(([_norm(v) for v in r] for r in duck_rows), key=key)
    if len(a) != len(b):
        return f"row count: spark={len(a)} duckdb={len(b)}"
    for i, (ra, rb) in enumerate(zip(a, b)):
        if len(ra) != len(rb):
            return f"width: {len(ra)} vs {len(rb)}"
        for j, (va, vb) in enumerate(zip(ra, rb)):
            fz = fuzzy[j] if fuzzy and j < len(fuzzy) else True
            if not _cells_equal(va, vb, fz):
                return f"row {i} col c{j}: spark={va!r} duckdb={vb!r}"
    return None


def run_one(isess, con, sql: str, fuzzy=None) -> str | None:
    spark_rows = [tuple(r) for r in isess.sql(sql).collect()]
    duck_rows = con.sql(sql).fetchall()
    return compare_results(spark_rows, duck_rows, fuzzy)


def run_insert_roundtrip(isess, con, q: "GenQuery", name: str = "grammar_rt") -> str | None:
    """INSERT…SELECT round-trip (grammar v3, round-6): materialize the
    generated query in BOTH engines — Impala-dialect ``CREATE TABLE …
    STORED AS PARQUET AS <q>`` then ``INSERT INTO … <q>`` appending the
    same rows — and compare the tables read back.  Exercises the CTAS +
    INSERT DML path (dialect rewrite, parquet sink, catalog read-back)
    over arbitrary grammar payloads, which the SELECT-only differential
    never touched.  Output aliases c0..cN make the CTAS schema valid by
    construction; LIMIT queries are total-ordered by the grammar so the
    doubled multiset is engine-independent."""
    isess.sql(f"drop table if exists {name}")
    con.sql(f"DROP TABLE IF EXISTS {name}")
    try:
        isess.sql(f"create table {name} stored as parquet as {q.sql}")
        isess.sql(f"insert into {name} {q.sql}")
        con.sql(f"CREATE TABLE {name} AS {q.sql}")
        con.sql(f"INSERT INTO {name} {q.sql}")
        readback = f"SELECT * FROM {name}"
        spark_rows = [tuple(r) for r in isess.sql(readback).collect()]
        duck_rows = con.sql(readback).fetchall()
        return compare_results(spark_rows, duck_rows, q.fuzzy)
    finally:
        isess.sql(f"drop table if exists {name}")
        con.sql(f"DROP TABLE IF EXISTS {name}")


def generate(seed: int, pool: LiteralPool, depth: int = 2) -> GenQuery:
    rng = random.Random(seed)
    return QueryGen(rng, pool).create_query(depth=depth)


# --- grammar v4: stateful session fuzz -------------------------------------

#: option mutations the session fuzz draws from: (key, value-choices).
#: DEFAULT_ORDER_BY_LIMIT uses non-truncating magnitudes for the plain
#: compares (the oracle runs the RAW sql, so a truncating limit would
#: be a false positive on non-total-ordered queries); the truncating
#: semantics are checked by a dedicated total-ordered micro-probe at
#: every SET (below).
_SESSION_OPTIONS: list[tuple[str, list[str]]] = [
    ("default_order_by_limit", ["10000000", "50000000"]),
    ("parquet_compression_codec", ["snappy", "gzip", "zstd", "none"]),
    ("disable_codegen", ["1", "0"]),
    ("parquet_file_size", ["67108864", "268435456"]),
    ("batch_size", ["1024", "0"]),
    ("mem_limit", ["1g", "0"]),
    ("num_nodes", ["1", "0"]),
]


#: row-explosion guard for the session fuzz: a handful of seeds
#: legitimately compose self-join fan-outs in the tens of millions of
#: rows (e.g. seed 32901: lineitem⋈lineitem on the ~30-value suppkey,
#: right-joined to a lineitem CTE — 82M result rows at sf0.001). The
#: differential's value is the compare, not hauling 80M rows into
#: Python, so steps whose ORACLE-side count exceeds this cap are
#: counted and reported as skipped (a DuckDB count(*) over the same
#: query takes <1s — the cheap side decides).
SESSION_ROW_CAP = 5_000_000


def _oracle_rows(con, sql: str) -> int:
    return con.sql(f"SELECT count(*) FROM ({sql})").fetchone()[0]


def _dol_probe(isess, con, n: int) -> str | None:
    """Truncation-semantics check for DEFAULT_ORDER_BY_LIMIT over a
    total-ordered statement: the session must append LIMIT n to a
    top-level ORDER BY without LIMIT; the oracle runs it explicitly."""
    sql = "select n_nationkey, n_name from nation order by n_nationkey"
    spark_rows = [tuple(r) for r in isess.sql(sql).collect()]
    duck_rows = con.sql(f"{sql} LIMIT {n}").fetchall()
    msg = compare_results(spark_rows, duck_rows)
    return f"default_order_by_limit probe (n={n}): {msg}" if msg else None


def run_session_fuzz(isess, con, pool, args) -> int:
    """One PERSISTENT session across all seeds; each step draws a
    (seeded) action so runs are reproducible: option mutation, option
    unset, CTAS+INSERT round-trip under the current codec, CREATE VIEW
    + compare, re-query of an EARLIER view (definition stability across
    unrelated mutations), or a plain differential compare under
    whatever options are live."""
    import sys
    import time

    bad = 0
    skipped = 0
    active: dict[str, str] = {}
    views: list[tuple[str, object]] = []  # (name, fuzzy)
    t0 = time.time()
    for s in range(args.seed, args.seed + args.queries):
        arng = random.Random(f"session-{s}")
        q = generate(s, pool, depth=args.depth)
        roll = arng.random()
        msg = None
        what = "compare"
        try:
            if _oracle_rows(con, q.sql) > SESSION_ROW_CAP:
                skipped += 1
                if args.verbose:
                    print(f"-- seed {s} [SKIPPED: row-explosion guard]")
                continue
            if roll < 0.12:  # SET mutation
                key, choices = arng.choice(_SESSION_OPTIONS)
                val = arng.choice(choices)
                what = f"set {key}={val}"
                isess.sql(f"set {key}={val}")
                active[key] = val
                if key == "default_order_by_limit":
                    # semantic micro-probe with a genuinely truncating
                    # value, then restore the non-truncating one
                    isess.set_option(key, "7")
                    msg = _dol_probe(isess, con, 7)
                    isess.set_option(key, val)
                if msg is None:
                    msg = run_one(isess, con, q.sql, q.fuzzy)
            elif roll < 0.20 and active:  # UNSET a live option
                key = arng.choice(sorted(active))
                what = f"unset {key}"
                isess.unset_option(key)
                del active[key]
                msg = run_one(isess, con, q.sql, q.fuzzy)
            elif roll < 0.35:  # CTAS + INSERT under the current codec
                what = f"insert-roundtrip (codec={active.get('parquet_compression_codec', 'default')})"
                msg = run_insert_roundtrip(isess, con, q, name=f"grammar_rt_{s}")
            elif roll < 0.45:  # CREATE VIEW from this query
                name = f"gv_{s}"
                what = f"create view {name}"
                isess.sql(f"create view {name} as {q.sql}")
                con.sql(f"CREATE VIEW {name} AS {q.sql}")
                views.append((name, q.fuzzy))
                msg = run_one(isess, con, f"select * from {name}", q.fuzzy)
            elif roll < 0.55 and views:  # re-query an earlier view
                name, fz = arng.choice(views)
                what = f"requery view {name}"
                msg = run_one(isess, con, f"select * from {name}", fz)
            else:
                msg = run_one(isess, con, q.sql, q.fuzzy)
        except Exception as e:  # an engine rejecting a step IS a finding
            msg = f"exception: {type(e).__name__}: {str(e)[:300]}"
        if args.verbose:
            print(f"-- seed {s} [{what}]")
        if msg is not None:
            bad += 1
            print(
                f"\nDISCREPANCY seed={s} [{what}] options={active}: {msg}\n{q.sql}\n",
                file=sys.stderr,
            )
    for name, _ in views:
        isess.sql(f"drop view if exists {name}")
        con.sql(f"DROP VIEW IF EXISTS {name}")
    for key in list(active):
        isess.unset_option(key)
    dt = time.time() - t0
    print(
        f"{args.queries} session-fuzz steps, {bad} discrepancies, "
        f"{skipped} row-cap skips, "
        f"{dt:.1f}s ({dt / max(1, args.queries):.2f}s/step)"
    )
    return 1 if bad else 0


# --- discrepancy searcher CLI ---------------------------------------------


def main() -> int:
    import argparse
    import sys
    import time

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--queries", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--depth", type=int, default=2, help="expression/view nesting depth")
    ap.add_argument(
        "--insert",
        action="store_true",
        help="run CTAS + INSERT...SELECT round-trips instead of bare SELECT compares",
    )
    ap.add_argument(
        "--session",
        action="store_true",
        help="v4 stateful session fuzz: interleave SET/UNSET option "
        "mutations, CTAS/INSERT round-trips and view DDL across one "
        "persistent session",
    )
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()

    import duckdb

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
    from impala_cut_spark.session import ImpalaSession, build_session
    from impala_cut_spark.sources.catalog import register_views

    spark = build_session(
        app_name="query-grammar", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    register_views(spark, args.sf)
    isess = ImpalaSession(spark)
    con = duckdb.connect()
    for t in SCHEMA:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )
    install_oracle_macros(con)
    pool = LiteralPool(args.sf, con)

    if args.session:
        return run_session_fuzz(isess, con, pool, args)

    bad = 0
    t0 = time.time()
    for s in range(args.seed, args.seed + args.queries):
        q = generate(s, pool, depth=args.depth)
        if args.verbose:
            print(f"-- seed {s}\n{q.sql}")
        try:
            if args.insert:
                msg = run_insert_roundtrip(isess, con, q)
            else:
                msg = run_one(isess, con, q.sql, q.fuzzy)
        except Exception as e:  # an engine rejecting the query IS a finding
            msg = f"exception: {type(e).__name__}: {str(e)[:300]}"
        if msg is not None:
            bad += 1
            print(f"\nDISCREPANCY seed={s}: {msg}\n{q.sql}\n", file=sys.stderr)
    dt = time.time() - t0
    print(
        f"{args.queries} generated queries, {bad} discrepancies, "
        f"{dt:.1f}s ({dt / max(1, args.queries):.2f}s/q)"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
