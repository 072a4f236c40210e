"""Impala-SQL → Spark-SQL dialect rewriter.

The reference parses its dialect with JFlex+CUP
(``/root/reference/fe/src/main/jflex/sql-scanner.flex``,
``fe/src/main/cup/sql-parser.y``). We do NOT rebuild a parser —
Spark's parser accepts almost all of the dialect; this module applies
the small token-level deltas (SURVEY.md §7 "Custom"):

1. join hints ``[broadcast]`` / ``[shuffle]``
   (``sql-parser.y:1563-1567``) → Spark ``/*+ BROADCAST(t) */`` /
   ``/*+ SHUFFLE_HASH(t) */`` hints.
2. ``STRAIGHT_JOIN`` (disables join reordering,
   ``Planner.java:972``) → stripped; caller may pin
   ``spark.sql.cbo.joinReorder.enabled=false``.
3. Default ORDER BY null ordering: Impala is ASC→NULLS LAST,
   DESC→NULLS FIRST (``fe/.../analysis/OrderByElement.java:74-75``) —
   exactly opposite to Spark — so explicit NULLS clauses are injected.
4. Function-name/semantic renames for Impala builtins Spark lacks
   (registry in ``common/function-registry/impala_functions.py``):
   textual expansion keeps everything JVM-side and type-generic.

All rewrites are quote- and comment-aware but deliberately shallow:
they transform tokens, not grammar. (Impala's dialect has no
subqueries-in-predicates, windows, INTERSECT/EXCEPT — SURVEY §2 — so
the surface is small.)
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# function-call expansions: name -> callable(list_of_arg_sql) -> sql
# ---------------------------------------------------------------------------


def _least_greatest(fn: str, a: list[str]) -> str:
    # emitted as array_min/array_max so the fixpoint rewriter doesn't
    # re-expand the call; the CASE supplies the any-NULL→NULL contract
    if len(a) == 1:
        return f"({a[0]})"
    nulls = " OR ".join(f"({x}) IS NULL" for x in a)
    agg = "array_min" if fn == "least" else "array_max"
    return f"(CASE WHEN {nulls} THEN NULL ELSE {agg}(array({', '.join(a)})) END)"


def _substr_zero(a: list[str]) -> str:
    if len(a) >= 2 and a[1].strip() == "0":
        return "''"
    raise ValueError("not the literal-zero form; leave the call as-is")


def _pad_negative(a: list[str]) -> str:
    if len(a) >= 2 and re.fullmatch(r"-\s*\d+", a[1].strip()):
        return "CAST(NULL AS STRING)"
    raise ValueError("not the literal-negative form; leave the call as-is")


def _empty_needle(a: list[str], needle_idx: int) -> str:
    if len(a) > needle_idx and a[needle_idx].strip() in ("''", '""'):
        return "cast(0 as int)"
    raise ValueError("needle not the empty literal; leave the call as-is")


#: Impala date/time format token letters (timestamp-parse-util.h
#: DateTimeFormatTokenType: year/month/day/hour/minute/second/fraction)
_DT_TOKEN_LETTERS = set("yMdHmsS")


def _normalize_dt_format(raw: str) -> str:
    """Impala format literal → Spark DateTimeFormatter pattern literal.

    Token runs (y M d H m s S) pass through — identical letters in both
    dialects; any OTHER letter run (e.g. the ISO 'T' separator, which
    Impala treats as a literal but Spark reserves) is single-quoted.
    Raises (→ rewrite skipped) for non-literal formats.
    """
    raw = raw.strip()
    if not (len(raw) >= 2 and raw[0] == raw[-1] == "'"):
        raise ValueError("format is not a simple string literal")
    body = raw[1:-1]
    if "'" in body or '"' in body:
        raise ValueError("quoted section already present; leave as-is")
    out, i = [], 0
    while i < len(body):
        c = body[i]
        if c.isalpha():
            j = i
            while j < len(body) and body[j] == c:
                j += 1
            run = body[i:j]
            # formatter-quoting a literal run uses single quotes INSIDE
            # an SQL single-quoted literal → escape them by doubling
            out.append(run if c in _DT_TOKEN_LETTERS else f"''{run}''")
            i = j
        else:
            out.append(c)
            i += 1
    return "'" + "".join(out) + "'"


def _from_unixtime_fmt(a: list[str]) -> str:
    """from_unixtime(t, 'fmt') with a normalizable literal format.
    Raises (→ skip) when nothing changes, so the fixpoint terminates."""
    if len(a) != 2:
        raise ValueError("1-arg/NULL-format forms match Spark; leave as-is")
    nf = _normalize_dt_format(a[1])
    if nf == a[1].strip():
        raise ValueError("already normalized")
    return f"from_unixtime({a[0]}, {nf})"


def _unix_timestamp_fmt(a: list[str]) -> str:
    """unix_timestamp dialect (emits to_unix_timestamp — a different
    name, so the rewrite cannot re-expand):

    - 1 arg: Impala tries its default fixed contexts (date-only,
      ISO-T, full — timestamp-parse-util.cc:49-75); Spark's
      unix_timestamp(string) accepts ONLY 'yyyy-MM-dd HH:mm:ss'.
      A timestamp CAST accepts the same families Impala does →
      to_unix_timestamp(cast(x as timestamp)).
    - 2 args, literal format: Impala parses by FIXED POSITION and
      ignores trailing text (expr-test.cc:2534-2536); Spark requires a
      full match → truncate the input to the format's width first.
      All Impala tokens are fixed-width, so width = len(format body).
    """
    if len(a) == 1:
        # Impala's default contexts all start yyyy-MM-dd (date-only /
        # ' ' / 'T' variants); a bare Spark CAST would also accept
        # time-only strings by filling in TODAY (expr-test.cc:2538
        # wants NULL) — gate on the date-prefix shape first.
        x = a[0]
        return (
            f"to_unix_timestamp(CASE WHEN cast({x} as string) rlike "
            "'^\\\\d{4}-\\\\d{2}-\\\\d{2}([T ].*)?$' "
            f"THEN cast({x} as timestamp) END)"
        )
    if len(a) == 2:
        nf = _normalize_dt_format(a[1])
        width = len(a[1].strip()) - 2  # fixed-width tokens: width = body length
        return f"to_unix_timestamp(substr({a[0]}, 1, {width}), {nf})"
    raise ValueError("0-arg form matches Spark; leave as-is")


def _fn_isnull(a):  # Impala isnull(a,b) == nvl; Spark isnull is unary
    if len(a) == 1:
        return f"({a[0]} IS NULL)"
    return f"nvl({a[0]}, {a[1]})"


_DECIMAL_TYPE_RE = re.compile(r"decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)\s*\)?\s*$", re.I)
_NUMERIC_LITERAL_RE = re.compile(r"^\s*-?\s*(\d+)(?:\.(\d*))?\s*$")


def _decimal_meta(arg: str, which: str) -> str:
    """Fold precision(e)/scale(e) to an int literal (analysis-time fold
    in the reference, fe/.../analysis; constant for a given type)."""
    m = _DECIMAL_TYPE_RE.search(arg)
    if m:
        p, s = int(m.group(1)), int(m.group(2))
        return f"cast({p if which == 'precision' else s} as int)"
    m = _NUMERIC_LITERAL_RE.match(arg)
    if m:
        ip = m.group(1).lstrip("0")
        fp = m.group(2) or ""
        p = max(len(ip) + len(fp), 1)
        return f"cast({p if which == 'precision' else len(fp)} as int)"
    # unresolvable form: leave the call — surfaces as a clear
    # unresolved-function error rather than a silent wrong answer
    return f"{which}({arg})"


CALL_REWRITES: dict[str, object] = {
    # conditional (impala_functions.py:357-466)
    "isnull": _fn_isnull,
    "zeroifnull": lambda a: f"coalesce({a[0]}, 0)",
    "nullifzero": lambda a: f"nullif({a[0]}, 0)",
    # string (impala_functions.py:149-213)
    "strleft": lambda a: f"left({a[0]}, {a[1]})",
    "strright": lambda a: f"right({a[0]}, {a[1]})",
    # concat_ws returns NULL when ANY argument is NULL
    # (string-functions.cc:545-564); Spark's skips null strings.
    # array_join carries no rewritable names, so no re-expansion.
    "concat_ws": lambda a: (
        "(CASE WHEN "
        + " OR ".join(f"({x}) IS NULL" for x in a)
        + f" THEN NULL ELSE array_join(array({', '.join(a[1:])}), {a[0]}) END)"
    ),
    # substr(s, 0[, n]) is EMPTY in the reference
    # (string-functions.cc:39-58 `fixed_pos != 0` guard); Spark treats
    # pos 0 as 1. Fold only the literal-zero form; raising skips the
    # rewrite (rewriter catches and leaves the call untouched).
    "substr": lambda a: _substr_zero(a),
    "substring": lambda a: _substr_zero(a),
    # lpad/rpad with negative target length are NULL in the reference
    # (string-functions.cc:132-137 `*len < 0` guard); Spark yields ''.
    # Literal-form fold, like substr-zero.
    "lpad": lambda a: _pad_negative(a),
    "rpad": lambda a: _pad_negative(a),
    # empty-needle search is 0 in the reference (expr-test.cc:1388-1397
    # instr/locate goldens); Spark returns 1. Literal-form fold.
    "instr": lambda a: _empty_needle(a, 1),
    "locate": lambda a: _empty_needle(a, 0),
    # math (impala_functions.py:56-148)
    # least/greatest return NULL when ANY argument is NULL
    # (math-functions.cc:568-584 LeastGreatest: `if (val == NULL)
    # return NULL`); Spark's skip nulls — wrap with the null check.
    "least": lambda a: _least_greatest("least", a),
    "greatest": lambda a: _least_greatest("greatest", a),
    "quotient": lambda a: f"({a[0]} div {a[1]})",
    # Impala fmod is the C float modulo — FLOAT/DOUBLE in, DOUBLE out
    # (math-functions.cc). Without the casts Spark types mod(bigint,
    # 7.5) as DECIMAL (a fractional literal is DECIMAL(p,s) in Spark
    # SQL) and downstream division silently loses double precision —
    # found by the round-6 grammar sweep (seed 402).
    "fmod": lambda a: f"mod(cast({a[0]} as double), cast({a[1]} as double))",
    "dayname": lambda a: f"date_format({a[0]}, 'EEEE')",
    # Impala to_date(ts) returns STRING 'yyyy-MM-dd'
    # (timestamp-functions.cc; impala_functions.py:239-356); Spark's
    # to_date returns DATE — keep the string contract.
    "to_date": lambda a: f"date_format({a[0]}, 'yyyy-MM-dd')",
    # variance family (BuiltinsDb.java:273-320): Impala names
    # variance_samp/variance_pop; Spark spells them var_samp/var_pop
    "variance_samp": lambda a: f"var_samp({a[0]})",
    "variance_pop": lambda a: f"var_pop({a[0]})",
    # approximate count-distinct family (aggregate-functions.cc:48-49,252-302)
    "ndv": lambda a: f"approx_count_distinct({', '.join(a)})",
    "distinctpc": lambda a: f"approx_count_distinct({a[0]})",
    "distinctpcsa": lambda a: f"approx_count_distinct({a[0]})",
    # group_concat(col[, sep]) (BuiltinsDb.java:359-367). Impala gives no
    # ordering guarantee; we sort for determinism (SURVEY §7 risk 1).
    "group_concat": lambda a: (
        f"array_join(sort_array(collect_list({a[0]})), {a[1] if len(a) > 1 else chr(39) + ', ' + chr(39)})"
    ),
    # from_unixtime/unix_timestamp format dialect (SURVEY §2.8 delta;
    # timestamp-functions.cc:60-120, impala_functions.py:239-356):
    # Impala formats are fixed-position SimpleDateFormat-ish tokens
    # (timestamp-parse-util.h DateTimeFormatToken pos/len) —
    # unquoted literal letters like the ISO 'T' are accepted, and
    # PARSING is a prefix match (expr-test.cc:2534-2536: trailing text
    # beyond the format is ignored). Spark's DateTimeFormatter throws
    # on unquoted reserved letters and requires a full-input match.
    # Normalizer: quote non-token letter runs, and for parsing
    # truncate the input to the format's fixed width. Literal-format
    # forms only; non-literal formats raise-to-skip (left to Spark).
    "from_unixtime": lambda a: _from_unixtime_fmt(a),
    "unix_timestamp": lambda a: _unix_timestamp_fmt(a),
    # utility (impala_functions.py:214-238): fnv_hash → xxhash64 (documented
    # non-bit-compatible 64-bit hash alias)
    "fnv_hash": lambda a: f"xxhash64({', '.join(a)})",
    "user": lambda a: "current_user()",
    "current_database": lambda a: "current_database()",
    # type-constant helpers (math-functions.cc min/max per int type)
    "min_tinyint": lambda a: "cast(-128 as tinyint)",
    "max_tinyint": lambda a: "cast(127 as tinyint)",
    "min_smallint": lambda a: "cast(-32768 as smallint)",
    "max_smallint": lambda a: "cast(32767 as smallint)",
    "min_int": lambda a: "cast(-2147483648 as int)",
    "max_int": lambda a: "cast(2147483647 as int)",
    "min_bigint": lambda a: "cast(-9223372036854775808 as bigint)",
    "max_bigint": lambda a: "cast(9223372036854775807 as bigint)",
    "is_inf": lambda a: f"(abs({a[0]}) = double('Infinity'))",
    "is_nan": lambda a: f"isnan({a[0]})",
    # decimal introspection (decimal-functions.cc; impala_functions.py:467-490).
    # The reference folds precision(e)/scale(e) to literals at analysis
    # from the argument's resolved type; we fold textually for the two
    # resolvable forms — an explicit decimal cast and a numeric literal.
    "precision": lambda a: _decimal_meta(a[0], "precision"),
    "scale": lambda a: _decimal_meta(a[0], "scale"),
    # numeric truncation toward zero (decimal-functions.cc trunc/truncate)
    "truncate": lambda a: (
        f"(cast({a[0]} * pow(10, {a[1]}) as bigint) / pow(10, {a[1]}))"
        if len(a) > 1
        else f"cast({a[0]} as bigint)"
    ),
}


# interval arithmetic (impala_functions.py:272-356): <unit>s_add/_sub on
# TIMESTAMP. Spark's timestampadd covers every unit except nanoseconds
# (no ns type — truncated to µs, documented in SURVEY §7 risk 1).
_INTERVAL_UNITS = {
    "years": "YEAR",
    "months": "MONTH",
    "weeks": "WEEK",
    "days": "DAY",
    "hours": "HOUR",
    "minutes": "MINUTE",
    "seconds": "SECOND",
    "milliseconds": "MILLISECOND",
    "microseconds": "MICROSECOND",
}


def _make_interval_fns():
    def add(unit):
        return lambda a: f"timestampadd({unit}, {a[1]}, {a[0]})"

    def sub(unit):
        return lambda a: f"timestampadd({unit}, -({a[1]}), {a[0]})"

    fns = {}
    for name, unit in _INTERVAL_UNITS.items():
        fns[f"{name}_add"] = add(unit)
        fns[f"{name}_sub"] = sub(unit)
    fns["nanoseconds_add"] = lambda a: f"timestampadd(MICROSECOND, ({a[1]}) div 1000, {a[0]})"
    fns["nanoseconds_sub"] = lambda a: f"timestampadd(MICROSECOND, -(({a[1]}) div 1000), {a[0]})"
    # date_add/date_sub & aliases: Impala's 2-arg form is timestamp ± n
    # days yielding TIMESTAMP (Spark's builtin date_add returns DATE)
    fns["date_add"] = lambda a: f"timestampadd(DAY, {a[1]}, {a[0]})"
    fns["adddate"] = fns["date_add"]
    fns["date_sub"] = lambda a: f"timestampadd(DAY, -({a[1]}), {a[0]})"
    fns["subdate"] = fns["date_sub"]
    return fns


CALL_REWRITES.update(_make_interval_fns())

_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def _scan_strings(sql: str):
    """Yield (index, char, in_string) walking the text with quote AND
    comment awareness.  ``-- …\\n`` and ``/* … */`` spans are reported as
    in_string=True so rewrites never fire inside them and quotes inside
    them (e.g. ``-- don't``) cannot flip the string state."""
    i, n = 0, len(sql)
    quote = None
    while i < n:
        c = sql[i]
        if quote:
            if c == quote:
                if i + 1 < n and sql[i + 1] == quote:  # doubled quote escape
                    yield i, c, True
                    i += 1
                else:
                    quote = None
            yield i, c, quote is not None
        elif c == "-" and i + 1 < n and sql[i + 1] == "-":
            while i < n and sql[i] != "\n":
                yield i, sql[i], True
                i += 1
            continue
        elif c == "/" and i + 1 < n and sql[i + 1] == "*":
            end = sql.find("*/", i + 2)
            end = n if end < 0 else end + 2
            while i < end:
                yield i, sql[i], True
                i += 1
            continue
        else:
            if c in ("'", '"', "`"):
                quote = c
            yield i, c, quote is not None
        i += 1


def _split_args(argtext: str) -> list[str]:
    """Split a function arg list on top-level commas (quote/paren aware)."""
    args, depth, cur = [], 0, []
    quote = None
    for c in argtext:
        if quote:
            cur.append(c)
            if c == quote:
                quote = None
            continue
        if c in ("'", '"', "`"):
            quote = c
            cur.append(c)
        elif c == "(":
            depth += 1
            cur.append(c)
        elif c == ")":
            depth -= 1
            cur.append(c)
        elif c == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
    tail = "".join(cur).strip()
    if tail:
        args.append(tail)
    return args


def rewrite_calls(sql: str) -> str:
    """Expand Impala-only function calls (innermost-first, iterated to a
    true fixpoint — one call is replaced per pass, so the bound must
    cover every call in the statement, not a small constant)."""
    # Generous fixpoint bound: each pass eliminates one rewritable call;
    # expansions may themselves contain further rewritable calls, but
    # convergence is structural (rewrites emit non-rewritable names).
    for _ in range(10_000):
        out = _rewrite_calls_once(sql)
        if out == sql:
            return out
        sql = out
    raise ValueError(
        "dialect.rewrite_calls did not converge; a CALL_REWRITES entry "
        "likely re-emits its own (or another rewritable) call name: "
        + sql[:200]
    )


def _rewrite_calls_once(sql: str) -> str:
    in_str = [False] * len(sql)
    for i, _, s in _scan_strings(sql):
        in_str[i] = s
    lower = sql.lower()
    for m in _IDENT.finditer(lower):
        name = m.group(0)
        if name not in CALL_REWRITES or in_str[m.start()]:
            continue
        # must be a call: next non-space char is '('
        j = m.end()
        while j < len(sql) and sql[j].isspace():
            j += 1
        if j >= len(sql) or sql[j] != "(":
            continue
        # find matching close paren
        depth, k, quote = 0, j, None
        while k < len(sql):
            c = sql[k]
            if quote:
                if c == quote:
                    quote = None
            elif c in ("'", '"', "`"):
                quote = c
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            k += 1
        if k >= len(sql):
            continue  # unbalanced; leave alone
        args = _split_args(sql[j + 1 : k])
        try:
            replacement = CALL_REWRITES[name](args)
        except Exception:
            continue
        return sql[: m.start()] + replacement + sql[k + 1 :]
    return sql


# ---------------------------------------------------------------------------
# join hints & straight_join
# ---------------------------------------------------------------------------

#: keywords that can follow a table ref and must not parse as an alias
_NOT_ALIAS = "on|using|where|join|left|right|inner|outer|full|cross|semi|anti|group|order|limit|union|having"

_HINT = re.compile(
    r"\bjoin\s*\[\s*(broadcast|shuffle)\s*\]\s+([A-Za-z_][A-Za-z0-9_.]*)"
    rf"(?:\s+(?:as\s+)?(?!(?:{_NOT_ALIAS})\b)([A-Za-z_][A-Za-z0-9_]*))?",
    re.IGNORECASE,
)


def rewrite_hints(sql: str) -> tuple[str, list[str]]:
    """``JOIN [broadcast] t [alias]`` → plain join + collected Spark hint.

    Quote/comment-aware: a literal like ``'join [broadcast] x'`` must
    pass through untouched (same rule as every other rewrite here).
    """
    hints: list[str] = []
    in_str = [False] * len(sql)
    for i, _, s in _scan_strings(sql):
        in_str[i] = s

    def repl(m: re.Match) -> str:
        if in_str[m.start()]:
            return m.group(0)
        kind, table, alias = m.group(1).lower(), m.group(2), m.group(3)
        target = alias or table.split(".")[-1]
        hints.append(("BROADCAST" if kind == "broadcast" else "SHUFFLE_HASH") + f"({target})")
        out = f"JOIN {table}"
        if alias:
            out += f" {alias}"
        return out

    sql = _HINT.sub(repl, sql)
    # recompute offsets: the hint rewrite above may have shifted text
    in_str2 = [False] * len(sql)
    for i, _, s in _scan_strings(sql):
        in_str2[i] = s
    sql = re.sub(
        r"\bstraight_join\b",
        lambda m: m.group(0) if in_str2[m.start()] else "",
        sql,
        flags=re.IGNORECASE,
    )
    return sql, hints


def _inject_hints(sql: str, hints: list[str]) -> str:
    if not hints:
        return sql
    # place after the first SELECT keyword outside strings
    in_str = [False] * len(sql)
    for i, _, s in _scan_strings(sql):
        in_str[i] = s
    for m in re.finditer(r"\bselect\b", sql, re.IGNORECASE):
        if not in_str[m.start()]:
            return sql[: m.end()] + " /*+ " + ", ".join(hints) + " */" + sql[m.end() :]
    return sql


# ---------------------------------------------------------------------------
# ORDER BY default null-ordering injection
# ---------------------------------------------------------------------------

_ORDER_BY = re.compile(r"\border\s+by\b", re.IGNORECASE)
_TERMINATORS = re.compile(r"\b(limit|offset|union|except|intersect)\b", re.IGNORECASE)


def rewrite_null_ordering(sql: str) -> str:
    """Append Impala default NULLS placement to ORDER BY keys lacking one.

    Impala: ASC→NULLS LAST, DESC→NULLS FIRST
    (fe/.../analysis/OrderByElement.java:74-75). Spark defaults are the
    opposite, so every key without an explicit NULLS clause gets one.
    """
    in_str = [False] * len(sql)
    for i, _, s in _scan_strings(sql):
        in_str[i] = s

    out, pos = [], 0
    for m in _ORDER_BY.finditer(sql):
        if in_str[m.start()] or m.start() < pos:
            continue
        # find end of the ORDER BY list: top-level terminator keyword,
        # unbalanced ')', or end of statement
        depth = 0
        k = m.end()
        end = len(sql)
        while k < len(sql):
            if in_str[k]:
                k += 1
                continue
            c = sql[k]
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    end = k
                    break
                depth -= 1
            elif depth == 0:
                t = _TERMINATORS.match(sql, k)
                if t:
                    end = k
                    break
            k += 1
        body = sql[m.end() : end]
        out.append(sql[pos : m.end()])
        out.append(_fix_order_items(body))
        pos = end
    out.append(sql[pos:])
    return "".join(out)


def _append_null_suffix(item: str, suffix: str) -> str:
    """Append ``suffix`` to an ORDER BY item without letting a trailing
    ``-- …`` line comment swallow it (the item's terminating newline is
    gone after _split_args' strip, so a naive append lands INSIDE the
    comment).  The suffix goes before the comment and the comment is
    re-terminated with a newline."""
    in_s = None
    i = 0
    while i < len(item):
        c = item[i]
        if in_s:
            if c == in_s:
                in_s = None
            i += 1
            continue
        if c in ("'", '"', "`"):
            in_s = c
        elif c == "-" and item[i : i + 2] == "--":
            nl = item.find("\n", i)
            if nl < 0:
                return f"{item[:i].rstrip()}{suffix} {item[i:]}\n"
            i = nl
        elif c == "/" and item[i : i + 2] == "/*":
            end = item.find("*/", i + 2)
            i = len(item) if end < 0 else end + 1
        i += 1
    return item + suffix


def _fix_order_items(body: str) -> str:
    items = _split_args(body)
    if not items:
        return body
    fixed = []
    for it in items:
        low = it.lower()
        if re.search(r"\bnulls\s+(first|last)\b", low):
            fixed.append(it)
        elif re.search(r"\bdesc\b", low):
            fixed.append(_append_null_suffix(it, " NULLS FIRST"))
        else:
            fixed.append(_append_null_suffix(it, " NULLS LAST"))
    return " " + ", ".join(fixed) + " "


# ---------------------------------------------------------------------------
# statement-level (DDL/DML/utility) rewrites — SURVEY.md §2.11
# ---------------------------------------------------------------------------

#: Impala file formats → Spark USING providers. The reference WRITES
#: only text and parquet (be/src/exec/hdfs-table-sink.cc:341-347);
#: rcfile/sequencefile are read-only legacy (not in this build) and
#: avro requires the external spark-avro module (absent here).
_FORMAT_MAP = {
    "textfile": "csv",
    "parquet": "parquet",
    "parquetfile": "parquet",
}

_STORED_AS = re.compile(r"\bstored\s+as\s+([A-Za-z_]+)", re.IGNORECASE)
_ROW_FORMAT = re.compile(
    r"\brow\s+format\s+delimited"
    r"(?:\s+fields\s+terminated\s+by\s+('(?:[^']|'')*'))?"
    r"(?:\s+escaped\s+by\s+('(?:[^']|'')*'))?"
    r"(?:\s+lines\s+terminated\s+by\s+('(?:[^']|'')*'))?",
    re.IGNORECASE,
)


def rewrite_statements(sql: str) -> str:
    """DDL/utility statement deltas (grammar: sql-parser.y:407-810):

    - ``CREATE [EXTERNAL] TABLE … [ROW FORMAT …] STORED AS fmt`` →
      Spark ``CREATE TABLE … USING provider [OPTIONS (…)]``
    - ``COMPUTE STATS t`` → ``ANALYZE TABLE t COMPUTE STATISTICS``
    - ``REFRESH t`` / ``INVALIDATE METADATA [t]`` → ``REFRESH TABLE t``
      / ``CLEAR CACHE`` (the statestore-free equivalents)
    """
    head = sql.lstrip().lower()

    # Impala CREATE/ALTER VIEW (sql-parser.y:407-660; catalog/View.java)
    # → session temp views: this engine's tables mount as session-scoped
    # views (sources/catalog.py register_views, the avro LOCATION mount),
    # and Spark refuses a PERSISTENT view over temp relations — so the
    # catalog-view surface maps to temp views with matching semantics:
    # plain CREATE errors on exists (like Impala), IF NOT EXISTS is
    # preserved, ALTER VIEW ... AS redefines in place.
    m = re.match(r"(?is)^\s*create\s+view\s+", sql)
    if m:
        rest = sql[m.end() :].strip()
        _reject_qualified_view_name(rest)
        return f"CREATE TEMPORARY VIEW {rest}"
    m = re.match(r"alter\s+view\s+([A-Za-z_][\w.]*)\s+as\s+", head)
    if m:
        _reject_qualified_view_name(m.group(1))
        body = sql[re.search(r"(?i)\bas\b", sql).end() :]
        return f"CREATE OR REPLACE TEMPORARY VIEW {m.group(1)} AS {body.strip()}"

    m = re.match(r"compute\s+stats\s+([A-Za-z_][\w.]*)", head)
    if m:
        # ComputeStatsStmt computes table AND per-column stats in one
        # statement (fe/.../analysis/ComputeStatsStmt.java) — Spark's
        # FOR ALL COLUMNS is the equivalent
        return f"ANALYZE TABLE {m.group(1)} COMPUTE STATISTICS FOR ALL COLUMNS"
    m = re.match(r"refresh\s+(?!table\b)([A-Za-z_][\w.]*)\s*$", head)
    if m:
        return f"REFRESH TABLE {m.group(1)}"
    m = re.match(r"invalidate\s+metadata\s*([A-Za-z_][\w.]*)?\s*$", head)
    if m:
        return f"REFRESH TABLE {m.group(1)}" if m.group(1) else "CLEAR CACHE"

    if head.startswith(("create table", "create external table")):
        options: list[str] = []
        rf = _ROW_FORMAT.search(sql)
        if rf:
            sep, esc, _lines = rf.group(1), rf.group(2), rf.group(3)
            if sep:
                options.append(f"sep {sep}")
            if esc:
                options.append(f"escape {esc}")
            sql = sql[: rf.start()] + sql[rf.end() :]
        sa = _STORED_AS.search(sql)
        if sa:
            fmt = sa.group(1).lower()
            if fmt in ("avro", "avrofile", "warc"):
                # the session layer intercepts LOCATION-bearing avro and
                # warc DDL and mounts them via the pyavro/pywarc readers
                # (ImpalaSession.sql → sources/avro.py, sources/warc.py);
                # reaching here means a managed/writable table was
                # requested
                raise ValueError(
                    f"STORED AS {fmt.upper()} is read-only here: give the "
                    "table a LOCATION '<file|dir|glob>' (mounted via the "
                    "pure-Python pyavro/pywarc scans) or use read_avro()/"
                    "read_warc(); writes for this format are unsupported "
                    "(engine writes text and parquet — reference "
                    "hdfs-table-sink.cc:341-347)"
                )
            provider = _FORMAT_MAP.get(fmt)
            if provider is None:
                raise ValueError(
                    f"unsupported file format {fmt!r}: this engine writes "
                    "text and parquet (reference hdfs-table-sink.cc:341-347)"
                )
            using = f"USING {provider}"
            if provider == "csv":
                # Impala text format: NULL is stored as \N
                # (HdfsTable.java:93 DEFAULT_NULL_COLUMN_VALUE,
                # text-converter.inline.h:41). '\\N' in Spark SQL
                # literal syntax → the two chars \N.  Known delta:
                # Spark's csv parser reads an EMPTY unquoted string
                # field as NULL, where the reference yields '' for
                # STRING columns (numerics are NULL either way).
                options.append(r"nullValue '\\N'")
                # Spark's csv WRITER trims leading/trailing whitespace
                # by default; the reference's text writer never does —
                # pin preservation into the table options so INSERTs
                # keep field whitespace byte-exact
                options.append("ignoreLeadingWhiteSpace 'false'")
                options.append("ignoreTrailingWhiteSpace 'false'")
                using += " OPTIONS (" + ", ".join(options) + ")"
            sql = sql[: sa.start()] + using + sql[sa.end() :]
        sql = re.sub(r"\bcreate\s+external\s+table\b", "CREATE TABLE", sql, flags=re.IGNORECASE)
        sql = _rewrite_partitioned_create(sql)
    return sql


def _reject_qualified_view_name(rest: str) -> None:
    """Views map to session temp views, whose names cannot be
    db-qualified in Spark — fail with a clear message instead of
    Spark's opaque AnalysisException (same contract as the avro-mount
    guard in session.py)."""
    m = re.match(r"(?:if\s+not\s+exists\s+)?([A-Za-z_][\w.]*)", rest, re.IGNORECASE)
    if m and "." in m.group(1):
        raise ValueError(
            f"views map to session temp views here; qualified name "
            f"{m.group(1)!r} is not valid — use an unqualified name"
        )


_PARTITIONED_BY = re.compile(r"\bpartitioned\s+by\s*\(", re.IGNORECASE)


def _rewrite_partitioned_create(sql: str) -> str:
    """Impala partitioned CREATE → Spark form.

    Impala (sql-parser.y create_tbl): partition columns are TYPED and
    NOT part of the main column list —
        CREATE TABLE t (a INT) PARTITIONED BY (k STRING) STORED AS …
    Spark wants them IN the column list with a names-only clause AFTER
    the provider —
        CREATE TABLE t (a INT, k STRING) USING parquet PARTITIONED BY (k)
    Names-only clauses (already Spark-style) pass through untouched.
    """
    # quote-aware search: a string literal containing "partitioned by ("
    # (e.g. in TBLPROPERTIES) must not trigger the rewrite (ADVICE r2 #3)
    in_str = {i: s for i, _, s in _scan_strings(sql)}
    m = None
    for cand in _PARTITIONED_BY.finditer(sql):
        if not in_str.get(cand.start(), False):
            m = cand
            break
    if not m:
        return sql
    # matching close paren of the partition list (types may nest parens)
    depth, k = 1, m.end()
    while k < len(sql) and depth:
        if in_str.get(k, False):
            k += 1
            continue
        if sql[k] == "(":
            depth += 1
        elif sql[k] == ")":
            depth -= 1
        k += 1
    plist = sql[m.end() : k - 1]
    entries = _split_args(plist)
    if not entries or any(len(e.split()) < 2 for e in entries):
        return sql  # names-only → already Spark-style
    names = [e.split()[0] for e in entries]
    # main column list = first top-level paren group before PARTITIONED BY
    open_idx = sql.find("(")
    if open_idx < 0 or open_idx >= m.start():
        return sql  # CTAS-style partitioned create: no column list
    depth, j = 1, open_idx + 1
    while j < len(sql) and depth:
        if in_str.get(j, False):
            j += 1
            continue
        if sql[j] == "(":
            depth += 1
        elif sql[j] == ")":
            depth -= 1
        j += 1
    close_idx = j - 1
    out = (
        sql[:close_idx]
        + ", "
        + ", ".join(entries)
        + sql[close_idx : m.start()]
        + sql[k:].strip()
        + " PARTITIONED BY ("
        + ", ".join(names)
        + ")"
    )
    return _collapse_ws_outside_strings(out).strip()


def _collapse_ws_outside_strings(sql: str) -> str:
    """``\\s+`` → one space, but ONLY outside quoted spans — a LOCATION
    path or TBLPROPERTIES value keeps its internal whitespace verbatim
    (ADVICE r2 #3)."""
    out: list[str] = []
    pending_ws = False
    for _, c, in_string in _scan_strings(sql):
        if not in_string and c.isspace():
            pending_ws = True
            continue
        if pending_ws:
            out.append(" ")
            pending_ws = False
        out.append(c)
    return "".join(out)


# ---------------------------------------------------------------------------
# entry point
# ---------------------------------------------------------------------------


def rewrite(sql: str, csv_mode: str | None = None) -> str:
    """Full Impala → Spark SQL rewrite pipeline.

    ``csv_mode``: malformed-row policy captured into text-table DDL
    (``USING csv`` OPTIONS) — the session passes FAILFAST when the
    Impala ``abort_on_error`` query option is set (PERMISSIVE
    otherwise), mirroring hdfs-text-scanner's per-scan policy at the
    one point Spark lets a table pin read options."""
    sql = rewrite_statements(sql)
    if csv_mode:
        # quote-aware: a string literal containing "using csv" must not
        # be rewritten (module invariant — same _scan_strings gate as
        # rewrite_hints)
        in_str = {i: s for i, _, s in _scan_strings(sql)}
        m = next(
            (
                c
                for c in re.finditer(
                    r"\busing\s+csv\b(\s+options\s*\()?", sql, re.IGNORECASE
                )
                if not in_str.get(c.start(), False)
            ),
            None,
        )
        if m is not None:
            if m.group(1):
                sql = sql[: m.end()] + f"mode '{csv_mode}', " + sql[m.end() :]
            else:
                sql = sql[: m.end()] + f" OPTIONS (mode '{csv_mode}')" + sql[m.end() :]
    sql, hints = rewrite_hints(sql)
    sql = rewrite_calls(sql)
    sql = rewrite_null_ordering(sql)
    sql = _inject_hints(sql, hints)
    return sql
