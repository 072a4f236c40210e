"""Local stand-in for the driver's t2 correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB
over the same sf dir, then compares: row count, column names, and
order-insensitive values (columns sorted by name, rows sorted, values
normalized). Usage:

    python tools/check_correctness.py [--strict] [sf_dir] [query ...]

``--strict`` additionally mimics the driver's value-hash: both results
are pulled through pandas and compared as *rendered strings* with no
type normalization, so type-rendering skew (DuckDB HUGEINT/DOUBLE vs
Spark BIGINT → "3.0" vs "3") fails locally the way it fails the
driver's hash_match.
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb


def normalize_cell(v):
    import datetime
    from decimal import Decimal

    if v is None:
        return None
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(f"{v:.10g}")
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(normalize_cell(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return normalize_cell(v.item())
    if hasattr(v, "to_pydatetime"):
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    return v


def frame_to_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(normalize_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return [cols[i] for i in order], out


def _render_cell(v):
    """str(v) with only the skews the driver is known to tolerate
    normalized: nulls, and date-vs-midnight-datetime (r1 evidence:
    cov_fn_timestamp driver-hash-matched with Spark DATE vs DuckDB
    datetime64).  Numeric dtype skew (HUGEINT→float64 "3.0" vs BIGINT
    "3") intentionally stays visible — that is what the driver hashes."""
    import datetime

    import pandas as pd

    if v is None or (isinstance(v, float) and v != v) or v is pd.NaT:
        return "NULL"
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat() + " 00:00:00"
    return str(v)


def render_frame(pdf):
    """Driver-style rendering: lowercase columns sorted by name, every
    cell rendered from the pandas-materialized value, rows sorted. Any
    numeric dtype skew between engines shows up as a string diff."""
    pdf = pdf.copy()
    pdf.columns = [c.lower() for c in pdf.columns]
    pdf = pdf[sorted(pdf.columns)]
    rows = [
        tuple(_render_cell(v) for v in r)
        for r in pdf.itertuples(index=False, name=None)
    ]
    rows.sort()
    return list(pdf.columns), rows


def strict_compare(name, sdf, orel):
    """Return error string or None. Mimics the driver's hash compare."""
    spdf = sdf.toPandas()
    opdf = orel.df()
    sc, sr = render_frame(spdf)
    oc, orw = render_frame(opdf)
    if sc != oc:
        return f"strict columns {sc} vs {oc}"
    if len(sr) != len(orw):
        return f"strict rowcount {len(sr)} vs {len(orw)}"
    bad = [(a, b) for a, b in zip(sr, orw) if a != b]
    if bad:
        return f"strict {len(bad)}/{len(sr)} differing rendered rows; first: {bad[0]}"
    return None


def main():
    argv = sys.argv[1:]
    strict = "--strict" in argv
    argv = [a for a in argv if a != "--strict"]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from impala_cut_spark.session import build_session

    spark = build_session(shuffle_partitions=8)

    con = duckdb.connect()
    for tname in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{sf_dir}/{tname}.parquet')"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception:
            failures.append(name)
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}", flush=True)
            continue
        if name not in oracles:
            print(f"ok*   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)", flush=True)
            continue
        try:
            orel = con.sql(oracles[name])
            ocols = [c.lower() for c in orel.columns]
            orows = orel.fetchall()
        except Exception:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error\n{traceback.format_exc()}", flush=True)
            continue
        sc, sr = frame_to_rows([c.lower() for c in scols], srows)
        oc, orw = frame_to_rows(ocols, orows)
        if sc != oc:
            failures.append(name)
            print(f"FAIL  {name}: columns {sc} vs {oc}", flush=True)
            continue
        if len(sr) != len(orw):
            failures.append(name)
            print(f"FAIL  {name}: rowcount {len(sr)} vs {len(orw)}", flush=True)
            continue
        bad = [(a, b) for a, b in zip(sr, orw) if a != b]
        if bad:
            failures.append(name)
            print(f"FAIL  {name}: {len(bad)}/{len(sr)} differing rows; first: {bad[0]}", flush=True)
            continue
        if strict:
            err = strict_compare(name, sdf, con.sql(oracles[name]))
            if err:
                failures.append(name)
                print(f"FAIL  {name}: {err}", flush=True)
                continue
        print(f"ok    {name}: {len(sr)} rows match ({time.time()-t0:.1f}s)", flush=True)

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
