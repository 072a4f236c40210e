"""Temporal join operators the engine family lacks natively.

``asof_join`` — for each left row, the LATEST right row with
``right.ts <= left.ts`` per key (the time-series point-in-time join;
kdb aj / pandas merge_asof / DuckDB ASOF JOIN).

Spark-first design: NOT a per-key loop or a range self-join — the
classic union + last_value(ignorenulls) window:

    1. tag both sides, align schemas (right's payload columns are
       NULL on left rows and vice versa)
    2. ONE shuffle: window partitioned by key, ordered by
       (ts, side, tiebreak) with right-before-left on equal ts
       (inclusive as-of) — last(payload, ignorenulls=True) carries the
       most recent right payload forward onto every left row
    3. keep the left rows

Scale: a single hash shuffle on the key — same cost as any keyed agg;
no range-condition join blow-up, no per-key state loops. Skewed keys
fall under the same AQE/salting toolbox as any other keyed shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    value_cols: list[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row + the latest preceding (or
    simultaneous) ``right`` row's ``value_cols`` per ``by`` key; NULL
    when no right row precedes.

    ``tiebreak``: column making right-side ordering total when several
    right rows share one timestamp (the carried row is the greatest by
    (ts, tiebreak)).
    """
    value_cols = value_cols or [c for c in right.columns if c not in (on, by)]
    lcols = [c for c in left.columns]

    l_tag = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    r_tag = right.select(
        F.col(by),
        F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (on, by)],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    ).select(*lcols, "_side", *[f"_r_{c}" for c in value_cols])

    # right (0) before left (1) on equal ts → inclusive as-of; the
    # tiebreak orders only WITHIN the same (ts, side) stratum so every
    # same-ts right still precedes every same-ts left
    order = [F.col(on).asc(), F.col("_side").asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc_nulls_first())
    w = (
        Window.partitionBy(by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tag.unionByName(r_tag)
    for c in value_cols:
        filled = filled.withColumn(f"_r_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w))
    return (
        filled.filter(F.col("_side") == 1)
        .drop("_side")
        .withColumnsRenamed({f"_r_{c}": f"asof_{c}" for c in value_cols})
    )
