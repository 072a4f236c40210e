"""Generate tests/plan_pins.json: plan-shape regression pins for every
driver-window query (round-2 verdict Next-round #5 — the PlannerTest
analogue widened from ~10 hand asserts to the full window).

For each DRIVER_WINDOW query this executes the query at the TEST scale
(sf0.001, shuffle_partitions=8 — the same environment
tests/test_plans.py runs in) and records the AQE-final plan's
scale-relevant signal counts:

    shuffles          Exchange hash/range partitioning count
    broadcast_joins   BroadcastHashJoin count
    bnlj              BroadcastNestedLoopJoin count (cross-join shapes
                      legitimately carry one; anything else is a
                      regression)
    cartesian         CartesianProduct count
    pushdown          True if every parquet FileScan that could push a
                      filter did (any DataFilters/PushedFilters present
                      whenever a FileScan exists)

tests/test_plans.py::test_window_plan_pins asserts equality, so a
dialect or operator change that silently alters a window plan shape
fails CI until the pin is intentionally regenerated:

    python tools/gen_plan_pins.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.001"
OUT = REPO / "tests" / "plan_pins.json"


def plan_signals(plan: str) -> dict:
    return {
        "shuffles": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "pushdown": ("FileScan" not in plan)
        or ("DataFilters" in plan)
        or ("PushedFilters" in plan),
    }


def main() -> None:
    from impala_cut_spark.plans import DRIVER_WINDOW, REGISTRY
    from impala_cut_spark.session import build_session

    spark = build_session(
        app_name="gen-plan-pins", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")

    # pin every driver-window row AND every bench headliner (round-5
    # verdict #3: headliners must all have audited, pinned plans even
    # when they rotate out of the correctness window), AND every name
    # already pinned (round-11: rotation must never SHRINK the pin set —
    # rotated-out rows keep their plan regression guard)
    prior = set(json.loads(OUT.read_text())) if OUT.exists() else set()
    names = list(DRIVER_WINDOW) + sorted(
        (
            {n for n, s in REGISTRY.items() if s.headline}
            | (prior & set(REGISTRY))
        )
        - set(DRIVER_WINDOW)
    )
    pins: dict[str, dict] = {}
    for name in names:
        df = REGISTRY[name].spark(spark, SF_DIR)
        df.collect()
        full = df._jdf.queryExecution().executedPlan().toString()
        final = full.split("== Initial Plan ==")[0]
        pins[name] = plan_signals(final)
        print(name, pins[name], flush=True)

    OUT.write_text(json.dumps(pins, indent=1, sort_keys=True) + "\n")
    print(f"wrote {OUT} ({len(pins)} pins)")
    spark.stop()


if __name__ == "__main__":
    main()
