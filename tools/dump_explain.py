"""Dump `.explain("formatted")` for named registry queries to files.

Usage: python tools/dump_explain.py OUTDIR SUFFIX q1 [q2 ...] [--sf DIR]

Writes OUTDIR/<query>_<SUFFIX>.txt — the round's plan-evidence contract
(r12 verdict Next #7: before/after explains for every touched path).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("suffix")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from impala_cut_spark.plans import REGISTRY
    from impala_cut_spark.session import build_session

    spark = build_session(
        app_name="dump-explain", master="local[8]", shuffle_partitions=16
    )
    spark.sparkContext.setLogLevel("ERROR")
    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    for name in args.queries:
        df = REGISTRY[name].spark(spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (outdir / f"{name}_{args.suffix}.txt").write_text(plan)
        print(f"wrote {outdir / f'{name}_{args.suffix}.txt'}")
    spark.stop()


if __name__ == "__main__":
    main()
