#!/usr/bin/env python
"""Capture ``explain("formatted")`` for registry queries into plans/r<N>/.

Usage:
    python tools/capture_plans.py --round 12 --suffix before [--keys k1,k2 | --bench]

Writes ``plans/r{round}/{key}_{suffix}.txt`` with the formatted physical
plan of the DataFrame each registry fn returns, at $SPARK_GRAFT_SF_DIR
(default sf0.1).  Plans are captured WITHOUT executing the returned frame
(fn() itself may do eager work for persisted/stream lanes; that work runs
as it would in the bench).
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mapreduce_framework_spark.registry import all_queries, bench_queries  # noqa: E402
from mapreduce_framework_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--keys", default="")
    ap.add_argument("--bench", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / f"r{args.round}"
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.keys:
        wanted = args.keys.split(",")
        reg = all_queries()
        specs = {k: reg[k] for k in wanted}
    elif args.bench:
        specs = dict(bench_queries())
    else:
        specs = dict(all_queries())

    spark = get_spark("mfs-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")

    failed: list[str] = []
    for name in sorted(specs):
        spec = specs[name]
        try:
            spark.sparkContext.setJobDescription(f"plan-capture: {name}")
            df = spec.fn(spark, sf_dir)
            from mapreduce_framework_spark.plans import formatted_plan

            plan = formatted_plan(df)
            (out_dir / f"{name}_{args.suffix}.txt").write_text(plan)
            print(f"ok   {name}")
        except Exception:
            failed.append(name)
            print(f"FAIL {name}")
            traceback.print_exc(limit=3)
    if failed:
        print(f"{len(failed)} failed: {failed}")
        sys.exit(1)
    print(f"captured {len(specs)} plans -> {out_dir}")


if __name__ == "__main__":
    main()
