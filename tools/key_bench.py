#!/usr/bin/env python
"""Time a handful of registry keys exactly the way bench.py does
(noop sink, min-of-N inside one warmed process) — the A/B harness for
single-key optimization work.

Usage: python tools/key_bench.py key1,key2 [--reps 3] [--sf-dir ...]
Prints one JSON line: {"key": min_seconds, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    from mapreduce_framework_spark.registry import all_queries
    from mapreduce_framework_spark.session import get_spark

    spark = get_spark("mfs-key-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    reg = all_queries()
    keys = args.keys.split(",")
    timings: dict[str, float] = {}
    for _ in range(args.reps):
        for k in keys:
            t0 = time.perf_counter()
            df = reg[k].fn(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            timings[k] = min(timings.get(k, dt), dt)
    print(json.dumps(timings, separators=(",", ":")))


if __name__ == "__main__":
    main()
