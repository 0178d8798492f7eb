#!/usr/bin/env python
"""One-shot FULL-REGISTRY price sweep (round-6: closes the bench
blind spot structurally).

`bench.py` is the headline suite — the bench-tagged keys (59 as of
round 7), min-of-3, the
series BASELINE.md's 2× gate tracks.  This tool prices EVERYTHING
else: every registered key runs once to a `noop` sink (compute +
shuffle, no sink I/O, no DuckDB oracle in the timing — unlike the
VERIFY_LOCAL artifacts' `sec`, which includes the oracle replay) and
the per-key wall goes to a JSON artifact.  One-shot timings include
each key's codegen compilation — honest for single-shot execution;
read them as ceilings, not steady-state.

Usage:
    python tools/price_all.py [--sf-dir /root/testdata/sf0.1] \
        [--out PRICES_r06.json]
"""

from __future__ import annotations

import argparse
import gc
import json
import re
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
import sys

sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="PRICES.json")
    args = ap.parse_args()

    from mapreduce_framework_spark.registry import all_queries
    from mapreduce_framework_spark.session import get_spark

    spark = get_spark("mfs-price-all")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM

    m = re.search(r"sf([0-9.]+)", args.sf_dir)
    queries: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, spec in sorted(all_queries().items()):
        t0 = time.perf_counter()
        try:
            spec.fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            queries[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # record, don't abort the sweep
            errors[name] = f"{type(e).__name__}: {e}"[:200]
        print(f"{name:35s} {queries.get(name, 'ERR')}", flush=True)
        # Storage hygiene between keys (the round-5 OOM lesson): free
        # cached blocks, localCheckpoint RDDs and dead broadcasts.
        try:
            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()
        except Exception:
            pass

    doc = {
        "metric": "full_registry_oneshot_seconds",
        "sf": float(m.group(1)) if m else -1.0,
        "n_keys": len(queries),
        "n_errors": len(errors),
        "total_sec": round(sum(queries.values()), 1),
        "queries": queries,
        "errors": errors,
    }
    Path(args.out).write_text(json.dumps(doc, indent=1, sort_keys=True))
    print(json.dumps({k: doc[k] for k in ("sf", "n_keys", "n_errors", "total_sec")}))


if __name__ == "__main__":
    main()
