#!/usr/bin/env python
"""Local replica of the driver's CORRECTNESS gate over the FULL registry.

Runs every `queries()` entry on Spark and its `oracle_sql()` twin on
DuckDB at the driver's scale factor (sf0.01 by default), canonicalizes
both sides the way the driver does (columns sorted by name, cells
normalized, rows sorted), and writes one JSON file with per-query
rows/schema/values verdicts:

    python tools/verify_local.py [--sf-dir /root/testdata/sf0.01] \
        [--out VERIFY_LOCAL.json]

The driver samples a subset of keys per round; this artifact is the
evidence for the rest.  Uses the same normalization helpers as
tests/conftest.py (single source of truth for comparison semantics).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

from tests.conftest import TABLES, rows_normalized  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=str(REPO / "VERIFY_LOCAL.json"))
    ap.add_argument(
        "--keys",
        default="",
        help="comma-separated subset of registry keys (default: all)",
    )
    args = ap.parse_args()

    import __spark_entry__ as contract  # noqa: E402  (repo-root import)
    from pyspark.sql import SparkSession

    # A BARE session, deliberately NOT the repo's get_spark(): the real
    # driver hands queries ITS OWN session, so this replica must prove
    # the contract's per-query runtime-conf pinning (and nothing else)
    # is what makes results correct.  The round-3 timestamp-NTZ bug was
    # exactly the class of failure a get_spark()-based replica misses.
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    qs, oracles = contract.queries(), contract.oracle_sql()
    if args.keys:
        wanted = [k.strip() for k in args.keys.split(",") if k.strip()]
        unknown = sorted(set(wanted) - set(qs))
        if unknown:
            raise SystemExit(f"unknown keys: {unknown}")
        qs = {k: qs[k] for k in wanted}
    report: dict[str, dict] = {}
    for name in sorted(qs):
        t0 = time.time()
        entry: dict = {"err": None}
        try:
            sdf = qs[name](spark, args.sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                entry.update(rows_only=True, spark_rows=len(s_rows))
            else:
                res = con.execute(oracles[name])
                d_cols = [d[0] for d in res.description]
                d_rows = res.fetchall()
                _, s_norm = rows_normalized(s_cols, s_rows)
                _, d_norm = rows_normalized(d_cols, d_rows)
                entry.update(
                    spark_rows=len(s_rows),
                    oracle_rows=len(d_rows),
                    rows_match=len(s_rows) == len(d_rows),
                    schema_match=sorted(s_cols) == sorted(d_cols),
                    values_match=s_norm == d_norm,
                )
        except Exception as e:  # harness parity: record, don't abort
            entry["err"] = f"{type(e).__name__}: {e}"[:300]
        entry["sec"] = round(time.time() - t0, 1)
        report[name] = entry
        # Release cached/persisted blocks between keys: in local mode
        # they live in the driver JVM, and 160+ queries of accumulated
        # storage pushed late keys into broadcast OOM (round-5).  The
        # per-key check is unchanged — each key still runs on the bare
        # session with only its own runtime-conf pinning.
        try:
            spark.catalog.clearCache()
            # clearCache drops cached plans but NOT the localCheckpoint
            # RDD blocks / broadcast pieces earlier keys left behind —
            # those are freed by the ContextCleaner only after a GC
            # notices the references are dead.  Force both collectors so
            # the bare 1g-driver session's storage pool is actually empty
            # when the next key needs to build a broadcast (round-5
            # sf0.1 sweep OOM under graph_pagerank_deep).
            import gc as _gc

            _gc.collect()
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        status = (
            "ERR"
            if entry["err"]
            else "rows-only"
            if entry.get("rows_only")
            else ("OK" if entry.get("values_match") else "MISMATCH")
        )
        print(f"{name:35s} {status:9s} {entry['sec']}s", flush=True)

    checked = [e for e in report.values() if "values_match" in e]
    ok = sum(1 for e in checked if e["values_match"] and e["rows_match"] and e["schema_match"])
    summary = {
        "sf_dir": args.sf_dir,
        "total": len(report),
        "oracle_checked": len(checked),
        "oracle_green": ok,
        "rows_only": sum(1 for e in report.values() if e.get("rows_only")),
        "errors": sum(1 for e in report.values() if e["err"]),
    }
    out = {"summary": summary, "queries": report}
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(summary))
    return 0 if ok == len(checked) and summary["errors"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
