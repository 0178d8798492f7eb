#!/usr/bin/env python
"""Seeded family-stratified oracle sample — the judge-methodology twin
of tools/verify_local.py (round-11 verdict task #4).

Eleven rounds in, the driver's CORRECTNESS sample had hash-checked
76/234 distinct keys and never touched the sql/stream/sim/graph/join/
window families; judges re-ran those by hand every round.  This tool
closes that blind spot structurally: a FRESH bare-session process (the
same methodology a judge uses — deliberately NOT the repo's
get_spark(), so per-query runtime-conf pinning is what has to make
results correct) runs a seeded sample of N keys drawn evenly across
the named families against the DuckDB oracle, and writes a
VERIFY_LOCAL-shaped artifact the evidence ledger folds in.

    python tools/verify_sample.py \
        --families sql,stream,sim,graph,join,window --n 25 --seed 12 \
        [--sf-dir /root/testdata/sf0.01] [--out VERIFY_SAMPLE_r12.json]

    python tools/verify_sample.py --keys source_kvtext_datasource,wordcount

Selection is deterministic in (families, n, seed, registry contents):
keys are stratified round-robin across families, each family's order
shuffled by the seed, so consecutive rounds with consecutive seeds
walk different keys and coverage accumulates instead of resampling.
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

from tests.conftest import TABLES, rows_normalized  # noqa: E402


def pick(all_keys: list[str], families: list[str], n: int, seed: int) -> list[str]:
    """Deterministic stratified sample: round-robin across families,
    per-family order seeded-shuffled."""
    rng = random.Random(seed)
    per_family = {
        fam: sorted(k for k in all_keys if k == fam or k.startswith(fam + "_"))
        for fam in families
    }
    empty = [fam for fam, ks in per_family.items() if not ks]
    if empty:
        raise SystemExit(f"no registry keys in families: {empty}")
    for ks in per_family.values():
        rng.shuffle(ks)
    chosen: list[str] = []
    rank = 0
    while len(chosen) < n and any(per_family.values()):
        for fam in families:
            ks = per_family[fam]
            if rank < len(ks) and len(chosen) < n:
                chosen.append(ks[rank])
        rank += 1
        if rank > max(len(ks) for ks in per_family.values()):
            break
    return sorted(chosen)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default="sql,stream,sim,graph,join,window")
    ap.add_argument("--n", type=int, default=25)
    ap.add_argument("--seed", type=int, required=False, default=0)
    ap.add_argument("--keys", default=None, help="explicit comma-separated keys (overrides sampling)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=str(REPO / "VERIFY_SAMPLE.json"))
    args = ap.parse_args()

    import __spark_entry__ as contract  # noqa: E402
    from pyspark.sql import SparkSession

    qs, oracles = contract.queries(), contract.oracle_sql()
    if args.keys:
        names = [k.strip() for k in args.keys.split(",") if k.strip()]
        unknown = [k for k in names if k not in qs]
        if unknown:
            raise SystemExit(f"unknown keys: {unknown}")
    else:
        names = pick(sorted(qs), args.families.split(","), args.n, args.seed)

    # Bare session, judge posture — see module docstring.
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    report: dict[str, dict] = {}
    for name in names:
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
        except Exception as e:
            entry["err"] = f"{type(e).__name__}: {e}"[:300]
        entry["sec"] = round(time.time() - t0, 1)
        report[name] = entry
        # Same inter-key storage hygiene as verify_local (round-5 OOM).
        try:
            spark.catalog.clearCache()
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
    ok = sum(
        1
        for e in checked
        if e["values_match"] and e["rows_match"] and e["schema_match"]
    )
    summary = {
        "sf_dir": args.sf_dir,
        "families": None if args.keys else args.families,
        "seed": None if args.keys else args.seed,
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
