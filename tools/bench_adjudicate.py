#!/usr/bin/env python
"""Automated driver-bench adjudication (round-9 verdict task #4).

Every round the driver records a SINGLE-SHOT bench at BENCH_r{N}.json
on a shared box with documented 3-20x swings on identical plans
(BASELINE.md).  The noise-vs-regression call for each >1.25x mover used
to live in prose and judge re-derivation; this tool makes it an
artifact.  For the latest BENCH_r{N} / BENCH_r{N-1} pair it emits
BENCH_ADJUDICATION_r{N}.json with a per-mover verdict:

  new-capability  — the key did not exist in round N-1 (its cost is the
                    price of a new capability, not a regression);
  noise           — the key's code path was NOT touched between the two
                    rounds (git diff over the file that defines it), or
                    it was touched but the builder's min-of-3 local
                    series moved < the mover threshold (single-shot
                    drift cannot be a code regression when the
                    reproducible-minimum series is flat);
  real            — code path touched AND the min-of-3 series confirms
                    the slowdown: a genuine regression to fix;
  unconfirmed     — no local series covers the key; the single-shot
                    ratio stands unexplained (act as if real).

Per-query timings are read from ``parsed.queries`` when the driver
captured it, else recovered from the 2000-char stdout ``tail`` (the
round-9 failure mode: ``parsed: null`` because the JSON line straddled
the tail truncation — bench.py now also writes BENCH_last.json so the
CURRENT round is always fully recoverable).

Run from the repo root (the Makefile round-start target does):

    python tools/bench_adjudicate.py [--threshold 1.25]
"""

from __future__ import annotations

import argparse
import json
import math
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

MOVER_THRESHOLD = 1.25
# Sub-50ms keys flip >1.25x on scheduler jitter alone; they can never
# be adjudicated meaningfully from a single shot.
MIN_BASE_SEC = 0.05


def _queries_from_artifact(path: Path) -> tuple[dict[str, float], str]:
    """(per-query seconds, provenance) from a driver BENCH_r{N}.json OR
    a local bench line (BENCH_last.json / BENCH_local_r{N}.json)."""
    d = json.loads(path.read_text())
    if "queries" in d and isinstance(d.get("queries"), dict):
        return dict(d["queries"]), "full"
    if d.get("parsed") and isinstance(d["parsed"].get("queries"), dict):
        return dict(d["parsed"]["queries"]), "parsed"
    tail = d.get("tail") or ""
    # Tail recovery: the JSON line was truncated; scrape what survived.
    pairs = re.findall(r'"([a-z0-9_]+)":\s*([0-9]+(?:\.[0-9]+)?)', tail)
    qs = {
        k: float(v)
        for k, v in pairs
        if k not in ("value", "sf", "n", "rc", "cpus")
    }
    return qs, f"tail-recovered ({len(qs)} keys)"


def _latest_round() -> int | None:
    rounds = sorted(
        int(m.group(1))
        for p in REPO.glob("BENCH_r*.json")
        if (m := re.fullmatch(r"BENCH_r(\d+)\.json", p.name))
    )
    return rounds[-1] if rounds else None


def _round_boundary_commit(n: int) -> str | None:
    """The commit that landed round n's driver artifacts — the diff
    base for 'was this key's code path touched since'."""
    out = subprocess.run(
        ["git", "log", "--grep", f"round {n}: verdict", "--format=%H", "-1"],
        cwd=REPO,
        capture_output=True,
        text=True,
    ).stdout.strip()
    return out or None


def _touched_files(since: str, until: str) -> set[str]:
    out = subprocess.run(
        ["git", "diff", "--name-only", f"{since}..{until}"],
        cwd=REPO,
        capture_output=True,
        text=True,
    ).stdout
    return {line.strip() for line in out.splitlines() if line.strip()}


def _key_files() -> dict[str, str]:
    """registry key -> repo-relative file that defines it."""
    from mapreduce_framework_spark.registry import all_queries

    out = {}
    for name, spec in all_queries().items():
        try:
            f = Path(spec.fn.__code__.co_filename).resolve()
            out[name] = str(f.relative_to(REPO))
        except (AttributeError, ValueError):
            out[name] = ""
    return out


def _local_series(n: int) -> list[tuple[str, dict[str, float]]]:
    """Available min-of-3 local recordings in RECENCY order (oldest
    first) — ratio direction matters: only newer/older > threshold
    means 'the local series confirms a slowdown'.  BENCH_last.json is
    the current session's latest run, i.e. the newest recording."""
    # Every folded recording from round n-1 onward, in round order: a
    # FLAT newer/older fold pair — even one recorded after round n —
    # is evidence the driver's single-shot drift did not persist, i.e.
    # noise.  BENCH_last (the session's latest SINGLE run) stands in
    # only when no fold at or after round n exists: a single shot is
    # noisier than a min-of-3 fold, and pairing one against a fold
    # manufactures slowdowns the folded series disproves.
    fold_rounds = sorted(
        m
        for p in REPO.glob("BENCH_local_r*.json")
        if (mt := re.fullmatch(r"BENCH_local_r(\d+)\.json", p.name))
        and (m := int(mt.group(1))) >= n - 1
    )
    order = [f"BENCH_local_r{m:02d}.json" for m in fold_rounds]
    if not any(m >= n for m in fold_rounds):
        order.append("BENCH_last.json")
    series: list[tuple[str, dict[str, float]]] = []
    for name in order:
        p = REPO / name
        if p.exists():
            qs, _ = _queries_from_artifact(p)
            series.append((name, qs))
    return series


def adjudicate(threshold: float) -> dict | None:
    n = _latest_round()
    if n is None:
        return None
    cur_p = REPO / f"BENCH_r{n:02d}.json"
    prev_p = REPO / f"BENCH_r{n - 1:02d}.json"
    if not prev_p.exists():
        return None
    cur, cur_src = _queries_from_artifact(cur_p)
    prev, prev_src = _queries_from_artifact(prev_p)

    common = sorted(k for k in cur if k in prev and prev[k] > 0 and cur[k] > 0)
    geomean = (
        math.exp(sum(math.log(cur[k] / prev[k]) for k in common) / len(common))
        if common
        else None
    )

    # Diff window = exactly the code that changed BETWEEN the two
    # benched rounds: the artifact-landing commits bound it.  Round n's
    # boundary may not exist yet (the adjudicated bench can land before
    # the verdict commit) — then the window ends at HEAD and verdicts
    # can only be contaminated by same-round edits, which is the best
    # available approximation and is recorded in diff_until.
    prev_boundary = _round_boundary_commit(n - 1)
    until = _round_boundary_commit(n) or "HEAD"
    touched = (
        _touched_files(prev_boundary, until) if prev_boundary else set()
    )
    key_files = _key_files()
    locals_ = _local_series(n)

    def local_ratios_for(k: str) -> dict[str, float]:
        # Newer/older for every ordered recording pair — direction-
        # correct: >1 means the NEWER recording is slower.
        out = {}
        for older_i in range(len(locals_)):
            for newer_i in range(older_i + 1, len(locals_)):
                o_name, o_qs = locals_[older_i]
                n_name, n_qs = locals_[newer_i]
                if k in o_qs and k in n_qs and o_qs[k] > 0:
                    out[f"{n_name}/{o_name}"] = round(n_qs[k] / o_qs[k], 3)
        return out

    oldest_local = locals_[0][1] if locals_ else {}
    prev_truncated = prev_src.startswith("tail-recovered")

    movers = []
    for k in sorted(cur):
        if k not in prev:
            if prev_truncated and k in oldest_local:
                # The key EXISTED last round — it just fell off the
                # driver's truncated stdout tail.  Exempting it as
                # 'new-capability' would hide a real regression; fall
                # through to the local-series adjudication with no
                # driver ratio available.
                lr = local_ratios_for(k)
                if lr and all(v <= threshold for v in lr.values()):
                    verdict, why = "noise", (
                        "prev driver timing lost to tail truncation; "
                        "min-of-3 local series is flat"
                    )
                elif any(v > threshold for v in lr.values()):
                    verdict, why = "real", (
                        "prev driver timing lost to tail truncation; "
                        "min-of-3 local series shows a slowdown"
                    )
                else:
                    verdict, why = "unconfirmed", (
                        "prev driver timing lost to tail truncation and "
                        "no local series covers the key"
                    )
                movers.append(
                    {"key": k, "cur_s": cur[k], "local_ratios": lr,
                     "verdict": verdict, "why": why}
                )
            else:
                movers.append(
                    {"key": k, "cur_s": cur[k], "verdict": "new-capability",
                     "why": "no round-{} recording".format(n - 1)}
                )
            continue
        if prev[k] < MIN_BASE_SEC or cur[k] / prev[k] <= threshold:
            continue
        ratio = round(cur[k] / prev[k], 3)
        f = key_files.get(k, "")
        was_touched = f in touched
        local_ratios = local_ratios_for(k)
        local_confirms = any(v > threshold for v in local_ratios.values())
        if not was_touched:
            verdict, why = "noise", f"code path untouched since round {n-1} ({f})"
        elif local_ratios and not local_confirms:
            verdict, why = "noise", "touched, but min-of-3 local series is flat"
        elif local_confirms:
            verdict, why = "real", "touched AND min-of-3 series confirms"
        else:
            verdict, why = "unconfirmed", "touched; no local series covers the key"
        movers.append(
            {"key": k, "prev_s": prev[k], "cur_s": cur[k], "ratio": ratio,
             "file": f, "touched": was_touched, "local_ratios": local_ratios,
             "verdict": verdict, "why": why}
        )

    return {
        "round": n,
        "vs_round": n - 1,
        "threshold": threshold,
        "cur_source": cur_src,
        "prev_source": prev_src,
        "n_common": len(common),
        "geomean_ratio": round(geomean, 4) if geomean else None,
        "diff_base": prev_boundary,
        "diff_until": until,
        "movers": movers,
        "n_real": sum(1 for m in movers if m["verdict"] == "real"),
        "n_noise": sum(1 for m in movers if m["verdict"] == "noise"),
        "n_new": sum(1 for m in movers if m["verdict"] == "new-capability"),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=MOVER_THRESHOLD)
    args = ap.parse_args()
    result = adjudicate(args.threshold)
    if result is None:
        print("bench_adjudicate: need at least two BENCH_r{N}.json artifacts")
        return
    out = REPO / "BENCH_ADJUDICATION_r{:02d}.json".format(result["round"])
    out.write_text(json.dumps(result, indent=1) + "\n")
    print(
        f"wrote {out.name}: geomean {result['geomean_ratio']} over "
        f"{result['n_common']} keys; movers real={result['n_real']} "
        f"noise={result['n_noise']} new={result['n_new']}"
    )


if __name__ == "__main__":
    main()
