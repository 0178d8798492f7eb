#!/usr/bin/env python
"""Empirical scaling probe for the dedup ladder.

Synthesizes a deterministic document corpus at two sizes (default 50k
and 500k docs, ~40 tokens each, with planted exact- and near-dup rates)
and times each dedup tier at both sizes.  The interesting number is the
RATIO: a linear operator should scale ~Nx when the corpus grows Nx; the
banded jaccard should stay near-linear (bounded block quadratic), and
anything super-linear is a scale bug this probe exists to catch before
a 100 TB run does.

    python tools/scale_probe.py [--small 50000] [--big 500000]

Writes nothing outside /tmp; prints one JSON line per tier plus a
summary line.  Synthetic corpus: 2% of docs are exact duplicates of a
neighbor, 2% are near-dups (one appended token).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

VOCAB = [
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu zero one two three four "
    "five six seven eight nine stone river cloud ember quartz willow "
    "falcon harbor meadow summit canyon prairie tundra lagoon mesa "
    "grove delta basin ridge bluff cove glen heath knoll ledge marsh "
    "notch outlook pass quarry reach shoal trail vale wash yard zone "
    "arch bend cliff dune edge ford gap hill isle jetty key loop mount"
][0].split()


def synth(spark, n: int) -> DataFrame:
    """Deterministic corpus mirroring the testdata's blocking shape:
    (lang, source) categories plus VARIED doc lengths (20-79 tokens —
    uniform lengths would collapse every doc into one token-count band
    and turn the banded tier into all-pairs, which is exactly the
    degenerate case the band does NOT protect against; the probe's
    first version demonstrated that by hanging).  Text derives from a
    seed id; 2% of docs reuse the previous id's seed (exact dup), 2%
    reuse it and append a token (near dup) — dup partners share
    (lang, source) like real near-dups share provenance."""
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    d = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 50 == 1, F.col("id") - 1)
        .when(F.col("id") % 50 == 2, F.col("id") - 2)
        .otherwise(F.col("id"))
        .alias("seed"),
        (F.col("id") % 50 == 2).alias("near"),
    )
    d = d.withColumn("lang", F.concat(F.lit("l"), F.pmod("seed", F.lit(5))))
    d = d.withColumn("source", F.concat(F.lit("s"), F.pmod("seed", F.lit(20))))
    n_tok = (F.lit(20) + F.pmod(F.col("seed") * 7, F.lit(60))).cast("int")
    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), n_tok),
            lambda k: F.element_at(
                vocab, (F.pmod(F.xxhash64(F.col("seed"), k), F.lit(len(VOCAB))) + 1).cast("int")
            ),
        ),
    )
    return d.select(
        "doc_id",
        "lang",
        "source",
        F.when(F.col("near"), F.concat(body, F.lit(" extra"))).otherwise(body).alias(
            "text"
        ),
    )


def tiers(docs: DataFrame) -> dict[str, callable]:
    from mapreduce_framework_spark.operators.minhash import (
        candidate_pairs,
        jaccard,
    )
    from mapreduce_framework_spark.operators.simhash import fingerprints, near_pairs

    def t_exact() -> int:
        return (
            docs.select(F.sha2(F.col("text"), 256).alias("h"), "doc_id")
            .groupBy("h")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > 1)
            .count()
        )

    def t_banded_jaccard() -> int:
        import math

        d = docs.select(
            "doc_id",
            "lang",
            "source",
            F.array_distinct(F.split("text", " ")).alias("toks"),
        ).withColumn(
            "band",
            F.floor(
                F.log(F.greatest(F.size("toks"), F.lit(1))) / F.lit(math.log(1.25))
            ).cast("int"),
        )
        a = d.select(
            F.col("doc_id").alias("doc_a"),
            "lang",
            "source",
            F.col("toks").alias("toks_a"),
            F.explode(F.array(*[F.col("band") + F.lit(i) for i in range(-2, 3)])).alias(
                "bp"
            ),
        )
        b = d.select(
            F.col("doc_id").alias("doc_b"),
            F.col("lang").alias("lang_b"),
            F.col("source").alias("source_b"),
            F.col("toks").alias("toks_b"),
            "band",
        )
        return (
            a.join(
                b,
                (F.col("lang") == F.col("lang_b"))
                & (F.col("source") == F.col("source_b"))
                & (F.col("bp") == F.col("band")),
            )
            .where(F.col("doc_a") < F.col("doc_b"))
            .where(jaccard(F.col("toks_a"), F.col("toks_b")) >= 0.8)
            .count()
        )

    def t_minhash() -> int:
        from mapreduce_framework_spark.functions.tokenize import word_ngrams

        d = (
            docs.select("doc_id", F.split("text", " ").alias("toks"))
            .where(F.size("toks") >= 3)
            .select("doc_id", word_ngrams(F.col("toks"), 3).alias("sh"))
        )
        return candidate_pairs(d, "doc_id", "sh").count()

    def t_simhash() -> int:
        d = docs.select("doc_id", F.split("text", " ").alias("toks"))
        fps = fingerprints(d, "doc_id", "toks")
        return near_pairs(fps, "doc_id", "fp", max_distance=3).count()

    return {
        "exact": t_exact,
        "banded_jaccard": t_banded_jaccard,
        "minhash_lsh": t_minhash,
        "simhash": t_simhash,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=50_000)
    ap.add_argument("--big", type=int, default=500_000)
    args = ap.parse_args()

    from mapreduce_framework_spark.session import get_spark

    spark = get_spark("mfs-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM

    # Tier-appropriate sizes: the linear tiers run at (small, big); the
    # banded exact-jaccard tier runs at (small/8, small/2) because its
    # within-block pair count grows QUADRATICALLY once block membership
    # grows linearly with the corpus (fixed category cardinality) — the
    # probe exists to measure that, not to wait on it.
    sizes = {
        "exact": (args.small, args.big),
        "minhash_lsh": (args.small, args.big),
        "simhash": (args.small, args.big),
        "banded_jaccard": (max(args.small // 8, 1000), max(args.small // 2, 4000)),
    }
    cache: dict[int, DataFrame] = {}

    def corpus(n: int) -> DataFrame:
        if n not in cache:
            df = synth(spark, n)
            df.persist()
            df.count()  # materialize synthesis outside the timed region
            cache[n] = df
        return cache[n]

    report = {}
    for name in ("exact", "minhash_lsh", "simhash", "banded_jaccard"):
        for n in sizes[name]:
            fn = tiers(corpus(n))[name]
            t0 = time.perf_counter()
            result = fn()
            dt = round(time.perf_counter() - t0, 2)
            report.setdefault(name, {})[n] = {"sec": dt, "result_rows": result}
            print(json.dumps({"tier": name, "n_docs": n, "sec": dt, "rows": result}), flush=True)

    summary = {}
    for name, v in report.items():
        (n1, r1), (n2, r2) = sorted(v.items())
        summary[name] = {
            "n": [n1, n2],
            "sec": [r1["sec"], r2["sec"]],
            "data_ratio": round(n2 / n1, 1),
            "time_ratio": round(r2["sec"] / max(r1["sec"], 1e-9), 1),
        }
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
