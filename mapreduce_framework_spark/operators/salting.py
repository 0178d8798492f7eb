"""Salted two-stage aggregation for skewed group keys.

At 100 TB a handful of hot keys (empty string, null-ish sentinels, a
bot user) can put most of a shuffle into one partition.  AQE's skew
handling splits oversized partitions for JOINS, but a skewed
`groupBy().agg()` still funnels each hot key through a single reducer
for the FINAL aggregate.  The classic fix is salting:

    stage 1: groupBy(key, salt) — hot keys spread over S partitions;
             partial aggregation happens map-side as usual, so stage 1
             shuffles at most S rows per (key, partition);
    stage 2: groupBy(key) over S pre-aggregated rows per key — the
             reducer for the hot key now combines S rows, not N.

Only works for algebraically decomposable aggregates (sum/count/min/
max, and avg via sum+count).  The salt is derived from a hash of a
high-cardinality column (not ``rand()``), so the plan stays
deterministic and re-executable — a task retry re-salts identically,
which Spark's recompute-on-failure model requires for correctness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Aggregates that decompose as combine(partial_1 … partial_S).
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summing
    "min": F.min,
    "max": F.max,
}

_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(c),
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    salt_source: Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output column name → (agg_name, input column) with
    agg_name in {sum, count, min, max}.  ``salt_source`` is any
    high-cardinality deterministic column (e.g. an id) used to derive
    the salt.
    """
    unknown = {a for a, _ in aggs.values()} - set(_PARTIAL)
    if unknown:
        raise ValueError(f"non-decomposable aggregates: {sorted(unknown)}")

    salt = F.pmod(F.xxhash64(salt_source), F.lit(n_salts)).alias("_salt")
    stage1 = df.groupBy(*keys, salt).agg(
        *[_PARTIAL[a](c).alias(out) for out, (a, c) in aggs.items()]
    )
    stage2 = stage1.groupBy(*keys).agg(
        *[_MERGE[a](F.col(out)).alias(out) for out, (a, _) in aggs.items()]
    )
    return stage2


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_source: Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the BIG side's hot keys across S
    partitions and replicate the small side S× so every salted row
    still finds its match.

    AQE's skew-join split handles most cases at runtime; this is the
    explicit fallback for joins AQE cannot split (e.g. a skewed stream
    side, or when one hot key exceeds a single executor even after
    splitting).  Cost: the small side shuffles S× its size — use only
    when small really is small and the hot key really is hot.

    The salt is hash-derived from ``salt_source`` (a deterministic
    high-cardinality column of ``big``), never rand(): task retries
    must re-salt identically.
    """
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(salt_source), F.lit(n_salts))
    )
    small_replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_salted.join(small_replicated, [on, "_salt"], how).drop("_salt")
