"""MinHash + LSH banding for near-duplicate detection at scale.

Algorithm (standard MinHash/LSH, cf. Broder '97; ClusterJoin VLDB'14 for
the partitioned-candidate-join framing in PAPERS.md):

1. signature: for each of ``n_hashes`` seeded hash functions, the min of
   ``xxhash64(token, seed)`` over the document's token set.  Pure JVM
   expressions (`transform` + `array_min`) — no Python, no shuffle.
2. banding: split the signature into ``n_bands`` bands of ``r`` rows;
   hash each band.  Documents sharing ANY band hash become candidates —
   one `groupBy(band_id, band_hash)` shuffle where each bucket is tiny.
3. verify: exact Jaccard over token sets for candidate pairs only.

Scale posture: the all-pairs O(n²) never materializes — the shuffle is
O(n · n_bands) rows, candidate buckets are bounded by collision rate,
and the final verify join touches only candidates.  Skewed buckets
(e.g. empty-doc signatures) are AQE-splittable; a cap on bucket size
(`max_bucket`) guards pathological collisions.

Probability: with n_hashes=64, bands=16×4, P(candidate) ≈
1-(1-j⁴)¹⁶ — ~50% at j≈0.55, >99% at j≥0.8 — the classic S-curve for a
0.7-0.8 threshold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _seeded_min(tokens: Column, seed: int) -> Column:
    # Closure (not a default-arg lambda): PySpark counts lambda params
    # to pick the HOF form, so `lambda t, i=i` would silently become the
    # (element, index) two-arg variant.
    def h(t: Column) -> Column:
        return F.xxhash64(t, F.lit(seed))

    return F.array_min(F.transform(tokens, h))


def minhash_signature(tokens: Column, n_hashes: int = 64) -> Column:
    """array<bigint> MinHash signature of a token-array column."""
    return F.array(*[_seeded_min(tokens, i) for i in range(n_hashes)])


def band_hashes(sig: Column, n_bands: int = 16, rows_per_band: int = 4) -> Column:
    """array<struct<band_id:int, band_hash:bigint>> from a signature."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(
                    *[F.element_at(sig, b * rows_per_band + r + 1) for r in range(rows_per_band)]
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )


def candidate_pairs(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    n_hashes: int = 64,
    n_bands: int = 16,
    max_bucket: int = 100_000,
) -> DataFrame:
    """Distinct candidate id pairs (id_a < id_b) from LSH banding.

    ``max_bucket`` drops degenerate buckets (a bucket of k docs yields
    k² pairs; a pathological collision would otherwise dominate the
    stage).  NOTE it must stay well above the largest *legitimate*
    duplicate-cluster size — a cluster of k near-identical docs shares
    most band buckets, and pruning those buckets silently loses true
    pairs (recall, not just cost).  Default bounds bucket blowup at
    ~1e10 comparisons while tolerating 1e5-doc dup clusters; tune per
    corpus with the bucket-size histogram."""
    rows_per_band = n_hashes // n_bands
    sig = minhash_signature(F.col(tokens_col), n_hashes)
    banded = (
        df.select(F.col(id_col).alias("_id"), sig.alias("_sig"))
        .select("_id", F.explode(band_hashes(F.col("_sig"), n_bands, rows_per_band)).alias("b"))
        .select("_id", F.col("b.band_id").alias("band_id"), F.col("b.band_hash").alias("band_hash"))
    )
    bucket_sizes = banded.groupBy("band_id", "band_hash").agg(
        F.count(F.lit(1)).alias("_n")
    )
    pruned = banded.join(
        bucket_sizes.where(F.col("_n") <= max_bucket), ["band_id", "band_hash"]
    )
    a = pruned.select("band_id", "band_hash", F.col("_id").alias("id_a"))
    b = pruned.select("band_id", "band_hash", F.col("_id").alias("id_b"))
    return (
        a.join(b, ["band_id", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard(tokens_a: Column, tokens_b: Column) -> Column:
    """Exact Jaccard over two (deduplicated) token arrays — int
    cardinalities + one double division: cross-engine deterministic."""
    inter = F.size(F.array_intersect(tokens_a, tokens_b))
    union = F.size(F.array_union(tokens_a, tokens_b))
    return inter.cast("double") / union.cast("double")
