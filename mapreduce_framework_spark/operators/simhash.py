"""SimHash (Charikar '02) near-dup fingerprinting, pure JVM expressions.

64-bit fingerprint: for each bit position, sum +1/-1 votes from each
token's xxhash64; bit = 1 if the vote is positive.  Near-dups = pairs
within small Hamming distance, found by the pigeonhole trick: split the
64 bits into 4 16-bit chunks — any pair at distance ≤ 3 shares at least
one exact chunk, so one shuffle on (chunk_id, chunk_value) groups all
candidates; pairs are generated inside each bucket (no self-join, no
second corpus scan).

Execution shape (same reasoning as operators/minhash.py): explode the
token array, hash each token once, then ``groupBy(doc)`` with 64
codegen'd ``sum(bit_i)`` columns + one count — the vote for bit i is
``2·Σbit_i − n``.  Array-HOF bit-vote passes (``aggregate`` per bit)
are interpreted per element and were measured several times slower.
Map-side partial aggregation keeps the shuffle at one row per doc.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fingerprints(df: DataFrame, id_col: str, tokens_col: str) -> DataFrame:
    """DataFrame[id, fp]: 64-bit SimHash (bigint) per document from a
    token-ARRAY column.  One explode + one codegen HashAggregate; the
    shuffle carries one row of 65 longs per doc."""
    # explode_outer: avoids the inferred size()>0 filter that re-inlines
    # the token-array expression below the projection (see
    # operators/minhash.py).
    ex = (
        df.select(F.col(id_col).alias("_id"), F.explode_outer(F.col(tokens_col)).alias("_t"))
        .where(F.col("_t").isNotNull())
        .select("_id", F.xxhash64("_t").alias("_h"))
    )
    agg = ex.groupBy("_id").agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(F.shiftrightunsigned("_h", i).bitwiseAND(F.lit(1))).alias(f"_b{i}")
            for i in range(64)
        ],
    )
    fp = F.lit(0).cast("long")
    for i in range(64):
        # bit set iff vote > 0  ⇔  2·Σbit − n > 0
        fp = fp.bitwiseOR(
            F.when(
                F.col(f"_b{i}") * 2 > F.col("_n"),
                F.shiftleft(F.lit(1).cast("long"), i),
            ).otherwise(F.lit(0).cast("long"))
        )
    return agg.select(F.col("_id").alias(id_col), fp.alias("fp"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints (bit_count of
    XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def chunk16(fp: Column) -> Column:
    """array<struct<chunk_id:int, chunk_val:int>>: the 4 16-bit chunks
    for the pigeonhole candidate join."""
    return F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk_id"),
                F.shiftrightunsigned(fp, c * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .cast("int")
                .alias("chunk_val"),
            )
            for c in range(4)
        ]
    )


def near_pairs(
    df: DataFrame, id_col: str, fp_col: str, max_distance: int = 3
) -> DataFrame:
    """(id_a, id_b, distance) for pairs within ``max_distance``; one
    shuffle on 16-bit chunks (valid for max_distance ≤ 3 with 4 chunks),
    pairs generated within each chunk bucket array-side."""
    chunked = df.select(
        F.col(id_col).alias("_id"), F.col(fp_col).alias("_fp")
    ).select("_id", "_fp", F.explode(chunk16(F.col("_fp"))).alias("c"))
    buckets = (
        chunked.groupBy(
            F.col("c.chunk_id").alias("chunk_id"), F.col("c.chunk_val").alias("chunk_val")
        )
        .agg(F.collect_list(F.struct(F.col("_id"), F.col("_fp"))).alias("xs"))
        .where(F.size("xs") >= 2)
    )

    def pairs_of(xs: Column) -> Column:
        def with_gt(x: Column) -> Column:
            def gt(y: Column) -> Column:
                return y["_id"] > x["_id"]

            def pair(y: Column) -> Column:
                return F.struct(
                    x["_id"].alias("id_a"),
                    y["_id"].alias("id_b"),
                    hamming64(x["_fp"], y["_fp"]).alias("distance"),
                )

            return F.transform(F.filter(xs, gt), pair)

        return F.flatten(F.transform(xs, with_gt))

    return (
        buckets.select(F.explode(pairs_of(F.col("xs"))).alias("p"))
        .select("p.id_a", "p.id_b", "p.distance")
        .where(F.col("distance") <= max_distance)
        .distinct()
    )
