"""SimHash (Charikar '02) near-dup fingerprinting, pure JVM expressions.

64-bit fingerprint: for each bit position, sum +1/-1 votes from each
token's xxhash64; bit = 1 if the vote is positive.  Near-dups = pairs
within small Hamming distance, found by the pigeonhole trick: split the
64 bits into 4 16-bit chunks — any pair at distance ≤ 3 shares at least
one exact chunk, so an equi-join on (chunk_id, chunk_value) generates
all candidates with one shuffle (no O(n²)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def simhash64(tokens: Column) -> Column:
    """64-bit SimHash of a token-array column as bigint.

    Vote for bit i = Σ_tokens (2·bit_i(h(t)) − 1); fingerprint bit i set
    iff vote > 0.  Expressed as aggregate-over-array: one pass per doc,
    no shuffle.
    """
    def bit_vote(i: int) -> Column:
        # Real closure over i — a default-arg lambda would change the
        # HOF's detected arity (see operators/minhash.py note).
        def merge(acc: Column, t: Column) -> Column:
            bit = F.shiftrightunsigned(F.xxhash64(t), i).bitwiseAND(F.lit(1))
            return acc + (bit * 2 - 1).cast("long")

        return F.aggregate(tokens, F.lit(0).cast("long"), merge)

    fp = F.lit(0).cast("long")
    for i in range(64):
        fp = fp.bitwiseOR(
            F.when(bit_vote(i) > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return fp


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
    shuffle on 16-bit chunks (valid for max_distance ≤ 3 with 4 chunks)."""
    chunked = df.select(
        F.col(id_col).alias("_id"), F.col(fp_col).alias("_fp")
    ).select("_id", "_fp", F.explode(chunk16(F.col("_fp"))).alias("c"))
    a = chunked.select(
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.chunk_val").alias("chunk_val"),
        F.col("_id").alias("id_a"),
        F.col("_fp").alias("fp_a"),
    )
    b = chunked.select(
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.chunk_val").alias("chunk_val"),
        F.col("_id").alias("id_b"),
        F.col("_fp").alias("fp_b"),
    )
    return (
        a.join(b, ["chunk_id", "chunk_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming64(F.col("fp_a"), F.col("fp_b")).alias("distance"))
        .where(F.col("distance") <= max_distance)
        .distinct()
    )
