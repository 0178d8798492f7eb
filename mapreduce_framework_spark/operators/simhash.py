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


def md5_prefix60(token: Column) -> Column:
    """60-bit token hash from the first 15 hex chars of md5 — the
    cross-engine-reproducible hash family: DuckDB computes the identical
    value as ``CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT)``,
    which makes md5-based SimHash fingerprints oracle-checkable.  Still
    pure JVM codegen (md5 + conv), just slower than xxhash64."""
    return F.conv(F.substring(F.md5(token), 1, 15), 16, 10).cast("long")


def fingerprints(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    token_hash=None,
    n_bits: int = 64,
) -> DataFrame:
    """DataFrame[id, fp]: ``n_bits``-bit SimHash (bigint) per document
    from a token-ARRAY column.  One explode + one codegen HashAggregate;
    the shuffle carries one row of n_bits+1 longs per doc.

    ``token_hash`` maps a token Column to a bigint Column; default is
    engine-native ``xxhash64`` (fastest).  Pass :func:`md5_prefix60`
    with ``n_bits=60`` when the fingerprint must be reproducible
    outside Spark (oracle checks)."""
    if token_hash is None:
        token_hash = F.xxhash64
    # explode_outer: avoids the inferred size()>0 filter that re-inlines
    # the token-array expression below the projection (see
    # operators/minhash.py).
    ex = (
        df.select(F.col(id_col).alias("_id"), F.explode_outer(F.col(tokens_col)).alias("_t"))
        .where(F.col("_t").isNotNull())
        .select("_id", token_hash(F.col("_t")).alias("_h"))
    )
    agg = ex.groupBy("_id").agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(F.shiftrightunsigned("_h", i).bitwiseAND(F.lit(1))).alias(f"_b{i}")
            for i in range(n_bits)
        ],
    )
    fp = F.lit(0).cast("long")
    for i in range(n_bits):
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


def chunk16(fp: Column, n_chunks: int = 4, width: int = 16) -> Column:
    """array<struct<chunk_id:int, chunk_val:int>>: the fingerprint cut
    into ``n_chunks`` chunks of ``width`` bits for the pigeonhole
    candidate join (distance ≤ n_chunks−1 ⇒ some chunk matches)."""
    mask = (1 << width) - 1
    return F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk_id"),
                F.shiftrightunsigned(fp, c * width)
                .bitwiseAND(F.lit(mask))
                .cast("int")
                .alias("chunk_val"),
            )
            for c in range(n_chunks)
        ]
    )


def near_pairs(
    df: DataFrame,
    id_col: str,
    fp_col: str,
    max_distance: int = 3,
    n_chunks: int = 4,
    width: int = 16,
    max_bucket: int = 100_000,
) -> DataFrame:
    """(id_a, id_b, distance) for pairs within ``max_distance``; one
    shuffle on fingerprint chunks (valid for max_distance ≤ n_chunks−1),
    pairs generated within each chunk bucket array-side.

    ``max_bucket`` drops degenerate chunk buckets, with the same
    rationale and recall caveat as operators/minhash.py — a bucket of k
    docs builds k² pair structs inside ONE collect_list row, so an
    unguarded hot bucket is a memory hazard before it is a time
    problem.  Homogeneity note (measured, tools/scale_probe.py): on a
    low-vocabulary corpus fingerprints concentrate and Σk² over
    mid-size buckets — not one hot bucket — dominates (244M pair
    structs at 400k synthetic ~100-word-vocab docs, 21.6× time at 10×
    data, no bucket over 2.1k).  The cap cannot fix that shape; widen
    the chunks (fewer, larger) or use the MinHash tier, which measured
    1.1× time at 10× data on the same corpus."""
    chunked = df.select(
        F.col(id_col).alias("_id"), F.col(fp_col).alias("_fp")
    ).select(
        "_id", "_fp", F.explode(chunk16(F.col("_fp"), n_chunks, width)).alias("c")
    )
    buckets = (
        chunked.groupBy(
            F.col("c.chunk_id").alias("chunk_id"), F.col("c.chunk_val").alias("chunk_val")
        )
        .agg(F.collect_list(F.struct(F.col("_id"), F.col("_fp"))).alias("xs"))
        .where((F.size("xs") >= 2) & (F.size("xs") <= max_bucket))
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
