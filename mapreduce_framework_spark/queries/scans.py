"""Scans, pushdown, and sink round-trip (SURVEY.md §2a O1-O3, O12, O21).

The reference hand-rolls ranged blob reads with word-boundary fixing
(w7/src/worker/worker.h:42-86,196-232) and size-balanced sharding
(w7/src/master/dbconn.h:39-64); here both are FileSourceScan built-ins.
What we own is making sure pruning/pushdown actually reach the scan —
tests assert `PushedFilters`/`ReadSchema` on these plans.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_spark.io import table
from mapreduce_framework_spark.registry import register


@register(
    "scan_project",
    oracle="""
SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
FROM lineitem
""".strip(),
    tags=("scan",),
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned scan: ReadSchema must contain exactly 4 columns."""
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )


@register(
    "scan_filter_pushdown",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND o_orderstatus = 'O'
""".strip(),
    tags=("scan", "filter"),
    bench=True,
)
def scan_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicates reach the parquet reader (PushedFilters), so row groups
    outside the date range are skipped via min/max stats — at 100 TB this
    is the difference between scanning a year and scanning a decade."""
    o = table(spark, sf_dir, "orders")
    return o.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderstatus") == "O")
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")


@register(
    "sink_roundtrip",
    # Round-trip must be lossless, so the oracle is simply the same
    # aggregate computed directly on the source table.
    oracle="""
SELECT l_returnflag, count(*) AS cnt
FROM lineitem
WHERE l_quantity > 25
GROUP BY l_returnflag
""".strip(),
    tags=("sink",),
)
def sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write a filtered projection to parquet (partitioned by the group
    key, mirroring the reference's one-blob-per-reducer sink,
    workerimpl.cc:319-333), read it back, aggregate."""
    src = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > 25)
        .select("l_orderkey", "l_quantity", "l_returnflag")
    )
    out = tempfile.mkdtemp(prefix="mfs_sink_")
    src.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "sink_merge_upsert",
    oracle="""
WITH updates AS (
  SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST('1.1' AS DECIMAL(3,2))
              AS DOUBLE) AS o_totalprice
  FROM orders WHERE o_orderkey % 10 = 0
),
merged AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 10 <> 0
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM updates
)
SELECT o_orderstatus, count(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM merged
GROUP BY o_orderstatus
""".strip(),
    tags=("sink", "merge"),
)
def sink_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert on plain parquet: rows from the change batch replace
    snapshot rows by key (left_anti keeps unmatched snapshot rows, the
    batch is unioned in), written back and re-read.  This is the
    incremental-maintenance primitive for a snapshot table without a
    table format: at scale the anti-join broadcasts the (small) change
    batch, so the rewrite cost is one snapshot scan — and pairing it
    with partitioned layout (overwrite_partitions_dynamic in sources/)
    bounds the rewrite to touched partitions."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    updates = (
        o.where(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_orderstatus", F.lit("X"))
        # Exact decimal markup, NOT round(double*1.1, 2): rounding a
        # double product is the classic cross-engine boundary trap —
        # the same decimal value rounds differently once the binary
        # representation straddles .xx5 (bit at sf0.01).
        .withColumn(
            "o_totalprice",
            (
                F.col("o_totalprice").cast("decimal(18,2)")
                * F.lit("1.1").cast("decimal(3,2)")
            ).cast("double"),
        )
    )
    merged = o.join(
        F.broadcast(updates.select("o_orderkey")), "o_orderkey", "left_anti"
    ).unionByName(updates)
    out = tempfile.mkdtemp(prefix="mfs_merge_")
    merged.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        # Scale 4, not 2: the markup above has 4 decimal places, and
        # re-rounding it to 2 at cast time is engine-dependent.
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("total"),
    )
