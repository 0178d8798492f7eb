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
