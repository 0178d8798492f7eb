"""Window functions (SURVEY.md §2b) — the natural extension of the
reference's per-key processing (each reducer sees one key-partition,
reduce.py:2-17) to ordered per-key computation.

Scale notes: a window = one shuffle on partitionBy keys + in-partition
sort.  Partition keys here are high-cardinality (custkey/suppkey) so no
single partition explodes; every ORDER BY carries a unique tie-break
column so results are deterministic, not just correct-modulo-ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_framework_spark.functions.numeric import dsum, dsum_sql
from mapreduce_framework_spark.io import table
from mapreduce_framework_spark.registry import register


@register(
    "window_rank",
    oracle="""
SELECT c_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
WHERE rn <= 3
""".strip(),
    tags=("window",),
    bench=True,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (row_number, tie-broken by
    orderkey for determinism)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "window_running",
    oracle=f"""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate ASC, o_orderkey ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_total
FROM orders
""".strip(),
    tags=("window",),
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer in order-date order (exact decimal
    accumulation → order-insensitive cross-engine)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


@register(
    "window_lag",
    oracle=f"""
WITH daily AS (
  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS ship_day,
         {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
  FROM lineitem
  GROUP BY l_suppkey, CAST(l_shipdate AS DATE)
)
SELECT l_suppkey, ship_day, revenue,
       lag(revenue) OVER (PARTITION BY l_suppkey ORDER BY ship_day) AS prev_revenue,
       revenue - lag(revenue) OVER (PARTITION BY l_suppkey ORDER BY ship_day)
         AS day_delta
FROM daily
""".strip(),
    tags=("window",),
)
def window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day revenue delta per supplier (lag over daily rollup;
    ship_day is unique within supplier so ordering is total)."""
    l = table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    daily = (
        l.groupBy("l_suppkey", F.col("l_shipdate").cast("date").alias("ship_day"))
        .agg(dsum(revenue, 4).alias("revenue"))
    )
    w = Window.partitionBy("l_suppkey").orderBy(F.asc("ship_day"))
    return daily.select(
        "l_suppkey",
        "ship_day",
        "revenue",
        F.lag("revenue").over(w).alias("prev_revenue"),
        (F.col("revenue") - F.lag("revenue").over(w)).alias("day_delta"),
    )
