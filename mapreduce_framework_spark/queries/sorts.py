"""Sorts, limits, top-k (SURVEY.md §2a O10).

The reference sorts reduce input lexicographically inside the reducer
(w7/src/python/reduce.py:6).  Spark only sorts when the plan requires it;
a global ORDER BY is a range-partitioned sort (sampled range boundaries →
no single-node bottleneck), and ORDER BY + LIMIT collapses to
TakeOrderedAndProject — per-partition top-k then a k-sized merge on the
driver, which is the only sane top-k at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_spark.functions.numeric import dsum, dsum_sql
from mapreduce_framework_spark.io import table
from mapreduce_framework_spark.registry import register


@register(
    "sort_multi_key",
    oracle=f"""
SELECT l_returnflag, l_linestatus, {dsum_sql('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag ASC, sum_qty DESC NULLS LAST
""".strip(),
    tags=("sort",),
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-direction multi-key global sort with explicit null ordering.
    (The driver compares order-insensitively; ordering correctness is
    asserted in tests/test_plans.py.)"""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
        .orderBy(F.asc("l_returnflag"), F.desc_nulls_last("sum_qty"))
    )


@register(
    "topk_limit",
    oracle=f"""
SELECT l_partkey, {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM lineitem
GROUP BY l_partkey
ORDER BY revenue DESC, l_partkey ASC
LIMIT 10
""".strip(),
    tags=("sort", "limit"),
    bench=True,
)
def topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 revenue parts.  Tie-broken by key so the row *set* is
    deterministic; physical plan is TakeOrderedAndProject (no global
    sort materialization)."""
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(dsum(revenue, 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_partkey"))
        .limit(10)
    )
