"""Projections, compound predicates, null semantics (SURVEY.md §2b).

Generalizes the reference mapper's scalar pipeline (w7/src/python/
map.py:9-18 — the only per-row transform the reference has) into the
full boolean/conditional expression surface.  Everything stays inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_spark.io import table
from mapreduce_framework_spark.registry import register


@register(
    "proj_expressions",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  l_extendedprice * (1 - l_discount) AS revenue,
  (l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS charge,
  CASE WHEN l_quantity < 10 THEN 'small'
       WHEN l_quantity < 30 THEN 'medium'
       ELSE 'large' END AS qty_class,
  l_discount > 0.05 AS high_disc
FROM lineitem
""".strip(),
    tags=("projection",),
)
def proj_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic + CASE WHEN + boolean columns; per-row double math is
    IEEE-deterministic so values hash-match the oracle exactly."""
    l = table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return l.select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        (revenue * (F.lit(1) + F.col("l_tax"))).alias("charge"),
        F.when(F.col("l_quantity") < 10, "small")
        .when(F.col("l_quantity") < 30, "medium")
        .otherwise("large")
        .alias("qty_class"),
        (F.col("l_discount") > 0.05).alias("high_disc"),
    )


@register(
    "filter_compound",
    oracle="""
SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
FROM part
WHERE p_size BETWEEN 10 AND 40
  AND (p_type IN ('PROMO', 'ECONOMY') OR p_name LIKE '%widget%')
  AND p_brand NOT IN ('Brand#9', 'Brand#13')
  AND NOT (p_retailprice < 500)
""".strip(),
    tags=("filter",),
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT/IN/BETWEEN/LIKE battery on `part`."""
    p = table(spark, sf_dir, "part")
    return p.where(
        F.col("p_size").between(10, 40)
        & (F.col("p_type").isin("PROMO", "ECONOMY") | F.col("p_name").like("%widget%"))
        & ~F.col("p_brand").isin("Brand#9", "Brand#13")
        & ~(F.col("p_retailprice") < 500)
    ).select("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")


@register(
    "filter_null_semantics",
    oracle="""
SELECT
  c_custkey,
  NULLIF(c_mktsegment, 'AUTOMOBILE') AS seg,
  NULLIF(c_mktsegment, 'AUTOMOBILE') IS NULL AS seg_missing,
  NULLIF(c_mktsegment, 'AUTOMOBILE') IS NOT DISTINCT FROM 'BUILDING' AS is_building,
  coalesce(NULLIF(c_mktsegment, 'AUTOMOBILE'), 'UNKNOWN') AS seg_filled
FROM customer
WHERE NULLIF(c_mktsegment, 'AUTOMOBILE') IS NULL
   OR NULLIF(c_mktsegment, 'AUTOMOBILE') = 'BUILDING'
""".strip(),
    tags=("filter", "null"),
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] NULL, null-safe equality (<=> ≙ IS NOT DISTINCT FROM),
    coalesce — the typed-null model the reference never had (its only
    types were string keys / int counts, workerimpl.cc:211-220)."""
    c = table(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("AUTOMOBILE"))
    return c.select(
        "c_custkey",
        seg.alias("seg"),
        seg.isNull().alias("seg_missing"),
        seg.eqNullSafe("BUILDING").alias("is_building"),
        F.coalesce(seg, F.lit("UNKNOWN")).alias("seg_filled"),
    ).where(seg.isNull() | (seg == "BUILDING"))
