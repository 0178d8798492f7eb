"""Set operations (SURVEY.md §2b) — the closure/chaining invariant of the
reference ("output … same format as input … enables chaining",
w6/docs/design.md:74): every operator is DataFrame → DataFrame, so set
algebra over intermediate results is free.

Scale notes: UNION is a metadata-only concat (no shuffle); DISTINCT /
INTERSECT / EXCEPT shuffle on the full row — keep projections narrow
before them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_spark.io import table
from mapreduce_framework_spark.registry import register


def _segments(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Two overlapping customer segments: big spenders vs urgent-order
    placers."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    big = (
        o.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("t"))
        .where(F.col("t") > 150000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    urgent = (
        c.join(
            o.where(F.col("o_orderpriority") == "1-URGENT"),
            c.c_custkey == o.o_custkey,
            "left_semi",
        ).select("c_custkey")
    )
    return big, urgent


_SEG_SQL = """
big AS (
  SELECT o_custkey AS c_custkey FROM orders
  GROUP BY o_custkey
  HAVING SUM(CAST(o_totalprice AS DECIMAL(18,2))) > 150000
),
urgent AS (
  SELECT c_custkey FROM customer
  WHERE EXISTS (SELECT 1 FROM orders
                WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
)
""".strip()


@register(
    "set_union_dedup",
    oracle=f"WITH {_SEG_SQL}\nSELECT c_custkey FROM big UNION SELECT c_custkey FROM urgent",
    tags=("setop",),
)
def set_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT: zero-shuffle concat, then one hash dedup."""
    big, urgent = _segments(spark, sf_dir)
    return big.unionByName(urgent).distinct()


@register(
    "set_intersect",
    oracle=f"WITH {_SEG_SQL}\nSELECT c_custkey FROM big INTERSECT SELECT c_custkey FROM urgent",
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    big, urgent = _segments(spark, sf_dir)
    return big.intersect(urgent)


@register(
    "set_except",
    oracle=f"WITH {_SEG_SQL}\nSELECT c_custkey FROM big EXCEPT SELECT c_custkey FROM urgent",
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    big, urgent = _segments(spark, sf_dir)
    return big.exceptAll(urgent).distinct()


@register(
    "set_multiset_ops",
    # Multiset (bag) semantics: EXCEPT ALL subtracts multiplicities,
    # INTERSECT ALL takes their min — duplicates are data here, which
    # the distinct-based set ops above deliberately erase.
    oracle="""
WITH o1 AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
o2 AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
SELECT 'except_all' AS op, o_custkey FROM (
  SELECT o_custkey FROM o1 EXCEPT ALL SELECT o_custkey FROM o2
)
UNION ALL
SELECT 'intersect_all' AS op, o_custkey FROM (
  SELECT o_custkey FROM o1 INTERSECT ALL SELECT o_custkey FROM o2
)
""".strip(),
    tags=("setop",),
)
def set_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set ops over per-status order streams: a customer
    with 3 open and 1 final order contributes 2 rows to EXCEPT ALL
    (3−1) and 1 to INTERSECT ALL (min(3,1)) — the multiplicity
    arithmetic `distinct`-based set ops destroy.  Spark plans both as
    one hash aggregate counting per-side multiplicities then a
    generator re-expanding the difference/min — same single-shuffle
    cost as the distinct variants, the multiplicity column rides along
    free."""
    o = table(spark, sf_dir, "orders")
    o1 = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    o2 = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    ex = o1.exceptAll(o2).select(F.lit("except_all").alias("op"), "o_custkey")
    it = o1.intersectAll(o2).select(
        F.lit("intersect_all").alias("op"), "o_custkey"
    )
    return ex.unionByName(it)
