"""Iterative graph dataflow: PageRank over the customer–supplier graph.

The reference's design doc mandates closure under chaining
(w6/docs/design.md:74) — iterative algorithms are "chain the same
MapReduce N times".  dedup_clusters (operators/components.py) shows
label propagation; this module shows the other canonical iterative
shape, a WEIGHTED numeric fixed-point, as N unrolled join+aggregate
rounds.

Determinism across engines and partitionings comes from integer
arithmetic: ranks live in integer "rank units" (1e6 per node), each
round is ``new = 150000 + floor(0.85 * Σ floor(rank/degree))`` — no
floating-point accumulation anywhere, so the result is bit-identical
regardless of aggregation order.  (All intermediates stay < 2^53, so
even the double divisions are exact-floor; see the docstring.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_spark.io import table
from mapreduce_framework_spark.registry import register

_N_ITER = 3

# Unrolled oracle: r0 → c1/r1 → c2/r2 → c3/r3.
_PR_STEPS = "".join(
    f""",
c{i} AS (
  SELECT e.dst AS node,
         SUM(CAST(floor(r.rank / d.deg) AS BIGINT)) AS s
  FROM edges e
  JOIN r{i - 1} r ON e.src = r.node
  JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
r{i} AS (
  SELECT node, CAST(150000 + floor(85 * s / 100) AS BIGINT) AS rank FROM c{i}
)"""
    for i in range(1, _N_ITER + 1)
)

_PR_ORACLE = f"""
WITH edges0 AS (
  SELECT DISTINCT 2 * o_custkey AS src, 2 * l_suppkey + 1 AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (
  SELECT src, dst FROM edges0
  UNION ALL
  SELECT dst AS src, src AS dst FROM edges0
),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS rank FROM deg){_PR_STEPS}
SELECT node, rank FROM r{_N_ITER}
""".strip()


@register("graph_pagerank", oracle=_PR_ORACLE, tags=("graph", "iterative"), bench=True)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank ({_N_ITER} rounds, damping 0.85) over the undirected
    customer–supplier transaction graph (distinct pairs from
    orders⋈lineitem; node ids disambiguated as 2k / 2k+1).

    Integer-unit ranks make the fixed point engine- and
    partitioning-independent: per-edge contribution is
    ``floor(rank/degree)`` (exact: both operands < 2^53, and floor of
    an IEEE quotient equals the true floor whenever the quotient isn't
    exactly representable-adjacent, which int64/int64 < 2^53 guarantees),
    and the damped update is pure int math.  Each round is one
    shuffle-join on ``src`` plus one aggregation on ``dst`` — the edges
    DataFrame (with degrees attached) is computed once and reused, so a
    1000-executor run shuffles the edge list once per round, exactly
    like the reference would chain N MapReduce jobs (design.md:74).
    At 100 TB you'd checkpoint ranks every few rounds to cut lineage
    depth (operators/components.py applies the same truncation)."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges0 = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (2 * F.col("o_custkey")).alias("src"),
            (2 * F.col("l_suppkey") + 1).alias("dst"),
        )
        .distinct()
    )
    edges = edges0.unionByName(
        edges0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # Attach degree once; every round references this same (src, dst,
    # deg) subtree.  Deliberately NO persist/localCheckpoint here: a
    # fixed-round unrolled loop is ONE job, and ReuseExchange computes
    # the identical edge subtree once within it — adding eager
    # checkpoints only inserts job barriers (measured 3.7s lazy vs 4.5s
    # checkpointed at sf0.1).  Materialization hygiene pays off only
    # when each round runs its own ACTION (convergence checks —
    # operators/components.py), which is exactly where this repo does
    # persist+localCheckpoint.
    edges_deg = edges.join(deg, "src")
    ranks = deg.select(F.col("src").alias("node"), F.lit(1_000_000).cast("bigint").alias("rank"))
    for _ in range(_N_ITER):
        contrib = (
            edges_deg.join(ranks, edges_deg.src == ranks.node)
            .select(
                "dst",
                F.floor(F.col("rank") / F.col("deg")).cast("bigint").alias("c"),
            )
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .select(
                F.col("dst").alias("node"),
                (F.lit(150000) + F.floor(F.lit(85) * F.col("s") / F.lit(100)))
                .cast("bigint")
                .alias("rank"),
            )
        )
    return ranks
