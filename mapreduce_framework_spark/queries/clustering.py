"""Embedding clustering (training-data curation: semantic bucketing,
IVF index construction, diversity sampling all start from k-means)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_spark.io import table
from mapreduce_framework_spark.operators.kmeans import kmeans_rounds, quantize
from mapreduce_framework_spark.registry import register

_KMEANS_ORACLE = """
WITH e AS (
  SELECT vec_id,
         unnest(list_transform(CAST(embedding AS DOUBLE[]),
                               x -> CAST(round(x * 10000) AS BIGINT))) AS val,
         unnest(range(len(embedding))) AS pos
  FROM embeddings
),
c0 AS (SELECT CAST(vec_id AS INTEGER) AS cid, pos, val FROM e WHERE vec_id < 8),
d1 AS (
  SELECT e.vec_id, c.cid, SUM((e.val - c.val) * (e.val - c.val)) AS dist
  FROM e JOIN c0 c USING (pos)
  GROUP BY e.vec_id, c.cid
),
a1 AS (
  SELECT vec_id, cid FROM d1
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1
),
c1 AS (
  SELECT a1.cid, e.pos, SUM(e.val) // count(*) AS val
  FROM a1 JOIN e ON a1.vec_id = e.vec_id
  GROUP BY a1.cid, e.pos
),
d2 AS (
  SELECT e.vec_id, c.cid, SUM((e.val - c.val) * (e.val - c.val)) AS dist
  FROM e JOIN c1 c USING (pos)
  GROUP BY e.vec_id, c.cid
),
a2 AS (
  SELECT vec_id, cid, dist FROM d2
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1
)
SELECT cid AS cluster_id,
       count(*) AS n_members,
       min(vec_id) AS rep_vec_id,
       CAST(SUM(dist) AS BIGINT) AS total_dist
FROM a2
GROUP BY cid
""".strip()


@register(
    "embedding_kmeans",
    oracle=_KMEANS_ORACLE,
    tags=("clustering", "pipeline", "iterative"),
    bench=True,
)
def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two unrolled Lloyd's k-means iterations (k=8, seeds = the first
    8 vectors) over integer-quantized embeddings; returns per-cluster
    size, representative (lowest member id), and total squared-L2
    inertia.  Deterministic end to end — quantized int64 distances,
    struct-min argmin with cid tie-break, truncating integer centroid
    means — so even the ITERATION is hash-checked against an unrolled
    SQL oracle (same trick as graph_pagerank).  See
    operators/kmeans.py for the per-step plan/scale analysis; the
    oracle works in exploded (vec, dim) form, the Spark plan in array
    form with broadcast centroids."""
    vectors = table(spark, sf_dir, "embeddings").select(
        "vec_id", quantize(F.col("embedding")).alias("v")
    )
    seeds = vectors.where(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("v").alias("c")
    )
    final = kmeans_rounds(vectors, seeds, rounds=2)
    return final.groupBy(F.col("cid").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("vec_id").alias("rep_vec_id"),
        F.sum("dist").alias("total_dist"),
    )
