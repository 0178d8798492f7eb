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


@register(
    "embedding_seed_farthest",
    # Greedy k-center (farthest-point) seeding, k=4, fully deterministic:
    # integer-lattice distances (same ×10000 quantization as kmeans),
    # argmax ties to the lowest vec_id.  The oracle unrolls the same 3
    # expansions over the exploded (pos, val) representation.
    oracle="""
WITH e AS (
  SELECT vec_id,
         unnest(list_transform(CAST(embedding AS DOUBLE[]),
                               x -> CAST(round(x * 10000) AS BIGINT))) AS val,
         unnest(range(len(embedding))) AS pos
  FROM embeddings
),
s0 AS (SELECT pos, val FROM e WHERE vec_id = 0),
d0 AS (
  SELECT e.vec_id, SUM((e.val - s.val) * (e.val - s.val)) AS dist
  FROM e JOIN s0 s USING (pos) GROUP BY e.vec_id
),
p1 AS (SELECT vec_id, dist FROM d0
       QUALIFY row_number() OVER (ORDER BY dist DESC, vec_id ASC) = 1),
s1 AS (SELECT pos, val FROM e WHERE vec_id = (SELECT vec_id FROM p1)),
d1 AS (
  SELECT e.vec_id,
         least(min(d0.dist), SUM((e.val - s.val) * (e.val - s.val))) AS dist
  FROM e JOIN s1 s USING (pos) JOIN d0 ON d0.vec_id = e.vec_id
  GROUP BY e.vec_id
),
p2 AS (SELECT vec_id, dist FROM d1
       QUALIFY row_number() OVER (ORDER BY dist DESC, vec_id ASC) = 1),
s2 AS (SELECT pos, val FROM e WHERE vec_id = (SELECT vec_id FROM p2)),
d2 AS (
  SELECT e.vec_id,
         least(min(d1.dist), SUM((e.val - s.val) * (e.val - s.val))) AS dist
  FROM e JOIN s2 s USING (pos) JOIN d1 ON d1.vec_id = e.vec_id
  GROUP BY e.vec_id
),
p3 AS (SELECT vec_id, dist FROM d2
       QUALIFY row_number() OVER (ORDER BY dist DESC, vec_id ASC) = 1)
SELECT 0 AS seed_rank, CAST(0 AS BIGINT) AS vec_id, CAST(0 AS BIGINT) AS sq_dist
UNION ALL SELECT 1, vec_id, CAST(dist AS BIGINT) FROM p1
UNION ALL SELECT 2, vec_id, CAST(dist AS BIGINT) FROM p2
UNION ALL SELECT 3, vec_id, CAST(dist AS BIGINT) FROM p3
""".strip(),
    tags=("clustering",),
)
def embedding_seed_farthest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center (farthest-point) seeding — the deterministic
    k-means++ alternative used to initialize distributed clustering and
    to pick maximally-diverse exemplar documents: seed 0 is vector 0,
    each next seed is the vector maximizing its distance to the chosen
    set (min-distance column updated with a running `least`, ties to
    the lowest id).

    Scale: each expansion is one broadcast of the single new seed
    vector + one codegen min-update + one TakeOrdered(1) — the corpus
    is never re-shuffled; k seeds cost k scans (or one cached scan).
    The argmax frame stays IN-PLAN (limit-1 frame joined back for the
    seed's vector, no driver collect), so the unrolled k=4 plan is one
    lazy job.  Distances live on the ×10000 integer lattice (exactly
    kmeans' convention) — sums of integer squares are order-independent
    and engine-exact."""
    from mapreduce_framework_spark.operators.kmeans import _sq_l2, quantize

    vectors = table(spark, sf_dir, "embeddings").select(
        "vec_id", quantize(F.col("embedding")).alias("qv")
    )
    seed0 = vectors.where(F.col("vec_id") == 0).select(F.col("qv").alias("sv"))
    scored = vectors.crossJoin(F.broadcast(seed0)).select(
        "vec_id", "qv", _sq_l2(F.col("qv"), F.col("sv")).alias("dist")
    )
    out = [
        spark.range(1).select(
            F.lit(0).alias("seed_rank"),
            F.lit(0).cast("bigint").alias("vec_id"),
            F.lit(0).cast("bigint").alias("sq_dist"),
        )
    ]
    for rank in (1, 2, 3):
        best = scored.orderBy(F.desc("dist"), F.asc("vec_id")).limit(1)
        out.append(
            best.select(
                F.lit(rank).alias("seed_rank"),
                "vec_id",
                F.col("dist").alias("sq_dist"),
            )
        )
        seed_vec = (
            vectors.join(best.select("vec_id"), "vec_id")
            .select(F.col("qv").alias("sv"))
        )
        scored = scored.crossJoin(F.broadcast(seed_vec)).select(
            "vec_id",
            "qv",
            F.least(F.col("dist"), _sq_l2(F.col("qv"), F.col("sv"))).alias("dist"),
        )
    res = out[0]
    for frame in out[1:]:
        res = res.unionByName(frame)
    return res
