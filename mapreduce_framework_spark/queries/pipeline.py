"""Dataset-assembly operations for training pipelines.

Deduplication, quality scoring, and similarity live in their own
modules; these are the LAST-mile ops that turn a cleaned corpus into
training input: reproducible splits and token-budget shard packing.
Both are pure single-pass declarative plans — no sampling state, no
driver-side loops — so they run unchanged at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_framework_spark.io import table
from mapreduce_framework_spark.registry import register


@register(
    "split_train_eval",
    oracle="""
SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
            THEN 'train' ELSE 'eval' END AS split,
       lang,
       count(*) AS n_docs,
       CAST(SUM(CAST(n_chars AS DECIMAL(18,0))) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1, 2
""".strip(),
    tags=("pipeline", "split"),
)
def split_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 12/16–4/16 train/eval split by the first hex digit
    of md5(doc_id).  Hash-based splitting is the only reproducible way
    to split at scale: no shuffle, no sampling state, stable under
    re-runs and under adding/removing OTHER documents (each doc's
    assignment depends on its id alone).  Engine-portable because the
    hex string compare avoids any engine-specific hash function."""
    d = table(spark, sf_dir, "documents")
    hexdigit = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1)
    return (
        d.withColumn(
            "split", F.when(hexdigit < "c", "train").otherwise("eval")
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_chars").cast("decimal(18,0)"))
            .cast("bigint")
            .alias("total_chars"),
        )
    )


@register(
    "pack_sequences",
    oracle="""
WITH toks AS (
  SELECT doc_id, source,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
packed AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens
           AS start_offset
  FROM toks
)
SELECT source,
       CAST(floor(start_offset / 2048.0) AS BIGINT) AS shard_id,
       count(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
FROM packed
GROUP BY source, CAST(floor(start_offset / 2048.0) AS BIGINT)
""".strip(),
    tags=("pipeline", "pack"),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing: within each source, documents are
    laid out in doc_id order and cut into ~2048-token shards by their
    running token offset — the sequence-packing layout step of a
    training pipeline, as one window pass.  Partitioning the window by
    ``source`` is what makes this scale: each partition's running sum
    is independent, so there is no global single-partition sort —
    at 100 TB the shard layout parallelizes across sources (cf. the
    same per-key independence the reference gets from hash-partitioned
    reducers, workerimpl.cc:254)."""
    d = table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = d.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
    )
    packed = toks.withColumn(
        "start_offset", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return (
        packed.groupBy(
            "source",
            F.floor(F.col("start_offset") / F.lit(2048.0)).alias("shard_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("shard_tokens"),
        )
    )


@register(
    "sample_stratified",
    oracle="""
WITH d AS (
  SELECT source, n_chars,
         substring(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 1)
           < CASE WHEN CAST(substring(source, 4) AS INTEGER) < 10
                  THEN '4' ELSE 'c' END AS keep
  FROM documents
)
SELECT source,
       count(*) AS n_total,
       count(*) FILTER (WHERE keep) AS n_sampled,
       CAST(SUM(CAST(n_chars AS DECIMAL(18,0))) FILTER (WHERE keep) AS BIGINT)
         AS sampled_chars
FROM d
GROUP BY source
""".strip(),
    tags=("pipeline", "sample"),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified corpus sampling with per-stratum rates (head sources
    src0–src9 kept at 4/16, the rest at 12/16) decided by a salted
    md5-hexdigit of the doc id — the downsample-the-overrepresented-
    source step of corpus curation.  Hash-based, like split_train_eval:
    no sampling state, no RNG, reproducible per row at any scale and
    under any partitioning.  The salt ('sample:') decorrelates the
    sampling decision from the train/eval split hash, so sampling does
    not bias the split.  One scan, conditional aggregates — the keep
    decision never materializes a second copy of the corpus."""
    d = table(spark, sf_dir, "documents")
    threshold = F.when(
        F.substring("source", 4, 10).cast("int") < 10, F.lit("4")
    ).otherwise(F.lit("c"))
    keep = (
        F.substring(
            F.md5(F.concat(F.lit("sample:"), F.col("doc_id").cast("string")).cast("binary")),
            1,
            1,
        )
        < threshold
    )
    return (
        d.select("source", "n_chars", keep.alias("keep"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(F.col("keep"), 1)).alias("n_sampled"),
            F.sum(
                F.when(F.col("keep"), F.col("n_chars").cast("decimal(18,0)"))
            )
            .cast("bigint")
            .alias("sampled_chars"),
        )
    )
