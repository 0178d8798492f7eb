"""Multimodal plumbing query: binary payload → mapInPandas decode →
typed metadata.  The payloads are synthesized from documents.text
(UTF-8 bytes) since the corpus ships no real images; the decode stage is
the deterministic fake documented in multimodal/decode.py, so the whole
path — binary column, Arrow batches, schema — is oracle-checkable."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_spark.io import table
from mapreduce_framework_spark.multimodal.decode import decode_images
from mapreduce_framework_spark.registry import register


@register(
    "multimodal_decode",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       CAST(octet_length(encode(text)) % 256 AS INTEGER) AS width,
       CAST(octet_length(encode(text)) // 256 + 1 AS INTEGER) AS height,
       'fake/raw' AS format
FROM documents
""".strip(),
    tags=("multimodal",),
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary payload column → Arrow-batched decode → typed metadata."""
    payloads = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return decode_images(payloads)
