"""End-to-end reference-contract job as a hash-checked query.

Runs the full compat path (text source → user mapfunc via mapInPandas →
hash shuffle on key → user reducefunc → key:value text sink → re-read)
with OUR implementations of the reference's sample word-count
map/reduce contract, and checks it against the same DuckDB oracle as
the declarative flagship ``wordcount``.  Proves a reference user's
job runs unchanged AND produces identical answers to the fast path.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_spark import compat
from mapreduce_framework_spark.functions.tokenize import tokenize_sql_duckdb
from mapreduce_framework_spark.io import table
from mapreduce_framework_spark.registry import register

_ORACLE = f"""
SELECT word, count(*) AS cnt
FROM (
    SELECT unnest({tokenize_sql_duckdb('text')}) AS word
    FROM documents
)
GROUP BY word
""".strip()


@register("mapreduce_job_wordcount", oracle=_ORACLE, tags=("compat", "udf"), bench=True)
def mapreduce_job_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference job contract end-to-end: documents.text spilled to a
    text corpus (one doc per line — the reference's file-of-lines input
    model), then mapfunc/reducefunc with R=5 (the graded small run's R,
    w6/docs/workshop9.md:17)."""
    corpus = os.path.join(
        tempfile.gettempdir(), f"mfs_mr_corpus_{os.path.basename(sf_dir)}"
    )
    out = os.path.join(
        tempfile.gettempdir(), f"mfs_mr_out_{os.path.basename(sf_dir)}"
    )
    table(spark, sf_dir, "documents").select("text").write.mode("overwrite").text(
        corpus
    )
    result = compat.run_job(
        spark,
        corpus,
        compat.make_wordcount_mapfunc(),
        compat.make_wordcount_reducefunc(),
        num_reducers=5,
        output_path=out,
    )
    return result.select(
        F.col("key").alias("word"), F.col("value").alias("cnt")
    )
