"""Flagship query: word count, reference semantics end-to-end.

This is the reference's entire pipeline in one declarative plan
(SURVEY.md §2a O4-O12): scan → tokenize (map.py:9-18) → explode →
partial HashAggregate (the sample mapper's dict accumulation,
map.py:16-22, i.e. a map-side combiner) → hash shuffle on word
(workerimpl.cc:254 ``std::hash(key) % R``) → final HashAggregate
(reduce.py:12-15) → 2-column result (the ``key:value`` output lines,
workerimpl.cc:256-261).

Catalyst gives the partial/final split automatically; at 100 TB the
map-side combine is what keeps the shuffle proportional to *distinct*
words per partition rather than total tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_spark.functions.tokenize import tokens, tokenize_sql_duckdb
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


@register("wordcount", oracle=_ORACLE, tags=("agg", "flagship"), bench=True)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word → occurrence count over ``documents.text``."""
    docs = table(spark, sf_dir, "documents").select("text")
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
