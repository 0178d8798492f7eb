"""UDF / UDAF / UDTF surface (SURVEY.md §2a O4/O5/O11) — parity with the
reference's "bring your own Python" extension point.

The reference embeds CPython in each C++ worker and calls
``mapfunc(path) -> dict`` / ``reducefunc(path) -> dict``
(w7/src/worker/workerimpl.cc:155-247).  The Spark equivalents, in
ascending preference for the hot path:

1. ``udf`` — row-at-a-time, pickled; kept ONLY as a parity demo
   (`udf_scalar_python`) and cross-checked against the built-in plan.
2. ``pandas_udf`` — Arrow-batched, vectorized (~10-100× the row UDF).
3. ``applyInPandas`` — grouped map: the generalization of the
   reference's reducer (one Python call per key group).
4. ``mapInPandas`` — partition-at-a-time: the generalization of the
   reference's ``map_shard`` (one Python call per shard,
   workerimpl.cc:85-105).

Each is hash-checked against a pure-SQL oracle, proving the Python
path computes exactly what the declarative plan computes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from mapreduce_framework_spark.functions.numeric import dsum, dsum_sql
from mapreduce_framework_spark.functions.tokenize import (
    make_reference_tokenizer,
    tokenize_sql_duckdb,
)
from mapreduce_framework_spark.io import table
from mapreduce_framework_spark.registry import register

# NOTE: every function shipped to Python workers below is constructed in
# a local scope (closure) so cloudpickle serializes it by value — the
# executors must never need this package on their sys.path.

_WORDCOUNT_ORACLE = f"""
SELECT word, count(*) AS cnt
FROM (
    SELECT unnest({tokenize_sql_duckdb('text')}) AS word
    FROM documents
)
GROUP BY word
""".strip()


@register(
    "udf_scalar_python",
    oracle=_WORDCOUNT_ORACLE,
    tags=("udf",),
)
def udf_scalar_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF tokenizer; must equal the built-in
    `wordcount` plan exactly.  Deliberately the slow path — the parity
    demo of the reference's embedded-CPython contract."""
    tokenize = F.udf(make_reference_tokenizer(), ArrayType(StringType()))
    docs = table(spark, sf_dir, "documents").select("text")
    return (
        docs.select(F.explode(tokenize("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "udf_pandas_scalar",
    oracle=f"""
SELECT l_returnflag,
       {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS total_charge
FROM lineitem
GROUP BY l_returnflag
""".strip(),
    tags=("udf", "pandas"),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized charge computation in an Arrow-batched pandas UDF; the
    surrounding aggregation stays JVM-side (decimal cast applied after
    the UDF so the sum is order-insensitive)."""

    @F.pandas_udf("double")
    def charge(ext: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return ext * (1 - disc) * (1 + tax)

    l = table(spark, sf_dir, "lineitem")
    return (
        l.select(
            "l_returnflag",
            charge("l_extendedprice", "l_discount", "l_tax").alias("charge"),
        )
        .groupBy("l_returnflag")
        .agg(dsum(F.col("charge"), 6).alias("total_charge"))
    )


@register(
    "udf_grouped_map",
    oracle="""
SELECT c_custkey, c_nationkey, c_acctbal,
       CASE WHEN max(c_acctbal) OVER w = min(c_acctbal) OVER w THEN NULL
            ELSE (c_acctbal - min(c_acctbal) OVER w)
                 / (max(c_acctbal) OVER w - min(c_acctbal) OVER w)
       END AS bal_scaled
FROM customer
WINDOW w AS (PARTITION BY c_nationkey)
""".strip(),
    tags=("udf", "pandas"),
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation min-max normalization via applyInPandas — the
    reference reducer generalized (one Python call per key group).
    min/max are order-insensitive, so the Python result hash-matches the
    SQL window oracle exactly."""

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        mn, mx = pdf["c_acctbal"].min(), pdf["c_acctbal"].max()
        denom = mx - mn
        pdf = pdf.copy()
        if denom == 0:
            pdf["bal_scaled"] = None
        else:
            pdf["bal_scaled"] = (pdf["c_acctbal"] - mn) / denom
        return pdf

    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    return c.groupBy("c_nationkey").applyInPandas(
        scale,
        schema="c_custkey long, c_nationkey int, c_acctbal double, bal_scaled double",
    )


@register(
    "udf_map_partitions",
    oracle=_WORDCOUNT_ORACLE,
    tags=("udf", "pandas"),
)
def udf_map_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-at-a-time word counting via mapInPandas: each partition
    emits pre-aggregated (word, partial) pairs — literally the
    reference's map_shard + combiner (workerimpl.cc:85-105, map.py:16-22)
    — then a JVM-side final sum.  The shuffle carries distinct words per
    partition, not raw tokens: the 100 TB-relevant property."""

    py_tokens = make_reference_tokenizer()

    def count_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        for pdf in batches:
            for text in pdf["text"]:
                for w in py_tokens(text):
                    counts[w] = counts.get(w, 0) + 1
        if counts:
            yield pd.DataFrame(
                {"word": list(counts.keys()), "partial": list(counts.values())}
            )

    docs = table(spark, sf_dir, "documents").select("text")
    partials = docs.mapInPandas(count_partition, schema="word string, partial long")
    return partials.groupBy("word").agg(F.sum("partial").alias("cnt"))


@register(
    "udf_grouped_agg",
    oracle="""
SELECT l_returnflag,
       count(*) AS n,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
FROM lineitem
GROUP BY l_returnflag
""".strip(),
    tags=("udf", "pandas"),
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-AGGREGATE pandas UDF (the 4th quadrant of the UDF matrix:
    scalar-python, scalar-pandas, grouped-map, grouped-agg): one Arrow
    batch per group in, one scalar out, usable inside a regular .agg().
    Accumulates integer cents so the result is row-order-invariant —
    a float sum inside the UDF would depend on shuffle arrival order."""

    @F.pandas_udf("bigint")
    def sum_cents(x: pd.Series) -> int:
        return int(x.mul(100).round().sum())

    @F.pandas_udf("bigint")
    def n_rows(x: pd.Series) -> int:
        # Also a pandas UDF: Spark disallows mixing grouped-agg pandas
        # UDFs with JVM aggregates in one .agg() (INVALID_PANDAS_UDF_PLACEMENT).
        return len(x)

    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        n_rows("l_extendedprice").alias("n"),
        sum_cents("l_extendedprice").alias("price_cents"),
    )


@register(
    "udf_table_function",
    oracle="""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
i AS (
  SELECT doc_id, toks,
         unnest(range(0, CAST(ceil(len(toks) / 5.0) AS BIGINT))) AS chunk_idx
  FROM d
)
SELECT doc_id,
       CAST(chunk_idx AS INTEGER) AS chunk_idx,
       array_to_string(toks[chunk_idx * 5 + 1 : chunk_idx * 5 + 5], ' ') AS chunk
FROM i
""".strip(),
    tags=("udf", "udtf"),
)
def udf_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (user-defined TABLE function): each document expands
    to one row per 5-token chunk — the 1→N row shape (chunking for
    embedding/training windows) that scalar UDFs cannot express.  The
    UDTF runs per-row in the Python worker with its yields flattened by
    the engine; the oracle recomputes the chunking declaratively, so
    the hash proves the imperative and declarative forms agree.  Scale:
    a UDTF pipelines inside the stage like mapInPandas — no shuffle,
    parallelism = input partitions."""
    from pyspark.sql.functions import lit, udtf

    class Chunker:
        def eval(self, doc_id, text):
            toks = (text or "").split(" ")
            for i, start in enumerate(range(0, max(len(toks), 1), 5)):
                yield doc_id, i, " ".join(toks[start : start + 5])

    chunker = udtf(Chunker, returnType="doc_id bigint, chunk_idx int, chunk string")
    spark.udtf.register("mfs_chunker", chunker)
    table(spark, sf_dir, "documents").createOrReplaceTempView("mfs_docs_udtf")
    return spark.sql(
        """
        SELECT c.doc_id, c.chunk_idx, c.chunk
        FROM mfs_docs_udtf AS d,
             LATERAL mfs_chunker(d.doc_id, d.text) AS c
        """
    )


@register(
    "udf_arrow_scalar",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       CASE WHEN len(string_split(text, ' ')) >= 64 THEN 'long'
            WHEN len(string_split(text, ' ')) >= 16 THEN 'mid'
            ELSE 'short' END AS length_band
FROM documents
""".strip(),
    tags=("udf", "arrow"),
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (``useArrow=True``): same row-wise
    user code as a classic UDF, but batched over Arrow instead of
    pickled row-by-row — the middle rung of the Python ladder (classic
    UDF ≪ arrow UDF ≤ pandas UDF) and Spark 4's recommended default for
    scalar Python logic.  The banding is recomputed declaratively by
    the oracle, so the hash proves Arrow (de)serialization preserves
    values exactly."""

    def band(text: str) -> str:
        n = len((text or "").split(" "))
        return "long" if n >= 64 else ("mid" if n >= 16 else "short")

    band_udf = F.udf(band, StringType(), useArrow=True)
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        band_udf("text").alias("length_band"),
    )
