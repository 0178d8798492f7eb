"""Driver contract for the spark-graft builder (PySpark target).

Thin view over :mod:`mapreduce_framework_spark.registry` — every
implemented operator from SURVEY.md §2 registers itself there with a
Spark implementation and (where SQL-expressible) a DuckDB oracle.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from mapreduce_framework_spark.registry import (  # noqa: E402
    get_query,
    oracle_sqls,
    query_fns,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (wordcount) on /root/testdata/sf0.001."""
    return get_query("wordcount").fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return query_fns()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per hash-checked query."""
    return oracle_sqls()
