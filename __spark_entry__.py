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
from mapreduce_framework_spark.session import apply_runtime_confs  # noqa: E402


def _pinned(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    """The driver hands us ITS SparkSession; pin the semantics-critical
    runtime confs (UTC session timezone, Arrow lanes, AQE) before every
    query so results don't depend on the harness session's defaults."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(apply_runtime_confs(spark), sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (wordcount) on /root/testdata/sf0.001."""
    return _pinned(get_query("wordcount").fn)(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _pinned(fn) for name, fn in query_fns().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per hash-checked query."""
    return oracle_sqls()
