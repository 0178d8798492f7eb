"""mapreduce_framework_spark — a PySpark-native analytics engine.

A ground-up re-expression of the capabilities of the reference MapReduce
framework (kpavan05/mapreduce_framework, studied read-only at
/root/reference) as an idiomatic Spark DataFrame/SQL/Structured-Streaming
engine.  The reference's master/worker C++ engine (gRPC + ZooKeeper +
Azure Blob + embedded CPython) collapses into Spark's driver/executor
model; its operator semantics (scan → shard → map → combine → hash
shuffle → sort → reduce → sink; see SURVEY.md §2) are re-expressed as
declarative DataFrame plans optimized by Catalyst.

Design rules (100 TB posture):
- DataFrame/SQL first; Catalyst picks physical strategy.
- Built-in JVM functions in hot paths; Arrow-batched pandas UDFs only
  where built-ins cannot express the semantics; row-Python UDFs only as
  explicitly-labelled parity demos of the reference's UDF surface.
- Broadcast small dimensions, partial aggregation before every shuffle,
  AQE on for runtime coalescing / skew handling.
"""

from mapreduce_framework_spark.session import get_spark, stop_spark
from mapreduce_framework_spark.registry import (
    QuerySpec,
    register,
    all_queries,
    get_query,
    query_fns,
    oracle_sqls,
)

__all__ = [
    "get_spark",
    "stop_spark",
    "QuerySpec",
    "register",
    "all_queries",
    "get_query",
    "query_fns",
    "oracle_sqls",
]

__version__ = "0.1.0"
