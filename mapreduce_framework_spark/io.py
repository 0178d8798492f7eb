"""Sources and sinks.

The reference's "dataset = blob container, file = block blob" model
(SURVEY.md §1; reference w7/src/master/dbconn.h:107-113) maps to
directory-of-parquet reads here.  Split planning, record-boundary-safe
text splitting, and ranged reads (reference w7/src/worker/worker.h:42-86,
196-232) are all Spark built-ins — FileSourceScan packs splits by
``spark.sql.files.maxPartitionBytes``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at ANY scale factor (bounded-size
# tables: 5 regions / 25 nations, fixed by the schema not by SF).
ALWAYS_BROADCAST = frozenset({"region", "nation"})

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Parquet scan → column pruning + predicate pushdown
    happen automatically once the caller selects/filters."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Reference-fidelity text source: one row per line, line-boundary-safe
    splits (reference fixes word boundaries by hand, worker.h:196-232;
    Spark's text source does this natively)."""
    return spark.read.text(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Default sink. One file per partition mirrors the reference's
    ``out_<reducer_id>`` blob-per-reducer layout (workerimpl.cc:319-333)."""
    df.write.mode(mode).parquet(path)
