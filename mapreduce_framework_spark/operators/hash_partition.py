"""O7-parity helper: observable hash partitioning.

The reference routes each (key, value) to intermediate file
``int_<addr>_<sid>_<spid>_<r>`` with ``r = std::hash(key) % R``
(w7/src/worker/workerimpl.cc:249-263, hash at :254).  Spark does the
same inside every Exchange; this helper makes the routing *observable*
as a column (for tests and for explicit co-partitioning) using the same
Murmur3 hash the exchange uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def partition_id(key: Column, num_partitions: int) -> Column:
    """The shuffle partition a key routes to: pmod(hash(key), R) —
    exactly Spark's HashPartitioning (Murmur3, seed 42)."""
    return F.pmod(F.hash(key), F.lit(num_partitions))


def hash_partition(df: DataFrame, key: str, num_partitions: int) -> DataFrame:
    """Repartition by key with the routing exposed as ``_pid`` — the
    engine-level reproduction of the reference's R intermediate files
    (partition i ≙ file ``int_*_i``)."""
    return df.withColumn("_pid", partition_id(F.col(key), num_partitions)).repartition(
        num_partitions, F.col(key)
    )
