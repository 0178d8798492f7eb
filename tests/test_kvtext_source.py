"""The `key:value` Python DataSource (sources/kvtext_datasource.py):
partition planning, filter pushdown, and lane parity with the JVM
reader.  The registry key source_kvtext_datasource gets its oracle
parity from test_registry_parity like every other key; these tests pin
the DataSource-specific behavior the hash cannot see."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from mapreduce_framework_spark.compat import read_kv_text, write_kv_text
from mapreduce_framework_spark.sources.kvtext_datasource import (
    KvTextReader,
    register_kvtext,
)


@pytest.fixture(scope="module")
def kv_dir(spark):
    df = spark.createDataFrame(
        [("alpha", 3), ("beta", 5), ("with:colon", 7), ("alpha", 11), ("", 13)],
        ["key", "value"],
    )
    path = os.path.join(tempfile.mkdtemp(prefix="kvtext_t_"), "sink")
    # Round-robin repartition: every shard non-empty, so file count is
    # deterministic (hash-on-key can leave a shard empty on 4 keys).
    write_kv_text(df.repartition(3), path)
    return path


def test_roundtrip_matches_jvm_lane(spark, kv_dir):
    """The Python source and compat.read_kv_text must parse the same
    sink to the same multiset — including keys containing ':' (both
    split on the LAST colon) and the empty-string key."""
    register_kvtext(spark)
    via_ds = sorted(
        tuple(r) for r in spark.read.format("kvtext").load(kv_dir).collect()
    )
    via_jvm = sorted(tuple(r) for r in read_kv_text(spark, kv_dir).collect())
    assert via_ds == via_jvm
    assert ("with:colon", 7) in via_ds and ("", 13) in via_ds


def test_one_partition_per_shard_file(spark, kv_dir):
    """The unit of parallelism is the reducer-shard file: a 3-shard
    sink must scan as exactly 3 input partitions."""
    register_kvtext(spark)
    n_files = len(
        [f for f in os.listdir(kv_dir) if not f.startswith((".", "_"))]
    )
    df = spark.read.format("kvtext").load(kv_dir)
    assert df.rdd.getNumPartitions() == n_files == 3


def test_equality_pushdown_served_inside_reader(spark, kv_dir):
    """EqualTo(key) must be CONSUMED by the reader (no Spark-side
    Filter node survives above the scan) and still return exactly the
    matching rows."""
    register_kvtext(spark)
    flt = (
        spark.read.format("kvtext").load(kv_dir).where(F.col("key") == "alpha")
    )
    rows = sorted(tuple(r) for r in flt.collect())
    assert rows == [("alpha", 3), ("alpha", 11)]
    plan = flt._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan kvtext" in plan
    # A surviving Spark-side filter prints as a `Filter (condition)`
    # node; `RuntimeFilters: []` on the scan line is not one.
    assert "Filter (" not in plan, (
        "pushed equality must not be re-evaluated Spark-side"
    )


def test_non_key_filters_stay_sparkside(spark, kv_dir):
    """pushFilters' contract: only key-equality (and IsNotNull(key))
    are accepted; a value predicate must come back to Spark — returned
    by reference, evaluated post-scan, correct results."""
    from pyspark.sql.datasource import EqualTo

    reader = KvTextReader({"path": kv_dir})
    eq = EqualTo(("key",), "alpha")
    other = EqualTo(("value",), 3)
    remaining = list(reader.pushFilters([eq, other]))
    assert remaining == [other], "value filter must be returned to Spark"
    register_kvtext(spark)
    df = (
        spark.read.format("kvtext")
        .load(kv_dir)
        .where((F.col("key") == "alpha") & (F.col("value") > 4))
    )
    assert [tuple(r) for r in df.collect()] == [("alpha", 11)]


def test_contradictory_key_equalities_yield_empty(spark, kv_dir):
    """key='a' AND key='b' is unsatisfiable: the reader accepts both
    AND-terms and yields nothing — the semantics of the pushed AND."""
    register_kvtext(spark)
    df = (
        spark.read.format("kvtext")
        .load(kv_dir)
        .where((F.col("key") == "alpha") & (F.col("key") == "beta"))
    )
    assert df.collect() == []
