"""Separate-process-executor smoke for the artifact lanes (round-10
verdict task #4).

Every persisted artifact in the repo — publish_cached caches (ANN
indexes, graph adjacency, corpus spills) and the kvtext two-phase
commit — assumes a rename-atomic filesystem SHARED between driver and
executors.  ``local[32]`` cannot falsify that: executors are threads in
the driver JVM, so "executor writes, driver renames" degenerates to one
process touching its own files.  ``local-cluster[2,2,1024]`` launches
REAL separate executor JVMs (each with its own Python workers), so the
cross-process protocol actually executes: kvtext tasks stage .tmp files
from executor processes and the driver commits the renames; cache
builds run Spark write jobs on the executors and the driver publishes
the staged directory; probes then scan the published artifact from the
other executor.

Runs in a SUBPROCESS (the suite's shared session owns this process's
one SparkContext).  SCALE.md §Deployment carries the per-artifact
shared-FS requirement and the object-store alternative.
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local-cluster[2,2,1024]")
    .appName("artifact-lanes-smoke")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    # Executor-side Python workers must import the repo (registry
    # queries import mfs modules inside closures).
    .config("spark.executorEnv.PYTHONPATH", "/root/repo")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.001"

# --- kvtext 2PC across processes: executor-staged .tmp, driver-side
# commit rename, manifest-flipped overwrite, both read lanes.
import os, tempfile
from mapreduce_framework_spark.compat import read_kv_text
from mapreduce_framework_spark.sources.kvtext_datasource import register_kvtext

register_kvtext(spark)
sink = os.path.join(tempfile.mkdtemp(prefix="lc_kvtext_"), "sink")
df1 = spark.createDataFrame([("a", 1), ("b", 2)], ["key", "value"])
df1.repartition(2).write.format("kvtext").mode("append").save(sink)
got = sorted(tuple(r) for r in spark.read.format("kvtext").load(sink).collect())
assert got == [("a", 1), ("b", 2)], f"kvtext append roundtrip: {got}"
df2 = spark.createDataFrame([("c", 3)], ["key", "value"])
df2.coalesce(1).write.format("kvtext").mode("overwrite").save(sink)
got = sorted(tuple(r) for r in read_kv_text(spark, sink).collect())
assert got == [("c", 3)], f"kvtext manifest overwrite: {got}"
print("KVTEXT_2PC_OK")

# --- publish_cached lanes: ANN index + graph adjacency artifacts are
# BUILT by executor-process write jobs into the staged dir, published
# by a driver-side rename, then PROBED by executor-process scans.
from mapreduce_framework_spark.registry import get_query

probe = get_query("sim_search_pq_probe").fn(spark, sf)
rows = probe.collect()
assert len(rows) > 0, "pq probe returned nothing under local-cluster"
print("ANN_CACHE_OK", len(rows))

deg = get_query("graph_degree_persisted").fn(spark, sf)
rows = deg.collect()
assert len(rows) > 0, "adjacency probe returned nothing under local-cluster"
print("GRAPH_CACHE_OK", len(rows))

spark.stop()
print("LOCAL_CLUSTER_OK")
"""


def test_artifact_lanes_survive_separate_executor_processes():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    for marker in ("KVTEXT_2PC_OK", "ANN_CACHE_OK", "GRAPH_CACHE_OK",
                   "LOCAL_CLUSTER_OK"):
        assert marker in proc.stdout, proc.stdout[-2000:]
