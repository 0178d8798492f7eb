"""Task-failure recovery smoke test (reference parity: fail-injection +
requeue, SURVEY.md §2a O15/O20 — the reference's workers go dark after N
tasks and the master requeues; Spark's equivalent is task retry via
spark.task.maxFailures).

Runs in a SUBPROCESS because retries need a master of the form
``local[N, maxFailures]`` and the suite's shared session is ``local[N]``
(maxFailures=1, first failure fatal).  The injected fault: every task of
the map stage raises on its FIRST attempt (attemptNumber 0) — the job
can only succeed by retrying every partition, and the result must equal
the fault-free run exactly.
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[4, 3]")  # 3 attempts per task
    .appName("fault-smoke")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select("text")


def flaky_stage(batches):
    # Dies on every task's first attempt — forces a retry of every
    # partition (the reference's fail_after worker, workerimpl.cc:132-140).
    from pyspark import TaskContext

    ctx = TaskContext.get()
    if ctx.attemptNumber() == 0:
        raise RuntimeError(f"injected failure, partition {ctx.partitionId()}")
    import pandas as pd

    counts = {}
    for pdf in batches:
        for text in pdf["text"]:
            for w in text.split(" "):
                if w:
                    counts[w] = counts.get(w, 0) + 1
    yield pd.DataFrame({"word": list(counts.keys()), "partial": list(counts.values())})


flaky = (
    docs.mapInPandas(flaky_stage, schema="word string, partial long")
    .groupBy("word")
    .agg(F.sum("partial").alias("cnt"))
)
clean = (
    docs.select(F.explode(F.split("text", " ")).alias("word"))
    .where(F.col("word") != "")
    .groupBy("word")
    .agg(F.count(F.lit(1)).alias("cnt"))
)
a = sorted(map(tuple, flaky.collect()))
b = sorted(map(tuple, clean.collect()))
assert a == b and len(a) > 0, f"mismatch after retries: {len(a)} vs {len(b)}"
print("RECOVERED_OK", len(a))
"""


def test_query_survives_injected_task_failures():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "RECOVERED_OK" in proc.stdout
