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


def test_writer_roundtrip_and_commit_protocol(spark):
    """df.write.format('kvtext') must stage .tmp files and publish
    complete uniquely-suffixed part-* shards at commit — readable back identically
    by BOTH lanes, with no staging debris left behind."""
    df = spark.createDataFrame(
        [("x", 1), ("y:z", 2), ("w", 3)], ["key", "value"]
    )
    register_kvtext(spark)
    path = os.path.join(tempfile.mkdtemp(prefix="kvtext_w_"), "sink")
    df.repartition(2).write.format("kvtext").mode("append").save(path)

    names = sorted(os.listdir(path))
    assert all(n.startswith("part-") for n in names), names
    assert not any(n.endswith(".tmp") for n in names), "staging debris"
    expect = sorted([("x", 1), ("y:z", 2), ("w", 3)])
    assert sorted(tuple(r) for r in read_kv_text(spark, path).collect()) == expect
    assert (
        sorted(tuple(r) for r in spark.read.format("kvtext").load(path).collect())
        == expect
    )


def test_writer_overwrite_replaces_append_accretes(spark):
    """overwrite clears the previous generation at commit time; append
    adds shards beside it."""
    register_kvtext(spark)
    path = os.path.join(tempfile.mkdtemp(prefix="kvtext_m_"), "sink")
    one = spark.createDataFrame([("a", 1)], ["key", "value"])
    two = spark.createDataFrame([("b", 2)], ["key", "value"])
    one.coalesce(1).write.format("kvtext").mode("append").save(path)
    two.coalesce(1).write.format("kvtext").mode("append").save(path)
    got = sorted(tuple(r) for r in spark.read.format("kvtext").load(path).collect())
    assert got == [("a", 1), ("b", 2)]
    two.coalesce(1).write.format("kvtext").mode("overwrite").save(path)
    got = sorted(tuple(r) for r in spark.read.format("kvtext").load(path).collect())
    assert got == [("b", 2)], "overwrite must drop the old generation"


def test_stream_reader_incremental_exactly_once(spark):
    """The growing sink dir as a micro-batch source: run 1 consumes the
    initial shards; a shard landing later is picked up by run 2 from
    the SAME checkpoint with no re-read of consumed shards (set-based
    name offsets) — union equals the full sink exactly once."""
    register_kvtext(spark)
    path = os.path.join(tempfile.mkdtemp(prefix="kvtext_s_"), "sink")
    ckpt = tempfile.mkdtemp(prefix="kvtext_s_ckpt_")
    out = os.path.join(tempfile.mkdtemp(prefix="kvtext_s_out_"), "rows")
    spark.createDataFrame(
        [("a", 1), ("b", 2)], ["key", "value"]
    ).coalesce(1).write.format("kvtext").mode("append").save(path)

    def run():
        # Parquet sink: the append-mode sink class that supports
        # checkpoint recovery (memory-sink append does not).
        q = (
            spark.readStream.format("kvtext")
            .load(path)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(tuple(r) for r in spark.read.parquet(out).collect())

    assert run() == [("a", 1), ("b", 2)]
    spark.createDataFrame([("c", 3)], ["key", "value"]).coalesce(1).write.format(
        "kvtext"
    ).mode("append").save(path)
    assert run() == [("a", 1), ("b", 2), ("c", 3)], (
        "resume must read exactly the new shard, never the prefix again"
    )


def test_writer_rejects_nulls(spark):
    """Nulls have no representation in the line format — the writer
    must refuse loudly, never mint the literal string 'None' that the
    readers would then drop or mis-key."""
    register_kvtext(spark)
    path = os.path.join(tempfile.mkdtemp(prefix="kvtext_n_"), "sink")
    bad = spark.createDataFrame([("k", None)], "key string, value long")
    with pytest.raises(Exception, match="null key/value"):
        bad.coalesce(1).write.format("kvtext").mode("append").save(path)
    good = spark.createDataFrame([("k", 1)], "key string, value long")
    good.coalesce(1).write.format("kvtext").mode("append").save(path)
    assert [tuple(r) for r in read_kv_text(spark, path).collect()] == [("k", 1)]


def test_append_shards_never_clobber(spark):
    """Repeated appends must accrete distinct shard files — naming by
    count-of-existing alone would rename the second append's shard onto
    the first's (silent data loss); unique suffixes make that
    impossible."""
    register_kvtext(spark)
    path = os.path.join(tempfile.mkdtemp(prefix="kvtext_a_"), "sink")
    for i in range(3):
        spark.createDataFrame([(f"k{i}", i)], ["key", "value"]).coalesce(
            1
        ).write.format("kvtext").mode("append").save(path)
    assert len(os.listdir(path)) == 3
    got = sorted(tuple(r) for r in spark.read.format("kvtext").load(path).collect())
    assert got == [("k0", 0), ("k1", 1), ("k2", 2)]


def test_stream_survives_overwrite_between_batches(spark):
    """Round-11 verdict task #3: an OVERWRITE commit between batches is
    an epoch flip — an ordering-safe generation id — so the stream
    delivers the ENTIRE new generation as the next batch instead of
    dying (the pre-round-12 behavior forced a fresh checkpoint; the
    count-based design before THAT silently skipped the new generation
    and replayed wrong files).  The consumed-name set resets at the
    flip, which is what bounds offset JSON by the live generation."""
    import json

    register_kvtext(spark)
    path = os.path.join(tempfile.mkdtemp(prefix="kvtext_g_"), "sink")
    ckpt = tempfile.mkdtemp(prefix="kvtext_g_ckpt_")
    out = os.path.join(tempfile.mkdtemp(prefix="kvtext_g_out_"), "rows")
    spark.createDataFrame([("a", 1)], ["key", "value"]).coalesce(1).write.format(
        "kvtext"
    ).mode("append").save(path)

    def run():
        q = (
            spark.readStream.format("kvtext")
            .load(path)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(tuple(r) for r in spark.read.parquet(out).collect())

    assert run() == [("a", 1)]
    # Overwrite: atomically replaces the dataset under a fresh epoch.
    spark.createDataFrame(
        [("b", 2), ("c", 3)], ["key", "value"]
    ).coalesce(1).write.format("kvtext").mode("overwrite").save(path)
    assert run() == [("a", 1), ("b", 2), ("c", 3)], (
        "epoch flip must deliver the whole new generation, exactly once"
    )
    # Idempotent on a third pass with no source change.
    assert run() == [("a", 1), ("b", 2), ("c", 3)]
    # The committed offset is epoch-scoped: names bounded by the LIVE
    # generation (1 shard), not by everything ever consumed (2 shards).
    off_dir = os.path.join(ckpt, "offsets")
    latest = max(
        (n for n in os.listdir(off_dir) if n.isdigit()), key=int
    )
    off = None
    for line in open(os.path.join(off_dir, latest)).read().splitlines():
        if '"names"' in line:
            doc = json.loads(line)
            off = json.loads(doc) if isinstance(doc, str) else doc
    assert off is not None
    assert off["epoch"] >= 0
    assert len(off["names"]) == 1, off


def test_stream_still_loud_on_inplace_mutation(spark):
    """The mutation guard the epoch encoding must NOT lose: a consumed
    shard vanishing WITHOUT a generation flip (manual deletion, foreign
    compaction — anything outside the commit protocol) still fails
    loudly at planning time."""
    register_kvtext(spark)
    path = os.path.join(tempfile.mkdtemp(prefix="kvtext_m_"), "sink")
    ckpt = tempfile.mkdtemp(prefix="kvtext_m_ckpt_")
    out = os.path.join(tempfile.mkdtemp(prefix="kvtext_m_out_"), "rows")
    spark.createDataFrame([("a", 1)], ["key", "value"]).coalesce(1).write.format(
        "kvtext"
    ).mode("append").save(path)

    def run():
        q = (
            spark.readStream.format("kvtext")
            .load(path)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    # In-place rewrite: delete the consumed shard, land a new one, NO
    # epoch flip.
    for n in os.listdir(path):
        if n.startswith("part-"):
            os.remove(os.path.join(path, n))
    spark.createDataFrame([("b", 2)], ["key", "value"]).coalesce(1).write.format(
        "kvtext"
    ).mode("append").save(path)
    with pytest.raises(Exception, match="without a generation flip"):
        run()


def test_lanes_skip_malformed_identically(spark):
    """ONE grammar across lanes (round-9 ADVICE): on a dirty/foreign
    sink, the Python DataSource and compat.read_kv_text must skip the
    SAME lines — previously the JVM lane mapped a malformed line to a
    ('', NULL) row, indistinguishable from the legitimate empty-string
    key."""
    d = tempfile.mkdtemp(prefix="kvtext_dirty_")
    with open(os.path.join(d, "part-00000-dirty"), "w") as f:
        f.write(
            "good:1\n"          # conforming
            "no colon here\n"   # malformed: no colon
            "trail:12:b\n"      # malformed: non-digit suffix after last colon
            ":7\n"              # conforming: legitimate empty-string key
            "neg:-5\n"          # conforming: negative value
            "uni:１２\n"         # malformed: unicode digits are not the grammar
            "a:b:34\n"          # conforming: key contains ':'
            "\n"                # malformed: empty line
        )
    register_kvtext(spark)
    via_ds = sorted(tuple(r) for r in spark.read.format("kvtext").load(d).collect())
    via_jvm = sorted(tuple(r) for r in read_kv_text(spark, d).collect())
    expect = [("", 7), ("a:b", 34), ("good", 1), ("neg", -5)]
    assert via_ds == expect
    assert via_jvm == expect, "JVM lane must skip exactly the Python lane's skips"


def test_commit_sweeps_own_retry_stragglers_only(spark):
    """A task attempt that staged a .tmp and died (retry/speculation)
    leaves debris invisible to commit's message list; commit must sweep
    it so a SUCCEEDED job leaves no orphans (round-9 ADVICE) — but ONLY
    debris carrying ITS OWN run id: a foreign .tmp (another writer's
    in-flight stage) must survive (round-10 review finding)."""
    from mapreduce_framework_spark.sources.kvtext_datasource import KvTextWriter

    path = os.path.join(tempfile.mkdtemp(prefix="kvtext_strag_"), "sink")
    w = KvTextWriter({"path": path}, overwrite=False)
    # A retried attempt of THIS job: staged, never reported to commit.
    own_straggler = w.write(iter([("lost_attempt", 9)]))
    committed = w.write(iter([("k", 1)]))
    os.makedirs(path, exist_ok=True)
    foreign = os.path.join(path, ".part-ffffffff-deadbeef.tmp")
    with open(foreign, "w") as f:
        f.write("other_writer:1\n")
    w.commit([committed])
    assert not os.path.exists(own_straggler.tmp_path), (
        "own retry straggler must be swept at commit"
    )
    assert os.path.exists(foreign), "a foreign stage must survive"
    os.remove(foreign)
    assert [tuple(r) for r in read_kv_text(spark, path).collect()] == [("k", 1)]


def test_stream_reader_is_partition_planned(spark):
    """Round-9 verdict task #1's pin: the stream lane must be the
    partition-planning DataSourceStreamReader (one InputPartition per
    new shard, executor-side reads), not the driver-materializing
    Simple variant."""
    from pyspark.sql.datasource import DataSourceStreamReader

    from mapreduce_framework_spark.sources.kvtext_datasource import (
        KvTextDataSource,
        KvTextPartition,
    )

    d = tempfile.mkdtemp(prefix="kvtext_pp_")
    for i in range(3):
        with open(os.path.join(d, f"part-0000{i}-r10"), "w") as f:
            f.write(f"k{i}:{i}\n")
    src = KvTextDataSource({"path": d})
    reader = src.streamReader(None)
    assert isinstance(reader, DataSourceStreamReader), (
        "stream lane must plan partitions, not read driver-side"
    )
    start, end = reader.initialOffset(), reader.latestOffset()
    parts = reader.partitions(start, end)
    assert len(parts) == 3 and all(isinstance(p, KvTextPartition) for p in parts)
    assert sorted(os.path.basename(p.path) for p in parts) == sorted(
        end["names"]
    ), "one InputPartition per new shard, by name"
    # Consumed-everything: an empty plan, never a re-read.
    assert reader.partitions(end, end) == []
    # Each partition must be independently readable (the executor-side
    # contract: no driver state beyond the shard path).
    rows = [
        (k, v)
        for p in parts
        for b in reader.read(p)
        for k, v in zip(b.column(0).to_pylist(), b.column(1).to_pylist())
    ]
    assert sorted(rows) == [("k0", 0), ("k1", 1), ("k2", 2)]


def test_stream_microbatch_scans_one_task_per_shard(spark):
    """Executed proof of per-shard parallelism: a 3-shard generation
    arriving in one micro-batch must scan as 3 distinct input
    partitions (spark_partition_id over the batch frame), the unit of
    parallelism the reference's reducer shards define."""
    register_kvtext(spark)
    path = os.path.join(tempfile.mkdtemp(prefix="kvtext_tasks_"), "sink")
    ckpt = tempfile.mkdtemp(prefix="kvtext_tasks_ckpt_")
    spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], ["key", "value"]
    ).repartition(3).write.format("kvtext").mode("append").save(path)

    n_parts: list[int] = []

    def grab(batch_df, _batch_id):
        n_parts.append(batch_df.rdd.getNumPartitions())

    q = (
        spark.readStream.format("kvtext")
        .load(path)
        .writeStream.foreachBatch(grab)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert n_parts == [3], (
        f"3 shards must plan as 3 scan partitions, got {n_parts}"
    )


def test_stream_writer_roundtrip_and_resume(spark):
    """writeStream.format('kvtext'): an availableNow pass lands the
    source exactly; a second pass from the SAME checkpoint after a new
    source shard appends ONLY the new batch — never a replay of
    consumed data."""
    register_kvtext(spark)
    src = os.path.join(tempfile.mkdtemp(prefix="kvtext_sw_"), "src")
    out = os.path.join(tempfile.mkdtemp(prefix="kvtext_sw_"), "out")
    ckpt = tempfile.mkdtemp(prefix="kvtext_sw_ckpt_")
    spark.createDataFrame([("a", 1), ("b", 2)], ["key", "value"]).coalesce(
        1
    ).write.format("kvtext").mode("append").save(src)

    def run():
        q = (
            spark.readStream.format("kvtext")
            .load(src)
            .writeStream.format("kvtext")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(tuple(r) for r in read_kv_text(spark, out).collect())

    assert run() == [("a", 1), ("b", 2)]
    names0 = sorted(os.listdir(out))
    assert all(n.startswith("part-b") for n in names0), names0
    assert not any(n.endswith(".tmp") for n in names0)

    spark.createDataFrame([("c", 3)], ["key", "value"]).coalesce(1).write.format(
        "kvtext"
    ).mode("append").save(src)
    assert run() == [("a", 1), ("b", 2), ("c", 3)]
    # Batch 0's shards are untouched; batch 1 landed beside them.
    assert set(names0) <= set(os.listdir(out))


def test_stream_writer_recommit_replaces_batch_generation(spark):
    """The exactly-once mechanism itself: re-committing the SAME
    batchId (the crash-between-sink-commit-and-checkpoint replay)
    REPLACES that batch's shard generation instead of doubling it,
    while other batches' shards are untouched."""
    from mapreduce_framework_spark.sources.kvtext_datasource import (
        KvTextStreamWriter,
    )

    out = os.path.join(tempfile.mkdtemp(prefix="kvtext_rc_"), "sink")
    w = KvTextStreamWriter({"path": out})

    msg_b0 = w.write(iter([("stable", 10)]))
    w.commit([msg_b0], batchId=0)
    first = w.write(iter([("a", 1)]))
    w.commit([first], batchId=7)
    replay = w.write(iter([("a", 1)]))
    w.commit([replay], batchId=7)

    names = sorted(os.listdir(out))
    assert sum(n.startswith("part-b000007-") for n in names) == 1, names
    assert sum(n.startswith("part-b000000-") for n in names) == 1, names
    rows = sorted(tuple(r) for r in read_kv_text(spark, out).collect())
    assert rows == [("a", 1), ("stable", 10)], "replayed batch must not double"


def test_stream_writer_truncate_mode_keeps_only_latest_batch(spark):
    """outputMode('complete') hands the sink overwrite=True: each
    commit must REPLACE the whole sink with the batch's full result —
    ignoring the flag would silently accumulate stale generations
    (round-10 review finding)."""
    from mapreduce_framework_spark.sources.kvtext_datasource import (
        KvTextStreamWriter,
    )

    out = os.path.join(tempfile.mkdtemp(prefix="kvtext_tr_"), "sink")
    w = KvTextStreamWriter({"path": out}, overwrite=True)
    w.commit([w.write(iter([("a", 1), ("b", 2)]))], batchId=0)
    assert sorted(tuple(r) for r in read_kv_text(spark, out).collect()) == [
        ("a", 1),
        ("b", 2),
    ]
    # Batch 1 carries the NEW full aggregate — the sink must hold only it.
    w.commit([w.write(iter([("a", 5), ("b", 7), ("c", 1)]))], batchId=1)
    assert sorted(tuple(r) for r in read_kv_text(spark, out).collect()) == [
        ("a", 5),
        ("b", 7),
        ("c", 1),
    ], "truncate commit must drop every earlier generation"


def test_stream_writer_complete_mode_end_to_end(spark):
    """The executed proof: a streaming AGGREGATE in complete mode lands
    in a kvtext sink, and after processing all input the sink equals
    the batch aggregate exactly — no stale batch-0 rows."""
    register_kvtext(spark)
    src = tempfile.mkdtemp(prefix="kvtext_cm_src_")
    out = os.path.join(tempfile.mkdtemp(prefix="kvtext_cm_"), "sink")
    ckpt = tempfile.mkdtemp(prefix="kvtext_cm_ckpt_")
    rows = [("a",), ("b",), ("a",), ("c",), ("a",), ("b",)]
    spark.createDataFrame(rows, ["key"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    counts = (
        spark.readStream.schema("key string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("value"))
    )
    q = (
        counts.writeStream.format("kvtext")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(tuple(r) for r in read_kv_text(spark, out).collect())
    assert got == [("a", 3), ("b", 2), ("c", 1)], got


def test_batch_commit_sweep_spares_concurrent_stage(spark):
    """The straggler sweep is scoped to the committing writer's run id:
    a CONCURRENT append's in-flight .tmp stage must survive another
    job's commit (the round-10 review found a global sweep broke the
    concurrent appends the unique shard names exist to allow)."""
    from mapreduce_framework_spark.sources.kvtext_datasource import KvTextWriter

    path = os.path.join(tempfile.mkdtemp(prefix="kvtext_cc_"), "sink")
    writer_a = KvTextWriter({"path": path}, overwrite=False)
    writer_b = KvTextWriter({"path": path}, overwrite=False)
    # B stages first (in flight), then A stages AND commits.
    msg_b = writer_b.write(iter([("from_b", 2)]))
    msg_a = writer_a.write(iter([("from_a", 1)]))
    writer_a.commit([msg_a])
    assert os.path.exists(msg_b.tmp_path), (
        "A's commit sweep must not delete B's in-flight stage"
    )
    writer_b.commit([msg_b])
    got = sorted(tuple(r) for r in read_kv_text(spark, path).collect())
    assert got == [("from_a", 1), ("from_b", 2)]
    assert not any(n.endswith(".tmp") for n in os.listdir(path))


def test_overwrite_generation_flip_is_atomic(spark):
    """Round-10 verdict task #3: the overwrite publish is ONE atomic
    manifest replace.  Simulate both crash windows at the file level
    and pin that every reader lane resolves a COMPLETE generation —
    old before the flip, new after it, never a mixture."""
    import json

    from mapreduce_framework_spark.sources.kvtext_datasource import (
        MANIFEST_NAME,
        live_shard_names,
        shard_epoch,
    )

    register_kvtext(spark)
    path = os.path.join(tempfile.mkdtemp(prefix="kvtext_atomic_"), "sink")
    g1 = spark.createDataFrame([("k", 1), ("k2", 1)], ["key", "value"])
    g2 = spark.createDataFrame([("k", 2), ("k2", 2)], ["key", "value"])
    g1.coalesce(1).write.format("kvtext").mode("overwrite").save(path)
    man1 = json.load(open(os.path.join(path, MANIFEST_NAME)))
    live1 = live_shard_names(path)
    assert live1 == sorted(man1["names"])
    assert all(shard_epoch(n) == man1["epoch"] for n in live1)

    # Crash window A — new generation renamed in, manifest NOT yet
    # flipped: readers must still resolve the OLD generation only.
    debris = f"part-e{man1['epoch'] + 1:06d}-00000-deadbeef"
    with open(os.path.join(path, debris), "w") as f:
        f.write("torn:999\n")
    assert live_shard_names(path) == live1, "unpublished epoch leaked"
    got = sorted(
        tuple(r) for r in spark.read.format("kvtext").load(path).collect()
    )
    assert got == [("k", 1), ("k2", 1)], "reader saw a torn overwrite"
    got_jvm = sorted(tuple(r) for r in read_kv_text(spark, path).collect())
    assert got_jvm == [("k", 1), ("k2", 1)], "JVM lane saw a torn overwrite"

    # A real second overwrite must pick an epoch ABOVE the debris (no
    # mixing with a crashed overwrite's files) and reclaim both the
    # old generation and the debris post-flip (self-healing).
    g2.coalesce(1).write.format("kvtext").mode("overwrite").save(path)
    man2 = json.load(open(os.path.join(path, MANIFEST_NAME)))
    assert man2["epoch"] > man1["epoch"] + 1
    names_now = os.listdir(path)
    assert debris not in names_now, "crashed-overwrite debris not reclaimed"
    assert not any(n in names_now for n in man1["names"]), "old gen lingers"
    got = sorted(
        tuple(r) for r in spark.read.format("kvtext").load(path).collect()
    )
    assert got == [("k", 2), ("k2", 2)]


def test_overwrite_racing_reader_sees_old_or_new_never_torn(spark):
    """A reader loop racing repeated overwrite commits must observe,
    on every resolution, one complete generation (all keys present,
    one distinct value) — or the documented LOUD FileNotFoundError if
    post-flip GC unlinks a shard between listing and open.  Resolution
    goes through live_shard_names + parse_kv_lines, the exact helpers
    both DataSource readers and (manifested) the JVM lane scan with,
    so the file-level race IS the reader race."""
    import threading

    from mapreduce_framework_spark.sources.kvtext_datasource import (
        live_shard_names,
        parse_kv_lines,
    )

    register_kvtext(spark)
    path = os.path.join(tempfile.mkdtemp(prefix="kvtext_race_"), "sink")
    keys = [f"k{i}" for i in range(5)]
    gens = 6
    frames = [
        spark.createDataFrame([(k, g) for k in keys], ["key", "value"])
        for g in range(1, gens + 1)
    ]
    stop = threading.Event()
    writer_err: list[Exception] = []

    def overwriter():
        try:
            # JVM active-session is THREAD-local and unset on the fresh
            # py4j thread this Python thread maps to; without it the
            # Python-data-source lookup silently skips the registry and
            # save() dies with ClassNotFoundException: kvtext.
            spark._jvm.org.apache.spark.sql.classic.SparkSession.setActiveSession(
                spark._jsparkSession
            )
            for df in frames:
                df.repartition(2).write.format("kvtext").mode(
                    "overwrite"
                ).save(path)
        except Exception as e:  # surfaced in the main thread
            writer_err.append(e)
        finally:
            stop.set()

    t = threading.Thread(target=overwriter)
    t.start()
    import time as _time

    observed = 0
    torn = []
    deadline = _time.time() + 300
    while (not stop.is_set() or observed == 0) and _time.time() < deadline:
        # Yield the GIL each iteration: a no-sleep listdir/parse loop
        # starves the writer thread's py4j calls and the test crawls.
        _time.sleep(0.002)
        try:
            rows = [
                kv
                for n in live_shard_names(path)
                for kv in parse_kv_lines(os.path.join(path, n))
            ]
        except FileNotFoundError:
            continue  # documented loud outcome of GC-after-listing
        if not rows:
            continue  # before the first commit
        observed += 1
        vals = {v for _, v in rows}
        ks = sorted(k for k, _ in rows)
        if len(vals) != 1 or ks != keys:
            torn.append(rows)
    t.join()
    assert not writer_err, writer_err
    assert not torn, f"torn generation observed: {torn[:1]}"
    assert observed > 0
    got = sorted(
        tuple(r) for r in spark.read.format("kvtext").load(path).collect()
    )
    assert got == [(k, gens) for k in keys]


def test_append_into_manifested_sink_stays_visible(spark):
    """After an overwrite introduced the manifest, appended shards are
    epoch-tagged with the live generation so every lane keeps seeing
    them (append-vs-overwrite semantics preserved post-manifest)."""
    register_kvtext(spark)
    path = os.path.join(tempfile.mkdtemp(prefix="kvtext_apnd_"), "sink")
    spark.createDataFrame([("a", 1)], ["key", "value"]).coalesce(1).write.format(
        "kvtext"
    ).mode("overwrite").save(path)
    spark.createDataFrame([("b", 2)], ["key", "value"]).coalesce(1).write.format(
        "kvtext"
    ).mode("append").save(path)
    expect = [("a", 1), ("b", 2)]
    assert (
        sorted(tuple(r) for r in spark.read.format("kvtext").load(path).collect())
        == expect
    )
    assert sorted(tuple(r) for r in read_kv_text(spark, path).collect()) == expect


def test_stale_foreign_stragglers_reclaimed_with_age_guard(spark):
    """Round-10 ADVICE #4: a DEAD run's .tmp stragglers (its run id
    gone forever) must eventually be reclaimed by a later commit — but
    only past the age guard, so a LIVE concurrent writer's fresh stage
    is never swept."""
    import time as _time

    from mapreduce_framework_spark.sources.kvtext_datasource import KvTextWriter

    path = os.path.join(tempfile.mkdtemp(prefix="kvtext_dead_"), "sink")
    os.makedirs(path)
    dead = os.path.join(path, ".part-00000000-cafecafe.tmp")
    with open(dead, "w") as f:
        f.write("dead_run:1\n")
    past = _time.time() - 7200
    os.utime(dead, (past, past))
    fresh = os.path.join(path, ".part-11111111-beefbeef.tmp")
    with open(fresh, "w") as f:
        f.write("live_run:1\n")

    w = KvTextWriter({"path": path}, overwrite=False)
    w.commit([w.write(iter([("k", 1)]))])
    assert not os.path.exists(dead), "aged dead-run straggler must be reclaimed"
    assert os.path.exists(fresh), "fresh foreign stage must survive"


def test_manifestless_preflip_epoch_shards_stay_invisible(spark):
    """Round-11 ADVICE #1 (the torn FIRST-overwrite window): in a
    NEVER-manifested dir, an epoch-tagged shard is an in-flight (or
    crashed) first overwrite's pre-flip generation and must stay
    invisible to every reader lane until its manifest flip publishes
    it — otherwise a reader racing the first overwrite of an
    append-only sink observes old untagged shards MIXED with
    partially-renamed new epoch shards."""
    from mapreduce_framework_spark.sources.kvtext_datasource import (
        live_generation,
        live_shard_names,
    )

    register_kvtext(spark)
    path = os.path.join(tempfile.mkdtemp(prefix="kvtext_pre_"), "sink")
    spark.createDataFrame([("a", 1)], ["key", "value"]).coalesce(1).write.format(
        "kvtext"
    ).mode("append").save(path)
    # A first overwrite crashed (or is mid-rename): epoch shard, no
    # manifest.
    with open(os.path.join(path, "part-e000000-00000-deadbeef"), "w") as f:
        f.write("torn:999\n")

    epoch, names = live_generation(path)
    assert epoch == -1
    assert names == live_shard_names(path)
    assert all("e000000" not in n for n in names), "pre-flip shard leaked"
    expect = [("a", 1)]
    got_ds = sorted(
        tuple(r) for r in spark.read.format("kvtext").load(path).collect()
    )
    assert got_ds == expect, "DataSource lane read the unpublished generation"
    got_jvm = sorted(tuple(r) for r in read_kv_text(spark, path).collect())
    assert got_jvm == expect, "JVM lane read the unpublished generation"


def test_stream_writer_into_manifested_dir_stays_visible(spark):
    """Round-11 ADVICE #2 mirror of
    test_append_into_manifested_sink_stays_visible: streaming into a
    dir that has been batch-OVERWRITTEN must epoch-tag its shards like
    the batch append path — untagged shards would be invisible to
    every generation-aware reader and silently deleted by the next
    overwrite's post-flip GC."""
    from mapreduce_framework_spark.sources.kvtext_datasource import (
        KvTextStreamWriter,
        shard_epoch,
    )

    register_kvtext(spark)
    path = os.path.join(tempfile.mkdtemp(prefix="kvtext_smf_"), "sink")
    spark.createDataFrame([("a", 1)], ["key", "value"]).coalesce(1).write.format(
        "kvtext"
    ).mode("overwrite").save(path)

    w = KvTextStreamWriter({"path": path})
    w.commit([w.write(iter([("b", 2)]))], batchId=0)
    stream_shards = [n for n in os.listdir(path) if "b000000" in n]
    assert stream_shards and all(
        shard_epoch(n) is not None for n in stream_shards
    ), f"stream shards not epoch-tagged in manifested dir: {stream_shards}"

    expect = [("a", 1), ("b", 2)]
    assert (
        sorted(tuple(r) for r in spark.read.format("kvtext").load(path).collect())
        == expect
    )
    assert sorted(tuple(r) for r in read_kv_text(spark, path).collect()) == expect

    # Replay of the same batch still replaces, not doubles, the
    # epoch-tagged generation of that batch.
    w2 = KvTextStreamWriter({"path": path})
    w2.commit([w2.write(iter([("b", 2)]))], batchId=0)
    assert (
        sorted(tuple(r) for r in spark.read.format("kvtext").load(path).collect())
        == expect
    )


def test_epoch_tag_parses_beyond_six_digits():
    """Round-11 ADVICE #3: {epoch:06d} emits 7+ digits from epoch
    10**6 — the tag regex must keep parsing, or the just-published
    live generation becomes invisible to every reader at that flip."""
    from mapreduce_framework_spark.sources.kvtext_datasource import shard_epoch

    assert shard_epoch("part-e000042-00000-cafe") == 42
    assert shard_epoch("part-e1000000-00000-cafe") == 1000000
    assert shard_epoch("part-e123456789-00000-cafe") == 123456789
    assert shard_epoch("part-b000001-00000") is None
    assert shard_epoch("part-00000-cafe") is None
