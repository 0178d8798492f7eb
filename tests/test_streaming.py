"""Streaming behavior: batch ≡ incremental replay, watermark drops,
exactly-once dedup."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, rows_normalized


@pytest.fixture(scope="module")
def events(spark):
    from mapreduce_framework_spark.io import table

    return table(spark, SF_DIR, "events")


def _as_sets(df):
    cols, rows = rows_normalized(df.columns, [tuple(r) for r in df.collect()])
    return cols, rows


def test_tumbling_stream_equals_batch(spark, events):
    """The same transform, replayed in 4 micro-batches with no watermark
    (complete mode), must produce exactly the batch aggregate."""
    from mapreduce_framework_spark.streaming import run_file_stream, tumbling_counts

    batch = tumbling_counts(events)
    stream = run_file_stream(spark, events, tumbling_counts, output_mode="complete")
    assert _as_sets(batch) == _as_sets(stream)


def test_sliding_stream_equals_batch(spark, events):
    from mapreduce_framework_spark.streaming import run_file_stream, sliding_counts

    batch = sliding_counts(events)
    stream = run_file_stream(spark, events, sliding_counts, output_mode="complete")
    assert _as_sets(batch) == _as_sets(stream)


def test_watermark_drops_or_holds_back_rows(spark, events):
    """Append mode + 10-min watermark: emitted windows are a subset of
    the batch result, counts never exceed the batch count, and — since
    the round-6 deterministic late set — at least one late row is
    ACTUALLY dropped (strictly smaller count somewhere), so the drop
    path is exercised, not just permitted."""
    from mapreduce_framework_spark.registry import get_query

    out = get_query("stream_watermark_late").fn(spark, SF_DIR)
    from mapreduce_framework_spark.streaming import tumbling_counts

    batch = {
        (r["wstart"], r["event_type"]): r["cnt"] for r in tumbling_counts(events).collect()
    }
    emitted = out.collect()
    assert 0 < len(emitted) <= len(batch)
    total_emitted, total_batch_over_emitted = 0, 0
    for r in emitted:
        assert (r["wstart"], r["event_type"]) in batch
        assert r["cnt"] <= batch[(r["wstart"], r["event_type"])]
        total_emitted += r["cnt"]
        total_batch_over_emitted += batch[(r["wstart"], r["event_type"])]
    assert total_emitted < total_batch_over_emitted, (
        "no late row was dropped — the watermark drop path is unexercised"
    )


def test_drop_metric_lies_in_semantic_bounds(spark, events):
    """The engine's numRowsDroppedByWatermark counts post-partial-agg
    rows, so its exact value depends on how the late batch splits into
    input partitions — layout, not semantics.  The layout-independent
    invariant is n_dropped_groups ≤ metric ≤ n_dropped_rows; the report
    key folds that into drop_metric_in_bounds (hash-pinned TRUE by the
    oracle) and this test asserts it with the bound values visible."""
    from mapreduce_framework_spark.registry import get_query

    [r] = get_query("stream_watermark_drop_report").fn(spark, SF_DIR).collect()
    assert r["n_dropped_rows"] > 0, "no late row dropped — fixture unexercised"
    assert 0 < r["n_dropped_groups"] <= r["n_dropped_rows"]
    assert r["drop_metric_in_bounds"] is True, (
        f"engine drop metric escaped its semantic bounds "
        f"[{r['n_dropped_groups']}, {r['n_dropped_rows']}]"
    )
    # The replay admits SOME late rows (still-open windows) — if all
    # late rows were dropped the admit path would be unexercised.
    assert r["n_dropped_rows"] < r["n_late"]


def test_streaming_dedup_exactly_once(spark, events):
    """withWatermark + dropDuplicates on event_id yields at most one row
    per id even when the source replays duplicates across batches."""
    from pyspark.sql import functions as F

    from mapreduce_framework_spark.streaming import run_file_stream

    # Inject duplicates: union the first 50 events again.
    dup_src = events.union(events.orderBy("ts").limit(50))

    def dedup(df):
        return df.withWatermark("ts", "1 hour").dropDuplicates(["event_id"]).select(
            "event_id", "ts"
        )

    out = run_file_stream(
        spark, dup_src, dedup, output_mode="append", n_batches=4
    )
    n_ids = events.select("event_id").distinct().count()
    got = out.groupBy("event_id").count().where(F.col("count") > 1).count()
    assert got == 0, "duplicate event_ids emitted"
    assert out.count() <= n_ids + 50  # sanity: bounded by distinct ids


def test_interval_join_stream_equals_batch(spark, events):
    """True stream-stream join (watermarked, micro-batched) must emit
    exactly the batch join's rows — inner interval joins emit on match,
    watermark only bounds state."""
    from mapreduce_framework_spark.streaming.runner import run_file_stream
    from mapreduce_framework_spark.streaming.transforms import (
        click_purchase_interval_join,
    )

    batch = click_purchase_interval_join(events)
    stream = run_file_stream(
        spark,
        events,
        click_purchase_interval_join,
        watermark=("ts", "10 minutes"),
        output_mode="append",
    )
    assert _as_sets(batch) == _as_sets(stream)


def test_checkpoint_resume_is_exactly_once(spark, events):
    """Reference O18 parity (checkpoint replication → resume missing
    work): process half the input, STOP, add the rest, restart from the
    SAME checkpoint — the union of outputs must equal the batch result
    exactly: no lost windows, no duplicates."""
    import glob
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from mapreduce_framework_spark.streaming.transforms import tumbling_counts

    src = tempfile.mkdtemp(prefix="ckpt_src_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_dir_")
    stage = tempfile.mkdtemp(prefix="ckpt_stage_")
    # Four deterministic time-ordered files, staged then revealed 2+2.
    events.repartitionByRange(4, "ts", "event_id").sortWithinPartitions(
        "ts", "event_id"
    ).write.mode("overwrite").parquet(stage)
    files = sorted(glob.glob(os.path.join(stage, "part-*")))
    assert len(files) == 4

    def run_until_done(sink):
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            tumbling_counts(stream)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.table(sink)

    for f in files[:2]:
        shutil.copy(f, os.path.join(src, os.path.basename(f)))
    run_until_done("ckpt_first")

    for f in files[2:]:
        shutil.copy(f, os.path.join(src, os.path.basename(f)))
    resumed = run_until_done("ckpt_second")  # same checkpoint → resumes offsets

    batch = tumbling_counts(events)
    assert _as_sets(batch) == _as_sets(resumed)


def test_foreach_batch_sink_is_idempotent(spark, events):
    """Exactly-once sink: replaying the stream writes everything once;
    re-running a batch function with the same batch id (a simulated
    post-crash retry) must not duplicate rows."""
    import tempfile

    from pyspark.sql import functions as F

    from mapreduce_framework_spark.streaming.sinks import idempotent_parquet_writer

    with tempfile.TemporaryDirectory() as tmp:
        sink_path = f"{tmp}/sink"
        src_dir = f"{tmp}/src"
        ckpt = f"{tmp}/ckpt"
        events.repartitionByRange(3, "ts", "event_id").write.parquet(src_dir)

        write_batch = idempotent_parquet_writer(sink_path)
        q = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
            .writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        sunk = spark.read.parquet(sink_path)
        assert sunk.count() == events.count()

        # Simulated retry: re-run batch 0's write with the same id.
        batch0 = sunk.where(F.col("_batch_id") == 0).drop("_batch_id")
        n0 = batch0.count()
        assert n0 > 0
        write_batch(batch0, 0)
        after = spark.read.parquet(sink_path)
        assert after.count() == events.count()  # no duplication
        assert after.where(F.col("_batch_id") == 0).count() == n0


def test_batching_invariance_across_trigger_sizes(spark, events):
    """Rate/size pressure: replaying the same stream with
    maxFilesPerTrigger = 1, 2, and uncapped (availableNow one-shot)
    changes only the micro-batch boundaries — complete-mode window
    state and update-mode custom state must converge to IDENTICAL final
    results.  This pins in execution what the range-partitioned-replay
    argument (queries/streaming.py module docstring) argues in prose."""
    from pyspark.sql import functions as F

    from mapreduce_framework_spark.streaming import run_file_stream, tumbling_counts
    from mapreduce_framework_spark.streaming.stateful import running_totals

    ev = events.select("ts", "event_type")
    results = [
        _as_sets(
            run_file_stream(
                spark, ev, tumbling_counts, output_mode="complete",
                max_files_per_trigger=m,
            )
        )
        for m in (1, 2, None)
    ]
    assert results[0] == results[1] == results[2]

    def final_totals(m):
        ev2 = events.select("ts", "user_id", "value")
        updates = run_file_stream(
            spark, ev2, running_totals, output_mode="update",
            max_files_per_trigger=m,
        )
        final = (
            updates.groupBy("user_id")
            .agg(F.max(F.struct("n_events", "total_cents")).alias("s"))
            .select("user_id", "s.n_events", "s.total_cents")
        )
        return _as_sets(final)

    # Two variants for the (expensive) stateful path: per-file batches
    # vs one-shot — the extremes bracket every intermediate batching.
    stateful = [final_totals(m) for m in (1, None)]
    assert stateful[0] == stateful[1]


def test_cdc_merge_disk_stays_bounded(spark, tmp_path):
    """Deep-replay disk lifecycle (round-5): driving the REAL
    foreachBatch merge callable through many batches must never hold
    more than two snapshot directories (state_b plus the state_{b-1} a
    post-crash retry of batch b could still need) — before the round-5
    pruning, a 1000-batch replay accumulated 1000 directories.  Also
    pins retryability: re-running the last batch against the pruned
    root regenerates state_b identically."""
    import datetime as dt
    import os

    from mapreduce_framework_spark.queries.streaming import cdc_merge

    state_root = str(tmp_path / "state")
    os.makedirs(state_root)
    merge = cdc_merge(state_root)

    def batch_df(b):
        rows = [
            (dt.datetime(2024, 1, 1, 0, 0, b), b * 2, b % 7, "click", float(b)),
            (dt.datetime(2024, 1, 1, 0, 0, b), b * 2 + 1, (b + 3) % 7, "view", float(b)),
        ]
        return spark.createDataFrame(
            rows,
            "ts timestamp, event_id long, user_id long, event_type string, value double",
        )

    n_batches = 40
    for b in range(n_batches):
        merge(batch_df(b), b)
        dirs = [d for d in os.listdir(state_root) if d.startswith("state_")]
        assert len(dirs) <= 2, f"batch {b}: snapshots leaked: {sorted(dirs)}"

    final = {
        tuple(r)
        for r in spark.read.parquet(
            os.path.join(state_root, f"state_{n_batches - 1}")
        ).collect()
    }
    # Post-crash retry of the LAST batch: state_{b-1} must still exist
    # and the regenerated snapshot must be identical.
    merge(batch_df(n_batches - 1), n_batches - 1)
    retried = {
        tuple(r)
        for r in spark.read.parquet(
            os.path.join(state_root, f"state_{n_batches - 1}")
        ).collect()
    }
    assert retried == final
    assert len(final) == 7  # one live row per user key


def test_cdc_upsert_tombstone_semantics(spark):
    """CDC last-writer-wins on a planted changelog: a key whose LAST
    change is a tombstone is absent from the snapshot; a key upserted
    AFTER its tombstone is resurrected with the newer value; retrying
    the final batch (Structured Streaming's post-crash re-run) leaves
    the snapshot byte-identical."""
    import datetime as dt

    from pyspark.sql import functions as F

    rows = [
        # user 1: upsert → tombstone → upsert  (resurrected, value 30)
        (dt.datetime(2024, 1, 1, 10, 0), 1, 1, "click", 10.0),
        (dt.datetime(2024, 1, 1, 11, 0), 2, 1, "error", 0.0),
        (dt.datetime(2024, 1, 1, 12, 0), 3, 1, "view", 30.0),
        # user 2: upsert → tombstone  (dead)
        (dt.datetime(2024, 1, 1, 10, 30), 4, 2, "purchase", 99.0),
        (dt.datetime(2024, 1, 1, 13, 0), 5, 2, "error", 0.0),
        # user 3: single upsert
        (dt.datetime(2024, 1, 1, 9, 0), 6, 3, "signup", 1.0),
    ]
    ev = spark.createDataFrame(
        rows, "ts timestamp, event_id long, user_id long, event_type string, value double"
    )

    # Batch-split replay: batch 0 = first 3 changes, batch 1 = rest;
    # ping-pong exactly as the query's merge does — state keeps
    # (ts, event_id) so later batches can compare against it.
    b0, b1 = ev.where(F.col("event_id") <= 3), ev.where(F.col("event_id") > 3)
    state0_full = (
        b0.groupBy("user_id")
        .agg(F.max_by(F.struct("ts", "event_id", "event_type", "value"),
                      F.struct("ts", "event_id")).alias("s"))
        .select("user_id", "s.ts", "s.event_id", "s.event_type", "s.value")
    )
    merged = (
        state0_full.unionByName(b1.select("user_id", "ts", "event_id", "event_type", "value"))
        .groupBy("user_id")
        .agg(F.max_by(F.struct("ts", "event_id", "event_type", "value"),
                      F.struct("ts", "event_id")).alias("s"))
        .select("user_id", "s.event_type", "s.value")
    )
    live = {r.user_id: (r.event_type, r.value)
            for r in merged.where(F.col("event_type") != "error").collect()}
    assert live == {1: ("view", 30.0), 3: ("signup", 1.0)}
    # Retry idempotence: re-merging batch 1 into state0 again gives the
    # same snapshot (same inputs → same reduce).
    merged2 = (
        state0_full.unionByName(b1.select("user_id", "ts", "event_id", "event_type", "value"))
        .groupBy("user_id")
        .agg(F.max_by(F.struct("ts", "event_id", "event_type", "value"),
                      F.struct("ts", "event_id")).alias("s"))
        .select("user_id", "s.event_type", "s.value")
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, merged2.collect()))


def test_session_timers_batching_invariant(spark, events):
    """The timer-emitted session set must depend only on the FINAL
    watermark, not on batching: replaying one file per trigger vs
    everything in one batch changes which micro-batch each timer fires
    in, but the emitted sessions are identical (availableNow's no-data
    final batch advances the watermark to max(ts) - delay and fires
    every remaining eligible timer)."""
    from mapreduce_framework_spark.streaming.runner import run_file_stream
    from mapreduce_framework_spark.streaming.stateful import timeout_sessions

    ev = events.select("ts", "user_id")
    per_file = run_file_stream(
        spark, ev, timeout_sessions,
        watermark=("ts", "10 seconds"), output_mode="append",
    )
    one_shot = run_file_stream(
        spark, ev, timeout_sessions,
        watermark=("ts", "10 seconds"), output_mode="append",
        max_files_per_trigger=None,
    )
    assert sorted(map(tuple, per_file.collect())) == sorted(
        map(tuple, one_shot.collect())
    )


def test_session_timer_lanes_identical(spark, events):
    """timer_sessions (transformWithStateInPandas) and timeout_sessions
    (applyInPandasWithState + EventTimeTimeout) implement the same
    emission contract — pinned whenever the TWS lane's protobuf
    dependency is available.  Skipped in this container (no
    google.protobuf), same policy as the multimodal real-codec seam."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas state protocol needs protobuf",
    )
    from mapreduce_framework_spark.streaming.runner import run_file_stream
    from mapreduce_framework_spark.streaming.stateful import (
        timeout_sessions,
        timer_sessions,
    )

    ev = events.select("ts", "user_id")
    tws = run_file_stream(
        spark, ev, timer_sessions,
        watermark=("ts", "10 seconds"), output_mode="append",
    )
    legacy = run_file_stream(
        spark, ev, timeout_sessions,
        watermark=("ts", "10 seconds"), output_mode="append",
    )
    assert sorted(map(tuple, tws.collect())) == sorted(map(tuple, legacy.collect()))


def test_session_proof_closed_emits_even_inside_watermark(spark):
    """Round-9 review regression: a session closed by its SUCCESSOR
    event (gap exceeded) emits immediately — even when the closed
    session's timer expiry is still within the final watermark, where
    a timer-only contract would hold it.  u1's first session closes
    5 s past the gap boundary with max(ts) only 5 s later: the
    watermark (max - 10 s) never passes start+gap, so only the
    proof-closed path can emit it."""
    import datetime

    from mapreduce_framework_spark.streaming.runner import run_file_stream
    from mapreduce_framework_spark.streaming.stateful import timeout_sessions

    base = datetime.datetime(2024, 1, 1)
    gap_s = 43_200
    rows = [
        (base, 1),
        (base + datetime.timedelta(seconds=gap_s + 5), 1),  # proof-closes s1
        (base + datetime.timedelta(seconds=gap_s + 10), 2),  # max ts carrier
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, user_id long")
    out = run_file_stream(
        spark, ev, timeout_sessions,
        watermark=("ts", "10 seconds"), output_mode="append",
        n_batches=2,
    )
    got = {(r.user_id, r.n_events) for r in out.collect()}
    # s1 (one event at base) is proof-closed and MUST emit; the two
    # successor sessions are still open at the final watermark.
    assert (1, 1) in got
    assert len(got) == 1


def test_processing_time_ttl_evicts(spark, events):
    """State TTL (round-8 verdict task #5's second half): per-key state
    must EXPIRE after ttl_ms of processing-time inactivity and LEAVE
    the store.  One continuous-trigger query (ProcessingTimeTimeout
    needs live batches to service timers — an availableNow run never
    self-terminates with timers pending, see ttl_evicting_totals'
    docstring): feed users 1-4, then more rows for user 1 inside the
    TTL (state must survive and accumulate), then idle past the TTL
    (every key must emit exactly one evicted=true row with its final
    count), then feed user 2 again — its count must restart FRESH,
    proving the eviction removed the state rather than masking it."""
    import glob
    import os
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F

    from mapreduce_framework_spark.streaming.stateful import ttl_evicting_totals

    src = tempfile.mkdtemp(prefix="ttl_src_")
    ckpt = tempfile.mkdtemp(prefix="ttl_ckpt_")

    def stage_file(df, name):
        d = tempfile.mkdtemp(prefix="ttl_stage_")
        df.coalesce(1).write.mode("overwrite").parquet(d)
        part = sorted(glob.glob(os.path.join(d, "part-*")))[0]
        shutil.copy(part, os.path.join(src, name))

    def wait_until(pred, timeout_s, what):
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            if pred():
                return
            time.sleep(0.5)
        raise AssertionError(f"timed out waiting for {what}")

    def rows():
        return spark.table("ttl_sink").collect()

    four = events.where(F.col("user_id").isin(1, 2, 3, 4))
    n1 = events.where(F.col("user_id") == 1).count()
    n2 = events.where(F.col("user_id") == 2).count()
    counts0 = {
        r.user_id: r.cnt
        for r in four.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()
    }

    # TTL sizing (round-9 ADVICE flake fix): the mid-TTL phases below —
    # "no eviction yet" and "user 1 accumulates onto SURVIVING state" —
    # only hold if their batches process within the TTL of the state's
    # creation.  At ttl_ms=10s a loaded host's first micro-batches
    # could take longer than the TTL and evict before b1 landed; 30s
    # gives the slow-host margin, and the no-eviction assertion is
    # additionally wall-clock-gated so it can never fire stale.
    ttl_ms = 30_000
    stage_file(four, "b0.parquet")
    t0 = time.time()
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        ttl_evicting_totals(stream, ttl_ms=ttl_ms)
        .writeStream.format("memory")
        .queryName("ttl_sink")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        wait_until(lambda: len(rows()) >= 4, 60, "first updates for users 1-4")
        assert {r.user_id for r in rows() if not r.evicted} == {1, 2, 3, 4}
        if time.time() - t0 < 0.8 * ttl_ms / 1000:
            # Only meaningful while provably inside the TTL window —
            # on a host slow enough to blow through it, eviction here
            # is correct behavior, not a failure.
            assert not any(r.evicted for r in rows()), (
                "eviction before TTL elapsed"
            )

        # Inside the TTL window: user 1's state must survive + accumulate.
        # Slow-host gate (round-10 ADVICE #5): if the host is loaded
        # enough that the TTL elapses BEFORE the b1 batch processes,
        # eviction-then-fresh-restart is the CORRECT engine behavior,
        # not a failure — b1 then emits a SECOND (1, n1, False) row
        # (counts0[1] == n1, so the value alone can't distinguish;
        # occurrence count can).  Accept either outcome, and assert the
        # branch-appropriate invariants below.
        n_u1_base = sum(
            1
            for r in rows()
            if not r.evicted and r.user_id == 1 and r.n_events == n1
        )
        stage_file(events.where(F.col("user_id") == 1), "b1.parquet")

        def u1_accumulated():
            return any(
                not r.evicted and r.user_id == 1 and r.n_events == counts0[1] + n1
                for r in rows()
            )

        def u1_restarted():
            return time.time() - t0 > ttl_ms / 1000 and (
                sum(
                    1
                    for r in rows()
                    if not r.evicted and r.user_id == 1 and r.n_events == n1
                )
                > n_u1_base
            )

        wait_until(
            lambda: u1_accumulated() or u1_restarted(),
            60,
            "user 1's second update (accumulated, or fresh post-TTL restart)",
        )
        accumulated = u1_accumulated()

        # Idle past the TTL: every state generation evicts exactly once
        # with its final count.  In the normal (accumulated) branch
        # that is one eviction per key; in the slow-host branch user
        # 1's rows were split across two state generations, so its
        # TOTAL evicted count — not its per-eviction count — must
        # equal counts0[1] + n1 (nothing lost, nothing double-counted).
        n_evictions = 4 if accumulated else 5
        wait_until(
            lambda: sum(1 for r in rows() if r.evicted) >= n_evictions,
            120,
            f"{n_evictions} evictions",
        )
        evicted = [r for r in rows() if r.evicted]
        assert {r.user_id for r in evicted} == {1, 2, 3, 4}
        assert len(evicted) == n_evictions, (
            "a state generation must evict exactly once"
        )
        assert sum(r.n_events for r in evicted if r.user_id == 1) == (
            counts0[1] + n1
        )
        by_user = {r.user_id: r.n_events for r in evicted if r.user_id != 1}
        assert by_user == {u: counts0[u] for u in (2, 3, 4)}

        # Re-feed an evicted key: the count must restart FRESH.  Note
        # counts0[2] == n2 (the b0 batch already emitted (2, n2, False)),
        # so a predicate on a single such row would be satisfied before
        # the refeed even runs — require a SECOND occurrence, which can
        # only come from the post-eviction batch, and reject the
        # survived-state value explicitly.
        n_fresh_before = sum(
            1 for r in rows() if not r.evicted and r.user_id == 2
        )
        assert n_fresh_before == 1
        stage_file(events.where(F.col("user_id") == 2), "b2.parquet")
        wait_until(
            lambda: sum(
                1
                for r in rows()
                if not r.evicted and r.user_id == 2 and r.n_events == n2
            )
            >= 2,
            60,
            "user 2's fresh post-eviction state",
        )
        assert not any(
            not r.evicted and r.user_id == 2 and r.n_events == counts0[2] + n2
            for r in rows()
        ), "state survived eviction: refeed accumulated onto the old count"
    finally:
        q.stop()
