"""Streaming queries (SURVEY.md §2b).

Oracle-checked entries run the shared transform in batch mode (the
driver's DuckDB check applies); `stream_watermark_late` runs the REAL
Structured Streaming path — watermarked, micro-batched, append-mode —
and is rows-only by contract.  tests/test_streaming.py additionally
proves batch≡stream equivalence for the windowed transforms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduce_framework_spark.io import table
from mapreduce_framework_spark.registry import register
from mapreduce_framework_spark.streaming.runner import run_file_stream
from mapreduce_framework_spark.streaming.transforms import (
    dedup_events,
    session_windows,
    sliding_counts,
    tumbling_counts,
)


@register(
    "stream_tumbling_count",
    oracle="""
SELECT time_bucket(INTERVAL '5 minutes', ts) AS wstart,
       time_bucket(INTERVAL '5 minutes', ts) + INTERVAL 5 MINUTE AS wend,
       event_type,
       count(*) AS cnt
FROM events
GROUP BY 1, 2, 3
""".strip(),
    tags=("streaming",),
    bench=True,
)
def stream_tumbling_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling counts per event type (batch-equivalence mode;
    the identical transform replays incrementally in tests)."""
    return tumbling_counts(table(spark, sf_dir, "events"))


@register(
    "stream_sliding",
    oracle="""
SELECT wstart, wstart + INTERVAL 10 MINUTE AS wend, event_type, count(*) AS cnt
FROM (
  SELECT event_type,
         unnest([time_bucket(INTERVAL '5 minutes', ts),
                 time_bucket(INTERVAL '5 minutes', ts) - INTERVAL 5 MINUTE]) AS wstart
  FROM events
)
GROUP BY 1, 2, 3
""".strip(),
    tags=("streaming",),
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 (each event in exactly two)."""
    return sliding_counts(table(spark, sf_dir, "events"))


@register(
    "stream_session",
    oracle="""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events
FROM sess
GROUP BY user_id, sid
""".strip(),
    tags=("streaming", "session"),
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap session windows per user.  The oracle reconstructs
    Spark's session semantics via gaps-and-islands SQL (new session when
    gap > 30 min; end = last event + gap)."""
    return session_windows(table(spark, sf_dir, "events"))


@register(
    "stream_dedup",
    oracle="""
SELECT event_id, min(ts) AS first_ts, count(*) AS n_copies
FROM events
GROUP BY event_id
""".strip(),
    tags=("streaming", "dedup"),
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once by event_id (deterministic batch form; streaming
    form = withWatermark + dropDuplicates, exercised in tests)."""
    return dedup_events(table(spark, sf_dir, "events"))


@register(
    "stream_watermark_late",
    oracle=None,  # real streaming run — behavioral, rows-only by contract
    tags=("streaming", "watermark"),
)
def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming run: 4 time-ordered micro-batches,
    10-minute watermark, append-mode tumbling counts.  Late rows beyond
    the watermark are dropped and the final in-flight windows stay in
    state (append emits only finalized windows) — so the result is a
    strict subset of the batch aggregate; tests assert both properties."""
    events = table(spark, sf_dir, "events")
    return run_file_stream(
        spark,
        events,
        tumbling_counts,
        watermark=("ts", "10 minutes"),
        output_mode="append",
        n_batches=4,
    )


@register(
    "stream_stateful_running_total",
    oracle="""
SELECT user_id,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM events
GROUP BY user_id
""".strip(),
    tags=("streaming", "stateful"),
    bench=True,
)
def stream_stateful_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom per-key stateful operator (applyInPandasWithState) run on
    the REAL streaming path: events replayed in time-ordered
    micro-batches, per-user (count, cents) state updated incrementally.
    The final state per user is batching-invariant — integer-cent
    accumulation — so the full stream run is hash-checked against the
    batch oracle, unlike typical stateful ops that settle for rows-only."""
    from pyspark.sql import functions as F

    from mapreduce_framework_spark.streaming.stateful import running_totals

    # Stage only the columns the stateful operator reads: the replay
    # writes + rescans the source once per micro-batch, so the wide
    # `props` string would be range-sorted and re-read 4× for nothing
    # (measured 2× the whole query at sf0.1).  Safe here because the
    # integer-cent state is batching-invariant; transforms whose output
    # depends on batch assignment (watermark drops) must keep the full
    # row so the tie-break ordering is unchanged.
    ev = table(spark, sf_dir, "events").select("ts", "user_id", "value")
    updates = run_file_stream(spark, ev, running_totals, output_mode="update")
    final = (
        updates.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_cents")).alias("s"))
        .select("user_id", F.col("s.n_events").alias("n_events"), F.col("s.total_cents").alias("total_cents"))
    )
    return final


@register(
    "stream_interval_join",
    oracle="""
SELECT c.event_id AS click_id,
       p.event_id AS purchase_id,
       c.user_id,
       c.ts AS click_ts,
       p.ts AS purchase_ts
FROM events c
JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click'
 AND p.event_type = 'purchase'
 AND p.ts >= c.ts
 AND p.ts < c.ts + INTERVAL 10 MINUTE
""".strip(),
    tags=("streaming", "join"),
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase attribution within 10 minutes (batch-equivalence
    mode; tests replay the identical transform as a true stream-stream
    join with watermark-bounded state)."""
    from mapreduce_framework_spark.streaming.transforms import (
        click_purchase_interval_join,
    )

    return click_purchase_interval_join(table(spark, sf_dir, "events"))
