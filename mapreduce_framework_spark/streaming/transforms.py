"""Batch/stream-agnostic event transforms.

Each takes a DataFrame with the `events` schema (ts timestamp, user_id,
event_type, event_id, value, props) and returns an aggregate.  The same
function runs under ``spark.read`` (oracle-checkable) and
``spark.readStream`` (incremental, stateful).

State-size posture at scale: tumbling/sliding windows keep one row per
(window × type) — bounded by watermark eviction; session windows keep
one open session per active user; dedup keeps ids within the watermark
horizon only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(df: DataFrame) -> DataFrame:
    """Events per 5-minute tumbling window per type."""
    w = F.window("ts", "5 minutes")
    return (
        df.groupBy(w, "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("window.start").alias("wstart"),
            F.col("window.end").alias("wend"),
            "event_type",
            "cnt",
        )
    )


def sliding_counts(df: DataFrame) -> DataFrame:
    """Sliding 10-minute windows every 5 minutes (each event lands in
    exactly two windows)."""
    w = F.window("ts", "10 minutes", "5 minutes")
    return (
        df.groupBy(w, "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("window.start").alias("wstart"),
            F.col("window.end").alias("wend"),
            "event_type",
            "cnt",
        )
    )


def session_windows(df: DataFrame) -> DataFrame:
    """Per-user sessions with a 30-minute inactivity gap.  Session end =
    last event + gap (Spark session_window semantics)."""
    return (
        df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_events(df: DataFrame) -> DataFrame:
    """Exactly-once by event_id.  Batch form is a deterministic groupBy
    (first timestamp + copy count); the streaming form is
    ``withWatermark + dropDuplicates`` — see runner usage in tests."""
    return df.groupBy("event_id").agg(
        F.min("ts").alias("first_ts"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def click_purchase_interval_join(df: DataFrame) -> DataFrame:
    """Stream-stream (self-)join: each click paired with the same
    user's purchases in the following 10 minutes.  In streaming mode
    both branches inherit the source watermark, which bounds join
    state: a buffered click can be dropped once the watermark passes
    click_ts + 10 min (inner joins emit matches immediately, so the
    batch replay is exactly equal).  At 100 TB the join state is the
    watermark-horizon slice of both streams, not their history."""
    clicks = df.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    )
    purchases = df.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("purchase_user"),
        F.col("ts").alias("purchase_ts"),
    )
    return (
        clicks.join(
            purchases,
            (F.col("click_user") == F.col("purchase_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") < F.col("click_ts") + F.expr("INTERVAL 10 MINUTES")),
        )
        .select(
            "click_id",
            "purchase_id",
            F.col("click_user").alias("user_id"),
            "click_ts",
            "purchase_ts",
        )
    )
