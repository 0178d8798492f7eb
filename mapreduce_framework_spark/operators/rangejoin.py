"""Bucketized range join: big-big interval joins without nested loops.

``join_theta_range`` broadcasts its tiny bucket table — right for a
small build side.  When BOTH sides are large (point stream × interval
table), a BroadcastNestedLoopJoin is O(n·m) and a disaster at scale.
Standard fix (cf. range-join optimizations in Databricks/Flink): quantize
time into fixed-width buckets, explode each interval into the buckets it
overlaps, equi-join on the bucket id (one hash shuffle), then re-apply
the exact predicate.  Cost: O(n + m·avg_buckets_per_interval) shuffle
rows, hash join instead of nested loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo: str,
    hi: str,
    bucket: str = "hour",
) -> DataFrame:
    """Join point rows to interval rows where lo <= ts < hi.

    Both inputs may be arbitrarily large; the only shuffle is the
    equi-join on the bucket id.  ``bucket`` is a date_trunc unit
    (minute/hour/day/...) and should approximate the median interval
    length (too small → interval explosion, too large → oversized probe
    buckets).
    """
    p = points.withColumn("_bucket", F.date_trunc(bucket, F.col(point_ts)))
    # Explode each interval into every bucket it overlaps.
    i = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.date_trunc(bucket, F.col(lo)),
                F.date_trunc(bucket, F.col(hi)),
                F.expr(f"INTERVAL 1 {bucket}"),
            )
        ),
    )
    return p.join(i, "_bucket").where(
        (F.col(point_ts) >= F.col(lo)) & (F.col(point_ts) < F.col(hi))
    ).drop("_bucket")
