"""Window functions (SURVEY.md §2b) — the natural extension of the
reference's per-key processing (each reducer sees one key-partition,
reduce.py:2-17) to ordered per-key computation.

Scale notes: a window = one shuffle on partitionBy keys + in-partition
sort.  Partition keys here are high-cardinality (custkey/suppkey) so no
single partition explodes; every ORDER BY carries a unique tie-break
column so results are deterministic, not just correct-modulo-ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_framework_spark.functions.numeric import dsum, dsum_sql
from mapreduce_framework_spark.io import table
from mapreduce_framework_spark.registry import register


@register(
    "window_rank",
    oracle="""
SELECT c_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
WHERE rn <= 3
""".strip(),
    tags=("window",),
    bench=True,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (row_number, tie-broken by
    orderkey for determinism)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "window_running",
    oracle=f"""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate ASC, o_orderkey ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_total
FROM orders
""".strip(),
    tags=("window",),
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer in order-date order (exact decimal
    accumulation → order-insensitive cross-engine)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


@register(
    "window_lag",
    oracle=f"""
WITH daily AS (
  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS ship_day,
         {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
  FROM lineitem
  GROUP BY l_suppkey, CAST(l_shipdate AS DATE)
)
SELECT l_suppkey, ship_day, revenue,
       lag(revenue) OVER (PARTITION BY l_suppkey ORDER BY ship_day) AS prev_revenue,
       revenue - lag(revenue) OVER (PARTITION BY l_suppkey ORDER BY ship_day)
         AS day_delta
FROM daily
""".strip(),
    tags=("window",),
)
def window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day revenue delta per supplier (lag over daily rollup;
    ship_day is unique within supplier so ordering is total)."""
    l = table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    daily = (
        l.groupBy("l_suppkey", F.col("l_shipdate").cast("date").alias("ship_day"))
        .agg(dsum(revenue, 4).alias("revenue"))
    )
    w = Window.partitionBy("l_suppkey").orderBy(F.asc("ship_day"))
    return daily.select(
        "l_suppkey",
        "ship_day",
        "revenue",
        F.lag("revenue").over(w).alias("prev_revenue"),
        (F.col("revenue") - F.lag("revenue").over(w)).alias("day_delta"),
    )


@register(
    "window_time_range",
    oracle="""
SELECT l_orderkey, l_linenumber, l_suppkey, l_shipdate,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER (
         PARTITION BY l_suppkey ORDER BY l_shipdate
         RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS trailing_7d_revenue
FROM lineitem
""".strip(),
    tags=("window", "range-frame"),
    bench=True,
)
def window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day revenue per supplier — a RANGE frame over event
    time, not a ROWS frame: the frame holds every row within 6 days
    regardless of row count.  Spark range frames need a numeric ORDER
    BY, so the timestamp is ordered as epoch seconds with the interval
    expressed in seconds — semantically identical to the oracle's
    INTERVAL frame at the fixture's date granularity."""
    from pyspark.sql import Window

    day = 86400
    # NTZ → timestamp → epoch seconds (exact with the session pinned to
    # UTC; NTZ cannot cast to a numeric directly).
    epoch = F.col("l_shipdate").cast("timestamp").cast("long")
    w = Window.partitionBy("l_suppkey").orderBy(epoch).rangeBetween(-6 * day, 0)
    l = table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        "l_shipdate",
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("trailing_7d_revenue"),
    )


@register(
    "window_distribution",
    oracle="""
SELECT o_custkey, o_orderkey,
       ntile(4) OVER w AS price_quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC)
""".strip(),
    tags=("window", "distribution"),
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile/percent_rank/cume_dist) per
    customer — the quantile-bucketing shape used for per-group score
    normalization.  Unique tie-break keeps ranks deterministic;
    round(6) guards the double division's last ulp."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).alias("price_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "window_first_last",
    oracle="""
SELECT o_custkey, o_orderkey,
       first_value(o_orderkey) OVER w AS cheapest_key,
       last_value(o_orderkey)  OVER w AS priciest_key,
       nth_value(o_orderkey, 2) OVER w AS second_cheapest_key
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""".strip(),
    tags=("window", "navigation"),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation window functions: per customer, the cheapest /
    priciest / second-cheapest order key attached to every row.  The
    frame is pinned to the WHOLE partition — last_value over the default
    frame (… AND CURRENT ROW) is the classic silent wrong answer, in
    both engines; unique tie-break keeps the navigation deterministic."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_totalprice"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("cheapest_key"),
        F.last("o_orderkey").over(w).alias("priciest_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_cheapest_key"),
    )


def sessionize_frame(e: DataFrame) -> DataFrame:
    """Per-user 30-minute-gap sessions from an (user_id, event_id, ts)
    frame — the reusable core of window_sessionize, shared with
    tools/scale_probe.py so the probe times the real operator."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull() | (F.col("ts").cast("long") - prev.cast("long") > 1800),
        1,
    ).otherwise(0)
    numbered = e.withColumn(
        "session_no",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias(
            "duration_s"
        ),
    )


@register(
    "window_sessionize",
    bench=True,
    oracle="""
WITH marked AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('second', lag(ts) OVER w, ts) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_no
  FROM marked
)
SELECT user_id,
       CAST(session_no AS BIGINT) AS session_no,
       count(*) AS n_events,
       min(ts) AS session_start,
       CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_s
FROM numbered
GROUP BY user_id, session_no
""".strip(),
    tags=("window", "session"),
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: per-user sessions cut at 30-minute
    inactivity gaps via lag + running sum of session starts — the
    batch twin of the streaming ``session_window`` query, and the
    classic two-window idiom every clickstream pipeline needs.

    Scale: both windows partition by ``user_id``, so session assembly
    parallelizes per user with ONE shuffle (the two windows and the
    final groupBy all share the user_id hash partitioning — Catalyst
    reuses the exchange).  Gap comparison and duration use
    second-truncated arithmetic (``date_diff('second')`` ≡ Spark's
    ``cast long``) because sub-second interval compares would disagree
    between engines on ns-precision timestamps."""
    e = table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    return sessionize_frame(e)


@register(
    "window_activity_streaks",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
isl AS (
  SELECT user_id, d,
         d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                  AS INTEGER) AS anchor
  FROM days
),
streaks AS (
  SELECT user_id, anchor, count(*) AS len
  FROM isl GROUP BY user_id, anchor
)
SELECT user_id,
       count(*) AS n_streaks,
       max(len) AS longest_streak_days,
       CAST(SUM(len) AS BIGINT) AS active_days
FROM streaks GROUP BY user_id
""".strip(),
    tags=("window", "islands"),
)
def window_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user consecutive-day activity streaks via
    the date-minus-row_number anchor trick — consecutive days share one
    anchor, so islands fall out of a plain groupBy with no self-join or
    recursive walk.  The engagement-streak shape (and the general
    contiguous-run detector: sequence gaps, sensor dropouts, retention
    runs).

    Scale: the distinct (user, day) frame is tiny relative to events;
    the window and both aggregates all share the user_id hash
    partitioning, so the event stream shuffles once and everything
    downstream is exchange-free."""
    d = (
        table(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    isl = d.select(
        "user_id",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("anchor"),
    )
    streaks = isl.groupBy("user_id", "anchor").agg(F.count(F.lit(1)).alias("len"))
    return streaks.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").alias("longest_streak_days"),
        F.sum("len").cast("bigint").alias("active_days"),
    )


@register(
    "window_cumulative_distinct",
    # Running COUNT(DISTINCT) has no direct window form in either
    # engine; both sides derive it from the first-occurrence flag —
    # rank 1 per (user, type) — summed cumulatively.
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS first_seen
  FROM events
)
SELECT user_id, event_id,
       CAST(SUM(first_seen) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS types_seen
FROM flagged
""".strip(),
    tags=("window", "distinct"),
)
def window_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct-count per user (how many distinct event types
    has this user produced up to and including each event) — the
    coverage-accumulation shape (features seen, endpoints exercised,
    vocab acquired).  Neither engine has COUNT(DISTINCT) OVER a running
    frame; the standard rewrite flags each (user, type)'s FIRST
    occurrence with one window and cumulatively sums the flags with a
    second — both windows share the user_id hash partitioning (the
    first adds event_type to the partition key, which hash-routes to
    the same exchange only when partitioned by the prefix; Spark plans
    one exchange per distinct partitioning, so this costs two
    user-keyed shuffles of the skinny (ids, type) projection).
    Deterministic via the unique (ts, event_id) ordering."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type")
    w1 = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.row_number().over(w1) == 1, 1).otherwise(0).alias("first_seen"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("first_seen").over(w2).cast("bigint").alias("types_seen"),
    )
