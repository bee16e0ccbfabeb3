"""Event-time windowing over the ``events`` stream table (SURVEY.md §2.7
St5, F16).

The reference's temporal unit is the day partition its workflow loop
iterates (reference .github/workflows/main.yml:77-95); these queries
generalize that to proper event-time windows — tumbling, sliding
(hopping), and session — plus the nested-JSON ``props`` traversal (F16,
mirroring the manifest JSON access at reference
src/01-scrape-images.py:332-343).

Batch and streaming share these shapes: the same ``F.window`` /
``F.session_window`` aggregations run under Structured Streaming with a
watermark (see ``newspapers_etl_spark/streaming/``); here they execute
as batch group-bys so the DuckDB oracle can check values exactly.

Scale design:
- Window grouping shuffles on (window, key) — fully partial-aggregable,
  so the map side collapses each partition to one row per bucket before
  the exchange.
- Sliding windows multiply rows by length/slide (here 2×) BEFORE the
  partial agg; the expansion never hits the shuffle at full width.
- Session windows shuffle on the session key (user) once; Spark merges
  per-key sorted runs, so skew is bounded by the hottest user's event
  count, and AQE splits oversized partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.operators.sessions_shared import (
    SESSION_GAP,
    SESSION_ORACLE,
)
from newspapers_etl_spark.registry import query

# ---------------------------------------------------------------------------
# Tumbling window (St5): 1-hour buckets per event type
# ---------------------------------------------------------------------------

TUMBLING_ORACLE = """
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2)     AS total_value
FROM events
GROUP BY 1, 2
"""


@query("evtmb", oracle=TUMBLING_ORACLE)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour count/sum per event type.  `window()` is
    epoch-aligned, matching DuckDB's time_bucket origin for sub-day
    intervals."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Sliding / hopping window (St5): 1-hour length, 30-minute slide
# ---------------------------------------------------------------------------

# Every event falls in exactly 2 windows: starts floor30(ts) and
# floor30(ts)-30min — both trivially satisfy start <= ts < start+1h,
# so the oracle needs no range filter.  max(value) is order-independent
# (exact double compare); sum is rounded to 2 so cross-engine
# accumulation-order drift (~1e-10) can't straddle a rounding boundary.
SLIDING_ORACLE = """
SELECT time_bucket(INTERVAL 30 MINUTE, ts) - k * INTERVAL 30 MINUTE AS window_start,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2)     AS total_value,
       max(value)               AS max_value
FROM events, unnest([0, 1]) AS t(k)
GROUP BY 1
"""


@query("evsld", oracle=SLIDING_ORACLE)
def events_sliding_hourly_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping window: 1-hour windows every 30 minutes.  Spark expands
    each row into length/slide = 2 window assignments map-side, then
    partial-aggregates before the shuffle."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "total_value",
            "max_value",
        )
    )


# ---------------------------------------------------------------------------
# Session window (St5): per-user activity sessions, 3-hour inactivity gap
# ---------------------------------------------------------------------------

# SESSION_ORACLE comes from sessions_shared (shared with the
# streaming twin, stream_sessions — see that module's docstring).


@query("evses", oracle=SESSION_ORACLE)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a {gap} inactivity gap — the
    native `session_window` operator; the oracle rebuilds it as
    gaps-and-islands to prove the merge semantics match."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", SESSION_GAP).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Nested-JSON props traversal (F16)
# ---------------------------------------------------------------------------

PROPS_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT)                         AS n_events,
       CAST(sum(CASE WHEN CAST(props->>'$.k' AS INTEGER) > 50
                     THEN 1 ELSE 0 END) AS BIGINT)      AS n_high_k,
       round(avg(CAST(props->>'$.k' AS INTEGER)), 4)    AS avg_k,
       CAST(max(CAST(props->>'$.k' AS INTEGER)) AS INTEGER) AS max_k
FROM events
GROUP BY event_type
"""


@query("evjs", oracle=PROPS_ORACLE)
def events_props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`from_json` with a DECLARED schema over the props column (never
    schema inference — at 100 TB that is a full extra pass), then plain
    aggregation on the extracted field.  Mirrors the reference's typed
    access into manifest JSON (src/01-scrape-images.py:332-343)."""
    e = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k INT").getField("k")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("k") > 50, 1).otherwise(0)).alias("n_high_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# Funnel analysis: strictly-ordered step conversion per user
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")

FUNNEL_ORACLE = """
WITH w1 AS (
  SELECT user_id, ts, event_type,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t1
  FROM events
),
w2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
              OVER (PARTITION BY user_id) AS t2
  FROM w1
),
w3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
              OVER (PARTITION BY user_id) AS t3
  FROM w2
)
SELECT 1 AS step, 'view' AS step_name,
       CAST(count(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END) AS BIGINT) AS n_users
FROM w3
UNION ALL
SELECT 2, 'view>click',
       CAST(count(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END) AS BIGINT)
FROM w3
UNION ALL
SELECT 3, 'view>click>purchase',
       CAST(count(DISTINCT CASE WHEN t3 IS NOT NULL THEN user_id END) AS BIGINT)
FROM w3
"""


@query("evfnl", oracle=FUNNEL_ORACLE)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel conversion (view → click → purchase):
    a user converts step N only with an event AFTER their first
    step-N-1 event — the sequence-matching analytics op the reference's
    serial day loop has no analog for.  The three conditional minima
    are STACKED window projections over the SAME partitioning spec
    (user), so Catalyst plans ONE exchange + one sort shared by all
    three Window operators — never one shuffle per step; the final
    rollup is a single aggregate of conditional distinct counts.  All
    outputs are integers, so the oracle compare is exact.  At 100 TB
    the shuffle carries (user, ts, type) only; per-user state is the
    hottest user's event run, same bound as the session windows
    above."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    s1, s2, s3 = FUNNEL_STEPS
    staged = (
        e.select("user_id", "ts", "event_type")
        .withColumn(
            "t1", F.min(F.when(F.col("event_type") == s1, F.col("ts"))).over(w)
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == s2) & (F.col("ts") > F.col("t1")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == s3) & (F.col("ts") > F.col("t2")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    counts = staged.agg(
        *[
            F.count_distinct(
                F.when(F.col(t).isNotNull(), F.col("user_id"))
            ).alias(n)
            for t, n in (("t1", "n1"), ("t2", "n2"), ("t3", "n3"))
        ]
    )
    return counts.selectExpr(
        "stack(3, 1, 'view', n1, 2, 'view>click', n2, "
        "3, 'view>click>purchase', n3) AS (step, step_name, n_users)"
    )


# ---------------------------------------------------------------------------
# Cohort retention: first-activity cohorts × day offsets
# ---------------------------------------------------------------------------

RETENTION_ORACLE = """
WITH activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
cohort AS (
  SELECT user_id, min(d) AS cohort_day FROM activity GROUP BY user_id
),
sizes AS (
  SELECT cohort_day, count(*) AS cohort_size FROM cohort GROUP BY cohort_day
),
joined AS (
  SELECT c.cohort_day, CAST(a.d - c.cohort_day AS INT) AS day_offset
  FROM activity a JOIN cohort c USING (user_id)
)
SELECT j.cohort_day,
       j.day_offset,
       CAST(count(*) AS BIGINT) AS n_active,
       round(count(*) * 1.0 / s.cohort_size, 4) AS retention
FROM joined j JOIN sizes s USING (cohort_day)
GROUP BY j.cohort_day, j.day_offset, s.cohort_size
"""


@query("evret", oracle=RETENTION_ORACLE)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix over the event stream: users are cohorted
    by their first active day, and each (cohort_day, day_offset) cell
    counts how many of them were active again ``offset`` days later,
    with the retained fraction.  This is the day-grain generalization of
    the reference's month-verify accounting (reference
    .github/workflows/main.yml:23: did every expected day actually
    happen?) applied to users instead of partitions — and the standard
    engagement query any event warehouse must answer.

    Scale shape: two aggregations and one join, ALL keyed on user_id
    until the final cell rollup — the distinct, the per-user min, and
    the activity⋈cohort join share one hash partitioning, so Catalyst
    plans a single user_id exchange feeding all three (no re-shuffle
    between them); the final groupBy re-keys on the (cohort, offset)
    cell, whose cardinality is bounded by days² regardless of corpus
    size.  Cohort sizes are a days-sized relation, hence broadcast to
    the cells rather than shuffled."""
    e = load_table(spark, sf_dir, "events")
    activity = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    sizes = cohort.groupBy("cohort_day").agg(F.count("*").alias("cohort_size"))
    cells = (
        activity.join(cohort, "user_id")
        .select(
            "cohort_day", F.datediff("d", "cohort_day").alias("day_offset")
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_active"))
    )
    return cells.join(F.broadcast(sizes), "cohort_day").select(
        "cohort_day",
        "day_offset",
        "n_active",
        F.round(F.col("n_active") / F.col("cohort_size"), 4).alias("retention"),
    )
