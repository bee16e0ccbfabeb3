"""Event-stream analytics beyond windowed aggregation: volume anomaly
detection and inter-arrival (gap) statistics.

No reference counterpart — the reference's workflow runs a fixed
day-loop with no monitoring (reference .github/workflows/main.yml:
61-96); the first thing an operator of that pipeline asks at scale is
"which hour's volume is off" and "how bursty is each source".  Both
queries are the standard formulations:

* `events_anomaly` — hourly event counts per type, z-scored against
  that type's own hourly distribution; windows with |z| >= 2 surface.
* `events_gaps` — per-user inter-arrival statistics via an ordered
  window `lag`, the burstiness / liveness profile.

Determinism across engines: both queries avoid floating accumulation
entirely until the last expression — the z-score's mean and variance
come from EXACT integer sums (sum n, sum n^2 over bigint counts), and
gap averages divide an exact microsecond sum — so Spark and the oracle
compute bit-identical doubles and the threshold filter can never
disagree on a borderline row.

Scale design: `events_anomaly` shuffles once to the (type, hour)
grain — partial-aggregated map-side, output is O(types x hours) —
then broadcasts the per-type stats (O(types) rows) back; no second
fact scan, no window over the raw stream.  `events_gaps` is the one
genuinely per-user-ordered computation, and it shuffles the minimal
projection (user_id, ts, event_id): at 100 TB the sort runs inside
each user partition (Spark sorts within partitions after hashing, no
global sort), and heavy users are bounded by the retention horizon,
not the corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.registry import query

Z_THRESHOLD = 2.0

ANOMALY_ORACLE = f"""
WITH hourly AS (
  SELECT event_type,
         time_bucket(INTERVAL 1 HOUR, ts) AS hour_start,
         CAST(count(*) AS BIGINT)         AS n_events
  FROM events
  GROUP BY 1, 2
),
stats AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT)          AS n_hours,
         CAST(sum(n_events) AS BIGINT)     AS sum_n,
         CAST(sum(n_events * n_events) AS BIGINT) AS sum_n2
  FROM hourly
  GROUP BY event_type
),
scored AS (
  SELECT h.event_type, h.hour_start, h.n_events,
         round((h.n_events - CAST(s.sum_n AS DOUBLE) / s.n_hours)
               / sqrt((s.sum_n2 - CAST(s.sum_n AS DOUBLE) * s.sum_n / s.n_hours)
                      / (s.n_hours - 1)), 4) AS z
  FROM hourly h JOIN stats s USING (event_type)
  WHERE s.n_hours > 1
    AND (s.sum_n2 - CAST(s.sum_n AS DOUBLE) * s.sum_n / s.n_hours) > 0
)
SELECT event_type, hour_start, n_events, z
FROM scored
WHERE abs(z) >= {Z_THRESHOLD}
"""


@query("evanm", oracle=ANOMALY_ORACLE)
def events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly volume z-score per event type; emit the |z| >= 2 windows.
    Variance uses the sum/sum-of-squares identity over exact integer
    sums, so the score is bit-deterministic and the threshold filter
    cannot flip across engines."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select("event_type", F.col("w.start").alias("hour_start"), "n_events")
    )
    stats = hourly.groupBy("event_type").agg(
        F.count("*").alias("n_hours"),
        F.sum("n_events").alias("sum_n"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("sum_n2"),
    )
    mean = F.col("sum_n").cast("double") / F.col("n_hours")
    var_num = F.col("sum_n2") - F.col("sum_n").cast("double") * F.col("sum_n") / F.col("n_hours")
    z = F.round(
        (F.col("n_events") - mean) / F.sqrt(var_num / (F.col("n_hours") - 1)), 4
    )
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .filter((F.col("n_hours") > 1) & (var_num > 0))
        .select("event_type", "hour_start", "n_events", z.alias("z"))
        .filter(F.abs(F.col("z")) >= Z_THRESHOLD)
    )


GAPS_ORACLE = """
WITH g AS (
  SELECT user_id,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS gap_us
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       round(CAST(sum(gap_us) AS DOUBLE) / count(gap_us) / 1e6, 6) AS avg_gap_s,
       CAST(max(gap_us) AS BIGINT) AS max_gap_us,
       CAST(min(gap_us) AS BIGINT) AS min_gap_us
FROM g
GROUP BY user_id
"""


@query("evgap", oracle=GAPS_ORACLE)
def events_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival profile: event count, mean gap (seconds,
    from an exact microsecond sum), min/max gap.  The tie-break on
    event_id makes the lag ordering total, so simultaneous events
    can't reorder between engines."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = e.select(
        "user_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
    )
    return gaps.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(
            F.sum("gap_us").cast("double") / F.count("gap_us") / F.lit(1e6), 6
        ).alias("avg_gap_s"),
        F.max("gap_us").alias("max_gap_us"),
        F.min("gap_us").alias("min_gap_us"),
    )


# ---------------------------------------------------------------------------
# IQR outlier detection on the value column, per event type
# ---------------------------------------------------------------------------

OUTLIERS_ORACLE = """
WITH stats AS (
  SELECT event_type,
         quantile_cont(value, 0.25) AS q1,
         quantile_cont(value, 0.75) AS q3
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (
         WHERE e.value < s.q1 - 1.5 * (s.q3 - s.q1)
            OR e.value > s.q3 + 1.5 * (s.q3 - s.q1)
       ) AS BIGINT) AS n_outliers,
       round(s.q1 - 1.5 * (s.q3 - s.q1), 4) AS lo_bound,
       round(s.q3 + 1.5 * (s.q3 - s.q1), 4) AS hi_bound
FROM events e JOIN stats s USING (event_type)
GROUP BY e.event_type, s.q1, s.q3
"""


@query("evout", oracle=OUTLIERS_ORACLE)
def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier accounting per event type: exact
    linearly-interpolated quartiles (bit-identical to DuckDB's
    quantile_cont — proven by agg_pctl), fences at 1.5×IQR, outlier
    counts against the raw stream.  Same two-phase shape as ev_anom:
    the per-type quartiles are an O(types)-row broadcast joined back
    onto the one fact scan; exact percentile state at the type grain
    is bounded by per-type cardinality, the scale cost is the sort
    inside each type partition (t-digest `tdigest` is the sketch
    path when even that is too much)."""
    e = load_table(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
    )
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    return (
        e.join(F.broadcast(stats), "event_type")
        .groupBy("event_type", "q1", "q3")
        .agg(
            F.count("*").alias("n_events"),
            F.count(
                F.when((F.col("value") < lo) | (F.col("value") > hi), 1)
            ).alias("n_outliers"),
        )
        .select(
            "event_type",
            "n_events",
            "n_outliers",
            F.round(lo, 4).alias("lo_bound"),
            F.round(hi, 4).alias("hi_bound"),
        )
    )
