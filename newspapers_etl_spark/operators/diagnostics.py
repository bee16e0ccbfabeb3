"""Data-distribution diagnostics: the queries you run BEFORE picking a
partitioning strategy.

The reference never profiles its key distribution — it serially fetches
whatever the archive returns and hits the hot-title problem implicitly
(one newspaper dominates the scrape, reference
src/01-scrape-images.py:497-515).  At cluster scale that blindness is a
stuck reducer: the skew remedies in functions/skew.py (salted agg,
salted broadcast join) and AQE skew-join all need to know WHICH keys
are hot and HOW hot before they're worth their overhead.

Scale design: the per-key count is a partial-aggregable groupBy — the
map side collapses every partition's slice of a hot key to one row, so
the profile itself is immune to the skew it measures; the top-k is
TakeOrderedAndProject (no global sort).  The grand total is declared
over the same count relation; physically Spark executes it as a second
single-column scan + partial count (Catalyst's exchange reuse does not
fire across the TakeOrdered/aggregate consumer split — verified
empirically), which is the right trade anyway: both branches scan ONLY
the key column, and the alternative — an unpartitioned window over the
counts — would pull every distinct key through one task.  The 1-row
total then joins back as a broadcast."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.registry import query

SKEW_TOP_K = 10

SKEW_ORACLE = f"""
WITH counts AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
),
tot AS (SELECT CAST(sum(n_events) AS BIGINT) AS t FROM counts),
ranked AS (
  SELECT user_id, n_events,
         CAST(row_number() OVER (ORDER BY n_events DESC, user_id) AS INT) AS rnk
  FROM counts
)
SELECT rnk, user_id, n_events,
       round(CAST(n_events AS DOUBLE) * 100 / t, 4) AS share_pct
FROM ranked, tot
WHERE rnk <= {SKEW_TOP_K}
"""


@query("skew", oracle=SKEW_ORACLE)
def skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter profile of the events key: the {SKEW_TOP_K} hottest
    user_ids with their absolute and percentage share.  A share_pct in
    the tens means salt that key (functions/skew.py) or lean on AQE
    skew-join; fractions of a percent mean plain hash partitioning is
    fine.  Deterministic tie-break on user_id keeps the profile
    hash-checkable."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id").agg(F.count("*").alias("n_events"))
    total = counts.agg(F.sum("n_events").alias("t"))
    order = [F.desc("n_events"), F.asc("user_id")]
    # orderBy+limit plans as TakeOrderedAndProject (per-partition top-k,
    # k-row merge on the driver) — no global sort; the unpartitioned
    # row_number window then runs over only the k surviving rows.
    topk = counts.orderBy(*order).limit(SKEW_TOP_K)
    ranked = topk.withColumn("rnk", F.row_number().over(Window.orderBy(*order)))
    return ranked.join(F.broadcast(total)).select(
        "rnk",
        "user_id",
        "n_events",
        F.round(F.col("n_events").cast("double") * 100 / F.col("t"), 4).alias(
            "share_pct"
        ),
    )
