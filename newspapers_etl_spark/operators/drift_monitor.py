"""Snapshot distribution-drift monitor (PSI) — the data-quality gate a
training pipeline runs BEFORE a corpus snapshot is allowed into a run.

No reference counterpart (the reference scrapes one snapshot and never
compares two — src/01-scrape-images.py); this is north-star territory
like operators/corpus.py: at 100 TB you never eyeball a new crawl, you
compare its feature distributions against the accepted snapshot and
alert on Population Stability Index.  PSI = Σ_bins (p−q)·ln(p/q) is the
industry-standard drift score (>0.2 ≈ investigate, >0.25 ≈ block).

Scale design:
- ONE scan of the corpus; each monitored feature is a map-side bucket
  expression followed by a conditional-count aggregation (partial
  aggregation combines map-side; the shuffle carries only
  features × buckets rows, never documents).
- Reference vs candidate membership is a map-side predicate (here:
  doc_id parity as the snapshot surrogate; production passes any
  predicate — a date column, a snapshot id).
- Per-feature totals are WINDOW sums over the (features × buckets)
  aggregate — never a self-join back onto the counts lineage, which
  would re-run the corpus scan (Spark recomputes unpersisted common
  subplans); the window's shuffle moves only the bounded counts
  relation.  Output is features × buckets rows (bounded, tiny).
- Laplace smoothing (+0.5 per bucket) keeps PSI finite on buckets one
  side never hit — deterministic and exactly mirrored in the oracle,
  no epsilon tuning.
- Buckets are FIXED-EDGE (width-60 bands for n_chars, the raw value
  for lang): fixed edges are what a production monitor uses (stable
  across snapshots, no quantile fit), and they keep the whole query
  exact arithmetic + one ln, hash-verifiable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.registry import query

N_CHAR_BIN_WIDTH = 60
N_CHAR_MAX_BIN = 9  # last bin is open-ended: [540, inf)

DRIFT_ORACLE = f"""
WITH b AS (
  SELECT CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS is_ref, f.feature,
         CASE f.feature
           WHEN 'n_chars' THEN coalesce(CAST(CAST(least(
             floor(n_chars / {N_CHAR_BIN_WIDTH}.0), {N_CHAR_MAX_BIN})
             AS BIGINT) AS VARCHAR), 'null')
           ELSE coalesce(lang, 'null')
         END AS bucket
  FROM documents
  CROSS JOIN (SELECT unnest(['n_chars', 'lang']) AS feature) f
),
counts AS (
  SELECT feature, bucket,
         CAST(sum(is_ref) AS BIGINT) AS ref_n,
         CAST(sum(1 - is_ref) AS BIGINT) AS cand_n
  FROM b GROUP BY feature, bucket
),
tot AS (
  SELECT feature, CAST(sum(ref_n) AS DOUBLE) AS ref_tot,
         CAST(sum(cand_n) AS DOUBLE) AS cand_tot,
         CAST(count(*) AS DOUBLE) AS n_buckets
  FROM counts GROUP BY feature
)
SELECT c.feature, c.bucket, c.ref_n, c.cand_n,
       round(((c.ref_n + 0.5) / (t.ref_tot + 0.5 * t.n_buckets)
              - (c.cand_n + 0.5) / (t.cand_tot + 0.5 * t.n_buckets))
             * ln(((c.ref_n + 0.5) / (t.ref_tot + 0.5 * t.n_buckets))
                  / ((c.cand_n + 0.5) / (t.cand_tot + 0.5 * t.n_buckets))),
             6) AS psi_part
FROM counts c JOIN tot t USING (feature)
"""


@query("drift", oracle=DRIFT_ORACLE)
def snapshot_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(feature, bucket) PSI contributions between the reference
    snapshot slice (even doc_id) and the candidate slice (odd doc_id):
    (feature, bucket, ref_n, cand_n, psi_part).  Σ psi_part per feature
    is the PSI the monitor alerts on; emitting the per-bucket terms
    keeps the output explainable (WHICH band moved) and the driver
    hash-checkable."""
    d = load_table(spark, sf_dir, "documents")
    is_ref = F.when((F.col("doc_id") % 2) == 0, 1).otherwise(0)
    n_chars_bucket = F.coalesce(
        F.least(
            F.floor(F.col("n_chars") / F.lit(float(N_CHAR_BIN_WIDTH))),
            F.lit(N_CHAR_MAX_BIN).cast("long"),
        ).cast("string"),
        F.lit("null"),
    )
    lang_bucket = F.coalesce(F.col("lang"), F.lit("null"))
    bucketed = d.select(
        is_ref.alias("is_ref"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("n_chars").alias("feature"),
                    n_chars_bucket.alias("bucket"),
                ),
                F.struct(
                    F.lit("lang").alias("feature"), lang_bucket.alias("bucket")
                ),
            )
        ).alias("fb"),
    ).select("is_ref", "fb.feature", "fb.bucket")
    counts = bucketed.groupBy("feature", "bucket").agg(
        F.sum("is_ref").cast("long").alias("ref_n"),
        F.sum(1 - F.col("is_ref")).cast("long").alias("cand_n"),
    )
    # Totals as window aggregates over the already-bounded counts
    # relation: a groupBy+join-back would make `counts` a shared
    # subplan and re-run the corpus scan (2 scans in the executed
    # plan); the window costs one bucket-grain exchange instead.
    w = Window.partitionBy("feature")
    counts = counts.select(
        "feature",
        "bucket",
        "ref_n",
        "cand_n",
        F.sum("ref_n").over(w).cast("double").alias("ref_tot"),
        F.sum("cand_n").over(w).cast("double").alias("cand_tot"),
        F.count("*").over(w).cast("double").alias("n_buckets"),
    )
    p = (F.col("ref_n") + 0.5) / (F.col("ref_tot") + 0.5 * F.col("n_buckets"))
    q = (F.col("cand_n") + 0.5) / (
        F.col("cand_tot") + 0.5 * F.col("n_buckets")
    )
    return counts.select(
        "feature",
        "bucket",
        "ref_n",
        "cand_n",
        F.round((p - q) * F.log(p / q), 6).alias("psi_part"),
    )
