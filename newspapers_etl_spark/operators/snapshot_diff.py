"""Snapshot diff / change-data-capture between two corpus versions.

The reference re-crawls a source and decides per file whether it
already exists before uploading (reference src/01-scrape-images.py:
141-149, 520-543) — an existence-only diff.  A corpus pipeline
promoting snapshot N+1 over N needs the full classification: which
documents were ADDED, which REMOVED, which CHANGED in content, and how
much survived UNCHANGED — per source, so a collapsing crawl or a
mass-rewrite shows up as a per-source anomaly before promotion.

The fixture ships one `documents` table, so the two snapshots are
derived deterministically from it (and the oracle derives the exact
same pair): the OLD snapshot drops `doc_id % 11 == 3` (those become
"added" in the new crawl) and upper-cases every 7th text (those read
as "changed" once the new crawl fixes them); the NEW snapshot drops
`doc_id % 13 == 5` ("removed").

Scale design: each side reduces to `(doc_id, source, md5(text))`
map-side BEFORE the full-outer join, so document text never enters an
exchange — the shuffle rows are ~50 bytes regardless of document
size.  At 100 TB both snapshots are written bucketed by doc_id
(`sinks/verified.py` layout), which turns the full-outer join into a
co-partitioned zip with no shuffle at all; the per-(source, class)
rollup is partial-aggregated to a handful of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.registry import query

CORPUS_DIFF_ORACLE = """
WITH old_snap AS (
  SELECT doc_id, source,
         md5(CASE WHEN doc_id % 7 = 0 THEN upper(text) ELSE text END) AS fp
  FROM documents WHERE doc_id % 11 != 3
),
new_snap AS (
  SELECT doc_id, source, md5(text) AS fp
  FROM documents WHERE doc_id % 13 != 5
),
diff AS (
  SELECT coalesce(o.source, n.source) AS source,
         CASE WHEN o.fp IS NULL THEN 'added'
              WHEN n.fp IS NULL THEN 'removed'
              WHEN o.fp != n.fp THEN 'changed'
              ELSE 'unchanged' END AS change
  FROM old_snap o FULL OUTER JOIN new_snap n USING (doc_id)
)
SELECT source, change, CAST(count(*) AS BIGINT) AS n_docs
FROM diff
GROUP BY source, change
"""


@query("snapdf", oracle=CORPUS_DIFF_ORACLE)
def corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify every document across two snapshot versions as
    added / removed / changed / unchanged and roll up per source.
    Content equality is fingerprint equality (md5 of the text),
    computed before the join so only 16-byte digests shuffle."""
    d = load_table(spark, sf_dir, "documents")
    old_text = F.when(F.col("doc_id") % 7 == 0, F.upper("text")).otherwise(
        F.col("text")
    )
    old = d.filter(F.col("doc_id") % 11 != 3).select(
        "doc_id",
        F.col("source").alias("source_old"),
        F.md5(old_text).alias("fp_old"),
    )
    new = d.filter(F.col("doc_id") % 13 != 5).select(
        "doc_id",
        F.col("source").alias("source_new"),
        F.md5("text").alias("fp_new"),
    )
    change = (
        F.when(F.col("fp_old").isNull(), "added")
        .when(F.col("fp_new").isNull(), "removed")
        .when(F.col("fp_old") != F.col("fp_new"), "changed")
        .otherwise("unchanged")
    )
    return (
        old.join(new, "doc_id", "full_outer")
        .select(
            F.coalesce("source_old", "source_new").alias("source"),
            change.alias("change"),
        )
        .groupBy("source", "change")
        .agg(F.count("*").alias("n_docs"))
    )
