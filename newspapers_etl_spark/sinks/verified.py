"""Verified partitioned sink (SURVEY.md §2.1 S4-S5).

The reference uploads each file into a title/date folder hierarchy
(get_or_create_drive_folder ×2, reference src/01-scrape-images.py:441-452,
layout contract README.md:94-106) and verifies every upload by comparing
the server-side md5Checksum against a locally recomputed digest
(src/01-scrape-images.py:98-132, compute_md5 :78-83).

Spark-first re-expression:
- The folder hierarchy IS Hive partitioning: ``partitionBy(cols)`` —
  directory creation, atomic task commit, and retry-safe staging renames
  all come from Spark's commit protocol; no get-or-create code.
- Per-file md5 verification becomes a POST-WRITE AUDIT: an
  order-insensitive content digest per partition computed on the source
  and on the read-back, compared as relations.  The digest (sorted
  per-row md5s re-hashed) is associative-safe: any row order in either
  engine or any partition file layout yields the same value.

Scale design: the audit aggregates to one row per partition before the
compare join, so verification shuffles |partitions| rows, not |rows|;
digesting is a map-side expression over the already-read rows.  Skewed
partitions (one giant title — §4's 'Dagens Nyheter' case) are bounded by
AQE skew splitting during the digest agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.registry import query


def partition_manifest(
    df: DataFrame, partition_cols: list[str], content_col: str
) -> DataFrame:
    """Audit manifest: one row per partition with row count and an
    order-insensitive combined content digest (md5 of the sorted
    per-row md5s).  This is the relation the reference's per-upload
    md5Checksum comparison becomes at dataset grain."""
    row_md5 = F.md5(F.col(content_col))
    return df.groupBy(*partition_cols).agg(
        F.count("*").alias("n_docs"),
        F.md5(F.concat_ws("", F.sort_array(F.collect_list(row_md5)))).alias(
            "combined_digest"
        ),
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    sort_cols: list[str] | None = None,
) -> None:
    """Hive-partitioned parquet write — the title/date folder fan-out of
    src/01-scrape-images.py:441-452 as one declarative sink.

    ``sort_cols`` sorts WITHIN each write task before encoding
    (sortWithinPartitions — no global shuffle): clustered values compress
    better and give parquet row-group min/max statistics real selectivity,
    so later range predicates skip row groups, not just directories."""
    if sort_cols:
        df = df.sortWithinPartitions(*sort_cols)
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def verify_partitioned_write(
    spark: SparkSession,
    src: DataFrame,
    path: str,
    partition_cols: list[str],
    content_col: str,
) -> DataFrame:
    """Post-write audit (the S4 verify + the declared-but-unimplemented
    verify-month op, reference .github/workflows/main.yml:23): join the
    source manifest against the sink's read-back manifest per partition
    and flag count or digest mismatches.  Empty result = verified."""
    expected = partition_manifest(src, partition_cols, content_col).select(
        *partition_cols,
        F.col("n_docs").alias("n_expected"),
        F.col("combined_digest").alias("expected_digest"),
    )
    actual = partition_manifest(
        spark.read.parquet(path), partition_cols, content_col
    ).select(
        *partition_cols,
        F.col("n_docs").alias("n_actual"),
        F.col("combined_digest").alias("actual_digest"),
    )
    return (
        expected.join(actual, partition_cols, "full_outer")
        .filter(
            (F.col("n_expected").eqNullSafe(F.col("n_actual")) == False)  # noqa: E712
            | (F.col("expected_digest").eqNullSafe(F.col("actual_digest")) == False)  # noqa: E712
        )
    )


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
) -> None:
    """Small-file compaction: rewrite each Hive partition into at most
    ``files_per_partition`` files.  Streaming/incremental sinks accrete
    one file per micro-batch per partition; at 100 TB that's millions of
    tiny files — listing cost alone dominates reads.

    Spark refuses to overwrite a path it is reading (correctly — the
    scan is lazy), so the rewrite lands in a sibling staging dir and is
    swapped in whole: write-aside + rename, the same staging-then-commit
    shape as Spark's own job-commit protocol.  The shuffle key is
    (partition_cols, hash-bucket) so each output partition spreads over
    at most ``files_per_partition`` write tasks.

    The bucket hashes every DATA COLUMN of the row — a deterministic
    row attribute — never monotonically_increasing_id(): a
    nondeterministic repartition expression routes rows differently
    when a task retries, which is the classic round-robin-repartition
    lost/duplicated-rows hazard.  Caveat: the two shutil.move renames
    are local-FS only and leave a short window where ``path`` is
    absent; on an object store, swap via a catalog pointer (or table
    format) instead."""
    import shutil

    df = spark.read.parquet(path)
    parts = [F.col(c) for c in partition_cols]
    data_cols = [c for c in df.columns if c not in partition_cols]
    bucket = F.pmod(
        F.xxhash64(*[F.col(c) for c in data_cols]),
        F.lit(files_per_partition),
    )
    staging = path.rstrip("/") + ".compacting"
    (
        df.repartition(*parts, bucket.alias("_b"))
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(staging)
    )
    old = path.rstrip("/") + ".pre_compact"
    shutil.move(path, old)
    shutil.move(staging, path)
    shutil.rmtree(old)


# ---------------------------------------------------------------------------
# Registered audit query (oracle-checked): the manifest itself
# ---------------------------------------------------------------------------

MANIFEST_ORACLE = """
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       md5(string_agg(md5(text), '' ORDER BY md5(text))) AS combined_digest
FROM documents
GROUP BY lang, source
"""


@query("sink_manifest", oracle=MANIFEST_ORACLE)
def sink_partition_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit manifest over documents partitioned by (lang, source) —
    the exact relation both sides of verify_partitioned_write compute."""
    d = load_table(spark, sf_dir, "documents")
    return partition_manifest(d, ["lang", "source"], "text")
