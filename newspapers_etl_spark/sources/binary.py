"""Binary-file source (SURVEY.md §2.1 S3).

The reference streams each image over HTTP in 8 KiB chunks with skip-if-
exists and per-file retry (reference src/01-scrape-images.py:353-385).
Spark-side, ingestion of already-landed binaries is the ``binaryFile``
DataSource — path/modificationTime/length/content columns, split-proof
(one file = one row), with glob pushdown so only matching files are ever
listed.  Task retry replaces the hand-rolled retry loop; idempotency is
the sink's anti-join (operators/incremental.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """binaryFile read with optional pathGlobFilter (e.g. '*.jp2').
    At 100 TB, pair with a partitioned directory layout so partition
    pruning bounds the listing, and keep maxPartitionBytes sized to the
    largest single object."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def with_binary_metadata(df: DataFrame) -> DataFrame:
    """Typed metadata over a binaryFile read: filename, byte length, md5
    audit digest (S4's verify, src/01-scrape-images.py:78-83) — all
    built-in expressions over the content column."""
    return df.select(
        F.element_at(F.split("path", "/"), -1).alias("filename"),
        F.col("length").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
        "modificationTime",
        "content",
    )
