"""Custom Data Source tests (SURVEY.md §2.1 S1): the archive connector
serves deterministic rows, one scan partition per day, and date
predicates prune partitions AT THE SOURCE (the reference's
server-side-filter semantics, src/01-scrape-images.py:487-491)."""

from __future__ import annotations

from datetime import date

import pytest

from pyspark.sql import functions as F

from newspapers_etl_spark.sources.archive_source import SOURCE_NAME, register


@pytest.fixture(scope="module")
def archive(spark):
    register(spark)
    return spark.read.format(SOURCE_NAME).option("start", "1994-01-01").option(
        "end", "1994-01-31"
    ).option("papers", 3)


@pytest.mark.heavy
def test_reads_one_row_per_paper_per_day(archive):
    df = archive.load()
    assert df.count() == 31 * 3
    days = df.select("issue_date").distinct().count()
    assert days == 31
    assert df.filter(F.col("n_pages").between(4, 31)).count() == 31 * 3


def test_deterministic_across_reads(archive):
    a = sorted(map(tuple, archive.load().collect()))
    b = sorted(map(tuple, archive.load().collect()))
    assert a == b


def test_date_predicate_prunes_partitions_at_source(archive):
    full = archive.load()
    assert full.rdd.getNumPartitions() == 31
    week = full.filter(
        (F.col("issue_date") >= F.lit(date(1994, 1, 10)))
        & (F.col("issue_date") <= F.lit(date(1994, 1, 16)))
    )
    # pushdown narrowed the planned day range: 7 partitions, not 31
    assert week.rdd.getNumPartitions() == 7
    assert week.count() == 7 * 3
    assert week.select(F.min("issue_date"), F.max("issue_date")).first() == (
        date(1994, 1, 10),
        date(1994, 1, 16),
    )


def test_fully_pruned_range_returns_empty(archive):
    none = archive.load().filter(F.col("issue_date") > F.lit(date(1999, 1, 1)))
    assert none.count() == 0


def test_streaming_day_loop_delivers_one_day_per_batch(spark, tmp_path):
    """The streaming face of the connector: day-granular offsets, one
    micro-batch per day, engine-checkpointed — the reference's workflow
    loop with scraper_state.json replaced by the offset log."""
    register(spark)
    stream = (
        spark.readStream.format(SOURCE_NAME)
        .option("start", "1994-02-01")
        .option("end", "1994-02-07")
        .option("papers", 2)
        .load()
    )
    batches: list[tuple[int, int]] = []

    def sink(batch_df, batch_id):
        batches.append((batch_id, batch_df.count()))

    # A simple stream reader prefetches one batch per trigger, so
    # availableNow would stop after a single day; run the query and stop
    # once the whole range has been delivered.
    import time

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if sum(n for _, n in batches) >= 7 * 2:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    delivered = [n for _, n in batches if n > 0]
    assert sum(delivered) == 7 * 2
    assert all(n == 2 for n in delivered), f"not day-granular: {batches}"
