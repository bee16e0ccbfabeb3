"""Incremental-append idempotency (SURVEY.md §5.2 item 3): the second
run of the same batch writes zero rows, and overlapping batches append
only the novel keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.operators.incremental import incremental_append


def test_second_run_is_noop(spark, sf_dir, tmp_path):
    target = str(tmp_path / "sink")
    batch = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    assert incremental_append(spark, batch, target, ["event_id"]) == batch.count()
    assert incremental_append(spark, batch, target, ["event_id"]) == 0
    assert spark.read.parquet(target).count() == batch.count()


def test_unreadable_target_raises_instead_of_duplicating(spark, sf_dir, tmp_path):
    """An EXISTING but unreadable target must raise, never be treated as
    'first run' — the silent fallback would re-append every row and
    break exactly-once with duplicates."""
    import pytest

    target = tmp_path / "sink"
    target.mkdir()
    (target / "part-corrupt.parquet").write_bytes(b"this is not parquet")
    batch = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    with pytest.raises(Exception, match="(?i)parquet|schema"):
        incremental_append(spark, batch, str(target), ["event_id"])
    # nothing was appended on the failure path
    assert list(target.iterdir()) == [target / "part-corrupt.parquet"]


def test_operation_lifecycle_start_verify_retry(spark, sf_dir, tmp_path):
    """start → damaged delivery → verify flags it → retry-failed heals →
    verify clean; a second retry is a no-op (idempotent)."""
    from newspapers_etl_spark.operators.incremental import run_operation

    target = str(tmp_path / "sink")
    src = load_table(spark, sf_dir, "events")

    # 'start' with a damaged copy (2% of rows never arrive)
    damaged = src.filter(F.col("event_id") % 50 != 0)
    run_operation(spark, "start", damaged, target, ["event_id"])

    audit = run_operation(spark, "verify", src, target, ["event_id"])
    bad = audit.filter("status = 'incomplete'")
    assert bad.count() > 0
    assert audit.filter("n_missing > 0").count() == bad.count()

    healed = run_operation(spark, "retry-failed", src, target, ["event_id"])
    assert healed == src.count() - damaged.count()
    audit2 = run_operation(spark, "verify", src, target, ["event_id"])
    assert audit2.filter("status = 'incomplete'").count() == 0

    assert run_operation(spark, "retry-failed", src, target, ["event_id"]) == 0
    assert run_operation(spark, "continue", src, target, ["event_id"]) == 0


def test_partitioned_append_prunes_existing_scan(spark, sf_dir, tmp_path):
    """The dedup gate's read of the target must carry PartitionFilters
    for the batch's days — at scale that's the difference between
    scanning 3 directories and the whole catalog — and the append stays
    idempotent across day-overlapping batches."""
    from newspapers_etl_spark.operators.incremental import (
        incremental_append_partitioned,
    )

    target = str(tmp_path / "sink")
    e = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    b1 = e.filter("day <= '2024-01-05'")
    n1 = incremental_append_partitioned(spark, b1, target, ["event_id"], "day")
    assert n1 == b1.count()
    # overlapping batch: days 4-8; only the novel rows append
    b2 = e.filter("day >= '2024-01-04' AND day <= '2024-01-08'")
    n2 = incremental_append_partitioned(spark, b2, target, ["event_id"], "day")
    assert n2 == b2.join(b1, ["event_id"], "left_anti").count()
    got = spark.read.parquet(target)
    assert got.count() == e.filter("day <= '2024-01-08'").count()
    # the pruning is real: a day-filtered read of the target plans
    # PartitionFilters on the partition column
    plan = (
        spark.read.parquet(target)
        .filter(F.col("day").isin([b2.select("day").first()[0]]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan and "day" in plan.split("PartitionFilters")[1][:120]


def test_overlapping_batch_appends_only_novel(spark, sf_dir, tmp_path):
    target = str(tmp_path / "sink")
    e = load_table(spark, sf_dir, "events")
    first = e.filter(F.col("event_id") < 200)
    overlap = e.filter((F.col("event_id") >= 100) & (F.col("event_id") < 300))
    incremental_append(spark, first, target, ["event_id"])
    appended = incremental_append(spark, overlap, target, ["event_id"])
    assert appended == overlap.join(first, ["event_id"], "left_anti").count()
    got = spark.read.parquet(target)
    assert got.count() == 300
    assert got.select("event_id").distinct().count() == 300
