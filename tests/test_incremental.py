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
