"""The stateful-stream state-partition sizing (streaming/
incremental_stream.run_available_now, r17): the override must bound
the stream's state-store partitioning, restore the session setting
afterwards, and stay out of the way when a caller pins the session
partitioning (state_partitions=0 — operators/rollup.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from newspapers_etl_spark.streaming.incremental_stream import (
    STREAM_SHUFFLE_PARTITIONS,
    run_available_now,
)


def _source(spark, tmp_path, name):
    src = str(tmp_path / f"src_{name}")
    spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "k long, v double"
    ).write.parquet(src)
    return spark.readStream.schema("k long, v double").parquet(src)


def test_override_applies_and_restores(spark, tmp_path):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    agg = _source(spark, tmp_path, "a").groupBy("k").agg(
        F.sum("v").alias("s")
    )
    out = run_available_now(
        agg, "t_sp_a", str(tmp_path / "ck_a"), "complete"
    )
    rows = {r["k"]: r["s"] for r in out.collect()}
    assert rows[3] == 3.0 and len(rows) == 20
    # the session setting is restored after the drain
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    # the stream itself ran at the override (state dirs per partition)
    import os

    state0 = tmp_path / "ck_a" / "state" / "0"
    n_parts = len([d for d in os.listdir(state0) if d.isdigit()])
    assert n_parts == STREAM_SHUFFLE_PARTITIONS


def test_zero_keeps_session_partitioning(spark, tmp_path):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    agg = _source(spark, tmp_path, "b").groupBy("k").agg(
        F.sum("v").alias("s")
    )
    run_available_now(
        agg, "t_sp_b", str(tmp_path / "ck_b"), "complete",
        state_partitions=0,
    )
    import os

    state0 = tmp_path / "ck_b" / "state" / "0"
    n_parts = len([d for d in os.listdir(state0) if d.isdigit()])
    assert n_parts == int(prev)
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
