"""Structured Streaming behavior tests (SURVEY.md §2.7): checkpoint
resume processes only unseen files (St2/St3), watermark dedup collapses
planted duplicates across micro-batches (St4), and maxFilesPerTrigger
paces micro-batches (St1)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.operators.incremental import incremental_append
from newspapers_etl_spark.streaming.incremental_stream import (
    deduped_stream,
    read_events_stream,
)


def _write_events_file(spark, sf_dir, path, lo, hi):
    """One standalone parquet file of events rows lo <= id < hi (µs ts)."""
    pdf = (
        load_table(spark, sf_dir, "events")
        .filter(f"event_id >= {lo} AND event_id < {hi}")
        .toPandas()
    )
    # µs precision: pandas defaults to ns, which Spark's reader rejects.
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(pdf), path)
    return len(pdf)


def _run_foreach_batch(stream, target, checkpoint, batches_seen):
    """availableNow run landing each micro-batch through the idempotent
    anti-join append sink (St4's exactly-once effect over an
    at-least-once channel)."""

    def sink(batch_df, batch_id):
        n = incremental_append(
            batch_df.sparkSession, batch_df, target, ["event_id"]
        )
        batches_seen.append((batch_id, n))

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_checkpoint_resume_processes_only_new_files(spark, sf_dir, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    target = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    n1 = _write_events_file(spark, sf_dir, src / "day1.parquet", 0, 300)
    seen: list[tuple[int, int]] = []
    _run_foreach_batch(read_events_stream(spark, str(src)), target, ckpt, seen)
    assert sum(n for _, n in seen) == n1
    assert spark.read.parquet(target).count() == n1

    # New file arrives; SAME checkpoint → only the new file is read.
    n2 = _write_events_file(spark, sf_dir, src / "day2.parquet", 300, 500)
    seen.clear()
    _run_foreach_batch(read_events_stream(spark, str(src)), target, ckpt, seen)
    assert sum(n for _, n in seen) == n2, "resume re-read already-seen input"
    got = spark.read.parquet(target)
    assert got.count() == n1 + n2
    assert got.select("event_id").distinct().count() == n1 + n2


def test_dedup_collapses_duplicates_across_micro_batches(spark, sf_dir, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    # Same 200 rows delivered twice (two files → two micro-batches with
    # maxFilesPerTrigger=1): at-least-once delivery simulation.
    n = _write_events_file(spark, sf_dir, src / "a.parquet", 0, 200)
    _write_events_file(spark, sf_dir, src / "a_redelivered.parquet", 0, 200)

    stream = deduped_stream(
        read_events_stream(spark, str(src), max_files_per_trigger=1)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_test_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("dedup_test_sink")
    assert out.count() == n
    assert out.select("event_id").distinct().count() == n


def test_stateful_running_totals_accumulate_across_batches(spark, sf_dir, tmp_path):
    """applyInPandasWithState: state persists across micro-batches —
    after two batches, the last emission per key equals the batch
    aggregate over ALL input; keys only in batch 1 keep their totals."""
    import pyspark.sql.functions as F

    from newspapers_etl_spark.streaming.stateful import running_totals_stateful

    src = tmp_path / "in"
    src.mkdir()
    _write_events_file(spark, sf_dir, src / "b1.parquet", 0, 300)
    _write_events_file(spark, sf_dir, src / "b2.parquet", 300, 500)

    stream = read_events_stream(spark, str(src), max_files_per_trigger=1)
    q = (
        running_totals_stateful(stream)
        .writeStream.format("memory")
        .queryName("stateful_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.table("stateful_sink").toPandas()
    # last emission per key (emissions arrive in batch order)
    last = emitted.groupby("user_id").last()

    all_events = (
        load_table(spark, sf_dir, "events")
        .filter("event_id < 500")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .collect()
    )
    assert len(last) == len(all_events)
    for r in all_events:
        assert last.loc[r.user_id, "n_events"] == r.n
        assert abs(last.loc[r.user_id, "total_value"] - r.tv) < 1e-9


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    """Watermarked stream-stream interval join over two event-type
    sub-streams of the same source equals the batch join on identical
    input — micro-batch execution changes nothing semantically."""
    from newspapers_etl_spark.streaming.stream_joins import interval_join

    src = tmp_path / "in"
    src.mkdir()
    _write_events_file(spark, sf_dir, src / "b1.parquet", 0, 400)
    _write_events_file(spark, sf_dir, src / "b2.parquet", 400, 800)

    def split(df):
        return (
            df.filter("event_type = 'click'"),
            df.filter("event_type = 'purchase'"),
        )

    clicks_s, purchases_s = split(read_events_stream(spark, str(src)))
    q = (
        interval_join(clicks_s, purchases_s, "user_id", within="6 hours")
        .writeStream.format("memory")
        .queryName("ssjoin_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = sorted(map(tuple, spark.table("ssjoin_sink").collect()))

    batch = load_table(spark, sf_dir, "events").filter("event_id < 800")
    clicks_b, purchases_b = split(batch)
    expected = sorted(
        map(
            tuple,
            interval_join(clicks_b, purchases_b, "user_id", within="6 hours")
            .collect(),
        )
    )
    assert len(expected) > 0, "fixture produced no click→purchase pairs"
    assert streamed == expected


def test_max_files_per_trigger_paces_micro_batches(spark, sf_dir, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    for i in range(3):
        _write_events_file(
            spark, sf_dir, src / f"f{i}.parquet", i * 100, (i + 1) * 100
        )
    seen: list[tuple[int, int]] = []
    _run_foreach_batch(
        read_events_stream(spark, str(src), max_files_per_trigger=1),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        seen,
    )
    assert len(seen) == 3, f"expected 3 micro-batches, saw {seen}"
    assert [n for _, n in seen] == [100, 100, 100]


def test_streaming_session_windows_match_batch_and_resume(spark, sf_dir, tmp_path):
    """St5 under the REAL engine: session_window + watermark runs under
    Trigger.AvailableNow, matches the batch session answer on identical
    input, and a checkpoint RESUME over newly-arrived files merges new
    events into existing session state (only unseen files are read)."""
    from pyspark.sql import functions as F

    from newspapers_etl_spark.operators.events_windows import SESSION_GAP
    from newspapers_etl_spark.streaming.incremental_stream import session_counts

    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def batch_sessions():
        e = spark.read.parquet(str(src)).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        return sorted(
            map(
                tuple,
                e.groupBy("user_id", F.session_window("ts", SESSION_GAP).alias("w"))
                .agg(
                    F.count("*").alias("n_events"),
                    F.round(F.sum("value"), 2).alias("total_value"),
                )
                .select(
                    "user_id",
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events",
                    "total_value",
                )
                .collect(),
            )
        )

    def run_streaming(name):
        q = (
            session_counts(read_events_stream(spark, str(src)))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(map(tuple, spark.table(name).collect()))

    _write_events_file(spark, sf_dir, src / "day1.parquet", 0, 300)
    assert run_streaming("sess_sink_1") == batch_sessions()

    # New file, SAME checkpoint: resume reads only day2, but the emitted
    # complete-mode result reflects merged session state over BOTH days
    # (sessions spanning the file boundary merge correctly).
    _write_events_file(spark, sf_dir, src / "day2.parquet", 300, 600)
    combined = batch_sessions()
    assert run_streaming("sess_sink_2") == combined

    # The resume genuinely merged: day-boundary sessions differ from the
    # naive union of per-file sessions unless no session spans the
    # boundary; at minimum the combined result covers all 600 events.
    assert sum(r[3] for r in combined) == 600


def test_streaming_scd2_upsert_converges_to_batch_merge(spark, sf_dir):
    """foreachBatch SCD2 upsert: 4 micro-batches with keys re-delivered
    within AND across batches must converge to the single-batch merge —
    micro-batch partitioning must not leak into the history."""
    from newspapers_etl_spark.operators.scd import _merged_customer_history
    from newspapers_etl_spark.streaming.scd_stream import stream_scd2_upsert

    streamed, n_batches = stream_scd2_upsert(
        spark, sf_dir, max_files_per_trigger=1, update_files=4
    )
    # The multi-batch path genuinely ran (files may coalesce if tiny,
    # but never into a single mega-batch at 1 file per trigger).
    assert n_batches >= 3

    batch = _merged_customer_history(spark, sf_dir)
    cols = ["c_custkey", "c_name", "c_mktsegment", "valid_from", "valid_to", "is_current"]
    s_rows = sorted(map(tuple, streamed.select(*cols).collect()))
    b_rows = sorted(map(tuple, batch.select(*cols).collect()))
    assert s_rows == b_rows


def test_streaming_scd2_upsert_recovers_from_crash_without_duplicates(
    spark, sf_dir, tmp_path
):
    """Crash between merges, then restart from the SAME root: the
    generation pointer recovers from _SUCCESS markers (not driver
    memory), the engine re-delivers the uncommitted epoch, and the
    converged history equals the batch merge with no duplicate
    versions."""
    import pyspark.errors

    from newspapers_etl_spark.operators.scd import _merged_customer_history
    from newspapers_etl_spark.streaming.scd_stream import stream_scd2_upsert

    root = tmp_path / "scd_root"
    root.mkdir()
    try:
        stream_scd2_upsert(
            spark, sf_dir, max_files_per_trigger=1, update_files=4,
            root=root, fail_after_batches=1,
        )
        raise AssertionError("injected crash did not surface")
    except pyspark.errors.exceptions.captured.StreamingQueryException:
        pass

    streamed, resumed_batches = stream_scd2_upsert(
        spark, sf_dir, max_files_per_trigger=1, update_files=4, root=root
    )
    assert resumed_batches >= 1  # the resume genuinely processed epochs

    batch = _merged_customer_history(spark, sf_dir)
    cols = ["c_custkey", "c_name", "c_mktsegment", "valid_from", "valid_to", "is_current"]
    s_rows = sorted(map(tuple, streamed.select(*cols).collect()))
    b_rows = sorted(map(tuple, batch.select(*cols).collect()))
    assert s_rows == b_rows
    # no key ever holds two open versions
    assert (
        streamed.filter("is_current")
        .groupBy("c_custkey").count().filter("count > 1").count() == 0
    )
