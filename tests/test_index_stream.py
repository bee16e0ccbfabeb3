"""Streaming ingestion into the maintained IVF index
(streaming/index_stream.py): oracle parity, stream==bulk equivalence,
and the composed exactly-once story — a crash mid-stream restarts from
the checkpoint and the applied-batch ledger makes replays no-op."""

import pytest
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table


def _codes_rows(df):
    return sorted(
        (r["vec_id"], r["cell"], tuple(r["codes"])) for r in df.collect()
    )


def test_st_ivf_matches_oracle(spark, sf_dir, oracle):
    from conftest import assert_matches_oracle

    from newspapers_etl_spark.streaming.index_stream import (
        IVF_APP_ORACLE,
        stream_ivf_append_roundtrip,
    )

    assert_matches_oracle(
        stream_ivf_append_roundtrip(spark, sf_dir), oracle, IVF_APP_ORACLE
    )


@pytest.mark.heavy
def test_stream_equals_bulk_append_bit_for_bit(spark, sf_dir, tmp_path):
    """The final index is micro-batch-split invariant: draining the
    batch slice through 2-file micro-batches equals one bulk append —
    codes AND stats exactly (pure encode, combinable pairs)."""
    from newspapers_etl_spark.operators.ivf_maintenance import (
        BASE_PREDICATE,
        append_ivf_index,
        build_ivf_index,
        read_ivf_codes,
    )
    from newspapers_etl_spark.sinks.verified import read_current
    from newspapers_etl_spark.streaming.index_stream import stream_append_ivf

    e = load_table(spark, sf_dir, "embeddings")
    base, batch = e.filter(F.expr(BASE_PREDICATE)), e.filter(
        ~F.expr(BASE_PREDICATE)
    )

    streamed = str(tmp_path / "streamed")
    build_ivf_index(spark, base, streamed)
    in_dir = str(tmp_path / "in")
    batch.repartition(2).write.parquet(in_dir)
    stream_append_ivf(spark, in_dir, streamed, str(tmp_path / "cp"))

    bulk = str(tmp_path / "bulk")
    build_ivf_index(spark, base, bulk)
    append_ivf_index(spark, batch, bulk, batch_id="b1")

    assert _codes_rows(read_ivf_codes(spark, streamed)) == _codes_rows(
        read_ivf_codes(spark, bulk)
    )

    def stats_rows(df):
        return sorted(
            (r["cell"], r["n"], tuple(r["svec"])) for r in df.collect()
        )

    assert stats_rows(read_current(spark, f"{streamed}/stats")) == stats_rows(
        read_current(spark, f"{bulk}/stats")
    )


@pytest.mark.heavy
def test_crash_mid_stream_restarts_and_converges(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Kill the stream on its second micro-batch AFTER that batch's
    append fully published (the worst replay case), restart with the
    SAME checkpoint: the engine replays the in-flight epoch, the
    applied-batch ledger no-ops it, and the drained index equals the
    uninterrupted run."""
    from newspapers_etl_spark.operators import ivf_maintenance as im
    from newspapers_etl_spark.operators.ivf_maintenance import (
        BASE_PREDICATE,
        build_ivf_index,
        read_ivf_codes,
    )
    from newspapers_etl_spark.streaming import index_stream
    from newspapers_etl_spark.sinks.verified import current_pointer

    e = load_table(spark, sf_dir, "embeddings")
    base, batch = e.filter(F.expr(BASE_PREDICATE)), e.filter(
        ~F.expr(BASE_PREDICATE)
    )
    path = str(tmp_path / "idx")
    build_ivf_index(spark, base, path)
    in_dir = str(tmp_path / "in")
    batch.repartition(2).write.parquet(in_dir)
    ckpt = str(tmp_path / "cp")

    real_append = im.append_ivf_index
    calls = []

    def flaky_append(sess, df, p, batch_id):
        real_append(sess, df, p, batch_id=batch_id)  # publish FIRST
        calls.append(batch_id)
        if len(calls) == 2:
            raise RuntimeError("injected: died after epoch-1 publish")

    monkeypatch.setattr(index_stream, "append_ivf_index", flaky_append)
    with pytest.raises(Exception):
        index_stream.stream_append_ivf(spark, in_dir, path, ckpt)
    monkeypatch.undo()

    # restart with the SAME checkpoint: replayed epoch no-ops via the
    # ledger, remaining epochs (none here) drain, stream completes.
    index_stream.stream_append_ivf(spark, in_dir, path, ckpt)

    expected = str(tmp_path / "clean")
    build_ivf_index(spark, base, expected)
    index_stream.stream_append_ivf(
        spark, in_dir, expected, str(tmp_path / "cp2")
    )
    assert _codes_rows(read_ivf_codes(spark, path)) == _codes_rows(
        read_ivf_codes(spark, expected)
    )
    # each epoch ledgered exactly once despite the replay
    applied = current_pointer(f"{path}/stats")["applied_batches"]
    assert sorted(applied) == sorted(set(applied))
