"""Streaming deletion (streaming/delete_stream.py): oracle parity,
stream==bulk-delete equivalence, and the exactly-once replay story —
a crash after an epoch's delete published restarts from the
checkpoint, the applied_deletes ledger no-ops the replay, and the
drained index converges."""

import pytest
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table


def _codes_rows(df):
    return sorted(
        (r["vec_id"], r["cell"], tuple(r["codes"])) for r in df.collect()
    )


def test_st_del_matches_oracle(spark, sf_dir, oracle):
    from conftest import assert_matches_oracle

    from newspapers_etl_spark.streaming.delete_stream import (
        IVF_DEL_ORACLE,
        stream_delete_roundtrip,
    )

    assert_matches_oracle(
        stream_delete_roundtrip(spark, sf_dir), oracle, IVF_DEL_ORACLE
    )


@pytest.mark.heavy
def test_stream_equals_bulk_delete_bit_for_bit(spark, sf_dir, tmp_path):
    """Draining the retirement wave through 2-file micro-batches equals
    one bulk delete — codes AND stats exactly (tombstone roots
    accumulate, the (n, svec) subtraction is combinable, ids disjoint
    per epoch)."""
    from newspapers_etl_spark.operators.index_delete import IVF_DEL_PRED
    from newspapers_etl_spark.operators.ivf_maintenance import (
        FIT_PREDICATE,
        build_ivf_index,
        delete_from_ivf_index,
        fit_models,
        read_ivf_codes,
    )
    from newspapers_etl_spark.sinks.verified import read_current
    from newspapers_etl_spark.streaming.delete_stream import stream_delete_ivf

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    models = fit_models(e.filter(F.expr(FIT_PREDICATE)))
    retired = e.filter(F.expr(IVF_DEL_PRED))

    streamed = str(tmp_path / "streamed")
    build_ivf_index(spark, e, streamed, e_encode=e, models=models)
    in_dir = str(tmp_path / "in")
    retired.select("vec_id").repartition(2).write.parquet(in_dir)
    stream_delete_ivf(spark, in_dir, e, streamed, str(tmp_path / "cp"))

    bulk = str(tmp_path / "bulk")
    build_ivf_index(spark, e, bulk, e_encode=e, models=models)
    delete_from_ivf_index(spark, retired, bulk, batch_id="d1")

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
def test_crash_after_publish_mid_stream_converges(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Kill the stream on its second epoch AFTER that epoch's delete
    fully published (the worst replay case: the checkpoint does not
    know the epoch completed), restart with the SAME checkpoint.  The
    engine replays the published epoch; the applied_deletes ledger
    no-ops it (no double stats subtraction); the drained index equals
    the uninterrupted run with every epoch ledgered exactly once."""
    from newspapers_etl_spark.operators.index_delete import IVF_DEL_PRED
    from newspapers_etl_spark.operators.ivf_maintenance import (
        FIT_PREDICATE,
        build_ivf_index,
        fit_models,
        read_ivf_codes,
    )
    from newspapers_etl_spark.sinks.verified import current_pointer
    from newspapers_etl_spark.streaming import delete_stream

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    models = fit_models(e.filter(F.expr(FIT_PREDICATE)))
    retired = e.filter(F.expr(IVF_DEL_PRED))
    path = str(tmp_path / "idx")
    build_ivf_index(spark, e, path, e_encode=e, models=models)
    in_dir = str(tmp_path / "in")
    retired.select("vec_id").repartition(2).write.parquet(in_dir)
    ckpt = str(tmp_path / "cp")

    real_delete = delete_stream.delete_from_ivf_index
    calls = []

    def flaky_delete(sess, df, p, batch_id):
        real_delete(sess, df, p, batch_id=batch_id)  # publish FIRST
        calls.append(batch_id)
        if len(calls) == 2:
            raise RuntimeError("injected: died after epoch publish")

    monkeypatch.setattr(delete_stream, "delete_from_ivf_index", flaky_delete)
    with pytest.raises(Exception):
        delete_stream.stream_delete_ivf(spark, in_dir, e, path, ckpt)
    monkeypatch.undo()

    # restart with the SAME checkpoint: the replayed epoch no-ops via
    # the ledger, remaining epochs (none here) drain, stream completes.
    delete_stream.stream_delete_ivf(spark, in_dir, e, path, ckpt)

    expected = str(tmp_path / "clean")
    build_ivf_index(spark, e, expected, e_encode=e, models=models)
    delete_stream.stream_delete_ivf(
        spark, in_dir, e, expected, str(tmp_path / "cp2")
    )
    assert _codes_rows(read_ivf_codes(spark, path)) == _codes_rows(
        read_ivf_codes(spark, expected)
    )
    # each epoch ledgered exactly once despite the replay
    applied = current_pointer(f"{path}/stats")["applied_deletes"]
    assert sorted(applied) == sorted(set(applied))
