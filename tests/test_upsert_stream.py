"""Streaming upsert (streaming/upsert_stream.py): oracle parity,
stream==bulk-upsert equivalence, and the layered exactly-once story —
a crash between one epoch's delete and append halves restarts from the
checkpoint, the replayed epoch no-ops its published half, and the
drained index converges."""

import pytest
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table


def _codes_rows(df):
    return sorted(
        (r["vec_id"], r["cell"], tuple(r["codes"])) for r in df.collect()
    )


def test_st_up_matches_oracle(spark, sf_dir, oracle):
    from conftest import assert_matches_oracle

    from newspapers_etl_spark.streaming.upsert_stream import (
        IVF_UP_ORACLE,
        stream_upsert_roundtrip,
    )

    assert_matches_oracle(
        stream_upsert_roundtrip(spark, sf_dir), oracle, IVF_UP_ORACLE
    )


@pytest.mark.heavy
def test_stream_equals_bulk_upsert_bit_for_bit(spark, sf_dir, tmp_path):
    """Draining the update wave through 2-file micro-batches equals one
    bulk upsert — codes AND stats exactly (disjoint ids per epoch, pure
    encode, combinable subtract-then-add)."""
    from newspapers_etl_spark.operators.index_upsert import IVF_UP_PRED
    from newspapers_etl_spark.operators.ivf_maintenance import (
        FIT_PREDICATE,
        build_ivf_index,
        fit_models,
        read_ivf_codes,
        upsert_ivf_index,
    )
    from newspapers_etl_spark.sinks.verified import read_current
    from newspapers_etl_spark.streaming.upsert_stream import (
        stream_upsert_ivf,
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    models = fit_models(e.filter(F.expr(FIT_PREDICATE)))
    old = e.filter(F.expr(IVF_UP_PRED))
    new = old.select("vec_id", F.reverse("embedding").alias("embedding"))

    streamed = str(tmp_path / "streamed")
    build_ivf_index(spark, e, streamed, e_encode=e, models=models)
    in_dir = str(tmp_path / "in")
    new.repartition(2).write.parquet(in_dir)
    stream_upsert_ivf(spark, in_dir, e, streamed, str(tmp_path / "cp"))

    bulk = str(tmp_path / "bulk")
    build_ivf_index(spark, e, bulk, e_encode=e, models=models)
    upsert_ivf_index(spark, old, new, bulk, batch_id="u1")

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
def test_crash_between_halves_mid_stream_converges(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The nastiest seam: kill epoch 1 AFTER its delete half published
    but BEFORE its append half ran, restart with the SAME checkpoint.
    The engine replays epoch 1; the composed upsert no-ops the
    published delete (applied_deletes) and applies the append; the
    remaining epoch drains; the index equals the uninterrupted run with
    every half ledgered exactly once."""
    from newspapers_etl_spark.operators import ivf_maintenance as im
    from newspapers_etl_spark.operators.index_upsert import IVF_UP_PRED
    from newspapers_etl_spark.operators.ivf_maintenance import (
        FIT_PREDICATE,
        build_ivf_index,
        fit_models,
        read_ivf_codes,
    )
    from newspapers_etl_spark.sinks.verified import current_pointer
    from newspapers_etl_spark.streaming import upsert_stream

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    models = fit_models(e.filter(F.expr(FIT_PREDICATE)))
    new = e.filter(F.expr(IVF_UP_PRED)).select(
        "vec_id", F.reverse("embedding").alias("embedding")
    )
    path = str(tmp_path / "idx")
    build_ivf_index(spark, e, path, e_encode=e, models=models)
    in_dir = str(tmp_path / "in")
    new.repartition(2).write.parquet(in_dir)
    ckpt = str(tmp_path / "cp")

    real_append = im.append_ivf_index
    died = []

    def dying_append(sess, df, p, batch_id):
        if not died:
            died.append(batch_id)
            raise RuntimeError("injected: died between the halves")
        real_append(sess, df, p, batch_id=batch_id)

    monkeypatch.setattr(im, "append_ivf_index", dying_append)
    with pytest.raises(Exception):
        upsert_stream.stream_upsert_ivf(spark, in_dir, e, path, ckpt)
    # torn: the first epoch's delete published, its append did not
    ptr = current_pointer(f"{path}/stats")
    assert died and died[0].endswith(".add")
    assert any(b.endswith(".del") for b in ptr["applied_deletes"])
    assert not any(
        b.endswith(".add") for b in ptr.get("applied_batches", [])
    )

    # restart with the SAME checkpoint: replayed epoch completes, the
    # published delete no-ops, the second epoch drains
    upsert_stream.stream_upsert_ivf(spark, in_dir, e, path, ckpt)
    monkeypatch.undo()

    expected = str(tmp_path / "clean")
    build_ivf_index(spark, e, expected, e_encode=e, models=models)
    upsert_stream.stream_upsert_ivf(
        spark, in_dir, e, expected, str(tmp_path / "cp2")
    )
    assert _codes_rows(read_ivf_codes(spark, path)) == _codes_rows(
        read_ivf_codes(spark, expected)
    )
    ptr = current_pointer(f"{path}/stats")
    for ledger in ("applied_deletes", "applied_batches"):
        assert sorted(ptr[ledger]) == sorted(set(ptr[ledger]))
