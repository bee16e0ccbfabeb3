"""Streaming BM25 deletion + upsert (streaming/bm25_upkeep_stream.py):
oracle parity for both, stream==bulk-delete equivalence, and the
crash-BETWEEN-HALVES upsert replay — the lexical mirror of
tests/test_delete_stream.py and tests/test_upsert_stream.py."""

import pytest
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table


def _topk_rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def test_st_bdl_matches_oracle(spark, sf_dir, oracle):
    from conftest import assert_matches_oracle

    from newspapers_etl_spark.streaming.bm25_upkeep_stream import (
        BM25_DEL_ORACLE,
        stream_bm25_delete_roundtrip,
    )

    assert_matches_oracle(
        stream_bm25_delete_roundtrip(spark, sf_dir), oracle, BM25_DEL_ORACLE
    )


def test_st_bup_matches_oracle(spark, sf_dir, oracle):
    from conftest import assert_matches_oracle

    from newspapers_etl_spark.streaming.bm25_upkeep_stream import (
        BM25_UP_ORACLE,
        stream_bm25_upsert_roundtrip,
    )

    assert_matches_oracle(
        stream_bm25_upsert_roundtrip(spark, sf_dir), oracle, BM25_UP_ORACLE
    )


@pytest.mark.heavy
def test_stream_equals_bulk_bm25_delete(spark, sf_dir, tmp_path):
    """Draining the retirement wave through 2-file micro-batches equals
    one bulk delete — scores AND the stored (n, sum_dl) exactly."""
    from newspapers_etl_spark.operators.index_delete import DOC_DEL_PRED
    from newspapers_etl_spark.operators.retrieval import (
        delete_bm25_docs,
        retrieval_bm25_topk_from_postings,
        write_bm25_postings,
    )
    from newspapers_etl_spark.sinks.verified import read_current
    from newspapers_etl_spark.streaming.bm25_upkeep_stream import (
        stream_delete_bm25,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    retired = docs.filter(F.expr(DOC_DEL_PRED))

    streamed = str(tmp_path / "streamed")
    write_bm25_postings(spark, None, streamed, docs=docs)
    in_dir = str(tmp_path / "in")
    retired.select("doc_id").repartition(2).write.parquet(in_dir)
    stream_delete_bm25(spark, in_dir, docs, streamed, str(tmp_path / "cp"))

    bulk = str(tmp_path / "bulk")
    write_bm25_postings(spark, None, bulk, docs=docs)
    delete_bm25_docs(spark, retired, bulk, batch_id="d1")

    assert _topk_rows(
        retrieval_bm25_topk_from_postings(spark, streamed)
    ) == _topk_rows(retrieval_bm25_topk_from_postings(spark, bulk))
    s = read_current(spark, f"{streamed}/stats").collect()[0]
    b = read_current(spark, f"{bulk}/stats").collect()[0]
    assert (s["n"], s["sum_dl"]) == (b["n"], b["sum_dl"])


@pytest.mark.heavy
def test_crash_between_upsert_halves_mid_stream_converges(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Kill epoch 1 AFTER its delete half published but BEFORE its
    append half ran, restart with the SAME checkpoint: the replayed
    epoch no-ops the published delete and applies the append, the
    second epoch drains, and the index equals the uninterrupted run
    with every half ledgered exactly once."""
    from newspapers_etl_spark.operators import retrieval as rt
    from newspapers_etl_spark.operators.index_upsert import DOC_UP_PRED
    from newspapers_etl_spark.operators.retrieval import (
        retrieval_bm25_topk_from_postings,
        write_bm25_postings,
    )
    from newspapers_etl_spark.sinks.verified import current_pointer
    from newspapers_etl_spark.streaming import bm25_upkeep_stream

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    new = docs.filter(F.expr(DOC_UP_PRED)).select(
        "doc_id", F.concat("text", F.lit(" "), "text").alias("text")
    )
    path = str(tmp_path / "idx")
    write_bm25_postings(spark, None, path, docs=docs)
    in_dir = str(tmp_path / "in")
    new.repartition(2).write.parquet(in_dir)
    ckpt = str(tmp_path / "cp")

    real_append = rt.append_bm25_postings
    died = []

    def dying_append(sess, sf, p, batch_id=None, docs=None, **kw):
        if not died:
            died.append(batch_id)
            raise RuntimeError("injected: died between the halves")
        real_append(sess, sf, p, batch_id=batch_id, docs=docs, **kw)

    monkeypatch.setattr(rt, "append_bm25_postings", dying_append)
    with pytest.raises(Exception):
        bm25_upkeep_stream.stream_upsert_bm25(
            spark, in_dir, docs, path, ckpt
        )
    # torn: the first epoch's delete published, its append did not
    ptr = current_pointer(f"{path}/stats")
    assert died and died[0].endswith(".add")
    assert any(b.endswith(".del") for b in ptr["applied_deletes"])
    assert not any(
        b.endswith(".add") for b in ptr.get("applied_batches", [])
    )

    # restart with the SAME checkpoint: replayed epoch completes, the
    # published delete no-ops, the second epoch drains
    bm25_upkeep_stream.stream_upsert_bm25(spark, in_dir, docs, path, ckpt)
    monkeypatch.undo()

    expected = str(tmp_path / "clean")
    write_bm25_postings(spark, None, expected, docs=docs)
    bm25_upkeep_stream.stream_upsert_bm25(
        spark, in_dir, docs, expected, str(tmp_path / "cp2")
    )
    assert _topk_rows(
        retrieval_bm25_topk_from_postings(spark, path)
    ) == _topk_rows(retrieval_bm25_topk_from_postings(spark, expected))
    ptr = current_pointer(f"{path}/stats")
    for ledger in ("applied_deletes", "applied_batches"):
        assert sorted(ptr[ledger]) == sorted(set(ptr[ledger]))
