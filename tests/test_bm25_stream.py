"""Streaming ingestion into the maintained BM25 posting index
(streaming/bm25_stream.py): oracle parity, stream==bulk equivalence,
and the composed exactly-once story — a crash mid-stream restarts from
the checkpoint and the applied-batch ledger makes replays no-op."""

import pytest
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table


def _topk_rows(df):
    return sorted(map(tuple, df.collect()))


def test_st_bm25_matches_oracle(spark, sf_dir, oracle):
    from conftest import assert_matches_oracle

    from newspapers_etl_spark.streaming.bm25_stream import (
        BM25_ORACLE,
        stream_bm25_append_roundtrip,
    )

    assert_matches_oracle(
        stream_bm25_append_roundtrip(spark, sf_dir), oracle, BM25_ORACLE
    )


@pytest.mark.heavy
def test_stream_equals_bulk_append(spark, sf_dir, tmp_path):
    """The final index is micro-batch-split invariant: draining the
    batch slice through 2-file micro-batches equals one bulk append —
    top-k scores AND the stored stats pair exactly (pure per-doc
    postings, combinable (n, sum_dl))."""
    from newspapers_etl_spark.operators.retrieval import (
        append_bm25_postings,
        retrieval_bm25_topk_from_postings,
        write_bm25_postings,
    )
    from newspapers_etl_spark.sinks.verified import read_current
    from newspapers_etl_spark.streaming.bm25_stream import (
        DOC_BASE_PREDICATE,
        stream_append_bm25,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.expr(DOC_BASE_PREDICATE))
    batch = docs.filter(~F.expr(DOC_BASE_PREDICATE))

    streamed = str(tmp_path / "streamed")
    write_bm25_postings(spark, None, streamed, docs=base)
    in_dir = str(tmp_path / "in")
    batch.repartition(2).write.parquet(in_dir)
    stream_append_bm25(spark, in_dir, streamed, str(tmp_path / "cp"))

    bulk = str(tmp_path / "bulk")
    write_bm25_postings(spark, None, bulk, docs=base)
    append_bm25_postings(spark, None, bulk, batch_id="b1", docs=batch)

    assert _topk_rows(
        retrieval_bm25_topk_from_postings(spark, streamed)
    ) == _topk_rows(retrieval_bm25_topk_from_postings(spark, bulk))

    def stats_row(path):
        r = read_current(spark, f"{path}/stats").collect()[0]
        return (r["n"], r["sum_dl"])

    assert stats_row(streamed) == stats_row(bulk)


@pytest.mark.heavy
def test_crash_mid_stream_restarts_and_converges(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Kill the stream on its second micro-batch AFTER that batch's
    append fully published (the worst replay case), restart with the
    SAME checkpoint: the engine replays the in-flight epoch, the
    applied-batch ledger no-ops it, and the drained index equals the
    uninterrupted run — tf/stats never double-counted."""
    from newspapers_etl_spark.operators import retrieval as rt
    from newspapers_etl_spark.operators.retrieval import (
        retrieval_bm25_topk_from_postings,
        write_bm25_postings,
    )
    from newspapers_etl_spark.sinks.verified import current_pointer
    from newspapers_etl_spark.streaming import bm25_stream
    from newspapers_etl_spark.streaming.bm25_stream import (
        DOC_BASE_PREDICATE,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.expr(DOC_BASE_PREDICATE))
    batch = docs.filter(~F.expr(DOC_BASE_PREDICATE))
    path = str(tmp_path / "idx")
    write_bm25_postings(spark, None, path, docs=base)
    in_dir = str(tmp_path / "in")
    batch.repartition(2).write.parquet(in_dir)
    ckpt = str(tmp_path / "cp")

    real_append = rt.append_bm25_postings
    calls = []

    def flaky_append(sess, sf, p, batch_id, docs):
        real_append(sess, sf, p, batch_id=batch_id, docs=docs)
        calls.append(batch_id)
        if len(calls) == 2:
            raise RuntimeError("injected: died after epoch-1 publish")

    monkeypatch.setattr(bm25_stream, "append_bm25_postings", flaky_append)
    with pytest.raises(Exception):
        bm25_stream.stream_append_bm25(spark, in_dir, path, ckpt)
    monkeypatch.undo()

    bm25_stream.stream_append_bm25(spark, in_dir, path, ckpt)

    expected = str(tmp_path / "clean")
    write_bm25_postings(spark, None, expected, docs=base)
    bm25_stream.stream_append_bm25(
        spark, in_dir, expected, str(tmp_path / "cp2")
    )
    assert _topk_rows(
        retrieval_bm25_topk_from_postings(spark, path)
    ) == _topk_rows(retrieval_bm25_topk_from_postings(spark, expected))
    applied = current_pointer(f"{path}/stats")["applied_batches"]
    assert sorted(applied) == sorted(set(applied))
