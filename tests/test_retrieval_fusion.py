"""Batch BM25 + reciprocal-rank-fusion hybrid retrieval
(operators/retrieval_fusion.py)."""

from pyspark.sql import functions as F

from newspapers_etl_spark.operators.retrieval_fusion import (
    BM25_BATCH_K,
    BM25_BATCH_ORACLE,
    BM25_BATCH_QUERIES,
    RRF_K,
    RRF_ORACLE,
    RRF_POOL,
    RRF_TOP_K,
    retrieval_bm25_batch,
    retrieval_rrf_hybrid,
)


def test_bm25_batch_query_matches_oracle(spark, sf_dir, oracle):
    from conftest import assert_matches_oracle

    assert_matches_oracle(
        retrieval_bm25_batch(spark, sf_dir), oracle, BM25_BATCH_ORACLE
    )


def test_rrf_matches_oracle(spark, sf_dir, oracle):
    from conftest import assert_matches_oracle

    assert_matches_oracle(
        retrieval_rrf_hybrid(spark, sf_dir), oracle, RRF_ORACLE
    )


def test_bm25_batch_serves_every_query_with_contiguous_ranks(spark, sf_dir):
    rows = retrieval_bm25_batch(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(BM25_BATCH_QUERIES)
    for _qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= BM25_BATCH_K
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_rrf_fuses_both_modalities_and_scores_are_rank_sums(spark, sf_dir):
    """Every fused score must equal 1/(K+r_lex) + 1/(K+r_vec) with the
    convention that a missing rank contributes 0 — recomputed here in
    plain Python from the returned ranks.  Both modalities must
    actually contribute to the fixture's top-k (the probe document
    itself is rank 1 on the vector side), and ranks stay within the
    per-modality pool."""
    rows = retrieval_rrf_hybrid(spark, sf_dir).collect()
    assert 0 < len(rows) <= RRF_TOP_K
    saw_lex = saw_vec = False
    for r in rows:
        expect = 0.0
        if r["r_lex"] is not None:
            assert 1 <= r["r_lex"] <= RRF_POOL
            expect += 1.0 / (RRF_K + r["r_lex"])
            saw_lex = True
        if r["r_vec"] is not None:
            assert 1 <= r["r_vec"] <= RRF_POOL
            expect += 1.0 / (RRF_K + r["r_vec"])
            saw_vec = True
        assert abs(r["rrf_score"] - round(expect, 6)) < 1e-12
        assert r["r_lex"] is not None or r["r_vec"] is not None
    assert saw_lex and saw_vec, "fusion degenerated to one modality"
    scores = [r["rrf_score"] for r in sorted(rows, key=lambda r: r["rnk"])]
    assert scores == sorted(scores, reverse=True)


def test_rrf_probe_document_ranks_first_on_vector_side(spark, sf_dir):
    """The probe's own embedding has cosine 1.0 to itself, so the probe
    doc carries r_vec = 1 — the self-NN sanity check, fused edition."""
    from newspapers_etl_spark.operators.retrieval_fusion import RRF_PROBE_ID

    rows = {r["doc_id"]: r for r in retrieval_rrf_hybrid(spark, sf_dir).collect()}
    assert RRF_PROBE_ID in rows, "probe doc missing from fused top-k"
    assert rows[RRF_PROBE_ID]["r_vec"] == 1


def test_rrf_pools_are_bounded_before_the_fusion_join(spark, sf_dir):
    """Scale contract: both modality pools reach the fusion join as
    k-row relations — the lexical side keeps bm25's
    TakeOrderedAndProject, the vector side pools the same way before
    its rank window, so no full-corpus relation crosses the join."""
    plan = (
        retrieval_rrf_hybrid(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count(f"TakeOrderedAndProject(limit={RRF_POOL}") == 2


def test_rrf_is_total_on_empty_tables(spark, tmp_path):
    """No literal-model collects anywhere on the fusion path: empty
    corpus -> empty pools -> empty fusion, not an analysis error."""
    from newspapers_etl_spark.catalog import SCHEMAS, TABLES, table_path

    tmp = str(tmp_path / "empty")
    for t in TABLES:
        spark.createDataFrame([], SCHEMAS[t]).write.mode("overwrite").parquet(
            table_path(tmp, t)
        )
    assert retrieval_rrf_hybrid(spark, tmp).count() == 0
    assert retrieval_bm25_batch(spark, tmp).count() == 0


def test_bm25_batch_amortizes_the_corpus_scan(spark, sf_dir):
    """Three queries, same number of parquet scan nodes as ONE direct
    bm25 — the decontamination sweep's whole point."""
    from newspapers_etl_spark.operators.retrieval import retrieval_bm25_topk

    def n_scans(df):
        return (
            df._jdf.queryExecution().executedPlan().toString().count("Scan parquet")
        )

    assert n_scans(retrieval_bm25_batch(spark, sf_dir)) == n_scans(
        retrieval_bm25_topk(spark, sf_dir)
    )


def test_rrf_two_modality_docs_dominate_worse_singletons(spark, sf_dir):
    """RRF's defining property: a document present in BOTH pools
    outranks any single-modality document whose one rank is worse than
    both of its ranks (two 1/(K+r) contributions beat one smaller
    one) — the always-true form of 'consensus wins'."""
    rows = retrieval_rrf_hybrid(spark, sf_dir).collect()
    both = [r for r in rows if r["r_lex"] is not None and r["r_vec"] is not None]
    for b in both:
        for r in rows:
            if r["r_lex"] is None and r["r_vec"] is not None:
                if r["r_vec"] > max(b["r_lex"], b["r_vec"]):
                    assert b["rrf_score"] > r["rrf_score"]
            if r["r_vec"] is None and r["r_lex"] is not None:
                if r["r_lex"] > max(b["r_lex"], b["r_vec"]):
                    assert b["rrf_score"] > r["rrf_score"]
