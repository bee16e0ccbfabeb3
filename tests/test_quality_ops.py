"""drift (PSI snapshot-drift monitor) and ndcg (retrieval-quality
evaluation): semantic invariants plus an independent pure-Python
recomputation of the nDCG assembly — the oracle sweep checks
cross-engine agreement, these check the MATH."""

import math
import re

import pytest
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import SCHEMAS, load_table, table_path


def test_drift_psi_parts_are_nonnegative_and_grouped(spark, sf_dir):
    """Every PSI term (p−q)·ln(p/q) is >= 0 (p−q and ln(p/q) share
    sign), buckets are exhaustive (per-feature ref/cand counts sum to
    the slice sizes), and both monitored features appear."""
    from newspapers_etl_spark.operators.drift_monitor import snapshot_drift_psi

    rows = snapshot_drift_psi(spark, sf_dir).collect()
    feats = {r["feature"] for r in rows}
    assert feats == {"n_chars", "lang"}
    assert all(r["psi_part"] >= 0 for r in rows)

    d = load_table(spark, sf_dir, "documents")
    n_ref = d.filter(F.col("doc_id") % 2 == 0).count()
    n_cand = d.count() - n_ref
    for feat in feats:
        fr = [r for r in rows if r["feature"] == feat]
        assert sum(r["ref_n"] for r in fr) == n_ref
        assert sum(r["cand_n"] for r in fr) == n_cand


def test_drift_detects_planted_shift(spark, tmp_path):
    """A candidate slice with systematically longer documents must
    light up PSI(n_chars) while PSI(lang) stays near zero (langs are
    distributed identically across the parity split)."""
    from newspapers_etl_spark.operators.drift_monitor import snapshot_drift_psi

    tmp = str(tmp_path / "drifted")
    rows = []
    langs = ["en", "de", "fr", "es"]
    for i in range(400):
        n_chars = 80 + (i % 40) if i % 2 == 0 else 380 + (i % 40)
        rows.append((i, "x" * 10, langs[(i // 2) % 4], f"s{i % 3}", n_chars))
    spark.createDataFrame(rows, SCHEMAS["documents"]).write.mode(
        "overwrite"
    ).parquet(table_path(tmp, "documents"))

    psi = {}
    for r in snapshot_drift_psi(spark, tmp).collect():
        psi[r["feature"]] = psi.get(r["feature"], 0.0) + r["psi_part"]
    assert psi["n_chars"] > 0.25, f"planted shift missed: {psi}"
    assert psi["lang"] < 0.05, f"stable feature flagged: {psi}"


def _py_tokens(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text) if t != ""]


def test_ndcg_matches_pure_python_assembly(spark, sf_dir):
    """Recompute nDCG@k in pure Python from (a) the ranked lists the
    batch scorer emits and (b) relevance grades derived from the raw
    texts — validating the DCG/IDCG join+window assembly independently
    of any Spark expression."""
    from newspapers_etl_spark.operators.retrieval import bm25_batch_topk_over
    from newspapers_etl_spark.operators.retrieval_eval import retrieval_ndcg
    from newspapers_etl_spark.operators.retrieval_fusion import (
        BM25_BATCH_K,
        BM25_BATCH_QUERIES,
    )

    d = load_table(spark, sf_dir, "documents")
    docs = {r["doc_id"]: r["text"] for r in d.select("doc_id", "text").collect()}
    rel = {
        (qid, did): len(set(terms) & set(_py_tokens(text)))
        for qid, terms in BM25_BATCH_QUERIES.items()
        for did, text in docs.items()
    }
    ranked = {}
    for r in bm25_batch_topk_over(d, BM25_BATCH_QUERIES, k=BM25_BATCH_K).collect():
        ranked.setdefault(r["query_id"], []).append((r["rnk"], r["doc_id"]))

    want = {}
    for qid in BM25_BATCH_QUERIES:
        dcg = sum(
            (2 ** rel[(qid, did)] - 1) / math.log2(rnk + 1)
            for rnk, did in sorted(ranked[qid])
        )
        ideal = sorted(
            ((r, did) for (q, did), r in rel.items() if q == qid and r > 0),
            key=lambda x: (-x[0], x[1]),
        )[:BM25_BATCH_K]
        idcg = sum(
            (2**r - 1) / math.log2(i + 2) for i, (r, _d) in enumerate(ideal)
        )
        want[qid] = round(dcg / idcg, 6) if idcg > 0 else 0.0

    got = {r["query_id"]: r["ndcg"] for r in retrieval_ndcg(spark, sf_dir).collect()}
    assert set(got) == set(want)
    for qid in want:
        assert got[qid] == pytest.approx(want[qid], abs=2e-6), (
            qid,
            got[qid],
            want[qid],
        )
        assert 0.0 < got[qid] <= 1.0


def test_drift_plan_is_single_scan(spark, sf_dir):
    """The PSI monitor's scale contract: ONE corpus scan, totals as
    window sums over the bounded counts relation — a groupBy+join-back
    on the unpersisted counts lineage would re-run the scan (the bug
    this pins out), and nothing in the plan may shuffle documents."""
    from newspapers_etl_spark.operators.drift_monitor import snapshot_drift_psi

    plan = (
        snapshot_drift_psi(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1, plan
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan


def test_ndcg_rel_is_persisted_not_recomputed(spark, sf_dir):
    """DCG and IDCG both consume the relevance relation; the persist
    must surface as InMemoryTableScan reuse in BOTH branches so the
    tokenize scan runs once, not once per branch."""
    from newspapers_etl_spark.cache import clear_all_session_caches
    from newspapers_etl_spark.operators.retrieval_eval import retrieval_ndcg

    try:
        plan = (
            retrieval_ndcg(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("InMemoryTableScan") == 2, plan
        assert "Cartesian" not in plan
    finally:
        clear_all_session_caches(spark)
