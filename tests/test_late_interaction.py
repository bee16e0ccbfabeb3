"""Late-interaction MaxSim (operators/late_interaction.py): hand-computed
scores, planted-duplicate ranking, self-exclusion and rank contiguity."""

from __future__ import annotations

import math

from newspapers_etl_spark.operators.late_interaction import (
    MAXSIM_TOP_K,
    N_PROBE_DOCS,
    maxsim_topk,
    token_relation,
)


def _tokens(spark, rows):
    """rows: (doc, vec_id, embedding) -> token relation with norms (the
    token_relation output contract, built directly for planted cases)."""
    from pyspark.sql import functions as F

    from newspapers_etl_spark.functions.vectors import l2_norm

    df = spark.createDataFrame(
        rows, "doc long, vec_id long, embedding array<float>"
    )
    return df.select(
        "doc", "vec_id", "embedding", l2_norm("embedding").alias("nrm")
    )


def test_identical_token_set_is_rank_one_with_maximal_score(spark):
    """A candidate holding an exact copy of every probe token vector
    scores Σ 1.0 = n_probe_tokens — nothing can beat per-token max
    cosine of 1 — and must rank first."""
    q = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    rows = (
        [(0, i, v) for i, v in enumerate(q)]
        + [(5, 50 + i, v) for i, v in enumerate(q)]  # exact copy
        + [(6, 60, [1.0, 1.0, 0.0]), (6, 61, [0.5, 0.0, 0.5])]
    )
    out = maxsim_topk(_tokens(spark, rows), n_probe_docs=1, k=5).collect()
    by_doc = {r["doc_id"]: r for r in out}
    assert by_doc[5]["rnk"] == 1
    assert by_doc[5]["score"] == 3.0
    assert by_doc[6]["score"] < 3.0


def test_hand_computed_maxsim(spark):
    """Two probe tokens, one candidate with two tokens — the score is
    the sum over probe tokens of the max cosine, each replayable with
    math.* on the raw vectors."""
    rows = [
        (0, 0, [1.0, 0.0]),
        (0, 1, [0.0, 1.0]),
        (3, 30, [1.0, 1.0]),
        (3, 31, [1.0, -1.0]),
    ]
    out = maxsim_topk(_tokens(spark, rows), n_probe_docs=1, k=5).collect()
    assert len(out) == 1
    # qtok [1,0]: cos vs [1,1] = 1/sqrt(2), vs [1,-1] = 1/sqrt(2) -> max
    # qtok [0,1]: cos vs [1,1] = 1/sqrt(2), vs [1,-1] = -1/sqrt(2) -> 1/sqrt(2)
    want = round(
        round(1 / math.sqrt(2), 6) + round(1 / math.sqrt(2), 6), 6
    )
    assert out[0]["score"] == want


def test_fixture_invariants(spark, sf_dir):
    """On the fixture encoding: probes never score themselves, ranks
    are dense 1..n per probe with n <= MAXSIM_TOP_K, scores
    non-increasing in rank."""
    from newspapers_etl_spark.catalog import load_table

    t = token_relation(load_table(spark, sf_dir, "embeddings"))
    rows = maxsim_topk(t).collect()
    assert rows
    by_probe: dict[int, list] = {}
    for r in rows:
        assert r["doc_id"] != r["probe_doc"]
        by_probe.setdefault(r["probe_doc"], []).append(r)
    assert set(by_probe) == set(range(N_PROBE_DOCS))
    for rs in by_probe.values():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= MAXSIM_TOP_K
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)
