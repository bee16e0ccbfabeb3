"""Semantic invariants for the SemDeDup / PQ operators beyond the
oracle hash (which tests/test_relational.py already covers for both):
the prune verdict must agree with the pair-level embedding dedup where
their domains overlap, and the PQ encoding must be self-consistent."""

from __future__ import annotations

from newspapers_etl_spark.operators.dedup import dedup_embedding_neardup
from newspapers_etl_spark.operators.semantic_dedup import (
    PQ_CODEBOOK,
    PQ_SUBSPACES,
    SEMDEDUP_THRESHOLD,
    pq_codes,
    semdedup,
)
from newspapers_etl_spark.plans import shuffle_count


def test_semdedup_agrees_with_pairwise_neardup(spark, sf_dir):
    """Every dedup_emb pair (exact cosine >= the shared threshold) whose
    two ends land in the SAME cluster must prune the higher id — the
    clustered search can only MISS pairs that straddle clusters, never
    disagree on a pair it does see.  And the lowest id of every cluster
    is always kept (nothing below it exists to prune it)."""
    verdicts = {
        r["vec_id"]: (r["cluster_id"], r["is_pruned"])
        for r in semdedup(spark, sf_dir).collect()
    }
    pairs = dedup_embedding_neardup(spark, sf_dir).collect()
    same_cluster = [
        (r["id_a"], r["id_b"])
        for r in pairs
        if r["cos_sim"] >= SEMDEDUP_THRESHOLD
        and verdicts[r["id_a"]][0] == verdicts[r["id_b"]][0]
    ]
    assert same_cluster, "fixture should plant same-cluster near-dups"
    for id_a, id_b in same_cluster:
        assert verdicts[max(id_a, id_b)][1], (
            f"pair ({id_a},{id_b}) shares a cluster and exceeds the "
            "threshold but the higher id was not pruned"
        )
    cluster_min: dict[int, int] = {}
    for vid, (cid, _) in verdicts.items():
        cluster_min[cid] = min(cluster_min.get(cid, vid), vid)
    for cid, vid in cluster_min.items():
        assert not verdicts[vid][1], f"cluster {cid} minimum {vid} was pruned"


def test_pq_codes_shape_and_self_encoding(spark, sf_dir):
    rows = pq_codes(spark, sf_dir).collect()
    n_vecs = len({r["vec_id"] for r in rows})
    assert len(rows) == n_vecs * PQ_SUBSPACES
    for r in rows:
        assert 0 <= r["code"] < PQ_CODEBOOK
        assert r["sq_err"] >= 0.0
    # A codebook vector encodes its own subspace with zero error (its
    # distance to itself is exactly 0; ties keep the smallest code, so
    # err stays 0 even if another entry coincides).
    for r in rows:
        if r["vec_id"] < PQ_CODEBOOK:
            assert r["sq_err"] == 0.0, (
                f"anchor {r['vec_id']} subspace {r['subspace']} "
                f"reconstructs with err {r['sq_err']}"
            )


def test_pq_encoding_is_map_only(spark, sf_dir):
    """The 100 TB contract: encoding N vectors is one scan, ZERO
    exchanges — the codebook rides in the plan as a literal, never as a
    join side."""
    assert shuffle_count(pq_codes(spark, sf_dir)) == 0
