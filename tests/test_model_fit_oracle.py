"""Pre-staged r10 oracle conversions for the model-fit bench handles:
the EXACT-fit (fit_fraction=1.0) fit_anc and fit_pq outputs must
hash-match their DuckDB Lloyd mirrors (functions/lloyd_sql.py), clause
for clause, before the registered defaults flip in the r10 window
(see model_fit.py's module docstring for the flip plan)."""

from __future__ import annotations

from tests.conftest import assert_matches_oracle


def test_fit_anc_exact_matches_lloyd_mirror(spark, sf_dir, oracle):
    """fit_anchor_centroids(fit_fraction=1.0) == the lloyd_centroid_ctes
    recursion emitted as (anchor_id, dim, val) rows at 6 dp."""
    from newspapers_etl_spark.functions.lloyd_sql import centroid_model_rows_sql
    from newspapers_etl_spark.operators.model_fit import fit_anchor_centroids
    from newspapers_etl_spark.operators.semantic_dedup import N_ANCHORS

    assert_matches_oracle(
        fit_anchor_centroids(spark, sf_dir, fit_fraction=1.0),
        oracle,
        centroid_model_rows_sql(N_ANCHORS, 2, "anchor_id"),
    )


def test_fit_pq_exact_matches_subspace_lloyd_mirror(spark, sf_dir, oracle):
    """fit_pq_codebook(fit_fraction=1.0) == the raw-vector per-subspace
    Lloyd recursion (pq_codebook_ctes) emitted as (code, dim, val) rows
    at 6 dp — seeds, 6-dp argmin assignment with smallest-code ties,
    and 9-dp mean updates all mirrored."""
    from newspapers_etl_spark.functions.lloyd_sql import pq_model_rows_sql
    from newspapers_etl_spark.operators.ivfadc import CB_ITERATIONS
    from newspapers_etl_spark.operators.model_fit import fit_pq_codebook
    from newspapers_etl_spark.operators.semantic_dedup import (
        EMB_DIM,
        PQ_CODEBOOK,
        PQ_SUBSPACES,
    )

    assert_matches_oracle(
        fit_pq_codebook(spark, sf_dir, fit_fraction=1.0),
        oracle,
        pq_model_rows_sql(
            PQ_CODEBOOK,
            PQ_SUBSPACES,
            EMB_DIM // PQ_SUBSPACES,
            CB_ITERATIONS,
        ),
    )


def test_fit_handles_sampled_defaults_unchanged(spark, sf_dir):
    """The registered (sampled) defaults did NOT change with the
    fit_fraction plumbing: the handles still run the seeded-sample fit
    and produce the model-sized row counts the driver has hashed."""
    from newspapers_etl_spark.operators.model_fit import (
        fit_anchor_centroids,
        fit_pq_codebook,
    )
    from newspapers_etl_spark.operators.semantic_dedup import (
        EMB_DIM,
        N_ANCHORS,
        PQ_CODEBOOK,
    )

    assert fit_anchor_centroids(spark, sf_dir).count() == N_ANCHORS * EMB_DIM
    assert fit_pq_codebook(spark, sf_dir).count() == PQ_CODEBOOK * EMB_DIM
