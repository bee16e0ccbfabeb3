"""Fitted and residual PQ must WIN on clustered data (VERDICT r5 #5).

The committed fixture is uniform-random — PQ's adversarial case (Jegou
et al. §V), where fit_codebook's docstring honestly records that both
the Lloyd-fitted codebook and residual PQ LOWER recall.  Real embedding
corpora are clustered, and the literature's claim is that there the
ranking flips.  This file closes that loop with a measurement instead
of a citation: a seeded mixture-of-Gaussians fixture on which

    recall(residual-fitted PQ) > recall(fitted PQ) > recall(first-K PQ)

against the exact ranking, restricted to each probe's probed cells so
IVF recall (identical across variants — same coarse quantizer) cancels
out and the comparison isolates codebook quality.

Fixture shape (what makes the comparison meaningful, not rigged):

* Well-separated centers (~N(0,1)^64: inter-center d² ≈ 2·dim) with
  round-robin cluster assignment, so the deterministic first-K seeds
  touch every cluster — the fairest footing for the first-K baseline.
* Within-cluster spread is LOW-RANK (rank-2 latent directions per
  cluster, spread 0.6) plus small isotropic noise — the shape real
  embedding corpora have.  With purely isotropic within-cluster noise
  NO 16-entry codebook can rank same-cluster neighbours (measured:
  all three variants land within noise of each other), so the task
  would distinguish nothing; low-rank residual structure is exactly
  what a fitted codebook can capture and a first-K codebook wastes
  codes re-describing cluster offsets on.
* Fits run 4 Lloyd iterations (the iters knob exists for precisely
  this): measured margins across 5 seeds are fitted ≥ first + 0.04
  and residual ≥ fitted + 0.04; the committed seed's margins are
  comfortably wider, and the run is fully deterministic.
"""

from __future__ import annotations

import numpy as np
import pytest

from newspapers_etl_spark.operators.ivfadc import fit_codebook, ivfadc_topk
from newspapers_etl_spark.operators.similarity import (
    IVF_CELLS,
    IVF_ITERATIONS,
    IVF_NPROBE,
    N_PROBES,
    TOP_K,
    _centroids,
)

pytestmark = pytest.mark.heavy  # 20s fitted-vs-deterministic PQ comparison

N_VECS = 600
N_CLUSTERS = 8
DIM = 64
RANK = 2        # within-cluster latent dimensionality
SPREAD = 0.6    # scale of the low-rank spread
NOISE = 0.05    # residual isotropic noise
FIT_ITERS = 4   # Lloyd steps for the fitted/residual codebooks
SEED = 2024


@pytest.fixture(scope="module")
def clustered_dir(spark, tmp_path_factory):
    """Seeded clustered corpus: separated centers, rank-RANK
    within-cluster spread, small isotropic noise (see module
    docstring for why each ingredient is load-bearing)."""
    rng = np.random.default_rng(SEED)
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    labels = np.arange(N_VECS) % N_CLUSTERS
    basis = rng.standard_normal((N_CLUSTERS, RANK, DIM))
    basis /= np.linalg.norm(basis, axis=2, keepdims=True)
    z = rng.standard_normal((N_VECS, RANK))
    vecs = (
        centers[labels]
        + SPREAD * np.einsum("nr,nrd->nd", z, basis[labels])
        + NOISE * rng.standard_normal((N_VECS, DIM))
    )
    path = tmp_path_factory.mktemp("clustered")
    spark.createDataFrame(
        [
            (int(i), [float(x) for x in vecs[i]], int(labels[i]))
            for i in range(N_VECS)
        ],
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(str(path / "embeddings.parquet"))
    # Float32 round-trip: recompute ground truth from what Spark stored.
    return str(path), vecs.astype(np.float32).astype(np.float64)


def _ground_truth(spark, sf_dir: str, vecs: np.ndarray) -> dict[int, set[int]]:
    """Exact squared-L2 top-K per probe among the members of its
    IVF_NPROBE probed cells — mirrors the query's dot-product cell
    assignment (ties to the smallest cell id) in NumPy."""
    from newspapers_etl_spark.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings")
    cents = _centroids(e, IVF_CELLS, IVF_ITERATIONS)
    cmat = np.array([c for _cid, c in sorted(cents)])  # cell id == row
    scores = vecs @ cmat.T  # (n, cells) dot products
    cells = scores.argmax(axis=1)  # argmax takes the first (smallest) id on ties
    truth: dict[int, set[int]] = {}
    for pid in range(N_PROBES):
        probed = np.argsort(-scores[pid], kind="stable")[:IVF_NPROBE]
        mask = np.isin(cells, probed)
        cand = np.flatnonzero(mask)
        d2 = ((vecs[cand] - vecs[pid]) ** 2).sum(axis=1)
        order = cand[np.lexsort((cand, d2))][:TOP_K]
        truth[pid] = set(int(i) for i in order)
    return truth


def _recall(df, truth: dict[int, set[int]]) -> float:
    got: dict[int, set[int]] = {}
    for r in df.collect():
        got.setdefault(int(r["probe_id"]), set()).add(int(r["vec_id"]))
    return sum(
        len(got.get(pid, set()) & want) / len(want) for pid, want in truth.items()
    ) / len(truth)


def test_fitted_and_residual_pq_win_on_clustered_data(spark, clustered_dir):
    sf_dir, vecs = clustered_dir
    truth = _ground_truth(spark, sf_dir, vecs)

    r_first = _recall(ivfadc_topk(spark, sf_dir), truth)
    fitted = fit_codebook(spark, sf_dir, iters=FIT_ITERS)
    r_fit = _recall(ivfadc_topk(spark, sf_dir, codebook=fitted), truth)
    # One shared quantizer fit between the residual codebook fit and the
    # search — the cents-sharing API the end-to-end residual path uses.
    from newspapers_etl_spark.catalog import load_table

    cents = _centroids(
        load_table(spark, sf_dir, "embeddings"), IVF_CELLS, IVF_ITERATIONS
    )
    res_cb = fit_codebook(
        spark, sf_dir, iters=FIT_ITERS, residual=True, cents=cents
    )
    r_res = _recall(
        ivfadc_topk(spark, sf_dir, codebook=res_cb, residual=True, cents=cents),
        truth,
    )

    # The production-shaped ordering the uniform fixture inverts.
    assert r_fit > r_first, f"fitted {r_fit:.3f} <= first-K {r_first:.3f}"
    assert r_res > r_first, f"residual {r_res:.3f} <= first-K {r_first:.3f}"
    assert r_res >= r_fit, f"residual {r_res:.3f} < fitted {r_fit:.3f}"
