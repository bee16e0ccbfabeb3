"""Semantic invariants for the PCA and IVF-ADC operators beyond the
oracle hash (emb_cov) / rows-only registration (pca_proj, ivfadc):
eigen-structure properties, NumPy ground-truth agreement, and ANN
recall against the exact brute-force ranking."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.operators.ivfadc import SUB_DIM, _adc_table, ivfadc_topk
from newspapers_etl_spark.operators.pca import (
    EMB_DIM,
    PCA_K,
    fit_pca,
    pca_projection,
)
from newspapers_etl_spark.operators.semantic_dedup import (
    PQ_CODEBOOK,
    PQ_SUBSPACES,
    _collect_anchors,
)
from newspapers_etl_spark.plans import shuffle_count


def _embeddings(spark, sf_dir) -> dict[int, np.ndarray]:
    rows = load_table(spark, sf_dir, "embeddings").collect()
    return {int(r.vec_id): np.array(r.embedding, dtype=np.float64) for r in rows}


def test_pca_components_are_orthonormal_and_ordered(spark, sf_dir):
    _mean, comps, vals = fit_pca(spark, sf_dir, PCA_K)
    mat = np.array(comps)
    assert mat.shape == (PCA_K, EMB_DIM)
    gram = mat @ mat.T
    assert np.allclose(gram, np.eye(PCA_K), atol=1e-6), "not orthonormal"
    assert all(a >= b - 1e-12 for a, b in zip(vals, vals[1:])), (
        f"eigenvalues not descending: {vals}"
    )
    assert vals[-1] >= -1e-9, "negative variance from a covariance matrix"


def test_pca_matches_numpy_ground_truth(spark, sf_dir):
    """The distributed covariance → eigh → literal-projection pipeline
    must agree with NumPy doing the whole job locally: same leading
    eigenvalues, and per-vector scores equal up to the covariance
    rounding (the projection itself is exact)."""
    emb = _embeddings(spark, sf_dir)
    x = np.stack([emb[k] for k in sorted(emb)])
    centered = x - x.mean(axis=0)
    cov = centered.T @ centered / len(x)
    vals_np = np.sort(np.linalg.eigvalsh(cov))[::-1][:PCA_K]
    _mean, comps, vals = fit_pca(spark, sf_dir, PCA_K)
    # fit_pca's covariance is rounded to 6dp before eigh
    assert np.allclose(vals, vals_np, atol=1e-3), (vals, vals_np.tolist())
    scores = {
        (r.vec_id, r.component): r.score
        for r in pca_projection(spark, sf_dir).collect()
    }
    assert len(scores) == len(emb) * PCA_K
    mean_vec = x.mean(axis=0)
    for vid in sorted(emb)[:20]:
        got = np.array([scores[(vid, c)] for c in range(PCA_K)])
        want = np.array(comps) @ (emb[vid] - mean_vec)
        assert np.allclose(got, want, atol=1e-3), f"vec {vid}: {got} vs {want}"


def test_pca_score_variance_tracks_eigenvalues(spark, sf_dir):
    _mean, _comps, vals = fit_pca(spark, sf_dir, PCA_K)
    var_rows = (
        pca_projection(spark, sf_dir)
        .groupBy("component")
        .agg(F.var_pop("score").alias("v"))
        .collect()
    )
    got = {r.component: r.v for r in var_rows}
    for c, lam in enumerate(vals):
        assert got[c] == pytest.approx(lam, rel=5e-3, abs=1e-4), (
            f"component {c}: score variance {got[c]} vs eigenvalue {lam}"
        )


def test_pca_projection_is_map_only(spark, sf_dir):
    """The 100 TB contract: projecting N vectors is one scan, ZERO
    exchanges — the fitted model rides in the plan as literals."""
    assert shuffle_count(pca_projection(spark, sf_dir)) == 0


def test_ivfadc_distance_matches_numpy_adc(spark, sf_dir):
    """Every returned adc_dist must equal the NumPy-computed asymmetric
    distance between the probe and the candidate's PQ reconstruction —
    the in-plan table-lookup fold is exact, not approximate, w.r.t. the
    model."""
    emb = _embeddings(spark, sf_dir)
    codebook = _collect_anchors(spark, sf_dir, k=PQ_CODEBOOK)
    cb = {code: np.array(vec) for code, vec in codebook}

    def encode(v: np.ndarray) -> list[int]:
        out = []
        for m in range(PQ_SUBSPACES):
            s = slice(m * SUB_DIM, (m + 1) * SUB_DIM)
            best = min(
                ((float(np.sum((v[s] - cb[c][s]) ** 2)), c) for c in sorted(cb)),
                key=lambda t: (round(t[0], 6), t[1]),
            )
            out.append(best[1])
        return out

    rows = ivfadc_topk(spark, sf_dir).collect()
    assert rows, "no candidates returned"
    for r in rows:
        q = emb[r.probe_id]
        codes = encode(emb[r.vec_id])
        dtab = _adc_table([float(x) for x in q], codebook)
        want = sum(dtab[m * PQ_CODEBOOK + codes[m]] for m in range(PQ_SUBSPACES))
        assert r.adc_dist == pytest.approx(want, abs=2e-6), (
            f"probe {r.probe_id} cand {r.vec_id}: {r.adc_dist} vs {want}"
        )


def test_ivfadc_recall_against_bruteforce(spark, sf_dir):
    """IVF-ADC trades accuracy for 32x compression; it must still agree
    with the exact L2 brute-force ranking well above chance.  Floor
    calibrated on the fixture (random vectors — the HARDEST case for
    PQ; structured real embeddings do far better)."""
    from newspapers_etl_spark.operators.similarity import N_PROBES, TOP_K

    emb = _embeddings(spark, sf_dir)
    got: dict[int, set[int]] = {}
    for r in ivfadc_topk(spark, sf_dir).collect():
        got.setdefault(r.probe_id, set()).add(r.vec_id)
    assert set(got) == set(range(N_PROBES))
    ids = sorted(emb)
    mat = np.stack([emb[i] for i in ids])
    hits = total = 0
    for pid in range(N_PROBES):
        d = np.sum((mat - emb[pid]) ** 2, axis=1)
        exact = {ids[i] for i in np.argsort(d)[:TOP_K]}
        hits += len(exact & got[pid])
        total += TOP_K
    recall = hits / total
    assert recall >= 0.2, f"recall@{TOP_K} vs exact L2 = {recall:.2f}"


def test_ivfadc_corpus_never_shuffles_before_probe_join(spark, sf_dir):
    """The index-scan contract: the corpus side (cell + codes, no raw
    vectors) must reach the probe join via broadcast hash join with no
    corpus-side exchange; the only exchange in the plan is the bounded
    per-probe top-k window."""
    from newspapers_etl_spark.plans import executed_plan as _plan

    plan = _plan(ivfadc_topk(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, "probe set not broadcast"
    assert "CartesianProduct" not in plan
    # every non-broadcast exchange must be the top-k window's probe_id
    # hash partitioning — never the corpus relation
    for i, chunk in enumerate(plan.split("Exchange ")[1:]):
        head = chunk.splitlines()[0]
        if "SinglePartition" in head or "broadcast" in head.lower():
            continue
        assert "probe_id" in head, f"unexpected exchange {i}: {head}"
        assert "embedding" not in head and "codes" not in head


def test_ivfadc_fitted_codebook_path_runs_and_ranks(spark, sf_dir):
    """The production codebook source (per-subspace k-means) must plug
    into the identical plan: same output shape, every probe served,
    ADC distances non-negative and ranked ascending.  (On the uniform
    fixture the fit measurably LOWERS recall — see fit_codebook's
    docstring — so the recall floor is only asserted for the default
    first-K path above.)"""
    from newspapers_etl_spark.operators.ivfadc import fit_codebook
    from newspapers_etl_spark.operators.similarity import N_PROBES, TOP_K

    cb = fit_codebook(spark, sf_dir)
    assert len(cb) == PQ_CODEBOOK
    assert all(len(v) == EMB_DIM for _c, v in cb)
    rows = ivfadc_topk(spark, sf_dir, codebook=cb).collect()
    by_probe: dict[int, list] = {}
    for r in rows:
        by_probe.setdefault(r.probe_id, []).append(r)
    assert set(by_probe) == set(range(N_PROBES))
    for pid, rs in by_probe.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TOP_K
        dists = [r.adc_dist for r in rs]
        assert all(d >= 0 for d in dists)
        assert dists == sorted(dists)


def test_ivfadc_residual_path_keeps_corpus_map_only(spark, sf_dir):
    """The residual recipe must not change the index-scan contract: the
    centering matrix is a literal indexed by the assigned cell, so the
    corpus side still reaches the probe join broadcast-joined with no
    corpus-side exchange, and raw vectors still never enter an exchange.
    Output contract mirrors the fitted-path test."""
    from newspapers_etl_spark.operators.ivfadc import fit_codebook
    from newspapers_etl_spark.operators.similarity import N_PROBES, TOP_K
    from newspapers_etl_spark.plans import executed_plan as _plan

    cb = fit_codebook(spark, sf_dir, residual=True)
    assert len(cb) == PQ_CODEBOOK
    df = ivfadc_topk(spark, sf_dir, codebook=cb, residual=True)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, "probe set not broadcast"
    assert "CartesianProduct" not in plan
    for i, chunk in enumerate(plan.split("Exchange ")[1:]):
        head = chunk.splitlines()[0]
        if "SinglePartition" in head or "broadcast" in head.lower():
            continue
        assert "probe_id" in head, f"unexpected exchange {i}: {head}"
        assert "embedding" not in head and "codes" not in head
    by_probe: dict[int, list] = {}
    for r in df.collect():
        by_probe.setdefault(r.probe_id, []).append(r)
    assert set(by_probe) == set(range(N_PROBES))
    for _pid, rs in by_probe.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TOP_K
        dists = [r.adc_dist for r in rs]
        assert all(d >= 0 for d in dists)
        assert dists == sorted(dists)


def test_ivfadc_stored_index_prunes_partitions(spark, sf_dir, tmp_path):
    """The 100 TB contract in ivfadc's docstring made testable: the
    encode output (vec_id, cell, codes — no vectors) written ONCE
    partitioned by cell IS the index, and a probe batch reading it back
    with a cell filter must scan only the probed cells' partitions
    (PartitionFilters at the parquet scan, not a post-scan filter) and
    produce the same candidate set as the in-memory path."""
    from pyspark.sql import functions as F

    from newspapers_etl_spark.catalog import load_table
    from newspapers_etl_spark.operators.ivfadc import _ranked_cells
    from newspapers_etl_spark.operators.semantic_dedup import (
        _collect_anchors,
        _nearest_code,
    )
    from newspapers_etl_spark.operators.similarity import (
        IVF_CELLS,
        IVF_ITERATIONS,
        N_PROBES,
        _centroids,
        _nearest_cell,
    )

    e = load_table(spark, sf_dir, "embeddings")
    cents = _centroids(e, IVF_CELLS, IVF_ITERATIONS)
    codebook = _collect_anchors(spark, sf_dir, k=PQ_CODEBOOK)
    codes = F.array(
        *[_nearest_code(m, codebook)["code"] for m in range(PQ_SUBSPACES)]
    )
    index = e.select(
        "vec_id", _nearest_cell("embedding", cents).alias("cell"), codes.alias("codes")
    )
    out = str(tmp_path / "ivf_index")
    index.write.partitionBy("cell").parquet(out)

    # TWO probes, not the full N_PROBES set: the contract under test is
    # partition PRUNING, which needs the probed-cell union to be a
    # proper subset of all cells.  2 probes x IVF_NPROBE=2 cells <= 4 <
    # IVF_CELLS=8 cells STRUCTURALLY — the old N_PROBES-wide union
    # sometimes covered all 8 (the Lloyd update's float avg is
    # summation-order nondeterministic across sessions, so cell
    # boundaries wobble by an ulp) and tripped the vacuous-test guard
    # flakily.
    n_pruning_probes = min(2, N_PROBES)
    probes = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in e.filter(F.col("vec_id") < n_pruning_probes)
        .select("vec_id", "embedding")
        .collect()
    ]
    probed = sorted({c for _pid, v in probes for c in _ranked_cells(v, cents)})
    assert len(probed) < IVF_CELLS, "fixture probes every cell — test is vacuous"

    stored = spark.read.parquet(out).filter(F.col("cell").isin(probed))
    plan = stored._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "cell" in pf, f"cell filter not pushed to partition pruning: {pf}"

    # The pruned read serves exactly the in-memory candidate set.
    mem = {
        (r.vec_id, tuple(r.codes))
        for r in index.filter(F.col("cell").isin(probed)).collect()
    }
    disk = {(r.vec_id, tuple(r.codes)) for r in stored.collect()}
    assert disk == mem and disk, f"stored index diverges ({len(disk)} vs {len(mem)})"


def test_ivfadc_residual_without_residual_codebook_refuses():
    """residual=True with the default raw-space codebook would silently
    mis-rank (origin-space anchors vs centered vectors) — the API must
    refuse, not degrade."""
    import pytest

    from newspapers_etl_spark.operators.ivfadc import ivfadc_topk

    with pytest.raises(ValueError, match="residual-space codebook"):
        ivfadc_topk(None, "/nonexistent", residual=True)


def test_registered_ivfadc_r_serves_every_probe_ranked(spark, sf_dir):
    """The REGISTERED end-to-end residual query (`ivfadcr`: shared
    quantizer fit + residual codebook + residual search) honors the same
    output contract as the component paths above — every probe served,
    contiguous ranks, non-negative ascending ADC distances — so a
    regression anywhere in the fit→center→encode→score composition is
    test-visible, not just bench-visible."""
    from newspapers_etl_spark.operators.ivfadc import ivfadc_residual_topk
    from newspapers_etl_spark.operators.similarity import N_PROBES, TOP_K

    by_probe: dict[int, list] = {}
    for r in ivfadc_residual_topk(spark, sf_dir).collect():
        by_probe.setdefault(r.probe_id, []).append(r)
    assert set(by_probe) == set(range(N_PROBES))
    for _pid, rs in by_probe.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TOP_K
        dists = [r.adc_dist for r in rs]
        assert all(d >= 0 for d in dists)
        assert dists == sorted(dists)


def test_ivfadc_oracle_constants_match_canonical():
    """IVFADC_ORACLE is built from literal copies of the model constants
    (the canonical modules register queries at import time, so the
    oracle string cannot import them without splicing registration
    order); this pins the copies to the canonical values."""
    import newspapers_etl_spark.operators.ivfadc as iv
    from newspapers_etl_spark.operators import semantic_dedup as sd
    from newspapers_etl_spark.operators import similarity as sim

    assert iv._OC_CELLS == sim.IVF_CELLS
    assert iv._OC_ITERS == sim.IVF_ITERATIONS
    assert iv._OC_N_PROBES == sim.N_PROBES
    assert iv._OC_NPROBE == sim.IVF_NPROBE
    assert iv._OC_TOP_K == sim.TOP_K
    assert iv._OC_CODES == sd.PQ_CODEBOOK
    assert iv._OC_SUBS == sd.PQ_SUBSPACES
    assert iv._OC_SUB_DIM == sd.EMB_DIM // sd.PQ_SUBSPACES
