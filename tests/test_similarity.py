"""Similarity-search invariants beyond the oracle diff (SURVEY.md §5.2
item 5): self-consistency and ANN recall vs the exact baseline."""

from __future__ import annotations

from newspapers_etl_spark.operators.similarity import (
    TOP_K,
    sim_ann_ivf_topk,
    sim_ann_lsh_topk,
    sim_topk_bruteforce,
)


def test_self_nearest_neighbor_is_self(spark, sf_dir):
    """Rank-1 neighbor of every probe is the probe itself at sim 1.0."""
    top1 = {
        r.probe_id: r
        for r in sim_topk_bruteforce(spark, sf_dir).filter("rnk = 1").collect()
    }
    assert top1, "no probes returned"
    for probe_id, r in top1.items():
        assert r.vec_id == probe_id
        assert abs(r.sim - 1.0) < 1e-6


def test_ann_includes_self_and_is_subset_ranked(spark, sf_dir):
    """ANN top-k: (a) contains the probe itself (same vector → same
    bucket, guaranteed hit), (b) every returned neighbor appears at the
    same-or-better sim than the exact baseline's k-th (ANN never invents
    similarity, only misses candidates)."""
    ann = sim_ann_lsh_topk(spark, sf_dir).collect()
    assert ann
    by_probe: dict[int, list] = {}
    for r in ann:
        by_probe.setdefault(r.probe_id, []).append(r)
    exact = sim_topk_bruteforce(spark, sf_dir).collect()
    exact_sims = {(r.probe_id, r.vec_id): r.sim for r in exact}
    for probe_id, rows in by_probe.items():
        assert any(r.vec_id == probe_id for r in rows), "self not in own bucket"
        assert len(rows) <= TOP_K
        for r in rows:
            if (probe_id, r.vec_id) in exact_sims:
                assert abs(r.sim - exact_sims[(probe_id, r.vec_id)]) < 1e-9


def test_ivf_includes_self_and_scores_match_exact(spark, sf_dir):
    """IVF ANN: the probe's own vector is always in the probe's nearest
    cell (it IS that cell's member), so rank-1 is self at 1.0; any
    neighbor shared with the brute-force baseline carries the identical
    similarity (IVF only restricts candidates, never rescores)."""
    ivf = sim_ann_ivf_topk(spark, sf_dir).collect()
    assert ivf
    by_probe: dict[int, list] = {}
    for r in ivf:
        by_probe.setdefault(r.probe_id, []).append(r)
    exact_sims = {
        (r.probe_id, r.vec_id): r.sim
        for r in sim_topk_bruteforce(spark, sf_dir).collect()
    }
    for probe_id, rows in by_probe.items():
        top = min(rows, key=lambda r: r.rnk)
        assert top.vec_id == probe_id and abs(top.sim - 1.0) < 1e-6
        assert len(rows) <= TOP_K
        for r in rows:
            if (probe_id, r.vec_id) in exact_sims:
                assert abs(r.sim - exact_sims[(probe_id, r.vec_id)]) < 1e-9


def test_lloyd_centroids_are_deterministic_across_plans(spark, sf_dir):
    """The fitted quantizer must be BIT-IDENTICAL however Spark
    schedules the fit: F.avg accumulates in partition/summation order,
    which varies across sessions and shuffle layouts by an ulp, and an
    unrounded model let two sessions disagree in downstream rounded
    scores (this flaked the pruning-subset guard in r7).  The fix is
    driver-side 9-dp rounding of every refined component — asserted
    here by fitting under two different shuffle layouts and comparing
    exactly, and by checking the components actually carry <= 9
    decimals."""
    from newspapers_etl_spark.catalog import load_table
    from newspapers_etl_spark.operators.similarity import (
        IVF_CELLS,
        IVF_ITERATIONS,
        _centroids,
    )

    e = load_table(spark, sf_dir, "embeddings")
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = _centroids(e, IVF_CELLS, IVF_ITERATIONS)
        # same source partitioning (the seeded sample is per-partition
        # deterministic) but a different aggregation layout: the
        # groupBy(cell, pos) exchange merges partials in a different
        # order, which is exactly the wobble the rounding must absorb
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = _centroids(e, IVF_CELLS, IVF_ITERATIONS)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b, "fitted quantizer differs across shuffle layouts"
    for _cid, vec in a:
        for x in vec:
            assert x == round(x, 9), f"component {x!r} not 9-dp rounded"
