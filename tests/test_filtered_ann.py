"""Metadata-filtered ANN (operators/filtered_ann.py): predicate and
self-exclusion invariants, per-probe rank contiguity, and recall of the
over-probed filtered search against the exact filtered top-k."""

from __future__ import annotations


def _fann_rows(spark, sf_dir):
    from newspapers_etl_spark.operators.filtered_ann import (
        sim_filtered_ann_topk,
    )

    return sim_filtered_ann_topk(spark, sf_dir).collect()


def test_filter_and_self_exclusion(spark, sf_dir, oracle):
    """Every returned neighbour shares the probe's label (pre-filter
    semantics: the predicate bounds the CANDIDATE set) and the probe
    row itself never appears."""
    rows = _fann_rows(spark, sf_dir)
    assert rows, "fixture corpus must produce filtered neighbours"
    labels = dict(
        oracle.sql("SELECT vec_id, label FROM embeddings").fetchall()
    )
    for r in rows:
        assert r["vec_id"] != r["probe_id"]
        assert labels[r["vec_id"]] == labels[r["probe_id"]]


def test_rank_contiguity_per_probe(spark, sf_dir):
    """Ranks are dense 1..n per probe with n <= TOP_K — a gap would
    mean the window ranked rows the filter should have pruned."""
    from newspapers_etl_spark.operators.similarity import TOP_K

    rows = _fann_rows(spark, sf_dir)
    by_probe: dict[int, list[int]] = {}
    for r in rows:
        by_probe.setdefault(r["probe_id"], []).append(r["rnk"])
    for probe, rnks in by_probe.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1)), probe
        assert len(rnks) <= TOP_K


def test_overprobed_recall_vs_exact_filtered_topk(spark, sf_dir, oracle):
    """The reason FANN_NPROBE doubles ivftk's nprobe: a label filter
    keeps ~1/n_labels of each probed cell, so recall under the
    unfiltered nprobe would sag.  Pin a recall floor against the EXACT
    filtered top-k (brute force over the whole label slice, no cell
    restriction) so a regression in the over-probe knob fails loudly."""
    from newspapers_etl_spark.operators.similarity import TOP_K

    rows = _fann_rows(spark, sf_dir)
    got: dict[int, set[int]] = {}
    for r in rows:
        got.setdefault(r["probe_id"], set()).add(r["vec_id"])

    exact = oracle.sql(
        f"""
        WITH sims AS (
          SELECT p.vec_id AS probe_id, e.vec_id,
                 list_sum(list_transform(list_zip(p.embedding, e.embedding),
                   z -> CAST(z[1] AS DOUBLE)*z[2]))
                 / (sqrt(list_sum(list_transform(p.embedding,
                     x -> CAST(x AS DOUBLE)*x)))
                    * sqrt(list_sum(list_transform(e.embedding,
                     x -> CAST(x AS DOUBLE)*x)))) AS sim
          FROM embeddings p
          JOIN embeddings e
            ON e.label = p.label AND e.vec_id <> p.vec_id
          WHERE p.vec_id < 5
        )
        SELECT probe_id, vec_id FROM (
          SELECT probe_id, vec_id,
                 row_number() OVER (PARTITION BY probe_id
                                    ORDER BY sim DESC, vec_id) AS rnk
          FROM sims
        ) WHERE rnk <= {TOP_K}
        """
    ).fetchall()
    want: dict[int, set[int]] = {}
    for probe_id, vec_id in exact:
        want.setdefault(probe_id, set()).add(vec_id)

    recalls = [
        len(got.get(p, set()) & w) / len(w) for p, w in want.items() if w
    ]
    assert recalls
    assert sum(recalls) / len(recalls) >= 0.6, recalls
