"""Centroid refresh decision (operators/ivf_refresh.py): oracle parity,
exact decision math on a hand-built index, refreshed-means algebra, and
drift sensitivity (a stable clustered corpus reports ~zero churn; a
batch that dilutes one cell and enriches another raises it)."""

import pytest
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table, table_path
from newspapers_etl_spark.operators.ivf_refresh import (
    IVF_REF_ORACLE,
    REFRESH_CHURN_THRESHOLD,
    centroid_refresh_decision,
    ivf_centroid_refresh,
    refreshed_centroids,
)


def test_ivf_ref_matches_oracle(spark, sf_dir, oracle):
    from conftest import assert_matches_oracle

    assert_matches_oracle(
        ivf_centroid_refresh(spark, sf_dir), oracle, IVF_REF_ORACLE
    )


def test_decision_math_on_hand_built_index(spark, tmp_path):
    """Full control: write model/codes/stats directly, hand-compute the
    expected row.  dim=16 -> 2 subspaces; codebook code0=axis0,
    code1=axis8 (one per subspace half).  Stats place cell 0's
    refreshed mean on axis 8 and cell 1's on axis 0 — so a vector
    decoded to axis 0 but stored in cell 0 MUST move, and one decoded
    to axis 8 in cell 0 must stay."""
    path = str(tmp_path / "idx")

    def vec(axis, mag=1.0, dim=16):
        v = [0.0] * dim
        v[axis] = mag
        return v

    spark.createDataFrame(
        [(0, vec(0)), (1, vec(8))], "cell int, cvec array<double>"
    ).write.parquet(f"{path}/model/centroids")
    spark.createDataFrame(
        [(0, vec(0)), (1, vec(8))], "code int, kvec array<double>"
    ).write.parquet(f"{path}/model/codebook")
    # recon: codes [a, b] -> codebook[a][0:8] ++ codebook[b][8:16]
    #   [0, 1] -> axis0 + axis8;  [0, 0] -> axis0 only;  [1, 1] -> axis8
    spark.createDataFrame(
        [
            (10, 0, [0, 0]),  # recon axis0, cell0 (mean axis8) -> MOVES to 1
            (11, 0, [1, 1]),  # recon axis8, cell0 -> stays
            (12, 1, [0, 0]),  # recon axis0, cell1 (mean axis0) -> stays
            (13, 1, [1, 1]),  # recon axis8, cell1 -> MOVES to 0
        ],
        "vec_id long, cell int, codes array<int>",
    ).write.parquet(f"{path}/codes")
    spark.createDataFrame(
        [(0, 2, vec(8, 2.0)), (1, 2, vec(0, 2.0))],
        "cell int, n long, svec array<double>",
    ).write.parquet(f"{path}/stats")

    row = centroid_refresh_decision(spark, path).collect()[0]
    assert (row["total"], row["moved"]) == (4, 2)
    assert row["churn"] == 0.5
    assert row["refresh"] is True

    assert refreshed_centroids(spark, path) == [
        (0, vec(8)),
        (1, vec(0)),
    ]


def _clustered(n_per_axis, axes, extra=()):
    """vec_ids 0..: the first len(axes) rows are one seed per axis (the
    Lloyd seeds AND the codebook head), then the clusters round-robin;
    ``extra`` rows append after with continuing ids."""
    rows = []
    i = 0
    for rep in range(n_per_axis):
        for a in axes:
            v = [0.0] * 64
            v[a] = 1.0 + 0.001 * (i % 7)
            rows.append((i, v))
            i += 1
    out = [(i + j, v) for j, v in enumerate(extra)]
    return rows, out


def test_stable_corpus_low_churn_diluted_index_higher(spark, tmp_path):
    """Sensitivity: 8 tight axis clusters (k=8 cells, one seed each) ->
    refreshed means sit on the frozen cells and churn ~ 0; appending a
    batch that DILUTES cell 0 (orthogonal axis-4.5-direction mass
    assigned there by tie-break)... instead, measurably: dilute cell 0
    with axis-4 mass while ENRICHING cell 1 with axis-0 mass — axis-0
    members' reconstructions now dot higher against cell 1's refreshed
    mean than their own diluted cell's, so they churn."""
    from newspapers_etl_spark.operators.ivf_maintenance import (
        append_ivf_index,
        build_ivf_index,
        fit_models,
    )

    axes = [0, 1, 2, 3, 8, 9, 10, 11]
    base_rows, _ = _clustered(25, axes)
    sdir = str(tmp_path / "stable")
    spark.createDataFrame(
        base_rows, "vec_id long, embedding array<float>"
    ).write.parquet(table_path(sdir, "embeddings"))
    e = load_table(spark, sdir, "embeddings")

    path = str(tmp_path / "idx")
    models = fit_models(e)
    build_ivf_index(spark, e, path, models=models)
    base = centroid_refresh_decision(spark, path).collect()[0]
    assert base["churn"] < REFRESH_CHURN_THRESHOLD
    assert base["refresh"] is False

    # drift batch: axis-4 mass lands in some axis-0..3 cell by
    # tie-break (all dots ~0) diluting it; [0.6 axis0 + 0.9 axis1]
    # vectors land in the axis-1 cell and drag its mean toward axis 0.
    def v64(pairs):
        v = [0.0] * 64
        for a, m in pairs:
            v[a] = m
        return v

    drift = [v64([(4, 1.0)]) for _ in range(75)] + [
        v64([(0, 0.6), (1, 0.9)]) for _ in range(75)
    ]
    bdir = str(tmp_path / "driftb")
    spark.createDataFrame(
        [(1000 + j, v) for j, v in enumerate(drift)],
        "vec_id long, embedding array<float>",
    ).write.parquet(table_path(bdir, "embeddings"))
    append_ivf_index(
        spark, load_table(spark, bdir, "embeddings"), path, batch_id="b1"
    )

    drifted = centroid_refresh_decision(spark, path).collect()[0]
    assert drifted["churn"] > base["churn"]
    assert drifted["moved"] > 0


def test_decision_on_emptied_index_is_null_not_error(spark, sf_dir, tmp_path):
    """All codes deleted: (0, 0, NULL, NULL) — nothing to churn,
    nothing to decide, no crash."""
    from newspapers_etl_spark.operators.ivf_maintenance import (
        FIT_PREDICATE,
        build_ivf_index,
        delete_from_ivf_index,
        fit_models,
    )

    e = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "idx")
    models = fit_models(e.filter(F.expr(FIT_PREDICATE)))
    build_ivf_index(spark, e, path, e_encode=e, models=models)
    delete_from_ivf_index(spark, e, path, "dall")
    row = centroid_refresh_decision(spark, path).collect()[0]
    assert (row["total"], row["moved"]) == (0, 0)
    assert row["churn"] is None and row["refresh"] is None


# --------------------------------------------------------------- rebuild


REBUILD_DEL = "vec_id % 5 = 0"


def _codes_rows(df):
    return sorted(
        (r["vec_id"], r["cell"], tuple(r["codes"])) for r in df.collect()
    )


def _stats_rows(df):
    return sorted(
        (r["cell"], r["n"], tuple(r["svec"])) for r in df.collect()
    )


def _lifecycle_index(spark, sf_dir, path):
    from newspapers_etl_spark.operators.ivf_maintenance import (
        FIT_PREDICATE,
        build_ivf_index,
        delete_from_ivf_index,
        fit_models,
    )

    e = load_table(spark, sf_dir, "embeddings")
    models = fit_models(e.filter(F.expr(FIT_PREDICATE)))
    build_ivf_index(spark, e, path, e_encode=e, models=models)
    delete_from_ivf_index(spark, e.filter(F.expr(REBUILD_DEL)), path, "d1")
    return e


@pytest.mark.heavy
def test_rebuild_equals_fresh_build_on_survivors_bit_for_bit(
    spark, sf_dir, tmp_path
):
    """History must leave no trace: build + delete + rebuild ==
    build-from-scratch over the survivors with the survivors' fit slice
    — codes, stats AND both frozen models exactly."""
    from newspapers_etl_spark.operators.ivf_maintenance import (
        FIT_PREDICATE,
        _read_model,
        build_ivf_index,
        fit_models,
        read_ivf_codes,
        rebuild_ivf_index,
    )
    from newspapers_etl_spark.sinks.verified import read_current

    incr = str(tmp_path / "incr")
    e = _lifecycle_index(spark, sf_dir, incr)
    rebuild_ivf_index(spark, e, incr)

    fresh = str(tmp_path / "fresh")
    survivors = e.filter(~F.expr(REBUILD_DEL))
    models = fit_models(survivors.filter(F.expr(FIT_PREDICATE)))
    build_ivf_index(spark, survivors, fresh, e_encode=survivors, models=models)

    assert _read_model(spark, incr) == _read_model(spark, fresh)
    assert _codes_rows(read_ivf_codes(spark, incr)) == _codes_rows(
        read_ivf_codes(spark, fresh)
    )
    assert _stats_rows(read_current(spark, f"{incr}/stats")) == _stats_rows(
        spark.read.parquet(f"{fresh}/stats")
    )


@pytest.mark.heavy
def test_rebuild_crash_before_publish_leaves_old_index_and_retries(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The rebuild's one non-atomic seam: everything staged and renamed
    but the pointer not flipped — readers must still resolve the OLD
    index (old models included), and the retry must complete, replacing
    the staged generation wholesale."""
    from newspapers_etl_spark.operators.ivf_maintenance import (
        _read_model,
        read_ivf_codes,
        rebuild_ivf_index,
    )
    from newspapers_etl_spark.sinks import verified

    path = str(tmp_path / "idx")
    e = _lifecycle_index(spark, sf_dir, path)
    before_codes = _codes_rows(read_ivf_codes(spark, path))
    before_model = _read_model(spark, path)

    real = verified.publish_generation

    def boom(*a, **kw):
        raise RuntimeError("injected: died before pointer flip")

    monkeypatch.setattr(verified, "publish_generation", boom)
    with pytest.raises(RuntimeError):
        rebuild_ivf_index(spark, e, path)
    monkeypatch.undo()
    assert _codes_rows(read_ivf_codes(spark, path)) == before_codes
    assert _read_model(spark, path) == before_model

    new_root = rebuild_ivf_index(spark, e, path)  # retry from scratch
    ptr = verified.current_pointer(f"{path}/stats")
    assert ptr["codes_root"] == f"{new_root}/codes"
    assert ptr["model_root"] == f"{new_root}/model"
    assert ptr["live_batches"] == [] and ptr["live_tombstones"] == []


@pytest.mark.heavy
def test_rebuild_reaps_superseded_roots_and_keeps_applied_ledgers(
    spark, sf_dir, tmp_path
):
    """After the flip the old codes/model/tombstone roots are gone, the
    append-only ledgers survive, and a late retry of a pre-rebuild
    delete or append stays a no-op."""
    import os

    from newspapers_etl_spark.operators.ivf_maintenance import (
        delete_from_ivf_index,
        read_ivf_codes,
        rebuild_ivf_index,
    )
    from newspapers_etl_spark.sinks.verified import current_pointer

    path = str(tmp_path / "idx")
    e = _lifecycle_index(spark, sf_dir, path)
    rebuild_ivf_index(spark, e, path)
    after = _codes_rows(read_ivf_codes(spark, path))

    assert not os.path.exists(f"{path}/codes")
    assert not os.path.exists(f"{path}/model")
    assert not os.path.exists(f"{path}/tombs-batch-d1")
    ptr = current_pointer(f"{path}/stats")
    assert ptr["applied_deletes"] == ["d1"]
    assert ptr["reap_roots"] == []

    # late retry of the pre-rebuild delete: applied ledger no-ops it
    delete_from_ivf_index(spark, e.filter(F.expr(REBUILD_DEL)), path, "d1")
    assert _codes_rows(read_ivf_codes(spark, path)) == after


def test_ivf_rb_matches_oracle(spark, sf_dir, oracle):
    from conftest import assert_matches_oracle

    from newspapers_etl_spark.operators.ivf_refresh import (
        IVF_RB_ORACLE,
        ivf_rebuild_roundtrip,
    )

    assert_matches_oracle(
        ivf_rebuild_roundtrip(spark, sf_dir), oracle, IVF_RB_ORACLE
    )


@pytest.mark.heavy
def test_crashed_rebuild_orphan_is_healed_by_next_maintenance(
    spark, sf_dir, tmp_path, monkeypatch
):
    """A rebuild that dies between the rename and the publish leaves an
    unreferenced rebuild-N root (a full index copy).  If the operator
    then decides NOT to retry the rebuild, the next compaction (or any
    later rebuild) must reap the orphan — and must never touch a
    rebuild root the pointer DOES reference."""
    import os

    from newspapers_etl_spark.operators.ivf_maintenance import (
        compact_ivf_codes,
        read_ivf_codes,
        rebuild_ivf_index,
    )
    from newspapers_etl_spark.sinks import verified

    path = str(tmp_path / "idx")
    e = _lifecycle_index(spark, sf_dir, path)
    before = _codes_rows(read_ivf_codes(spark, path))

    def boom(*a, **kw):
        raise RuntimeError("injected: died before pointer flip")

    monkeypatch.setattr(verified, "publish_generation", boom)
    with pytest.raises(RuntimeError):
        rebuild_ivf_index(spark, e, path)
    monkeypatch.undo()
    assert os.path.exists(f"{path}/rebuild-0001")  # the orphan

    compact_ivf_codes(spark, path)  # operator compacts instead
    assert not os.path.exists(f"{path}/rebuild-0001")
    assert _codes_rows(read_ivf_codes(spark, path)) == before

    # a LIVE rebuild root must survive later maintenance heals
    new_root = rebuild_ivf_index(spark, e, path)
    assert os.path.exists(f"{path}/{new_root}")
    compact_after = compact_ivf_codes(spark, path)
    # compaction moved codes out of the rebuild root but the model
    # still lives there: the shell must NOT be reaped
    ptr = verified.current_pointer(f"{path}/stats")
    assert ptr["codes_root"] == compact_after
    assert ptr["model_root"] == f"{new_root}/model"
    assert os.path.exists(f"{path}/{new_root}/model")
    assert read_ivf_codes(spark, path).count() > 0
