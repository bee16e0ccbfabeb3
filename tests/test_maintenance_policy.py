"""Maintenance-policy chain (operators/maintenance_policy.py): oracle
parity, the planted-shift path actually rebuilding, and the null path
staying gated (no decision scan side effects, no rebuild)."""

import pytest
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table


def test_mnt_pol_matches_oracle(spark, sf_dir, oracle):
    from conftest import assert_matches_oracle

    from newspapers_etl_spark.operators.maintenance_policy import (
        MNT_POL_ORACLE,
        maintenance_policy_roundtrip,
    )

    assert_matches_oracle(
        maintenance_policy_roundtrip(spark, sf_dir), oracle, MNT_POL_ORACLE
    )


@pytest.mark.heavy
def test_planted_shift_alerts_and_rebuilds(spark, sf_dir, tmp_path):
    """The registered scenario end-to-end on a scratch path: the
    shifted batch trips the PSI alert, churn crosses the bar, and the
    rebuild ACTUALLY runs — pointer flipped to a rebuild root, ledgers
    reset, the rebuilt codes covering exactly the live union."""
    from newspapers_etl_spark.operators.ivf_maintenance import (
        FIT_PREDICATE,
        append_ivf_index,
        build_ivf_index,
        fit_models,
        read_ivf_codes,
    )
    from newspapers_etl_spark.operators.maintenance_policy import (
        OFF,
        maintenance_policy_chain,
    )
    from newspapers_etl_spark.sinks.verified import current_pointer

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    models = fit_models(e.filter(F.expr(FIT_PREDICATE)))
    path = str(tmp_path / "idx")
    build_ivf_index(spark, e, path, e_encode=e, models=models)
    batch = e.select(
        (F.col("vec_id") + OFF).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x.cast("double") + F.lit(1.0)
        ).alias("embedding"),
    )
    append_ivf_index(spark, batch, path, batch_id="b1")

    out = {
        r["stage"]: (r["metric"], r["act"])
        for r in maintenance_policy_chain(
            spark, e.unionByName(batch), path
        ).collect()
    }
    assert out["drift"][1] is True and out["drift"][0] > 0.2
    assert out["refresh"][1] is True and out["refresh"][0] > 0.1
    assert out["rebuild"][1] is True

    ptr = current_pointer(f"{path}/stats")
    assert ptr["codes_root"].startswith("rebuild-")
    assert ptr["live_batches"] == [] and ptr["live_tombstones"] == []
    assert ptr["rebuilds"] == 1
    n_live = read_ivf_codes(spark, path).count()
    assert float(n_live) == out["rebuild"][0]
    n_union = (
        e.unionByName(batch).filter(F.col("embedding").isNotNull()).count()
    )
    assert n_live == n_union


@pytest.mark.heavy
def test_alert_without_churn_verdict_measures_but_does_not_rebuild(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The middle branch: drift alerts, the decision scan RUNS and
    emits a real churn metric, but the verdict says don't-rebuild — the
    rebuild never executes and the pointer is untouched.  (Driven by a
    raised churn bar: on this fixture geometry the PQ-decode error
    keeps intrinsic churn above the default 0.1 whenever drift alerts,
    so the branch is pinned through the threshold parameter the
    production deployment tunes anyway.)"""
    from newspapers_etl_spark.operators import maintenance_policy as mp
    from newspapers_etl_spark.operators.ivf_maintenance import (
        FIT_PREDICATE,
        append_ivf_index,
        build_ivf_index,
        fit_models,
    )
    from newspapers_etl_spark.operators.maintenance_policy import (
        OFF,
        maintenance_policy_chain,
    )
    from newspapers_etl_spark.sinks.verified import current_pointer

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    models = fit_models(e.filter(F.expr(FIT_PREDICATE)))
    path = str(tmp_path / "idx")
    build_ivf_index(spark, e, path, e_encode=e, models=models)
    batch = e.select(
        (F.col("vec_id") + OFF).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x.cast("double") + F.lit(1.0)
        ).alias("embedding"),
    )
    append_ivf_index(spark, batch, path, batch_id="b1")

    def exploding_rebuild(*a, **kw):
        raise AssertionError("rebuild ran without a churn verdict")

    monkeypatch.setattr(mp, "rebuild_ivf_index", exploding_rebuild)
    out = {
        r["stage"]: (r["metric"], r["act"])
        for r in maintenance_policy_chain(
            spark, e.unionByName(batch), path, churn_threshold=0.9
        ).collect()
    }
    assert out["drift"][1] is True
    assert out["refresh"][1] is False and 0.0 < out["refresh"][0] <= 0.9
    assert out["rebuild"] == (None, False)
    ptr = current_pointer(f"{path}/stats")
    assert "rebuilds" not in ptr
    assert ptr.get("codes_root", "codes") == "codes"


@pytest.mark.heavy
def test_same_distribution_batch_walks_the_null_path(
    spark, sf_dir, tmp_path, monkeypatch
):
    """A batch that merely duplicates the corpus distribution (exact
    copies under offset ids) yields PSI == 0 exactly: no alert, the
    decision scan NEVER RUNS (monkeypatch-asserted — the gating is the
    policy's steady-state cost story), no rebuild, pointer untouched."""
    from newspapers_etl_spark.operators import maintenance_policy as mp
    from newspapers_etl_spark.operators.ivf_maintenance import (
        FIT_PREDICATE,
        append_ivf_index,
        build_ivf_index,
        fit_models,
    )
    from newspapers_etl_spark.operators.maintenance_policy import (
        OFF,
        maintenance_policy_chain,
    )
    from newspapers_etl_spark.sinks.verified import current_pointer

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    models = fit_models(e.filter(F.expr(FIT_PREDICATE)))
    path = str(tmp_path / "idx")
    build_ivf_index(spark, e, path, e_encode=e, models=models)
    batch = e.select((F.col("vec_id") + OFF).alias("vec_id"), "embedding")
    append_ivf_index(spark, batch, path, batch_id="b1")

    def exploding_decision(*a, **kw):
        raise AssertionError("decision scan ran on the null path")

    monkeypatch.setattr(
        mp, "centroid_refresh_decision", exploding_decision
    )
    out = {
        r["stage"]: (r["metric"], r["act"])
        for r in maintenance_policy_chain(
            spark, e.unionByName(batch), path
        ).collect()
    }
    assert out["drift"] == (0.0, False)
    assert out["refresh"] == (None, False)
    assert out["rebuild"] == (None, False)
    ptr = current_pointer(f"{path}/stats")
    assert "rebuilds" not in ptr
    assert ptr.get("codes_root", "codes") == "codes"
