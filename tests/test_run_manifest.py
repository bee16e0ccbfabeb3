"""Training-run provenance manifest (operators/run_manifest.py):
oracle parity, and the replay contract — a manifest pins its run's
inputs so re-deriving any leg later reproduces the recorded digest
bit-for-bit (and a changed input provably changes it)."""

import pytest
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table


def test_manif_matches_oracle(spark, sf_dir, oracle):
    from conftest import assert_matches_oracle

    from newspapers_etl_spark.operators.run_manifest import (
        MANIF_ORACLE,
        run_manifest_roundtrip,
    )

    assert_matches_oracle(
        run_manifest_roundtrip(spark, sf_dir), oracle, MANIF_ORACLE
    )


@pytest.mark.heavy
def test_manifest_replays_bit_identically(spark, sf_dir):
    """The audit contract: computing the manifest twice — including the
    full index-walk leg, whose scratch index is rebuilt from zero the
    second time — yields the IDENTICAL relation, digests and all.  The
    digests are therefore replay handles: same manifest ⇒ same corpus
    bytes, same split membership, same dimension state, same index
    view."""
    from newspapers_etl_spark.operators.run_manifest import (
        training_run_manifest,
    )

    first = sorted(
        tuple(r) for r in training_run_manifest(spark, sf_dir).collect()
    )
    second = sorted(
        tuple(r) for r in training_run_manifest(spark, sf_dir).collect()
    )
    assert first == second
    assert {r[0] for r in first} == {"index", "corpus", "split", "dim"}


@pytest.mark.heavy
def test_manifest_index_leg_replays_pit_retrieval(spark, sf_dir, tmp_path):
    """The index digest in the manifest addresses a REPLAYABLE view:
    reconstructing the pinned batch's code relation through the PIT
    reader — after further maintenance landed on the index — returns
    bit-identical rows to what the manifest digested, which is exactly
    the 're-run yesterday's retrieval under yesterday's index'
    guarantee."""
    from newspapers_etl_spark.operators.index_pit import (
        PIT_B1_PRED,
        PIT_B2_PRED,
        PIT_DEL_PRED,
        read_ivf_codes_at,
    )
    from newspapers_etl_spark.operators.ivf_maintenance import (
        BASE_PREDICATE,
        FIT_PREDICATE,
        append_ivf_index,
        build_ivf_index,
        codes_fingerprint,
        delete_from_ivf_index,
        fit_models,
    )

    path = str(tmp_path / "idx")
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    models = fit_models(e.filter(F.expr(FIT_PREDICATE)))
    build_ivf_index(
        spark, e.filter(F.expr(BASE_PREDICATE)), path, models=models
    )
    append_ivf_index(spark, e.filter(F.expr(PIT_B1_PRED)), path, batch_id="b1")
    delete_from_ivf_index(
        spark,
        e.filter(F.expr(BASE_PREDICATE)).filter(F.expr(PIT_DEL_PRED)),
        path,
        batch_id="d1",
    )
    pinned = sorted(
        tuple(r)
        for r in codes_fingerprint(
            read_ivf_codes_at(spark, path, "d1")
        ).collect()
    )
    # The run ends; maintenance continues: another batch lands.
    append_ivf_index(spark, e.filter(F.expr(PIT_B2_PRED)), path, batch_id="b2")
    replayed = sorted(
        tuple(r)
        for r in codes_fingerprint(
            read_ivf_codes_at(spark, path, "d1")
        ).collect()
    )
    assert replayed == pinned


def test_manifest_digest_detects_a_changed_input(spark, sf_dir):
    """Negative control: flipping one document's text changes exactly
    its source's corpus digest and nothing else — the manifest
    localizes drift to the artifact that moved."""
    from newspapers_etl_spark.operators.run_manifest import manifest_digest

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    leg = lambda d: {
        (r["artifact"], r["part"]): (r["n"], r["digest"])
        for r in manifest_digest(
            d, "corpus", F.col("source"), F.md5(F.col("text"))
        ).collect()
    }
    base = leg(docs)
    probe = docs.orderBy("doc_id").limit(1).collect()[0]
    mutated = leg(
        docs.withColumn(
            "text",
            F.when(
                F.col("doc_id") == probe["doc_id"],
                F.concat(F.col("text"), F.lit(" tampered")),
            ).otherwise(F.col("text")),
        )
    )
    changed = {k for k in base if base[k] != mutated[k]}
    assert changed == {("corpus", probe["source"])}
    assert base[("corpus", probe["source"])][0] == (
        mutated[("corpus", probe["source"])][0]
    )
