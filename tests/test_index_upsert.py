"""Upsert roundtrips (operators/index_upsert.py): oracle parity,
upsert-equals-rebuild bit-for-bit, degradation to the halves, and the
crash-between-halves retry story the composed batch discipline exists
for."""

import pytest
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table


def _codes_rows(df):
    return sorted(
        (r["vec_id"], r["cell"], tuple(r["codes"])) for r in df.collect()
    )


def _stats_rows(df):
    return sorted(
        (r["cell"], r["n"], tuple(r["svec"])) for r in df.collect()
    )


def test_ivf_up_matches_oracle(spark, sf_dir, oracle):
    from conftest import assert_matches_oracle

    from newspapers_etl_spark.operators.index_upsert import (
        IVF_UP_ORACLE,
        ivf_upsert_roundtrip,
    )

    assert_matches_oracle(
        ivf_upsert_roundtrip(spark, sf_dir), oracle, IVF_UP_ORACLE
    )


def test_bm25_u_matches_oracle(spark, sf_dir, oracle):
    from conftest import assert_matches_oracle

    from newspapers_etl_spark.operators.index_upsert import (
        BM25_UP_ORACLE,
        bm25_upsert_roundtrip,
    )

    assert_matches_oracle(
        bm25_upsert_roundtrip(spark, sf_dir), oracle, BM25_UP_ORACLE
    )


def test_update_slice_stays_off_the_fit_slice():
    """The upsert oracle fits on the REAL embeddings table (frozen-model
    contract), so the substitution must never touch the fit slice — a
    predicate change that overlaps them would silently diverge the two
    fits only on fixtures where the overlap is non-empty."""
    from newspapers_etl_spark.operators.index_upsert import IVF_UP_PRED
    from newspapers_etl_spark.operators.ivf_maintenance import FIT_PREDICATE

    # both are mod-8 residue classes on vec_id: disjoint iff residues differ
    assert FIT_PREDICATE == "vec_id % 8 = 0"
    assert IVF_UP_PRED == "vec_id % 8 = 3"


@pytest.mark.heavy
def test_upsert_equals_rebuild_bit_for_bit(spark, sf_dir, tmp_path):
    """An index upserted in place equals one built from scratch over the
    substituted corpus under the SAME frozen models — codes AND stats
    exactly (root-scoped tombstone suppresses the old codes, the new
    append root is never covered, combinable stats subtract then add
    without residue)."""
    from newspapers_etl_spark.operators.index_upsert import IVF_UP_PRED
    from newspapers_etl_spark.operators.ivf_maintenance import (
        FIT_PREDICATE,
        build_ivf_index,
        fit_models,
        read_ivf_codes,
        upsert_ivf_index,
    )
    from newspapers_etl_spark.sinks.verified import read_current

    e = load_table(spark, sf_dir, "embeddings")
    models = fit_models(e.filter(F.expr(FIT_PREDICATE)))
    old = e.filter(F.expr(IVF_UP_PRED))
    new = old.select("vec_id", F.reverse("embedding").alias("embedding"))

    upserted = str(tmp_path / "upserted")
    build_ivf_index(spark, e, upserted, e_encode=e, models=models)
    upsert_ivf_index(spark, old, new, upserted, batch_id="u1")

    substituted = (
        e.select("vec_id", "embedding")
        .filter(~F.expr(IVF_UP_PRED))
        .unionByName(new)
    )
    rebuilt = str(tmp_path / "rebuilt")
    build_ivf_index(
        spark, substituted, rebuilt, e_encode=substituted, models=models
    )

    assert _codes_rows(read_ivf_codes(spark, upserted)) == _codes_rows(
        read_ivf_codes(spark, rebuilt)
    )
    assert _stats_rows(
        read_current(spark, f"{upserted}/stats")
    ) == _stats_rows(read_current(spark, f"{rebuilt}/stats"))


@pytest.mark.heavy
def test_crash_between_halves_retries_to_convergence(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Kill the upsert after its delete half published but before the
    append half ran (the torn-composition window), then retry the WHOLE
    upsert: the delete no-ops via ``applied_deletes``, the append
    applies, and the index equals the never-crashed run — each half
    ledgered exactly once."""
    from newspapers_etl_spark.operators import ivf_maintenance as im
    from newspapers_etl_spark.operators.index_upsert import IVF_UP_PRED
    from newspapers_etl_spark.operators.ivf_maintenance import (
        FIT_PREDICATE,
        build_ivf_index,
        fit_models,
        read_ivf_codes,
        upsert_ivf_index,
    )
    from newspapers_etl_spark.sinks.verified import current_pointer

    e = load_table(spark, sf_dir, "embeddings")
    models = fit_models(e.filter(F.expr(FIT_PREDICATE)))
    old = e.filter(F.expr(IVF_UP_PRED))
    new = old.select("vec_id", F.reverse("embedding").alias("embedding"))

    path = str(tmp_path / "torn")
    build_ivf_index(spark, e, path, e_encode=e, models=models)

    real_append = im.append_ivf_index

    def dying_append(sess, df, p, batch_id):
        raise RuntimeError("injected: died before the append half")

    monkeypatch.setattr(im, "append_ivf_index", dying_append)
    with pytest.raises(RuntimeError, match="injected"):
        upsert_ivf_index(spark, old, new, path, batch_id="u1")
    monkeypatch.undo()

    # torn state: delete published (tombstone live), append absent
    ptr = current_pointer(f"{path}/stats")
    assert "u1.del" in ptr["applied_deletes"]
    assert "u1.add" not in ptr.get("applied_batches", [])

    # retry the whole upsert — the composition's idempotency contract
    upsert_ivf_index(spark, old, new, path, batch_id="u1")
    monkeypatch.setattr(im, "append_ivf_index", real_append)

    clean = str(tmp_path / "clean")
    build_ivf_index(spark, e, clean, e_encode=e, models=models)
    upsert_ivf_index(spark, old, new, clean, batch_id="u1")
    assert _codes_rows(read_ivf_codes(spark, path)) == _codes_rows(
        read_ivf_codes(spark, clean)
    )
    ptr = current_pointer(f"{path}/stats")
    assert ptr["applied_deletes"].count("u1.del") == 1
    assert ptr["applied_batches"].count("u1.add") == 1
    # and a third retry of the fully-applied upsert is a pure no-op
    gens_before = ptr["generation"]
    upsert_ivf_index(spark, old, new, path, batch_id="u1")
    assert current_pointer(f"{path}/stats")["generation"] == gens_before


@pytest.mark.heavy
def test_upsert_then_compact_equals_rebuild(spark, sf_dir, tmp_path):
    """Compacting an upserted index folds the tombstoned old codes out
    and the re-appended batch in — one root, same rows as a fresh build
    over the substituted corpus, stats untouched (compaction adds no
    vectors).  This is the upsert's end state at 100 TB: the delete
    debris leaves disk on the next compaction, not before."""
    from newspapers_etl_spark.operators.index_upsert import IVF_UP_PRED
    from newspapers_etl_spark.operators.ivf_maintenance import (
        FIT_PREDICATE,
        build_ivf_index,
        compact_ivf_codes,
        fit_models,
        read_ivf_codes,
        upsert_ivf_index,
    )
    from newspapers_etl_spark.sinks.verified import current_pointer

    e = load_table(spark, sf_dir, "embeddings")
    models = fit_models(e.filter(F.expr(FIT_PREDICATE)))
    old = e.filter(F.expr(IVF_UP_PRED))
    new = old.select("vec_id", F.reverse("embedding").alias("embedding"))

    path = str(tmp_path / "idx")
    build_ivf_index(spark, e, path, e_encode=e, models=models)
    upsert_ivf_index(spark, old, new, path, batch_id="u1")
    compact_ivf_codes(spark, path)

    substituted = (
        e.select("vec_id", "embedding")
        .filter(~F.expr(IVF_UP_PRED))
        .unionByName(new)
    )
    rebuilt = str(tmp_path / "rebuilt")
    build_ivf_index(
        spark, substituted, rebuilt, e_encode=substituted, models=models
    )
    assert _codes_rows(read_ivf_codes(spark, path)) == _codes_rows(
        read_ivf_codes(spark, rebuilt)
    )
    ptr = current_pointer(f"{path}/stats")
    assert ptr["live_tombstones"] == [] and ptr["live_batches"] == []
    # a late retry of the folded upsert stays a no-op after compaction
    upsert_ivf_index(spark, old, new, path, batch_id="u1")
    assert _codes_rows(read_ivf_codes(spark, path)) == _codes_rows(
        read_ivf_codes(spark, rebuilt)
    )


@pytest.mark.heavy
def test_bm25_upsert_then_compact_equals_reindex(spark, sf_dir, tmp_path):
    """The lexical twin of upsert-then-compact: compacting the upserted
    posting index folds the tombstoned old postings out and the
    re-appended batch in — scores equal to a fresh index over the
    substituted documents, and a late retry of the folded upsert stays
    a no-op through the applied ledgers."""
    from newspapers_etl_spark.operators.index_upsert import DOC_UP_PRED
    from newspapers_etl_spark.operators.retrieval import (
        compact_bm25_postings,
        retrieval_bm25_topk_from_postings,
        upsert_bm25_docs,
        write_bm25_postings,
    )
    from newspapers_etl_spark.sinks.verified import current_pointer

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.filter(F.expr(DOC_UP_PRED))
    new = old.select(
        "doc_id", F.concat("text", F.lit(" "), "text").alias("text")
    )

    path = str(tmp_path / "idx")
    write_bm25_postings(spark, None, path, docs=docs)
    upsert_bm25_docs(spark, old, new, path, batch_id="u1")
    compact_bm25_postings(spark, path)

    fresh = str(tmp_path / "fresh")
    substituted = docs.filter(~F.expr(DOC_UP_PRED)).unionByName(new)
    write_bm25_postings(spark, None, fresh, docs=substituted)

    got = sorted(
        map(tuple, retrieval_bm25_topk_from_postings(spark, path).collect())
    )
    want = sorted(
        map(tuple, retrieval_bm25_topk_from_postings(spark, fresh).collect())
    )
    assert got == want
    ptr = current_pointer(f"{path}/stats")
    assert ptr["live_tombstones"] == [] and ptr["live_batches"] == []
    upsert_bm25_docs(spark, old, new, path, batch_id="u1")  # folded retry
    got2 = sorted(
        map(tuple, retrieval_bm25_topk_from_postings(spark, path).collect())
    )
    assert got2 == want


@pytest.mark.heavy
def test_bm25_upsert_equals_reindex_of_substituted_corpus(
    spark, sf_dir, tmp_path
):
    """Posting-index upsert equals writing a fresh index over the
    substituted documents: identical top-k scores (df from surviving +
    re-appended postings, avgdl from the subtract-then-add stats
    pair)."""
    from newspapers_etl_spark.operators.index_upsert import DOC_UP_PRED
    from newspapers_etl_spark.operators.retrieval import (
        _postings_of,
        _staged_of,
        retrieval_bm25_topk_from_postings,
        upsert_bm25_docs,
        write_bm25_postings,
    )
    from newspapers_etl_spark.operators.retrieval import (
        BM25_POSTING_SHARDS,
        _corpus_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.expr(DOC_UP_PRED))
    new = old.select(
        "doc_id", F.concat("text", F.lit(" "), "text").alias("text")
    )

    upserted = str(tmp_path / "upserted")
    write_bm25_postings(spark, sf_dir, upserted)
    upsert_bm25_docs(spark, old, new, upserted, batch_id="u1")

    substituted = docs.filter(~F.expr(DOC_UP_PRED)).select(
        "doc_id", "text"
    ).unionByName(new)
    fresh = str(tmp_path / "fresh")
    staged = _staged_of(substituted)
    _postings_of(staged, BM25_POSTING_SHARDS).repartition(
        BM25_POSTING_SHARDS, "term_shard"
    ).write.mode("overwrite").partitionBy("term_shard").parquet(
        f"{fresh}/postings"
    )
    _corpus_stats(staged).write.mode("overwrite").parquet(f"{fresh}/stats")

    got = sorted(
        map(tuple, retrieval_bm25_topk_from_postings(spark, upserted).collect())
    )
    want = sorted(
        map(tuple, retrieval_bm25_topk_from_postings(spark, fresh).collect())
    )
    assert got == want
