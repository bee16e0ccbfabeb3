"""Index deletion (tombstone ledger) for BOTH maintained indexes —
the IVF/PQ codes (operators/ivf_maintenance.py) and the BM25 postings
(operators/retrieval.py): delete-then-compact must equal the
never-indexed-them rebuild bit-for-bit, deletes are idempotent under
retry, visible-before-compaction, and crash-safe at the same seams the
append battery pins (VERDICT r10 next-round #5)."""

import os

import pytest
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table

DEL_PRED = "vec_id % 5 = 0"
DOC_DEL_PRED = "doc_id % 7 = 0"


def _codes_rows(df):
    return sorted(
        (r["vec_id"], r["cell"], tuple(r["codes"])) for r in df.collect()
    )


def _stats_rows(df):
    return sorted(
        (r["cell"], r["n"], tuple(r["svec"])) for r in df.collect()
    )


def _built_index(spark, sf_dir, path):
    """Full-corpus index under frozen fit-slice models, returning the
    models so a rebuild comparator can reuse them."""
    from newspapers_etl_spark.operators.ivf_maintenance import (
        FIT_PREDICATE,
        build_ivf_index,
        fit_models,
    )

    e = load_table(spark, sf_dir, "embeddings")
    models = fit_models(e.filter(F.expr(FIT_PREDICATE)))
    build_ivf_index(spark, e, path, e_encode=e, models=models)
    return e, models


# ---------------------------------------------------------------- IVF


@pytest.mark.heavy
def test_ivf_delete_then_compact_equals_rebuild_bit_for_bit(
    spark, sf_dir, tmp_path
):
    """build(all) + delete(slice) + compact == build(survivors) under
    the same frozen models — codes AND the subtracted stats pair
    exactly (fixture embeddings are float32 multiples of 2^-30 whose
    double sums stay inside the 53-bit window, so the negated merge
    cancels without residue)."""
    from newspapers_etl_spark.operators.ivf_maintenance import (
        build_ivf_index,
        compact_ivf_codes,
        delete_from_ivf_index,
        read_ivf_codes,
    )
    from newspapers_etl_spark.sinks.verified import read_current

    incr = str(tmp_path / "incr")
    e, models = _built_index(spark, sf_dir, incr)
    delete_from_ivf_index(spark, e.filter(F.expr(DEL_PRED)), incr, "d1")
    compact_ivf_codes(spark, incr)

    full = str(tmp_path / "full")
    survivors = e.filter(~F.expr(DEL_PRED))
    build_ivf_index(spark, survivors, full, e_encode=survivors, models=models)

    assert _codes_rows(read_ivf_codes(spark, incr)) == _codes_rows(
        read_ivf_codes(spark, full)
    )
    assert _stats_rows(read_current(spark, f"{incr}/stats")) == _stats_rows(
        spark.read.parquet(f"{full}/stats")
    )


@pytest.mark.heavy
def test_ivf_delete_visible_before_compaction(spark, sf_dir, tmp_path):
    """The anti-join read path: deleted vec_ids disappear from
    read_ivf_codes the instant the pointer publishes, while their code
    rows still sit on disk awaiting the next compaction."""
    from newspapers_etl_spark.operators.ivf_maintenance import (
        delete_from_ivf_index,
        read_ivf_codes,
    )

    path = str(tmp_path / "idx")
    e, _ = _built_index(spark, sf_dir, path)
    before = _codes_rows(read_ivf_codes(spark, path))
    deleted_ids = {
        r["vec_id"] for r in e.filter(F.expr(DEL_PRED)).select("vec_id").collect()
    }
    delete_from_ivf_index(spark, e.filter(F.expr(DEL_PRED)), path, "d1")

    after = _codes_rows(read_ivf_codes(spark, path))
    assert {v for v, _, _ in after}.isdisjoint(deleted_ids)
    assert after == [r for r in before if r[0] not in deleted_ids]
    # code rows not rewritten: the base root still holds them
    assert os.path.exists(f"{path}/tombs-batch-d1")


@pytest.mark.heavy
def test_ivf_delete_is_idempotent_under_retry(spark, sf_dir, tmp_path):
    from newspapers_etl_spark.operators.ivf_maintenance import (
        delete_from_ivf_index,
        read_ivf_codes,
    )
    from newspapers_etl_spark.sinks.verified import (
        current_pointer,
        read_current,
    )

    path = str(tmp_path / "idx")
    e, _ = _built_index(spark, sf_dir, path)
    batch = e.filter(F.expr(DEL_PRED))
    delete_from_ivf_index(spark, batch, path, "d1")
    codes1 = _codes_rows(read_ivf_codes(spark, path))
    stats1 = _stats_rows(read_current(spark, f"{path}/stats"))
    gen1 = current_pointer(f"{path}/stats")["generation"]

    delete_from_ivf_index(spark, batch, path, "d1")  # retry no-ops
    assert _codes_rows(read_ivf_codes(spark, path)) == codes1
    assert _stats_rows(read_current(spark, f"{path}/stats")) == stats1
    ptr = current_pointer(f"{path}/stats")
    assert ptr["generation"] == gen1
    assert ptr["applied_deletes"] == ["d1"]
    assert ptr["live_tombstones"] == ["d1"]


@pytest.mark.heavy
def test_ivf_delete_crash_before_stats_publish_leaves_index_readable(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The delete's one non-atomic seam (the append battery's shape):
    dying AFTER the tombstone rename but BEFORE the generation publish
    must leave readers at the PRE-delete state — the exposed tombstone
    root is invisible because readers derive roots from the POINTER —
    and the retry must converge."""
    from newspapers_etl_spark.operators.ivf_maintenance import (
        delete_from_ivf_index,
        read_ivf_codes,
    )
    from newspapers_etl_spark.sinks import verified

    path = str(tmp_path / "idx")
    e, _ = _built_index(spark, sf_dir, path)
    before = _codes_rows(read_ivf_codes(spark, path))
    batch = e.filter(F.expr(DEL_PRED))

    def boom(p):
        raise RuntimeError("injected: died before stats generation write")

    monkeypatch.setattr(verified, "allocate_generation", boom)
    with pytest.raises(RuntimeError):
        delete_from_ivf_index(spark, batch, path, "d1")
    monkeypatch.undo()
    # tombstones renamed but unledgered -> nothing deleted yet
    assert _codes_rows(read_ivf_codes(spark, path)) == before

    delete_from_ivf_index(spark, batch, path, "d1")  # retry converges
    after = _codes_rows(read_ivf_codes(spark, path))
    assert 0 < len(after) < len(before)
    assert set(after) <= set(before)


@pytest.mark.heavy
def test_ivf_compaction_reaps_tombstone_roots_and_keeps_delete_ledger(
    spark, sf_dir, tmp_path
):
    from newspapers_etl_spark.operators.ivf_maintenance import (
        compact_ivf_codes,
        delete_from_ivf_index,
        read_ivf_codes,
    )
    from newspapers_etl_spark.sinks.verified import current_pointer

    path = str(tmp_path / "idx")
    e, _ = _built_index(spark, sf_dir, path)
    delete_from_ivf_index(spark, e.filter(F.expr(DEL_PRED)), path, "d1")
    before = _codes_rows(read_ivf_codes(spark, path))

    new_root = compact_ivf_codes(spark, path)
    ptr = current_pointer(f"{path}/stats")
    assert ptr["codes_root"] == new_root
    assert ptr["live_tombstones"] == []
    assert ptr["applied_deletes"] == ["d1"]
    assert not os.path.exists(f"{path}/tombs-batch-d1")
    assert not os.path.exists(f"{path}/codes")
    assert _codes_rows(read_ivf_codes(spark, path)) == before

    # late retry of the folded delete stays a no-op (applied ledger)
    delete_from_ivf_index(spark, e.filter(F.expr(DEL_PRED)), path, "d1")
    assert _codes_rows(read_ivf_codes(spark, path)) == before
    assert current_pointer(f"{path}/stats")["live_tombstones"] == []


@pytest.mark.heavy
def test_ivf_delete_everything_then_compact_keeps_index_readable(
    spark, sf_dir, tmp_path
):
    from newspapers_etl_spark.operators.ivf_maintenance import (
        compact_ivf_codes,
        delete_from_ivf_index,
        read_ivf_codes,
    )
    from newspapers_etl_spark.sinks.verified import read_current

    path = str(tmp_path / "idx")
    e, _ = _built_index(spark, sf_dir, path)
    delete_from_ivf_index(spark, e, path, "dall")
    assert read_ivf_codes(spark, path).count() == 0
    assert read_current(spark, f"{path}/stats").count() == 0
    compact_ivf_codes(spark, path)
    assert read_ivf_codes(spark, path).count() == 0


# --------------------------------------------------------------- BM25


def _topk_rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def _postings_rows(spark, path):
    from newspapers_etl_spark.sinks.verified import current_pointer

    ptr = current_pointer(f"{path}/stats")
    root = ptr.get("postings_root", "postings") if ptr else "postings"
    return sorted(
        (r["doc_id"], r["term"], r["tf"], r["dl"], r["term_shard"])
        for r in spark.read.parquet(f"{path}/{root}").collect()
    )


@pytest.mark.heavy
def test_bm25_delete_scores_match_filtered_corpus(spark, sf_dir, tmp_path):
    """from_postings after a delete == direct scoring over the
    surviving documents: df recounted from surviving postings, avgdl
    from the subtracted stats pair — identical integer-scaled scores by
    construction."""
    from newspapers_etl_spark.operators.retrieval import (
        bm25_topk_over,
        delete_bm25_docs,
        retrieval_bm25_topk_from_postings,
        write_bm25_postings,
    )

    path = str(tmp_path / "bm25")
    write_bm25_postings(spark, sf_dir, path)
    docs = load_table(spark, sf_dir, "documents")
    delete_bm25_docs(spark, docs.filter(F.expr(DOC_DEL_PRED)), path, "d1")

    got = _topk_rows(retrieval_bm25_topk_from_postings(spark, path))
    want = _topk_rows(bm25_topk_over(docs.filter(~F.expr(DOC_DEL_PRED))))
    assert got == want


@pytest.mark.heavy
def test_bm25_delete_then_compact_equals_rebuild_bit_for_bit(
    spark, sf_dir, tmp_path
):
    from newspapers_etl_spark.operators.retrieval import (
        compact_bm25_postings,
        delete_bm25_docs,
        write_bm25_postings,
    )
    from newspapers_etl_spark.sinks.verified import read_current

    incr = str(tmp_path / "incr")
    write_bm25_postings(spark, sf_dir, incr)
    docs = load_table(spark, sf_dir, "documents")
    delete_bm25_docs(spark, docs.filter(F.expr(DOC_DEL_PRED)), incr, "d1")
    compact_bm25_postings(spark, incr)

    # rebuild over the survivors only (write_bm25_postings over a
    # filtered relation: route through the shared tokenizer)
    from newspapers_etl_spark.operators.retrieval import (
        BM25_POSTING_SHARDS,
        _corpus_stats,
        _postings_of,
        _staged_of,
    )

    full = str(tmp_path / "full")
    staged = _staged_of(docs.filter(~F.expr(DOC_DEL_PRED)))
    _postings_of(staged, BM25_POSTING_SHARDS).repartition(
        BM25_POSTING_SHARDS, "term_shard"
    ).write.partitionBy("term_shard").parquet(f"{full}/postings")
    _corpus_stats(staged).write.parquet(f"{full}/stats")

    assert _postings_rows(spark, incr) == _postings_rows(spark, full)
    got = read_current(spark, f"{incr}/stats").collect()[0]
    want = spark.read.parquet(f"{full}/stats").collect()[0]
    assert (got["n"], got["sum_dl"]) == (want["n"], want["sum_dl"])


@pytest.mark.heavy
def test_bm25_delete_is_idempotent_and_crash_safe(
    spark, sf_dir, tmp_path, monkeypatch
):
    from newspapers_etl_spark.operators.retrieval import (
        delete_bm25_docs,
        retrieval_bm25_topk_from_postings,
        write_bm25_postings,
    )
    from newspapers_etl_spark.sinks import verified

    path = str(tmp_path / "bm25")
    write_bm25_postings(spark, sf_dir, path)
    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.expr(DOC_DEL_PRED))
    before = _topk_rows(retrieval_bm25_topk_from_postings(spark, path))

    def boom(p):
        raise RuntimeError("injected: died before stats generation write")

    monkeypatch.setattr(verified, "allocate_generation", boom)
    with pytest.raises(RuntimeError):
        delete_bm25_docs(spark, batch, path, "d1")
    monkeypatch.undo()
    # tombstones exposed but unledgered -> scores unchanged
    assert _topk_rows(retrieval_bm25_topk_from_postings(spark, path)) == before

    delete_bm25_docs(spark, batch, path, "d1")
    after1 = _topk_rows(retrieval_bm25_topk_from_postings(spark, path))
    gen1 = verified.current_pointer(f"{path}/stats")["generation"]

    delete_bm25_docs(spark, batch, path, "d1")  # retry no-ops
    assert _topk_rows(retrieval_bm25_topk_from_postings(spark, path)) == after1
    ptr = verified.current_pointer(f"{path}/stats")
    assert ptr["generation"] == gen1
    assert ptr["applied_deletes"] == ["d1"]


# ------------------------------------------------------- oracle parity


def test_ivf_del_matches_oracle(spark, sf_dir, oracle):
    from conftest import assert_matches_oracle

    from newspapers_etl_spark.operators.index_delete import (
        IVF_DEL_ORACLE,
        ivf_delete_roundtrip,
    )

    assert_matches_oracle(
        ivf_delete_roundtrip(spark, sf_dir), oracle, IVF_DEL_ORACLE
    )


def test_bm25_d_matches_oracle(spark, sf_dir, oracle):
    from conftest import assert_matches_oracle

    from newspapers_etl_spark.operators.index_delete import (
        BM25_DEL_ORACLE,
        bm25_delete_roundtrip,
    )

    assert_matches_oracle(
        bm25_delete_roundtrip(spark, sf_dir), oracle, BM25_DEL_ORACLE
    )


# ------------------------------------------ re-append after delete
# (root-scoped tombstones: a takedown reversal is one ordinary append)


@pytest.mark.heavy
def test_ivf_reappend_after_delete_restores_the_full_index(
    spark, sf_dir, tmp_path
):
    """Delete a slice, append the same vectors back as a NEW batch: the
    tombstone covers only the roots that existed at delete time, so the
    old rows stay suppressed while the re-appended rows are read — the
    index equals never-having-deleted, bit-for-bit (encode is a pure
    function of the frozen model), and stats are restored exactly
    (subtract then add the same exact sums).  Compaction afterwards
    folds the tombstone without killing the re-added rows."""
    from newspapers_etl_spark.operators.ivf_maintenance import (
        append_ivf_index,
        compact_ivf_codes,
        delete_from_ivf_index,
        read_ivf_codes,
    )
    from newspapers_etl_spark.sinks.verified import read_current

    path = str(tmp_path / "idx")
    e, _ = _built_index(spark, sf_dir, path)
    never_deleted = _codes_rows(read_ivf_codes(spark, path))
    stats_before = _stats_rows(spark.read.parquet(f"{path}/stats"))

    batch = e.filter(F.expr(DEL_PRED))
    delete_from_ivf_index(spark, batch, path, "d1")
    append_ivf_index(spark, batch, path, batch_id="b2")

    assert _codes_rows(read_ivf_codes(spark, path)) == never_deleted
    assert _stats_rows(read_current(spark, f"{path}/stats")) == stats_before

    compact_ivf_codes(spark, path)
    assert _codes_rows(read_ivf_codes(spark, path)) == never_deleted
    assert _stats_rows(read_current(spark, f"{path}/stats")) == stats_before


@pytest.mark.heavy
def test_bm25_reappend_after_delete_restores_scores(spark, sf_dir, tmp_path):
    from newspapers_etl_spark.operators.retrieval import (
        append_bm25_postings,
        bm25_topk_over,
        compact_bm25_postings,
        delete_bm25_docs,
        retrieval_bm25_topk_from_postings,
        write_bm25_postings,
    )

    path = str(tmp_path / "bm25")
    write_bm25_postings(spark, sf_dir, path)
    docs = load_table(spark, sf_dir, "documents")
    sliced = docs.filter(F.expr(DOC_DEL_PRED))
    # the re-append source: the deleted docs as their own corpus dir
    from newspapers_etl_spark.catalog import table_path

    redir = str(tmp_path / "readd")
    sliced.write.parquet(table_path(redir, "documents"))

    delete_bm25_docs(spark, sliced, path, "d1")
    append_bm25_postings(spark, redir, path, batch_id="b2")

    want = _topk_rows(bm25_topk_over(docs))
    assert _topk_rows(retrieval_bm25_topk_from_postings(spark, path)) == want
    compact_bm25_postings(spark, path)
    assert _topk_rows(retrieval_bm25_topk_from_postings(spark, path)) == want


# ------------------------------------- ADVICE r11: no-op delete hygiene


def test_ivf_empty_delete_short_circuits_stats_generation(
    spark, sf_dir, tmp_path
):
    """An empty delete batch (zero rows / all-null embeddings) must be
    ledgered for idempotency WITHOUT allocating a byte-identical stats
    generation (ADVICE r11: pointer churn per no-op delete)."""
    from newspapers_etl_spark.operators.ivf_maintenance import (
        delete_from_ivf_index,
        read_ivf_codes,
    )
    from newspapers_etl_spark.sinks.verified import current_pointer

    path = str(tmp_path / "idx")
    e, _ = _built_index(spark, sf_dir, path)
    delete_from_ivf_index(spark, e.filter(F.expr(DEL_PRED)), path, "d1")
    ptr1 = current_pointer(f"{path}/stats")
    rows1 = _codes_rows(read_ivf_codes(spark, path))

    delete_from_ivf_index(spark, e.filter("vec_id < 0"), path, "empty")
    ptr2 = current_pointer(f"{path}/stats")
    assert ptr2["generation"] == ptr1["generation"], (
        "empty delete allocated a new stats generation"
    )
    assert ptr2["applied_deletes"] == ["d1", "empty"]
    assert ptr2["live_tombstones"] == ["d1"]
    assert "empty" not in ptr2.get("tombstone_covers", {})
    assert _codes_rows(read_ivf_codes(spark, path)) == rows1

    # retry of the ledgered empty batch no-ops entirely
    delete_from_ivf_index(spark, e.filter("vec_id < 0"), path, "empty")
    assert current_pointer(f"{path}/stats") == ptr2


def test_bm25_empty_delete_short_circuits_stats_generation(
    spark, sf_dir, tmp_path
):
    from newspapers_etl_spark.operators.retrieval import (
        delete_bm25_docs,
        retrieval_bm25_topk_from_postings,
        write_bm25_postings,
    )
    from newspapers_etl_spark.sinks.verified import current_pointer

    path = str(tmp_path / "bm25")
    write_bm25_postings(spark, sf_dir, path)
    docs = load_table(spark, sf_dir, "documents")
    delete_bm25_docs(spark, docs.filter(F.expr(DOC_DEL_PRED)), path, "d1")
    ptr1 = current_pointer(f"{path}/stats")
    scores1 = _topk_rows(retrieval_bm25_topk_from_postings(spark, path))

    delete_bm25_docs(spark, docs.filter("doc_id < 0"), path, "empty")
    ptr2 = current_pointer(f"{path}/stats")
    assert ptr2["generation"] == ptr1["generation"]
    assert ptr2["applied_deletes"] == ["d1", "empty"]
    assert ptr2["live_tombstones"] == ["d1"]
    assert (
        _topk_rows(retrieval_bm25_topk_from_postings(spark, path)) == scores1
    )


# --------------------------------- ADVICE r11: orphan tombstone debris


def test_orphan_tombstone_dirs_are_reaped(spark, sf_dir, tmp_path):
    """A delete that dies between its staging write and expose leaves
    _tombs-batch-<id>; one that dies between expose and publish leaves
    a live-named dir with no ledger row.  The reaper removes both and
    keeps every dir the live_tombstones ledger references."""
    from newspapers_etl_spark.operators.ivf_maintenance import (
        delete_from_ivf_index,
    )
    from newspapers_etl_spark.sinks.verified import reap_orphan_tombstones

    path = str(tmp_path / "idx")
    e, _ = _built_index(spark, sf_dir, path)
    delete_from_ivf_index(spark, e.filter(F.expr(DEL_PRED)), path, "d1")

    staged_orphan = tmp_path / "idx" / "_tombs-batch-crashA"
    live_orphan = tmp_path / "idx" / "tombs-batch-crashB"
    staged_orphan.mkdir()
    live_orphan.mkdir()
    (staged_orphan / "part-0.parquet").write_bytes(b"x")
    (live_orphan / "part-0.parquet").write_bytes(b"x")

    reap_orphan_tombstones(path)
    assert not staged_orphan.exists()
    assert not live_orphan.exists()
    assert (tmp_path / "idx" / "tombs-batch-d1").exists(), (
        "reaper must keep ledgered live tombstones"
    )


def test_ivf_compaction_reaps_orphan_tombstones(spark, sf_dir, tmp_path):
    """The compaction entry point heals the delete crash seams the same
    way it heals rebuild orphans — an operator never has to call the
    reaper directly."""
    from newspapers_etl_spark.operators.ivf_maintenance import (
        append_ivf_index,
        compact_ivf_codes,
        delete_from_ivf_index,
        read_ivf_codes,
    )

    path = str(tmp_path / "idx")
    e, _ = _built_index(spark, sf_dir, path)
    # an append so compaction has a pointer to work with either way
    delete_from_ivf_index(spark, e.filter(F.expr(DEL_PRED)), path, "d1")
    before = _codes_rows(read_ivf_codes(spark, path))

    orphan = tmp_path / "idx" / "tombs-batch-crashC"
    orphan.mkdir()
    (orphan / "part-0.parquet").write_bytes(b"x")

    compact_ivf_codes(spark, path)
    assert not orphan.exists()
    assert _codes_rows(read_ivf_codes(spark, path)) == before
