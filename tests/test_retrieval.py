"""BM25 retrieval scoring (operators/retrieval.py)."""

import pytest

from pyspark.sql import functions as F

from newspapers_etl_spark.operators.retrieval import (
    BM25_ORACLE,
    BM25_QUERY_TERMS,
    BM25_TOP_K,
    retrieval_bm25_topk,
)


def test_bm25_matches_oracle(spark, sf_dir, oracle):
    from conftest import assert_matches_oracle

    assert_matches_oracle(
        retrieval_bm25_topk(spark, sf_dir), oracle, BM25_ORACLE
    )


def test_bm25_ranking_properties(spark, sf_dir):
    rows = retrieval_bm25_topk(spark, sf_dir).collect()
    assert len(rows) == BM25_TOP_K
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    # stable tie-break: equal scores ordered by doc_id ascending
    for a, b in zip(rows, rows[1:]):
        if a["score"] == b["score"]:
            assert a["doc_id"] < b["doc_id"]


def test_bm25_more_hits_beats_fewer_on_same_length(spark, sf_dir):
    """A document containing more distinct query terms outranks one with
    fewer, all else equal — checked on the fixture by comparing each
    top-k doc's distinct-hit count against the bottom-ranked doc's."""
    top = retrieval_bm25_topk(spark, sf_dir, k=5).collect()
    from newspapers_etl_spark.catalog import load_table
    from newspapers_etl_spark.functions.text import words

    d = load_table(spark, sf_dir, "documents")
    hits = (
        d.select("doc_id", F.explode(words("text")).alias("t"))
        .filter(F.col("t").isin(*BM25_QUERY_TERMS))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    hit_counts = {r["doc_id"]: r["n_hits"] for r in hits.collect()}
    avg_hits = sum(hit_counts.values()) / len(hit_counts)
    for r in top:
        assert hit_counts[r["doc_id"]] > avg_hits


def test_bm25_topk_plan_uses_heap_not_full_sort(spark, sf_dir):
    plan = (
        retrieval_bm25_topk(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert f"TakeOrderedAndProject(limit={BM25_TOP_K}" in plan


def test_bm25_batch_reproduces_single_query_scores(spark, sf_dir):
    """One-scan batch scoring must agree exactly with the single-query
    path for a query that appears in the batch, and serve every query
    in the batch with contiguous ranks."""
    from newspapers_etl_spark.operators.retrieval import (
        retrieval_bm25_batch_topk,
    )

    batch = {
        0: BM25_QUERY_TERMS,
        1: ("customer", "hash"),
        2: ("merge",),
    }
    rows = retrieval_bm25_batch_topk(spark, sf_dir, batch, k=10).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(batch)
    for _qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
    single = retrieval_bm25_topk(spark, sf_dir, k=10).collect()
    got0 = [(r["doc_id"], r["score"]) for r in by_q[0]]
    want = [(r["doc_id"], r["score"]) for r in single]
    assert got0 == want


def test_bm25_batch_is_one_corpus_scan_per_stream(spark, sf_dir):
    """The batch plan must not multiply corpus passes by query count:
    however many queries, the documents table appears in exactly the
    same number of scan nodes as the single-query plan (hit stream +
    stats pass)."""
    from newspapers_etl_spark.operators.retrieval import (
        retrieval_bm25_batch_topk,
    )

    def n_scans(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Scan parquet")

    single = n_scans(retrieval_bm25_topk(spark, sf_dir))
    batch = n_scans(
        retrieval_bm25_batch_topk(
            spark, sf_dir, {i: BM25_QUERY_TERMS for i in range(8)}
        )
    )
    assert batch == single


def test_bm25_stored_postings_prune_and_reproduce(spark, sf_dir, tmp_path):
    """The stored-index contract (the ivfadc stored-index move, lexical
    edition): postings written once, sharded by term hash; scoring a
    query reads ONLY the query terms' shards (parquet PartitionFilters
    on term_shard, plus a pushed term predicate) and returns exactly
    the direct path's top-k."""
    from newspapers_etl_spark.operators.retrieval import (
        BM25_POSTING_SHARDS,
        _term_shards,
        retrieval_bm25_topk_from_postings,
        write_bm25_postings,
    )

    path = str(tmp_path / "bm25_index")
    write_bm25_postings(spark, sf_dir, path)
    df = retrieval_bm25_topk_from_postings(spark, path)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "term_shard" in plan
    assert "PushedFilters" in plan
    got = [(r["doc_id"], r["score"]) for r in df.collect()]
    want = [
        (r["doc_id"], r["score"])
        for r in retrieval_bm25_topk(spark, sf_dir).collect()
    ]
    assert got == want
    # the shard list is a proper subset of the universe — the pruning
    # is real, not a filter that happens to keep everything
    assert len(_term_shards(spark, BM25_QUERY_TERMS, BM25_POSTING_SHARDS)) <= len(
        BM25_QUERY_TERMS
    ) < BM25_POSTING_SHARDS


def test_bm25_postings_write_one_file_per_shard(spark, sf_dir, tmp_path):
    """The partitioned write must repartition on the layout key first:
    one parquet file per populated shard directory (tasks x shards
    small files otherwise — the classic partitioned-write mistake)."""
    from pathlib import Path

    from newspapers_etl_spark.operators.retrieval import write_bm25_postings

    path = str(tmp_path / "idx")
    write_bm25_postings(spark, sf_dir, path)
    for shard_dir in Path(path, "postings").glob("term_shard=*"):
        files = [p for p in shard_dir.glob("*.parquet")]
        assert len(files) == 1, f"{shard_dir.name}: {len(files)} files"


def test_bm25_incremental_append_equals_rebuild(spark, sf_dir, tmp_path):
    """Index maintenance contract: build-from-half + append-other-half
    must equal build-from-everything BIT-FOR-BIT — possible because the
    stored stats are the combinable (n, sum_dl) pair, not a pre-divided
    average, and df is derived from postings at query time."""
    from pyspark.sql import functions as F

    from newspapers_etl_spark.catalog import load_table, table_path
    from newspapers_etl_spark.operators.retrieval import (
        append_bm25_postings,
        retrieval_bm25_topk_from_postings,
        write_bm25_postings,
    )

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    cut = n_docs // 2
    half1, half2 = str(tmp_path / "h1"), str(tmp_path / "h2")
    docs.filter(F.col("doc_id") < cut).write.parquet(
        table_path(half1, "documents")
    )
    docs.filter(F.col("doc_id") >= cut).write.parquet(
        table_path(half2, "documents")
    )

    incr = str(tmp_path / "incr_idx")
    write_bm25_postings(spark, half1, incr)
    append_bm25_postings(spark, half2, incr)
    full = str(tmp_path / "full_idx")
    write_bm25_postings(spark, sf_dir, full)

    got = [
        (r["doc_id"], r["score"])
        for r in retrieval_bm25_topk_from_postings(spark, incr).collect()
    ]
    want = [
        (r["doc_id"], r["score"])
        for r in retrieval_bm25_topk_from_postings(spark, full).collect()
    ]
    assert got == want
    direct = [
        (r["doc_id"], r["score"])
        for r in retrieval_bm25_topk(spark, sf_dir).collect()
    ]
    assert got == direct


@pytest.mark.heavy
def test_bm25_append_crash_before_stats_publish_leaves_index_readable(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Failure injection on the one non-atomic maintenance step
    (VERDICT r7 #6): if the append dies AFTER the postings append but
    BEFORE the stats generation-pointer publish, the index must remain
    readable with the PREVIOUS stats — never unreadable, never
    half-published.  Both injection points are exercised: before the
    new generation is allocated, and after its data is written but
    before the pointer flips."""
    from pyspark.sql import functions as F

    from newspapers_etl_spark.catalog import load_table, table_path
    from newspapers_etl_spark.operators.retrieval import (
        append_bm25_postings,
        retrieval_bm25_topk_from_postings,
        write_bm25_postings,
    )
    from newspapers_etl_spark.sinks import verified

    docs = load_table(spark, sf_dir, "documents")
    cut = docs.count() // 2
    half1, half2 = str(tmp_path / "h1"), str(tmp_path / "h2")
    docs.filter(F.col("doc_id") < cut).write.parquet(
        table_path(half1, "documents")
    )
    docs.filter(F.col("doc_id") >= cut).write.parquet(
        table_path(half2, "documents")
    )
    path = str(tmp_path / "idx")
    write_bm25_postings(spark, half1, path)
    old_stats = verified.read_current(spark, f"{path}/stats").collect()[0]

    # --- crash point 1: before the new stats generation exists
    def boom_alloc(p):
        raise RuntimeError("injected: died before stats generation write")

    monkeypatch.setattr(verified, "allocate_generation", boom_alloc)
    try:
        append_bm25_postings(spark, half2, path)
    except RuntimeError:
        pass
    monkeypatch.undo()
    now = verified.read_current(spark, f"{path}/stats").collect()[0]
    assert (now["n"], now["sum_dl"]) == (old_stats["n"], old_stats["sum_dl"])
    # the index serves queries throughout — appended postings + the
    # previous generation's stats, never an absent stats directory
    assert retrieval_bm25_topk_from_postings(spark, path).count() > 0

    # --- crash point 2: generation data written, pointer never flips
    def boom_publish(p, gen_no, dir_name, keep_old_generation=False, meta=None):
        raise RuntimeError("injected: died before pointer publish")

    monkeypatch.setattr(verified, "publish_generation", boom_publish)
    try:
        append_bm25_postings(spark, half2, path)
    except RuntimeError:
        pass
    monkeypatch.undo()
    now = verified.read_current(spark, f"{path}/stats").collect()[0]
    assert (now["n"], now["sum_dl"]) == (old_stats["n"], old_stats["sum_dl"])

    # --- retry convergence (ADVICE r8 #3): after BOTH injected crashes
    # — each of which already wrote the batch's postings — a plain
    # retry must yield exactly the rebuild-from-everything index, not a
    # tf-doubled one: the batch overwrites its own postings root and
    # the stats publish records it in the pointer's applied_batches.
    append_bm25_postings(spark, half2, path)
    full = str(tmp_path / "full_idx")
    write_bm25_postings(spark, sf_dir, full)
    got = [
        (r["doc_id"], r["score"])
        for r in retrieval_bm25_topk_from_postings(spark, path).collect()
    ]
    want = [
        (r["doc_id"], r["score"])
        for r in retrieval_bm25_topk_from_postings(spark, full).collect()
    ]
    assert got == want

    # --- retry after full success is a no-op: the pointer (generation
    # and ledger) is untouched, scores unchanged.
    ptr_before = verified.current_pointer(f"{path}/stats")
    append_bm25_postings(spark, half2, path)
    assert verified.current_pointer(f"{path}/stats") == ptr_before
    again = [
        (r["doc_id"], r["score"])
        for r in retrieval_bm25_topk_from_postings(spark, path).collect()
    ]
    assert again == want


@pytest.mark.heavy
def test_bm25_compaction_folds_roots_and_keeps_ledger(spark, sf_dir, tmp_path):
    """compact_bm25_postings: scores identical before/after, readers
    flip to ONE root, live_batches resets, and — the critical
    invariant — applied_batches SURVIVES so a late retry of a batch
    already folded into the compacted root stays a no-op instead of
    duplicating its postings (ADVICE r9 #4's ledger-rewrite
    requirement)."""
    import os

    from pyspark.sql import functions as F

    from newspapers_etl_spark.catalog import load_table, table_path
    from newspapers_etl_spark.operators.retrieval import (
        append_bm25_postings,
        compact_bm25_postings,
        retrieval_bm25_topk_from_postings,
        write_bm25_postings,
    )
    from newspapers_etl_spark.sinks.verified import current_pointer, read_current

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    thirds = [str(tmp_path / f"t{i}") for i in range(3)]
    for i, d in enumerate(thirds):
        docs.filter(
            (F.col("doc_id") >= i * n // 3) & (F.col("doc_id") < (i + 1) * n // 3)
        ).write.parquet(table_path(d, "documents"))

    path = str(tmp_path / "idx")
    write_bm25_postings(spark, thirds[0], path)
    append_bm25_postings(spark, thirds[1], path, batch_id="b1")
    append_bm25_postings(spark, thirds[2], path, batch_id="b2")
    before = [
        (r["doc_id"], r["score"])
        for r in retrieval_bm25_topk_from_postings(spark, path).collect()
    ]
    stats_before = read_current(spark, f"{path}/stats").collect()[0]

    new_root = compact_bm25_postings(spark, path)
    ptr = current_pointer(f"{path}/stats")
    assert ptr["postings_root"] == new_root
    assert ptr["live_batches"] == []
    assert set(ptr["applied_batches"]) == {"b1", "b2"}
    assert not os.path.exists(f"{path}/postings")  # old roots reaped
    assert not os.path.exists(f"{path}/postings-batch-b1")

    after = [
        (r["doc_id"], r["score"])
        for r in retrieval_bm25_topk_from_postings(spark, path).collect()
    ]
    assert after == before
    stats_after = read_current(spark, f"{path}/stats").collect()[0]
    assert (stats_after["n"], stats_after["sum_dl"]) == (
        stats_before["n"],
        stats_before["sum_dl"],
    )

    # THE invariant: a late retry of a folded batch must be a no-op.
    append_bm25_postings(spark, thirds[1], path, batch_id="b1")
    assert [
        (r["doc_id"], r["score"])
        for r in retrieval_bm25_topk_from_postings(spark, path).collect()
    ] == before
    assert current_pointer(f"{path}/stats")["live_batches"] == []

    # And NEW appends keep working against the compacted root.  An
    # EMPTY batch is the degenerate case: it is ledgered as applied
    # (retries stay no-ops) but never enters the live read roots — a
    # fileless parquet root would break every reader with
    # UNABLE_TO_INFER_SCHEMA.
    extra = str(tmp_path / "extra")
    docs.filter(F.col("doc_id") >= n - 3).limit(0).write.parquet(
        table_path(extra, "documents")
    )
    append_bm25_postings(spark, extra, path, batch_id="b3")
    ptr3 = current_pointer(f"{path}/stats")
    assert "b3" in ptr3["applied_batches"]
    assert ptr3["live_batches"] == []
    assert not os.path.exists(f"{path}/postings-batch-b3")
    assert [
        (r["doc_id"], r["score"])
        for r in retrieval_bm25_topk_from_postings(spark, path).collect()
    ] == before


def test_bm25_compaction_crash_before_pointer_flip_is_invisible(
    spark, sf_dir, tmp_path, monkeypatch
):
    """compact_bm25_postings' failure seam: a crash after the folded
    root's rename but before the pointer flip leaves every reader on
    the old roots + old ledger; the retry completes and scores are
    unchanged throughout."""
    from pyspark.sql import functions as F

    from newspapers_etl_spark.catalog import load_table, table_path
    from newspapers_etl_spark.operators.retrieval import (
        append_bm25_postings,
        compact_bm25_postings,
        retrieval_bm25_topk_from_postings,
        write_bm25_postings,
    )
    from newspapers_etl_spark.sinks import verified

    docs = load_table(spark, sf_dir, "documents")
    cut = docs.count() // 2
    h1, h2 = str(tmp_path / "h1"), str(tmp_path / "h2")
    docs.filter(F.col("doc_id") < cut).write.parquet(table_path(h1, "documents"))
    docs.filter(F.col("doc_id") >= cut).write.parquet(table_path(h2, "documents"))
    path = str(tmp_path / "idx")
    write_bm25_postings(spark, h1, path)
    append_bm25_postings(spark, h2, path, batch_id="b1")
    before = [
        (r["doc_id"], r["score"])
        for r in retrieval_bm25_topk_from_postings(spark, path).collect()
    ]
    ptr_before = verified.current_pointer(f"{path}/stats")

    def boom(p, **meta):
        raise RuntimeError("injected: died before pointer flip")

    monkeypatch.setattr(verified, "update_pointer_meta", boom)
    try:
        compact_bm25_postings(spark, path)
    except RuntimeError:
        pass
    monkeypatch.undo()
    assert verified.current_pointer(f"{path}/stats") == ptr_before
    assert [
        (r["doc_id"], r["score"])
        for r in retrieval_bm25_topk_from_postings(spark, path).collect()
    ] == before

    compact_bm25_postings(spark, path)  # retry completes
    assert [
        (r["doc_id"], r["score"])
        for r in retrieval_bm25_topk_from_postings(spark, path).collect()
    ] == before
