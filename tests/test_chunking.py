"""Document chunking (operators/chunking.py): boundary arithmetic,
full coverage, stable ids, multibyte character counting, and the
degenerate inputs (NULL / empty / exactly-one-window texts)."""

from __future__ import annotations

import hashlib

from newspapers_etl_spark.operators.chunking import (
    STRIDE,
    WINDOW,
    chunk_relation,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boundary_arithmetic_and_coverage(spark):
    """L chars yield floor((L-1)/STRIDE)+1 chunks; every chunk but the
    last is exactly WINDOW chars (when the text allows); the windows
    cover the text with WINDOW-STRIDE overlap."""
    cases = {
        1: 1,
        STRIDE: 1,
        STRIDE + 1: 2,
        WINDOW: 2,  # WINDOW > STRIDE: start-150 window still has 50 chars
        2 * STRIDE: 2,
        2 * STRIDE + 1: 3,
        1000: (999 // STRIDE) + 1,
    }
    rows = [(n, "x" * n) for n in cases]
    out = chunk_relation(_docs(spark, rows)).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for n, expected in cases.items():
        got = sorted(by_doc[n], key=lambda r: r["chunk_ix"])
        assert len(got) == expected, (n, expected, len(got))
        for r in got:
            start = r["chunk_ix"] * STRIDE  # 0-based
            assert r["n_chunk"] == min(WINDOW, n - start)
        # coverage: last chunk reaches the end of the text
        last = got[-1]
        assert last["chunk_ix"] * STRIDE + last["n_chunk"] == n


def test_null_and_empty_texts_yield_no_chunks(spark):
    out = chunk_relation(
        _docs(spark, [(1, None), (2, ""), (3, "abc")])
    ).collect()
    assert {r["doc_id"] for r in out} == {3}


def test_stable_ids_and_content_hashes(spark):
    """chunk_id is a pure function of (doc_id, chunk_ix) and chunk_md5
    of the window bytes — both replayable outside Spark (hashlib), so
    downstream artifacts keyed by chunk_id survive re-runs."""
    text = "ábç" * 120  # 360 multibyte chars -> 3 chunks
    out = sorted(
        chunk_relation(_docs(spark, [(7, text)])).collect(),
        key=lambda r: r["chunk_ix"],
    )
    assert len(out) == (len(text) - 1) // STRIDE + 1
    for r in out:
        start = r["chunk_ix"] * STRIDE
        window = text[start : start + WINDOW]
        assert r["n_chunk"] == len(window)  # chars, not bytes
        assert (
            r["chunk_md5"]
            == hashlib.md5(window.encode("utf-8")).hexdigest()
        )
        assert (
            r["chunk_id"]
            == hashlib.md5(f"7:{r['chunk_ix']}".encode()).hexdigest()
        )


def test_rerun_reproduces_identical_relation(spark, sf_dir):
    """Determinism across invocations on the fixture table (the
    joinable-across-runs contract)."""
    from newspapers_etl_spark.operators.chunking import chunk_documents

    a = sorted(map(tuple, chunk_documents(spark, sf_dir).collect()))
    b = sorted(map(tuple, chunk_documents(spark, sf_dir).collect()))
    assert a == b
    assert a
