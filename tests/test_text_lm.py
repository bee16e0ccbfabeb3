"""Bigram surprisal semantics (operators/text_lm.py).

The oracle differential runs in the registry sweep; this pins the
property that motivates a bigram filter over a unigram one: a document
that is a word-for-word PERMUTATION of a fluent document has an
IDENTICAL unigram score (same token multiset) but a strictly higher
bigram surprisal (novel word pairs) — word salad is invisible to
``ppl`` and visible to ``ppl2``.
"""

from __future__ import annotations

from newspapers_etl_spark.operators.text_lm import text_bigram_ppl
from newspapers_etl_spark.operators.text_scoring import text_unigram_ppl


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))


def test_word_salad_spikes_bigram_but_not_unigram(spark, tmp_path):
    fluent = "the cat sat on the mat and the dog lay by the door"
    # Deterministic permutation of the SAME tokens (same multiset).
    salad = "mat the and dog the on sat by door lay the cat the"
    assert sorted(fluent.split()) == sorted(salad.split())
    rows = [(i, fluent) for i in range(10)] + [(99, salad)]
    _write_docs(spark, tmp_path, rows)

    uni = {r.doc_id: r.nll for r in text_unigram_ppl(spark, str(tmp_path)).collect()}
    bi = {r.doc_id: r.nll2 for r in text_bigram_ppl(spark, str(tmp_path)).collect()}

    # Same multiset -> identical unigram surprisal.
    assert abs(uni[99] - uni[0]) < 1e-9, (uni[99], uni[0])
    # Novel word pairs -> strictly higher bigram surprisal.
    assert bi[99] > bi[0] + 0.5, (bi[99], bi[0])


def test_short_docs_drop_out_of_bigram_scoring(spark, tmp_path):
    """Docs with fewer than two tokens have no bigrams: they must yield
    no row (not a crash from Spark's descending sequence(1, 0))."""
    _write_docs(
        spark, tmp_path, [(1, "single"), (2, ""), (3, "two tokens here")]
    )
    got = {r.doc_id: r.n_big for r in text_bigram_ppl(spark, str(tmp_path)).collect()}
    assert got == {3: 2}
