"""Semantic + plan tests for chunk-level dedup and cross-source overlap
(operators/corpus_overlap.py) on planted micro-fixtures: the oracle
differential runs in test_relational.py; these pin the SEMANTICS (a
planted partial copy is charged to the later doc, and only there) and
the SCALE SHAPE (chunk text stays out of every exchange)."""

from __future__ import annotations

import pytest

from newspapers_etl_spark.operators.corpus_overlap import (
    CHUNK_TOKENS,
    dedup_chunks,
    source_overlap,
)


@pytest.fixture(
    params=["/root/testdata/sf0.001", "/root/testdata/sf0.01"],
    ids=["sf0.001", "sf0.01"],
)
def plan_sf_dir(request) -> str:
    # Same two-SF parametrization as tests/test_plans.py: physical
    # shapes are AQE/size-dependent, one SF is not a scale claim.
    return request.param


def _write_documents(spark, tmp_path, rows):
    """Materialize a documents-shaped parquet dir usable as sf_dir."""
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _tokens(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_partial_copy_charged_to_later_doc_only(spark, tmp_path):
    # B's FIRST chunk is byte-identical to A's first chunk; B's second
    # chunk is unique.  C is entirely unique.  The C4 min-doc_id keeper
    # convention charges the dup to B alone.
    shared = _tokens("s", CHUNK_TOKENS)
    rows = [
        (0, shared + " " + _tokens("a", CHUNK_TOKENS), "en", "src0", 0),
        (1, shared + " " + _tokens("b", CHUNK_TOKENS), "en", "src1", 0),
        (2, _tokens("c", CHUNK_TOKENS), "en", "src0", 0),
    ]
    sf = _write_documents(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in dedup_chunks(spark, sf).collect()}
    assert got[0]["n_chunks"] == 2 and got[0]["n_dup_chunks"] == 0
    assert got[1]["n_chunks"] == 2 and got[1]["n_dup_chunks"] == 1
    assert got[2]["n_chunks"] == 1 and got[2]["n_dup_chunks"] == 0


def test_chunk_count_is_ceil_of_token_count(spark, tmp_path):
    rows = [
        (0, _tokens("a", CHUNK_TOKENS * 2 + 5), "en", "s", 0),  # 65 → 3
        (1, _tokens("b", 1), "en", "s", 0),                      # 1  → 1
        (2, _tokens("c", CHUNK_TOKENS), "en", "s", 0),           # 30 → 1
    ]
    sf = _write_documents(spark, tmp_path, rows)
    got = {r["doc_id"]: r["n_chunks"] for r in dedup_chunks(spark, sf).collect()}
    assert got == {0: 3, 1: 1, 2: 1}


def test_source_overlap_matches_brute_force(spark, tmp_path):
    # Two sources share the middle third of one doc's tokens; expected
    # Jaccard computed by brute-force shingling in Python.
    a_text = _tokens("a", 40) + " " + _tokens("m", 20)
    b_text = _tokens("m", 20) + " " + _tokens("b", 40)
    rows = [
        (0, a_text, "en", "srcA", 0),
        (1, b_text, "en", "srcB", 0),
    ]

    def shingles(text):
        ts = text.split()
        return {" ".join(ts[i : i + 3]) for i in range(len(ts) - 2)}

    sa, sb = shingles(a_text), shingles(b_text)
    expected = len(sa & sb) / len(sa | sb)
    sf = _write_documents(spark, tmp_path, rows)
    [row] = source_overlap(spark, sf).collect()
    assert (row["src_a"], row["src_b"]) == ("srcA", "srcB")
    assert row["n_shared"] == len(sa & sb)
    assert row["n_a"] == len(sa) and row["n_b"] == len(sb)
    assert row["jaccard"] == pytest.approx(expected, abs=1e-6)


def test_chunk_text_never_enters_an_exchange(spark, plan_sf_dir):
    # 100 TB shape: every exchange carries only doc_id / 16-byte hash /
    # aggregation buffers — never the chunk (or document) text.  Both
    # SFs, so an AQE strategy flip with input size can't silently
    # change the claim.
    from newspapers_etl_spark.plans import assert_exchanges_narrow

    assert_exchanges_narrow(
        dedup_chunks(spark, plan_sf_dir), forbidden=("chunk", "text")
    )


def test_chunking_is_lossless_at_boundaries(spark, tmp_path):
    """Property: the chunks partition the token sequence exactly —
    total chunked tokens equal the document's token count for every
    boundary-straddling size (0 handled by the size>0 guard)."""
    from pyspark.sql import functions as F
    from newspapers_etl_spark.functions.text import words

    sizes = [1, CHUNK_TOKENS - 1, CHUNK_TOKENS, CHUNK_TOKENS + 1,
             2 * CHUNK_TOKENS, 2 * CHUNK_TOKENS + 7]
    rows = [
        (i, _tokens(f"d{i}x", n), "en", "s", 0) for i, n in enumerate(sizes)
    ]
    sf = _write_documents(spark, tmp_path, rows)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    ts = F.col("ts")
    n_chunks = F.ceil(F.size(ts) / F.lit(CHUNK_TOKENS)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(ts, i * CHUNK_TOKENS + 1, F.lit(CHUNK_TOKENS)),
    )
    got = (
        docs.select("doc_id", words("text").alias("ts"))
        .select(
            "doc_id",
            F.size(ts).alias("n_tokens"),
            F.size(F.flatten(chunks)).alias("n_chunked"),
            F.aggregate(
                chunks, F.lit(0), lambda acc, c: acc + F.size(c)
            ).alias("n_summed"),
        )
        .collect()
    )
    for r in got:
        assert r["n_chunked"] == r["n_tokens"], r
        assert r["n_summed"] == r["n_tokens"], r
