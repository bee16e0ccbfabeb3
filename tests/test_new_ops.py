"""Semantic micro-tests for the round-4 late additions: data-quality
audit, snapshot diff, event anomaly/gap analytics, unigram surprisal,
and salted top-k sampling.

The oracle differential for each query runs in test_relational.py
(every registered oracle, both engines, order-insensitive hash); these
tests pin the SEMANTICS on planted fixtures — a violation is counted
in the right check, a changed document lands in the right class, a
volume spike crosses the z threshold — which an all-clean fixture
can't distinguish from a query that never fires."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from newspapers_etl_spark.operators.data_quality import dq_audit
from newspapers_etl_spark.operators.events_analytics import events_anomaly, events_gaps
from newspapers_etl_spark.operators.sampling_extended import TOPK_K, sample_topk
from newspapers_etl_spark.operators.snapshot_diff import corpus_diff
from newspapers_etl_spark.operators.text_scoring import text_unigram_ppl


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / f"{name}.parquet")
    )


# ---------------------------------------------------------------------------
# dq_audit: planted violations land in the right check rows
# ---------------------------------------------------------------------------


def test_dq_audit_counts_planted_violations(spark, tmp_path):
    _write(
        spark, tmp_path, "lineitem",
        [
            # (orderkey, quantity, discount, extendedprice)
            (1, 10.0, 0.05, 100.0),   # clean
            (1, 99.0, 0.05, 100.0),   # qty out of range
            (2, 10.0, 0.50, 100.0),   # discount out of range
            (2, 10.0, 0.05, -5.0),    # non-positive price
            (999, 10.0, 0.05, 100.0), # orphan orderkey
        ],
        "l_orderkey long, l_quantity double, l_discount double, l_extendedprice double",
    )
    _write(
        spark, tmp_path, "orders",
        [(1, 10), (2, 10), (2, 10), (3, 888)],  # dup PK 2; orphan custkey 888
        "o_orderkey long, o_custkey long",
    )
    _write(spark, tmp_path, "customer", [(10,), (20,)], "c_custkey long")  # 20 has no orders
    _write(
        spark, tmp_path, "documents",
        # empty text; one bad n_chars; dup PK.  (lang, source) groups:
        # ("en","a") has 3 members, ("de","b") has 1 — below k=5, so
        # BOTH quasi-groups are at-risk for the k-anonymity check.
        [
            (1, "abc", 3, "en", "a"),
            (2, "", 0, "en", "a"),
            (3, "xy", 9, "en", "a"),
            (3, "xy", 2, "de", "b"),
        ],
        "doc_id long, text string, n_chars long, lang string, source string",
    )
    _write(
        spark, tmp_path, "embeddings",
        # clean; exact-zero norm; NaN element; empty vector
        [
            (1, [1.0, 2.0]),
            (2, [0.0, 0.0]),
            (3, [float("nan"), 1.0]),
            (4, []),
        ],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["tbl"], r["chk"]): (r["n_rows"], r["n_bad"])
        for r in dq_audit(spark, str(tmp_path)).collect()
    }
    assert got[("lineitem", "qty_in_1_50")] == (5, 1)
    assert got[("lineitem", "discount_in_0_01")] == (5, 1)
    assert got[("lineitem", "price_positive")] == (5, 1)
    assert got[("lineitem", "fk_orderkey")] == (5, 1)
    assert got[("orders", "fk_custkey")] == (4, 1)
    assert got[("orders", "pk_unique")] == (4, 1)
    assert got[("customer", "has_orders")] == (2, 1)
    assert got[("documents", "text_nonempty")] == (4, 1)
    assert got[("documents", "n_chars_consistent")] == (4, 1)
    assert got[("documents", "pk_unique")] == (4, 1)
    # n_rows = quasi-groups (2), n_bad = groups under k=5 (both)
    assert got[("documents", "k_anon_5")] == (2, 2)
    # zero-norm + NaN element + empty vector are all unhealthy
    assert got[("embeddings", "zero_norm")] == (4, 3)


# ---------------------------------------------------------------------------
# corpus_diff: each class fires on its planted doc_id
# ---------------------------------------------------------------------------


def test_corpus_diff_classifies_planted_docs(spark, tmp_path):
    # doc 3: 3 % 11 == 3 → absent from OLD → added
    # doc 5: 5 % 13 == 5 → absent from NEW → removed
    # doc 7: 7 % 7 == 0 → OLD text upper-cased → changed
    # doc 1: in both, same text → unchanged
    _write(
        spark, tmp_path, "documents",
        [(1, "abc", "s"), (3, "abc", "s"), (5, "abc", "s"), (7, "abc", "s")],
        "doc_id long, text string, source string",
    )
    got = {
        r["change"]: r["n_docs"]
        for r in corpus_diff(spark, str(tmp_path)).collect()
    }
    assert got == {"added": 1, "removed": 1, "changed": 1, "unchanged": 1}


# ---------------------------------------------------------------------------
# events_anomaly: a planted volume spike crosses the threshold
# ---------------------------------------------------------------------------


def test_events_anomaly_flags_planted_spike(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(10):
        n = 30 if h == 9 else 1  # flat baseline, one 30x spike
        for _ in range(n):
            rows.append((eid, base + dt.timedelta(hours=h, minutes=1), 1, "a"))
            eid += 1
    _write(spark, tmp_path, "events", rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = events_anomaly(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert got[0]["hour_start"] == base + dt.timedelta(hours=9)
    assert got[0]["n_events"] == 30 and got[0]["z"] > 2.0


def test_events_anomaly_constant_series_emits_nothing(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (h, base + dt.timedelta(hours=h), 1, "a") for h in range(6)
    ]  # variance 0 → stats filter drops the type entirely
    _write(spark, tmp_path, "events", rows, "event_id long, ts timestamp, user_id long, event_type string")
    assert events_anomaly(spark, str(tmp_path)).count() == 0


# ---------------------------------------------------------------------------
# events_gaps: exact micro-gaps
# ---------------------------------------------------------------------------


def test_events_gaps_exact_values(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 7, "a"),
        (2, t0 + dt.timedelta(seconds=1), 7, "a"),
        (3, t0 + dt.timedelta(seconds=3), 7, "a"),  # gaps: 1s, 2s
        (4, t0, 8, "a"),                            # single event → null gaps
    ]
    _write(spark, tmp_path, "events", rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {r["user_id"]: r for r in events_gaps(spark, str(tmp_path)).collect()}
    assert got[7]["n_events"] == 3
    assert got[7]["avg_gap_s"] == pytest.approx(1.5)
    assert got[7]["max_gap_us"] == 2_000_000 and got[7]["min_gap_us"] == 1_000_000
    assert got[8]["n_events"] == 1
    assert got[8]["avg_gap_s"] is None and got[8]["max_gap_us"] is None


# ---------------------------------------------------------------------------
# text_unigram_ppl: closed-form value on an all-unique-token corpus
# ---------------------------------------------------------------------------


def test_unigram_ppl_closed_form_on_unique_tokens(spark, tmp_path):
    # Every token globally unique → p(term) = 1/N → nll = ln(N) exactly.
    rows = [
        (0, "a b c", "en", "s", 5),
        (1, "d e", "en", "s", 3),
    ]  # N = 5 tokens
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r["doc_id"]: r for r in text_unigram_ppl(spark, str(tmp_path)).collect()}
    assert got[0]["n_tok"] == 3 and got[1]["n_tok"] == 2
    for r in got.values():
        assert r["nll"] == pytest.approx(math.log(5), abs=1e-6)
        assert r["ppl"] == pytest.approx(5.0, abs=1e-3)


def test_unigram_ppl_drops_tokenless_docs(spark, tmp_path):
    rows = [(0, "a b", "en", "s", 3), (1, "", "en", "s", 0)]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = text_unigram_ppl(spark, str(tmp_path)).collect()
    assert [r["doc_id"] for r in got] == [0]


# ---------------------------------------------------------------------------
# sample_topk: salted two-phase ≡ naive single window; exact-k strata
# ---------------------------------------------------------------------------


def test_sample_topk_matches_naive_window(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from newspapers_etl_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    naive = (
        d.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= TOPK_K)
        .select("lang", "doc_id", "rk")
    )
    got = sorted(map(tuple, sample_topk(spark, sf_dir).collect()))
    want = sorted(map(tuple, naive.collect()))
    assert got == want

    sizes = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    per_lang: dict[str, list[int]] = {}
    for lang, _, rk in got:
        per_lang.setdefault(lang, []).append(rk)
    for lang, rks in per_lang.items():
        assert sorted(rks) == list(range(1, min(TOPK_K, sizes[lang]) + 1))


# ---------------------------------------------------------------------------
# url_ops: canonicalization is idempotent on adversarial inputs
# ---------------------------------------------------------------------------


def test_canonical_url_is_idempotent(spark):
    from pyspark.sql import functions as F

    from newspapers_etl_spark.operators.url_ops import canonical_url

    urls = [
        "https://WWW.Example.COM/Path/To/Page?utm_source=x&id=1#frag",
        "http://example.com/",
        "https://example.com",
        "https://www.example.org/a/b/?utm_a=1&utm_b=2",
        "https://Sub.Domain.Example.net/Mixed/Case?z=9&a=1",
        "https://example.com/?utm_only=1",
        "https://example.com/p?#",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonical_url(F.col("url")).alias("c1"))
    twice = once.select(
        F.col("c1"), canonical_url(F.col("c1")).alias("c2")
    ).collect()
    for r in twice:
        assert r["c1"] == r["c2"], f"not idempotent: {r['c1']} -> {r['c2']}"


# ---------------------------------------------------------------------------
# text_compress: entropy signal semantics (no oracle — DuckDB lacks zlib)
# ---------------------------------------------------------------------------


def test_compression_ratio_separates_repetitive_from_prose(spark, tmp_path):
    rep = "spam ham " * 200                      # highly repetitive
    prose = " ".join(f"w{i}x{i * 7 % 93}" for i in range(400))  # high entropy
    rows = [(0, rep, "en", "s", len(rep)), (1, prose, "en", "s", len(prose)),
            (2, "", "en", "s", 0)]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    from newspapers_etl_spark.operators.text_scoring import text_compression_ratio

    got = {r["doc_id"]: r for r in text_compression_ratio(spark, str(tmp_path)).collect()}
    assert got[0]["comp_ratio"] < 0.1, "repetitive text should crush"
    assert got[1]["comp_ratio"] > 2 * got[0]["comp_ratio"]
    assert got[2]["comp_ratio"] is None and got[2]["comp_b"] == 0
    again = {r["doc_id"]: r["comp_b"]
             for r in text_compression_ratio(spark, str(tmp_path)).collect()}
    assert again == {k: v["comp_b"] for k, v in got.items()}, "not deterministic"


# ---------------------------------------------------------------------------
# Defensive branches: corrupt ts dtype fails loudly; empty stream dir too
# ---------------------------------------------------------------------------


def test_load_events_with_string_ts_raises(spark, tmp_path):
    _write(spark, tmp_path, "events", [(1, "not-a-ts", 1, "a")],
           "event_id long, ts string, user_id long, event_type string")
    from newspapers_etl_spark.catalog import load_table

    with pytest.raises(TypeError, match="unsupported dtype"):
        load_table(spark, str(tmp_path), "events")


def test_peek_ts_encoding_empty_dir_raises(tmp_path):
    from newspapers_etl_spark.streaming.incremental_stream import _peek_ts_encoding

    with pytest.raises(FileNotFoundError, match="ts_encoding"):
        _peek_ts_encoding(str(tmp_path), None)


def test_peek_ts_encoding_sees_nested_layout(spark, tmp_path):
    d = tmp_path / "day=2024-01-01"
    d.mkdir()
    _write(spark, d, "events", [(1, __import__("datetime").datetime(2024, 1, 1), 1, "a")],
           "event_id long, ts timestamp, user_id long, event_type string")
    from newspapers_etl_spark.streaming.incremental_stream import _peek_ts_encoding

    assert _peek_ts_encoding(str(tmp_path), None) in ("tz", "ntz")


def test_peek_ts_encoding_descends_spark_written_dataset_dirs(spark, tmp_path):
    # glob names the dataset; on disk it is a DIRECTORY of part files
    _write(spark, tmp_path, "events", [(1, __import__("datetime").datetime(2024, 1, 1), 1, "a")],
           "event_id long, ts timestamp, user_id long, event_type string")
    from newspapers_etl_spark.streaming.incremental_stream import _peek_ts_encoding

    assert _peek_ts_encoding(str(tmp_path), "events.parquet") in ("tz", "ntz")


def test_rollup_merge_equals_direct_at_every_grain(spark, sf_dir):
    """Mergeability across grains: hour and day rollups computed from
    minute partials must equal the same grains computed directly from
    raw events — for every column including the active-minute count."""
    from pyspark.sql import functions as F

    from newspapers_etl_spark.catalog import load_table
    from newspapers_etl_spark.operators.rollup import (
        merge_to_grain,
        minute_partials,
    )

    e = load_table(spark, sf_dir, "events")
    partials = minute_partials(e).persist()
    try:
        for grain in ("1 hour", "1 day"):
            merged = {
                (r["g"]["start"], r["event_type"]): (
                    r["n_events"], r["sum_v"], r["min_v"], r["max_v"],
                    r["n_active_minutes"],
                )
                for r in merge_to_grain(partials, grain).collect()
            }
            direct = {
                (r["g"]["start"], r["event_type"]): (
                    r["n_events"], r["sum_v"], r["min_v"], r["max_v"],
                    r["n_active_minutes"],
                )
                for r in e.groupBy(
                    F.window("ts", grain).alias("g"), "event_type"
                )
                .agg(
                    F.count("*").alias("n_events"),
                    F.sum("value").alias("sum_v"),
                    F.min("value").alias("min_v"),
                    F.max("value").alias("max_v"),
                    F.count_distinct(
                        F.date_trunc("minute", "ts")
                    ).alias("n_active_minutes"),
                )
                .collect()
            }
            assert set(merged) == set(direct), f"{grain}: key sets differ"
            for k, got in merged.items():
                want = direct[k]
                assert got[0] == want[0] and got[4] == want[4], (k, got, want)
                assert got[1] == pytest.approx(want[1], rel=1e-12)
                assert got[2] == want[2] and got[3] == want[3]
    finally:
        partials.unpersist()


def test_kmv_sketch_error_bound_and_exact_small_groups(spark, sf_dir):
    """KMV estimate within the ~1/sqrt(k-2) bound of the exact distinct
    count for saturated groups; exact for groups under k distinct."""
    from pyspark.sql import functions as F

    from newspapers_etl_spark.catalog import load_table
    from newspapers_etl_spark.functions.text import words
    from newspapers_etl_spark.operators.sketches import KMV_K, kmv_vocabulary_ndv

    d = load_table(spark, sf_dir, "documents")
    exact = {
        r.lang: r.n
        for r in d.select("lang", F.explode(words("text")).alias("t"))
        .groupBy("lang")
        .agg(F.count_distinct("t").alias("n"))
        .collect()
    }
    got = {r.lang: (r.n_kept, r.est_ndv) for r in kmv_vocabulary_ndv(spark, sf_dir).collect()}
    assert set(got) == set(exact)
    bound = 4.0 / (KMV_K - 2) ** 0.5  # 4 sigma of the KMV relative error
    for lang, n in exact.items():
        kept, est = got[lang]
        if n < KMV_K:
            assert (kept, est) == (n, float(n)), f"{lang}: small group not exact"
        else:
            assert kept == KMV_K
            rel = abs(est - n) / n
            assert rel <= bound, f"{lang}: rel err {rel:.3f} > {bound:.3f} (n={n})"


def test_kmv_merge_of_parts_equals_sketch_of_whole(spark, sf_dir):
    """The property that makes KMV a SKETCH: merging two halves' sketch
    rows (union, keep k smallest) reproduces the whole-corpus sketch
    EXACTLY — so per-day/per-source summaries compose losslessly."""
    from pyspark.sql import functions as F

    from newspapers_etl_spark.catalog import load_table
    from newspapers_etl_spark.functions.text import words
    from newspapers_etl_spark.operators.sketches import (
        KMV_K,
        kmv_sketch,
    )
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("lang", "doc_id", F.explode(words("text")).alias("tok"))
    whole = {
        (r.grp, r.rank): r.u
        for r in kmv_sketch(toks, "lang", "tok").collect()
    }
    halves = [
        kmv_sketch(toks.filter(F.pmod("doc_id", F.lit(2)) == i), "lang", "tok")
        for i in (0, 1)
    ]
    merged_rows = (
        halves[0].unionByName(halves[1])
        .select("grp", "u")
        .distinct()
        .withColumn(
            "rank",
            F.row_number().over(Window.partitionBy("grp").orderBy(F.asc("u"))),
        )
        .filter(F.col("rank") <= KMV_K)
        .collect()
    )
    merged = {(r.grp, r.rank): r.u for r in merged_rows}
    assert merged == whole, "merged half-sketches diverge from whole-corpus sketch"
