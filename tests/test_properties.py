"""Property-based checks (SURVEY.md §5.2 item 4) via hypothesis:
algebraic identities that must hold for ANY input, not just the
fixtures.  Examples are kept small (Spark job per example) and the
deadline is disabled — JVM latency is not a property failure."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

# whole-module battery: index builds / 142-query sweeps / hypothesis
pytestmark = pytest.mark.heavy

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.lists(st.integers(min_value=-50, max_value=50), min_size=0, max_size=40)


@given(xs=keys)
@settings(**SETTINGS)
def test_distinct_is_idempotent(spark, xs):
    df = spark.createDataFrame([(x,) for x in xs], "k int")
    once = df.distinct()
    assert sorted(r.k for r in once.distinct().collect()) == sorted(
        r.k for r in once.collect()
    )
    assert once.count() == len(set(xs))


@given(a=keys, b=keys)
@settings(**SETTINGS)
def test_anti_join_complement_identity(spark, a, b):
    """|A ▷ B| = |A| − |A ⋉ B| row-for-row (semi and anti partition A)."""
    da = spark.createDataFrame([(x,) for x in a], "k int")
    db = spark.createDataFrame([(x,) for x in b], "k int")
    anti = da.join(db, "k", "left_anti").count()
    semi = da.join(db, "k", "left_semi").count()
    assert anti == da.count() - semi
    # and the anti side really contains no B keys
    assert anti == len([x for x in a if x not in set(b)])


@given(
    days=st.lists(
        st.integers(min_value=0, max_value=365 * 50), min_size=1, max_size=30
    )
)
@settings(**SETTINGS)
def test_date_format_roundtrip(spark, days):
    """to_date(date_format(d)) == d — the reference's YYYY-MM-DD string
    normalization (src/01-scrape-images.py:418,483-485) is lossless."""
    df = spark.createDataFrame([(d,) for d in days], "off int").select(
        F.date_add(F.to_date(F.lit("2000-01-01")), F.col("off")).alias("d")
    )
    out = df.select(
        "d", F.to_date(F.date_format("d", "yyyy-MM-dd")).alias("rt")
    ).collect()
    assert all(r.d == r.rt for r in out)


@given(xs=st.lists(st.text(alphabet="ab ", max_size=12), min_size=1, max_size=20))
@settings(**SETTINGS)
def test_exact_dedup_fingerprint_is_order_insensitive(spark, xs):
    """doc_fingerprint treats a document as a token SET: any permutation
    of the same tokens fingerprints identically, different token sets
    don't collide (md5 over canonical form)."""
    from newspapers_etl_spark.functions.text import doc_fingerprint

    rows = [(i, t) for i, t in enumerate(xs)]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        r.id: r.fp
        for r in df.select("id", doc_fingerprint("text").alias("fp")).collect()
    }
    canon = {i: frozenset(t.split()) for i, t in rows}
    for i in got:
        for j in got:
            if canon[i] == canon[j]:
                assert got[i] == got[j], f"same token set, different fp: {i},{j}"
            else:
                assert got[i] != got[j], f"collision: {xs[i]!r} vs {xs[j]!r}"


@given(
    docs=st.lists(
        st.lists(
            st.integers(min_value=0, max_value=12), min_size=1, max_size=12
        ).map(lambda xs: frozenset(xs)),
        min_size=2,
        max_size=12,
    ),
    t_pct=st.sampled_from([50, 75, 80]),
)
@settings(max_examples=200, deadline=None)
def test_prefix_filter_lemma_never_drops_a_true_pair(docs, t_pct):
    """The recall guarantee dedup_jaccard rests on, checked in pure
    Python against its EXACT ordering semantics (ascending document
    frequency, element as tie-break; prefix length n - ceil(t*n) + 1):
    every pair with Jaccard >= t must share at least one PREFIX element.
    A tiny alphabet makes collisions and df ties (the adversarial cases)
    dense."""
    import math

    t = t_pct / 100
    df: dict[int, int] = {}
    for s in docs:
        for x in s:
            df[x] = df.get(x, 0) + 1

    def prefix(s):
        ordered = sorted(s, key=lambda x: (df[x], x))
        n = len(ordered)
        return set(ordered[: n - math.ceil(t * n) + 1])

    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = docs[i], docs[j]
            jac = len(a & b) / len(a | b)
            if jac >= t:
                assert prefix(a) & prefix(b), (
                    f"true pair (J={jac:.3f} >= {t}) with disjoint prefixes: "
                    f"{sorted(a)} / {sorted(b)}"
                )


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),    # source
            st.integers(min_value=0, max_value=500),  # doc_id (deduped below)
            st.integers(min_value=0, max_value=40),   # n_tokens
        ),
        min_size=1,
        max_size=40,
    ),
    budget=st.integers(min_value=0, max_value=200),
)
@settings(**SETTINGS)
def test_two_phase_prefix_sum_equals_naive_window(spark, rows, budget):
    """The tok_bud rewrite's load-bearing claim, as an algebraic
    property over ARBITRARY inputs: the salted two-phase cumulative sum
    (bucket-local running totals + offset of earlier buckets) selects
    exactly the rows the naive single window per source selects, for
    any data and any budget — because the selection order is defined
    bucket-major, the composition is exact, not approximate."""
    from pyspark.sql import Window

    seen = set()
    uniq = []
    for s, d, n in rows:
        if (s, d) not in seen:
            seen.add((s, d))
            uniq.append((s, d, n))
    df = spark.createDataFrame(uniq, "source int, doc_id int, n_tokens int")
    salted = df.withColumn("salt", F.pmod(F.col("doc_id"), F.lit(4))).withColumn(
        "sel_key", F.md5(F.col("doc_id").cast("string"))
    )

    w_naive = (
        Window.partitionBy("source")
        .orderBy("salt", "sel_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = {
        (r.source, r.doc_id)
        for r in salted.withColumn("cum", F.sum("n_tokens").over(w_naive))
        .filter(F.col("cum") <= budget)
        .collect()
    }

    w_local = (
        Window.partitionBy("source", "salt")
        .orderBy("sel_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = salted.withColumn("local_cum", F.sum("n_tokens").over(w_local))
    w_off = (
        Window.partitionBy("source")
        .orderBy("salt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy("source", "salt")
        .agg(F.max("local_cum").alias("bt"))
        .withColumn("off", F.coalesce(F.sum("bt").over(w_off), F.lit(0)))
        .select("source", "salt", "off")
    )
    two_phase = {
        (r.source, r.doc_id)
        for r in local.join(offsets, ["source", "salt"])
        .withColumn("cum", F.col("off") + F.col("local_cum"))
        .filter(F.col("cum") <= budget)
        .collect()
    }
    assert two_phase == naive


# ---------------------------------------------------------------------------
# Codec round-trips (functions/codecs.py): pure-Python, no Spark job per
# example, so these run at full hypothesis example counts.
# ---------------------------------------------------------------------------


@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    gray=st.booleans(),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_any_pixels(w, h, gray, data):
    """decode(encode(pixels)) == pixels for ARBITRARY pixel buffers and
    dimensions, both color types — every scanline filter (y%5) and both
    bpp paths exercised across random shapes."""
    from newspapers_etl_spark.functions.codecs import decode_png, encode_png

    channels = 1 if gray else 3
    n = w * h * channels
    px = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n))
    )
    assert decode_png(encode_png(w, h, px, channels)) == (w, h, channels, px)


@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=600
    )
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_any_pcm(samples):
    """RIFF/WAVE 16-bit PCM must round-trip any sample sequence exactly
    (including empty and full-scale values)."""
    from newspapers_etl_spark.functions.codecs import decode_wav, encode_wav

    rate, back = decode_wav(encode_wav(samples))
    assert rate == 8000 and back == samples


@given(
    pos=st.integers(min_value=8, max_value=200),
    data=st.data(),
)
@settings(max_examples=40, deadline=None)
def test_png_bitflip_never_silently_misdecodes(pos, data):
    """Flipping any byte after the signature either raises PngError or
    (for bits inside the compressed stream that happen to survive CRC —
    impossible — or in chunk-length fields caught structurally) never
    returns a DIFFERENT pixel buffer with ok status."""
    from newspapers_etl_spark.functions.codecs import (
        PngError,
        decode_png,
        encode_png,
    )

    px = bytes(data.draw(st.lists(st.integers(0, 255), min_size=48, max_size=48)))
    png = bytearray(encode_png(4, 4, px, 3))
    idx = pos % (len(png) - 8) + 8
    png[idx] ^= 0xFF
    try:
        got = decode_png(bytes(png))
    except PngError:
        return  # detected — the required outcome
    assert got == (4, 4, 3, px), "corruption altered output without an error"


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["join", "vector", "stream", "window", "x", "yy"]),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(**SETTINGS)
def test_bm25_differential_vs_duckdb_on_any_corpus(spark, docs):
    """Engine-vs-engine BM25 differential on GENERATED corpora, not just
    the fixture: the Spark scoring core and the registered DuckDB oracle
    SQL must produce the identical top-k (doc_id, score) list for any
    corpus — same integer-scaled partial sums, same tie-breaks.  (The
    only theoretical divergence is a 1-ulp ln() difference landing a
    partial exactly on a .5 integer-scaling boundary, ~1e-7 per value.)"""
    import duckdb
    import pandas as pd

    from newspapers_etl_spark.operators.retrieval import (
        BM25_ORACLE,
        bm25_topk_over,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["doc_id"], r["score"]) for r in bm25_topk_over(sdf).collect()
    ]
    con = duckdb.connect()
    documents = pd.DataFrame(rows, columns=["doc_id", "text"])  # noqa: F841
    con.register("documents", documents)
    want = [tuple(r) for r in con.sql(BM25_ORACLE).fetchall()]
    assert got == [(int(d), float(s)) for d, s in want]


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "bb", "ccc", "join", "x"]),
            min_size=0,
            max_size=10,
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_lm_surprisal_differential_vs_duckdb_on_any_corpus(spark, docs):
    """Unigram AND bigram LM surprisal vs their registered DuckDB
    oracles on generated corpora: per-doc (n, nll, ppl) rows must match
    exactly — the model aggregations, broadcasts, and the size>=2
    bigram guard all under arbitrary inputs (empty docs, one-token
    docs, repeated grams)."""
    import duckdb
    import pandas as pd

    from newspapers_etl_spark.operators.text_lm import (
        BIGRAM_PPL_ORACLE,
        bigram_ppl_over,
    )
    from newspapers_etl_spark.operators.text_scoring import (
        UNIGRAM_PPL_ORACLE,
        unigram_ppl_over,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    documents = pd.DataFrame(rows, columns=["doc_id", "text"])
    con.register("documents", documents)
    for core, oracle in (
        (unigram_ppl_over, UNIGRAM_PPL_ORACLE),
        (bigram_ppl_over, BIGRAM_PPL_ORACLE),
    ):
        got = sorted(tuple(r) for r in core(sdf).collect())
        want = sorted(
            (int(d), int(n), float(nll), float(p))
            for d, n, nll, p in con.sql(oracle).fetchall()
        )
        assert got == want, f"{core.__name__} diverges"


# Exact-arithmetic documents-only queries whose oracle must agree on
# ANY corpus, not just the fixture: md5 fingerprints, integer counts,
# histogram buckets, deterministic hash splits.  (Float-regression and
# regex-dialect-sensitive queries are deliberately excluded — their
# fixture-sweep agreement is the contract; adversarial unicode would
# test DuckDB's regex engine, not this repo.)
_GENERATED_CORPUS_QUERIES = (
    "ddex",
    "ddchk",
    "tokens",
    "lenh",
    "lgid",
    "split3",
    "strat",
    "packsq",
    "textfp",
)


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["the", "och", "data", "batch", "x", "pix"]),
            min_size=0,
            max_size=14,
        ),
        min_size=1,
        max_size=10,
    ),
    langs=st.lists(st.sampled_from(["en", "sv"]), min_size=10, max_size=10),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_exact_queries_match_oracle_on_any_corpus(spark, tmp_path_factory, docs, langs):
    """The driver's differential check generalized to GENERATED corpora:
    write the corpus as a documents table, run each exact-arithmetic
    query against its registered oracle SQL with the driver's own
    comparison semantics.  Catches fixture-shape assumptions (token
    counts on empty docs, chunk boundaries on short docs, split hashing
    on tiny key spaces) that a fixed corpus can never exercise."""
    import duckdb

    from conftest import assert_matches_oracle
    from newspapers_etl_spark.catalog import table_path
    from newspapers_etl_spark.registry import all_oracles, all_queries

    rows = [
        (i, " ".join(ws), langs[i % len(langs)], f"s{i % 3}", len(" ".join(ws)))
        for i, ws in enumerate(docs)
    ]
    tmp = str(tmp_path_factory.mktemp("gen_sf"))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(table_path(tmp, "documents"))
    con = duckdb.connect()
    # Spark writes a part-file DIRECTORY where the driver fixtures are
    # single files — glob the parts for DuckDB.
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{table_path(tmp, 'documents')}/*.parquet')"
    )
    queries, oracles = all_queries(), all_oracles()
    for name in _GENERATED_CORPUS_QUERIES:
        assert_matches_oracle(queries[name](spark, tmp), con, oracles[name])


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(
                ["join", "vector", "stream", "window", "customer",
                 "hash", "merge", "x", "yy"]
            ),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(**SETTINGS)
def test_bm25_batch_differential_and_single_query_agreement(spark, docs):
    """Batch BM25 on GENERATED corpora, two independent checks per
    corpus: (a) the one-scan batch scorer matches the registered DuckDB
    batch oracle exactly (same integer-scaled partials, same per-query
    ranks); (b) for EVERY query in the batch, the batch rows equal the
    single-query path's top-k — the scan-amortization can never change
    a score (the term→query expansion fans out identical per-term
    partials)."""
    import duckdb
    import pandas as pd

    from newspapers_etl_spark.operators.retrieval import (
        bm25_batch_topk_over,
        bm25_topk_over,
    )
    from newspapers_etl_spark.operators.retrieval_fusion import (
        BM25_BATCH_K,
        BM25_BATCH_ORACLE,
        BM25_BATCH_QUERIES,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["query_id"], r["doc_id"], r["score"], r["rnk"])
        for r in bm25_batch_topk_over(sdf, BM25_BATCH_QUERIES, BM25_BATCH_K).collect()
    )
    con = duckdb.connect()
    documents = pd.DataFrame(rows, columns=["doc_id", "text"])  # noqa: F841
    con.register("documents", documents)
    want = sorted(
        (int(q), int(d), float(s), int(r))
        for q, d, s, r in con.sql(BM25_BATCH_ORACLE).fetchall()
    )
    assert got == want
    for qid, terms in BM25_BATCH_QUERIES.items():
        single = [
            (r["doc_id"], r["score"])
            for r in bm25_topk_over(sdf, terms, BM25_BATCH_K).collect()
        ]
        batch_q = [
            (d, s)
            for q, d, s, _r in sorted(got, key=lambda t: (t[0], t[3]))
            if q == qid
        ]
        assert batch_q == single


@given(
    seeds=st.lists(st.integers(min_value=0, max_value=10_000),
                   min_size=1, max_size=24),
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_embedding_ops_match_oracle_on_any_corpus(
    spark, tmp_path_factory, seeds
):
    """The generated-corpus differential extended to the EMBEDDING
    operators (ivf_rec / drift_emb / ivf_app): build a corpus of
    exactly-representable vectors (0.25-multiples — dots, norms and
    Lloyd means stay tie-free at the oracles' rounding precisions for
    <= 2^8-member cells), write it as an embeddings table, and require
    the registered DuckDB mirrors to agree bit-for-bit.  Exercises the
    shapes the fixture never does: corpora smaller than the cell/code
    counts (short seeds -> short codebooks), duplicate vectors
    (assignment ties -> the smallest-id tie-breaks on both engines),
    null embeddings (excluded from fit and encode on both sides), and
    an EMPTY fit slice (ivf_app's typed-empty path vs the oracle's
    empty recursion)."""
    import duckdb

    from conftest import assert_matches_oracle
    from newspapers_etl_spark.catalog import table_path
    from newspapers_etl_spark.operators.ann_eval import (
        IVF_RECALL_ORACLE,
        ivf_recall_at_k,
    )
    from newspapers_etl_spark.operators.embedding_drift import (
        DRIFT_EMB_ORACLE,
        embedding_drift_psi,
    )
    from newspapers_etl_spark.operators.ivf_maintenance import (
        IVF_APP_ORACLE,
        ivf_append_roundtrip,
    )

    def vec(seed):
        return [(((seed * 31 + j) % 8) - 4) * 0.25 for j in range(64)]

    rows = []
    for i, s in enumerate(seeds):
        # Nulls only past the probe ids: bf_topk's probe slice is
        # contractually non-null (fixture invariant) — a null PROBE
        # would test engine null-ordering defaults, not this repo.
        null = i >= 5 and s % 7 == 0
        rows.append((i, None if null else vec(s), s % 3))
    tmp = str(tmp_path_factory.mktemp("gen_emb"))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(table_path(tmp, "embeddings"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{table_path(tmp, 'embeddings')}/*.parquet')"
    )
    for fn, oracle_sql in (
        (ivf_recall_at_k, IVF_RECALL_ORACLE),
        (embedding_drift_psi, DRIFT_EMB_ORACLE),
        (ivf_append_roundtrip, IVF_APP_ORACLE),
    ):
        assert_matches_oracle(fn(spark, tmp), con, oracle_sql)


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",),  # no lone surrogates
            ),
            min_size=0,
            max_size=700,
        ),
        min_size=0,
        max_size=6,
    )
)
@settings(**SETTINGS)
def test_chunking_differential_vs_python_on_any_text(spark, texts):
    """chunk_relation vs a pure-Python reference chunker on arbitrary
    unicode: identical (doc, ix, id, md5, len) rows — pins the 1-based
    CHARACTER (not byte) window semantics and UTF-8 hashing across any
    input, including multibyte, empty and single-char texts."""
    import hashlib

    from newspapers_etl_spark.operators.chunking import (
        STRIDE,
        WINDOW,
        chunk_relation,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    got = sorted(
        map(
            tuple,
            chunk_relation(
                spark.createDataFrame(rows, "doc_id long, text string")
            ).collect(),
        )
    )
    want = []
    for doc_id, t in rows:
        if t is None or len(t) == 0:
            continue
        for ix in range((len(t) - 1) // STRIDE + 1):
            w = t[ix * STRIDE : ix * STRIDE + WINDOW]
            want.append(
                (
                    doc_id,
                    ix,
                    hashlib.md5(f"{doc_id}:{ix}".encode()).hexdigest(),
                    hashlib.md5(w.encode("utf-8")).hexdigest(),
                    len(w),
                )
            )
    assert got == sorted(want)


@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-2.0,
                max_value=2.0,
                allow_nan=False,
                width=32,
            ),
            min_size=4,
            max_size=4,
        ),
        min_size=0,
        max_size=24,
    )
)
@settings(**SETTINGS)
def test_maxsim_differential_vs_numpy_on_any_vectors(spark, vecs):
    """maxsim_topk vs a numpy reference on arbitrary float32 token
    vectors (zero vectors filtered — cosine undefined): identical
    (probe, doc, score) sets and identical ranking."""
    import numpy as np

    from newspapers_etl_spark.operators.late_interaction import (
        TOKENS_PER_DOC,
        maxsim_topk,
        token_relation,
    )

    arr = [v for v in vecs if any(abs(x) > 1e-6 for x in v)]
    rows = [(i, v) for i, v in enumerate(arr)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["probe_doc"], r["doc_id"]): (r["score"], r["rnk"])
        for r in maxsim_topk(token_relation(e), n_probe_docs=1).collect()
    }

    by_doc: dict[int, list] = {}
    for i, v in rows:
        f32 = np.asarray(v, dtype=np.float32).astype(np.float64)
        by_doc.setdefault(i // TOKENS_PER_DOC, []).append(f32)
    want = {}
    if 0 in by_doc:
        for doc, toks in by_doc.items():
            if doc == 0:
                continue
            score = 0.0
            for q in by_doc[0]:
                sims = [
                    round(
                        float(q @ d)
                        / (np.sqrt(q @ q) * np.sqrt(d @ d)),
                        6,
                    )
                    for d in toks
                ]
                score += max(sims)
            want[(0, doc)] = round(score, 6)
    assert {k: v[0] for k, v in got.items()} == want
    # ranks: dense by score desc, doc asc
    ranked = sorted(want, key=lambda k: (-want[k], k[1]))
    assert {k: got[k][1] for k in got} == {
        k: i + 1 for i, k in enumerate(ranked)
    }
