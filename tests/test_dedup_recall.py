"""Planted-duplicate recall for the near-dup operators.

The LSH/SimHash queries are rows-only (hash values are engine-specific),
so this is their semantic check: plant a near-duplicate of a document
and assert the blocking scheme actually surfaces the pair as a
candidate, while an unrelated document stays further away.  This is the
recall guarantee the 100 TB design leans on — banding with b bands of r
rows catches Jaccard-s pairs with probability 1-(1-s^r)^b, so a
high-overlap plant must collide in at least one band.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from newspapers_etl_spark.operators.dedup import (
    _EMB_PLANES,
    candidate_pairs,
    emb_lsh_bucket,
    hamming16,
    lsh_bands,
    minhash_signature,
    shingles,
    simhash,
    simhash_table_keys,
)
from newspapers_etl_spark.functions.text import words

BASE = (
    "the morning edition carries a long report on the harvest season "
    "with detailed tables of grain prices across every district and a "
    "short notice about the railway timetable changing next week "
    "followed by correspondence from the capital concerning the new "
    "tariff proposals and an account of the municipal council meeting "
    "where the waterworks extension was debated at considerable length "
    "before the assembly adjourned until the following thursday evening"
)
# near-dup: ONE word substituted out of ~60 tokens — only the 3
# shingles containing it change, so 3-shingle Jaccard is ~0.9 and the
# 4-band/4-row scheme must catch the pair (hashes are deterministic,
# so this is a fixed property of these strings, not a flaky sample)
NEAR = BASE.replace("waterworks", "gasworks")
OTHER = (
    "completely different subject matter entirely about maritime "
    "insurance rates and the arrival of steam vessels in the harbour "
    "with no overlapping vocabulary at all in this text"
)


def _docs(spark):
    return spark.createDataFrame(
        [(0, BASE), (1, NEAR), (2, OTHER)], ["doc_id", "text"]
    )


def test_minhash_lsh_recalls_planted_duplicate(spark):
    d = _docs(spark)
    sigs = (
        d.select("doc_id", words("text").alias("toks"))
        .select("doc_id", shingles("toks").alias("sh"))
        .select("doc_id", minhash_signature("sh").alias("sig"))
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in candidate_pairs(lsh_bands(sigs, "doc_id"), "doc_id").collect()
    }
    assert (0, 1) in pairs, "planted near-duplicate must be an LSH candidate"
    assert (0, 2) not in pairs and (1, 2) not in pairs, (
        "unrelated document must not collide with the pair in any band"
    )


def test_minhash_signature_similarity_orders_pairs(spark):
    d = _docs(spark)
    sigs = (
        d.select("doc_id", words("text").alias("toks"))
        .select("doc_id", shingles("toks").alias("sh"))
        .select("doc_id", minhash_signature("sh").alias("sig"))
    )
    rows = {r.doc_id: list(r.sig) for r in sigs.collect()}

    def agree(a, b):
        return sum(x == y for x, y in zip(rows[a], rows[b]))

    assert agree(0, 1) > agree(0, 2), (
        "signature agreement must rank the planted dup above unrelated text"
    )


def test_simhash_multitable_guarantees_recall_at_d3(spark):
    """The Manku blocking invariant, tested exhaustively at BOTH the
    16-bit fixture width (default widths) and the 32-bit scale
    instantiation (wider blocks, same C(6,3) tables): EVERY value at
    Hamming distance exactly 3 from a base value must share at least
    one (table_id, key) with it — C(bits,3) variants, zero misses
    allowed.  This is the recall guarantee the docstring claims; the
    old single-prefix scheme fails this for any triple touching the
    prefix bits."""
    from itertools import combinations as _combos

    cases = [
        (0b1011_0010_1110_0101, 16, None),  # fixture default
        (0b1011_0010_1110_0101_0110_1001_0011_1100, 32, (6, 6, 5, 5, 5, 5)),
    ]
    for base, bits, widths in cases:
        variants = [
            (i + 1, base ^ ((1 << a) | (1 << b) | (1 << c)))
            for i, (a, b, c) in enumerate(_combos(range(bits), 3))
        ]
        df = spark.createDataFrame([(0, base)] + variants, ["doc_id", "sh"])
        keys = (
            simhash_table_keys("sh")
            if widths is None
            else simhash_table_keys("sh", widths)
        )
        keyed = df.select("doc_id", F.explode(keys).alias("t")).select(
            "doc_id", "t.table_id", "t.key"
        )
        base_keys = keyed.filter(F.col("doc_id") == 0).select("table_id", "key")
        caught = (
            keyed.filter(F.col("doc_id") != 0)
            .join(base_keys, ["table_id", "key"])
            .select("doc_id")
            .distinct()
            .count()
        )
        assert caught == len(variants), (
            f"{bits}-bit blocking missed {len(variants) - caught} of "
            f"{len(variants)} distance-3 variants"
        )


def test_simhash_multitable_bucket_count_exceeds_prefix_scheme(spark, sf_dir):
    """The pair join must be bounded by many small buckets, not 16 big
    ones: distinct (table_id, key) count over the fixture corpus must be
    far above the old scheme's 16."""
    from newspapers_etl_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    n_buckets = (
        d.select(simhash("text").alias("sh"))
        .select(F.explode(simhash_table_keys("sh")).alias("t"))
        .select("t.table_id", "t.key")
        .distinct()
        .count()
    )
    assert n_buckets > 100, f"expected >>16 blocking buckets, got {n_buckets}"


def test_embedding_lsh_planted_neardup_collides(spark):
    """A near-identical embedding pair must collide in at least one
    Rademacher table (deterministic planes + deterministic vectors = a
    fixed property, not a flaky sample), while the blocking must still
    split the space (an antipodal vector lands in the complement bucket
    of every table)."""
    state = 12345
    v = []
    for _ in range(64):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        v.append(((state >> 32) % 2001 - 1000) / 1000.0)
    near = list(v)
    near[0] += 0.01  # tiny perturbation: cosine ~ 0.9999
    anti = [-x for x in v]
    df = spark.createDataFrame(
        [(0, v), (1, near), (2, anti)], ["vec_id", "embedding"]
    )
    buckets = df.select(
        "vec_id",
        *[
            emb_lsh_bucket("embedding", _EMB_PLANES[t]).alias(f"b{t}")
            for t in range(len(_EMB_PLANES))
        ],
    )
    rows = {r.vec_id: (r.b0, r.b1) for r in buckets.collect()}
    assert any(rows[0][t] == rows[1][t] for t in range(2)), (
        "planted near-duplicate must share an LSH bucket in some table"
    )
    assert all(rows[0][t] != rows[2][t] for t in range(2)), (
        "antipodal vector must never share a bucket"
    )


def test_candidate_pairs_mega_bucket_guard(spark):
    """Adversarial degenerate bucket: 500 identical documents share every
    band bucket, so without the guard the pair join is C(500,2) per band;
    with the default cap those buckets are skipped entirely while a
    planted near-dup pair in its own small buckets is still recalled."""
    clones = [(i, "identical boilerplate header row " * 8) for i in range(10, 510)]
    d = spark.createDataFrame([(0, BASE), (1, NEAR)] + clones, ["doc_id", "text"])
    sigs = (
        d.select("doc_id", words("text").alias("toks"))
        .select("doc_id", shingles("toks").alias("sh"))
        .select("doc_id", minhash_signature("sh").alias("sig"))
    )
    banded = lsh_bands(sigs, "doc_id")
    guarded = candidate_pairs(banded, "doc_id").collect()
    pairs = {(r.id_a, r.id_b) for r in guarded}
    assert (0, 1) in pairs, "planted pair must survive the guard"
    assert len(pairs) <= 2, f"mega-bucket pairs must be skipped, got {len(pairs)}"
    unguarded = candidate_pairs(banded, "doc_id", max_bucket=None).count()
    assert unguarded >= 500 * 499 // 2, "cap disabled must regenerate the flood"


def test_simhash_hamming_orders_pairs(spark):
    d = _docs(spark)
    sh = d.select("doc_id", simhash("text").alias("sh"))
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            hamming16(F.col("a.sh"), F.col("b.sh")).alias("h"),
        )
    )
    dist = {(r.id_a, r.id_b): r.h for r in pairs.collect()}
    assert dist[(0, 1)] < dist[(0, 2)], (
        "near-dup must be closer in Hamming space than unrelated text"
    )
    assert dist[(0, 1)] <= 3, "two-word edit should move at most a few bits"


def test_star_cc_chain_converges_in_log_rounds(spark):
    """The large-star/small-star alternation must resolve a 64-node
    path graph — the worst case for label propagation, which needs
    O(diameter)=63 rounds — in O(log n) iterations, and label every
    node with the component minimum."""
    from newspapers_etl_spark.operators.dedup import star_connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "u long, v long"
    )
    labels, iters = star_connected_components(chain)
    got = {r.node: r.cluster_id for r in labels.collect()}
    assert got == {i: 0 for i in range(64)}, "chain must collapse to min=0"
    assert iters <= 8, f"star CC took {iters} iterations on a 64-path"


def test_star_cc_disjoint_components(spark):
    """Two components + node-id gaps: each cluster labels with its own
    minimum, nothing bleeds across."""
    from newspapers_etl_spark.operators.dedup import star_connected_components

    edges = spark.createDataFrame(
        [(10, 30), (30, 20), (100, 200), (200, 150), (150, 100)],
        "u long, v long",
    )
    labels, _ = star_connected_components(edges)
    got = {r.node: r.cluster_id for r in labels.collect()}
    assert got == {10: 10, 20: 10, 30: 10, 100: 100, 150: 100, 200: 100}


def test_star_cc_reliable_checkpoint_dir(spark, tmp_path):
    """With checkpoint_dir set, every round checkpoints to RELIABLE
    storage (cluster-safe: a lost executor replays from disk, not from
    the whole lineage) and the labels are identical to the
    localCheckpoint default."""
    from newspapers_etl_spark.operators.dedup import star_connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(31)] + [(100, 200), (200, 300)],
        "u long, v long",
    )
    ckdir = str(tmp_path / "cc_ck")
    labels, iters = star_connected_components(edges, checkpoint_dir=ckdir)
    got = {r.node: r.cluster_id for r in labels.collect()}
    want = {i: 0 for i in range(32)} | {100: 100, 200: 100, 300: 100}
    assert got == want
    import os

    rdd_dirs = [
        f for root, dirs, _ in os.walk(ckdir) for f in dirs if f.startswith("rdd-")
    ]
    assert rdd_dirs, "no reliable checkpoint data written under checkpoint_dir"


def test_prefix_join_pairs_equal_bruteforce(spark, sf_dir):
    """EXACT recall+precision of the prefix-filtered Jaccard join
    (dedup_jaccard): its pair set must equal the all-pairs brute force
    at the same threshold.  This is the check the DuckDB oracle CANNOT
    provide — the oracle mirrors the same prefix algorithm, so a filter
    bug that drops a true pair on both sides would still hash-match;
    only an independent enumeration proves the prefix-length lemma is
    applied correctly."""
    from pyspark.sql import functions as F

    from newspapers_etl_spark.catalog import load_table
    from newspapers_etl_spark.functions.text import words
    from newspapers_etl_spark.operators.dedup import (
        JACCARD_T,
        dedup_jaccard_prefix_join,
        shingles,
    )

    try:
        got = {
            (r.doc_id_a, r.doc_id_b): r.jaccard
            for r in dedup_jaccard_prefix_join(spark, sf_dir).collect()
        }
    finally:
        spark.catalog.clearCache()

    d = load_table(spark, sf_dir, "documents")
    sized = (
        d.select("doc_id", words("text").alias("toks"))
        .select("doc_id", F.array_distinct(shingles("toks")).alias("ss"))
        .withColumn("n", F.size("ss"))
    )
    a = sized.select(
        F.col("doc_id").alias("ida"), F.col("ss").alias("ss_a"), F.col("n").alias("n_a")
    )
    b = sized.select(
        F.col("doc_id").alias("idb"), F.col("ss").alias("ss_b"), F.col("n").alias("n_b")
    )
    inter = F.size(F.array_intersect("ss_a", "ss_b"))
    brute = {
        (r.ida, r.idb): r.j
        for r in a.crossJoin(b)
        .filter(F.col("ida") < F.col("idb"))
        .select(
            "ida",
            "idb",
            F.round(
                inter.cast("double") / (F.col("n_a") + F.col("n_b") - inter), 4
            ).alias("j"),
        )
        .filter(F.col("j") >= JACCARD_T)
        .collect()
    }
    assert got == brute, (
        f"prefix join diverges from brute force: "
        f"missing={set(brute) - set(got)} extra={set(got) - set(brute)}"
    )
    assert brute, "fixture planted no near-dup pairs at this threshold"


def test_sh32_matches_brute_force_hamming3(spark, sf_dir):
    """The registered 32-bit production-width query (operators.dedup_scale)
    must return EXACTLY the brute-force pair set at Hamming <= 3 over the
    32-bit simhash — recall (Manku guarantee) AND precision (popcount
    verify) together, end-to-end on the fixture corpus.  Brute force runs
    driver-side over the 500 collected (doc_id, hash) pairs: test-only,
    the registered query itself never collects."""
    from newspapers_etl_spark.catalog import load_table
    from newspapers_etl_spark.operators.dedup_scale import (
        SIMHASH32_BITS,
        SIMHASH32_HAMMING_D,
        dedup_simhash32_neardup_pairs,
    )

    got = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup_simhash32_neardup_pairs(spark, sf_dir).collect()
    }
    d = load_table(spark, sf_dir, "documents")
    members = d.select(
        "doc_id", simhash("text", bits=SIMHASH32_BITS).alias("sh")
    ).collect()
    brute = {}
    for i, a in enumerate(members):
        for b in members[i + 1 :]:
            ham = bin(a.sh ^ b.sh).count("1")
            if ham <= SIMHASH32_HAMMING_D:
                key = (min(a.doc_id, b.doc_id), max(a.doc_id, b.doc_id))
                brute[key] = ham
    assert got == brute, (
        f"sh32 diverges from brute force: "
        f"missing={set(brute) - set(got)} extra={set(got) - set(brute)}"
    )
    assert brute, "fixture planted no pairs at Hamming <= 3"


def _to_signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def test_simhash64_blocking_guarantees_recall_at_d3(spark):
    """The 64-bit instantiation of the same C(6,3) construction
    (widths 11,11,11,11,10,10 — the SCALING.md claim), exhaustively:
    all C(64,3) distance-3 variants of a base value must collide with
    it in at least one table.  Values with bit 63 set are sign-wrapped
    to Spark longs; the shift/mask key arithmetic must be unsigned-
    correct through the sign bit."""
    from itertools import combinations as _combos

    base = 0xB2E5_6931_9C3C_A5D7
    widths = (11, 11, 11, 11, 10, 10)
    variants = [
        (i + 1, _to_signed64(base ^ ((1 << a) | (1 << b) | (1 << c))))
        for i, (a, b, c) in enumerate(_combos(range(64), 3))
    ]
    df = spark.createDataFrame(
        [(0, _to_signed64(base))] + variants, "doc_id long, sh long"
    )
    keyed = df.select(
        "doc_id", F.explode(simhash_table_keys("sh", widths)).alias("t")
    ).select("doc_id", "t.table_id", "t.key")
    base_keys = keyed.filter(F.col("doc_id") == 0).select("table_id", "key")
    caught = (
        keyed.filter(F.col("doc_id") != 0)
        .join(base_keys, ["table_id", "key"])
        .select("doc_id")
        .distinct()
        .count()
    )
    assert caught == len(variants), (
        f"64-bit blocking missed {len(variants) - caught} of {len(variants)}"
    )


def test_simhash64_end_to_end_matches_brute_force(spark, sf_dir):
    """The full 64-bit Manku near-dup join (simhash fold through the
    sign bit, shift-built powers, bit_count verify) returns exactly the
    brute-force Hamming <= 3 pair set on the fixture corpus — the
    64-bit twin of test_sh32_matches_brute_force_hamming3, proving the
    documented widest width runs end-to-end, not just in a docstring."""
    from newspapers_etl_spark.catalog import load_table
    from newspapers_etl_spark.operators.dedup import manku_neardup_pairs

    got = {
        (r.id_a, r.id_b): r.hamming
        for r in manku_neardup_pairs(
            spark,
            sf_dir,
            bits=64,
            widths=(11, 11, 11, 11, 10, 10),
            hamming_d=3,
            hamming_fn=lambda a, b: F.bit_count(a.bitwiseXOR(b)),
        ).collect()
    }
    d = load_table(spark, sf_dir, "documents")
    members = d.select("doc_id", simhash("text", bits=64).alias("sh")).collect()
    mask = (1 << 64) - 1
    brute = {}
    for i, a in enumerate(members):
        for b in members[i + 1 :]:
            ham = bin((a.sh ^ b.sh) & mask).count("1")
            if ham <= 3:
                key = (min(a.doc_id, b.doc_id), max(a.doc_id, b.doc_id))
                brute[key] = ham
    assert got == brute, (
        f"64-bit pairs diverge: missing={set(brute) - set(got)} "
        f"extra={set(got) - set(brute)}"
    )
