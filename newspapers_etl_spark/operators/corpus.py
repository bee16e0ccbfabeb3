"""Corpus-lifecycle operators for a training-data pipeline: incremental
cross-snapshot dedup, deterministic train/val/test splitting, hashed
linear quality scoring, and mixture statistics for sampling weights.

The reference's nearest analogs are its idempotent skip-if-exists
delivery (reference src/01-scrape-images.py:357-359,462-465 — "don't
re-download what a prior run already fetched", i.e. dedup against
history) and its date-range selection (src/01-scrape-images.py:484-497
— the only subsetting it does).  These queries are the corpus-level
generalizations a 100 TB pipeline runs between crawls and tokenization.

Scale design:
- Incremental dedup joins the NEW batch against history on the 16-byte
  content fingerprint — an equi-join shuffle keyed on the hash, never
  on text.  For a daily-batch cadence, bucket the history table by
  fingerprint so each day's join is co-located (no history re-shuffle).
- Split membership is a map-side expression over md5 of the stable key
  (same primitive as ``strat``): zero shuffles before the
  per-split accounting, reproducible on any engine or layout.
- The quality scorer is hashing-trick linear inference with
  integer-quantized weights: token → md5 → bucket → int weight, folded
  JVM-side in ONE ``F.aggregate`` pass (no Python, no shuffle until the
  final per-source rollup).  Integer summation keeps the score exact
  and engine-portable; real deployments swap the weight table for
  trained (int8-quantized) classifier weights — the plumbing is
  identical.
- Mixture stats aggregate to O(n_langs) rows before any windowing, so
  the share computations run on a tiny post-shuffle table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.functions.text import doc_fingerprint, words
from newspapers_etl_spark.registry import query

# History = sources src0..src9; the "new batch" = src10+.  Mirrors a
# crawl-over-crawl ingest where earlier snapshots are already curated.
HIST_SOURCE_MAX = 10

DEDUP_INCR_ORACLE = f"""
WITH fp AS (
  SELECT doc_id, lang,
         CAST(substr(source, 4) AS INT) >= {HIST_SOURCE_MAX} AS is_new,
         md5(array_to_string(list_sort(list_filter(list_distinct(string_split_regex(text, '\\s+')), x -> x != '')), ' '))
           AS fingerprint
  FROM documents
),
hist AS (SELECT DISTINCT fingerprint FROM fp WHERE NOT is_new)
SELECT b.lang,
       CAST(count(*) AS BIGINT) AS n_new,
       CAST(count(*) FILTER (WHERE h.fingerprint IS NOT NULL) AS BIGINT)
         AS n_dup_hist,
       CAST(count(*) FILTER (WHERE h.fingerprint IS NULL) AS BIGINT)
         AS n_net_new
FROM fp b LEFT JOIN hist h ON b.fingerprint = h.fingerprint
WHERE b.is_new
GROUP BY b.lang
"""


@query("ddinc", oracle=DEDUP_INCR_ORACLE)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cross-snapshot dedup: the new batch (sources
    src10+) joined against the distinct fingerprints of the historical
    corpus (src0..src9); per-lang accounting of how much of the batch
    is already known.  This is the steady-state shape of corpus dedup
    at 100 TB — you never re-pair the whole corpus, you join each new
    batch against the accumulated fingerprint set (the reference's
    skip-if-exists re-download guard, src/01-scrape-images.py:357-359,
    generalized from filenames to content hashes).  The join carries
    16-byte keys both sides; history arrives pre-distinct so the join
    fan-out is at most 1."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        (F.substring("source", 4, 10).cast("int") >= HIST_SOURCE_MAX).alias(
            "is_new"
        ),
        doc_fingerprint("text").alias("fingerprint"),
    )
    hist = (
        d.filter(~F.col("is_new"))
        .select("fingerprint")
        .distinct()
        .withColumn("in_hist", F.lit(1))
    )
    batch = d.filter("is_new")
    return (
        batch.join(hist, "fingerprint", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_new"),
            F.count("in_hist").alias("n_dup_hist"),
            F.count(F.when(F.col("in_hist").isNull(), 1)).alias("n_net_new"),
        )
    )


# md5-hex prefix ranges over the stable key: [00,0d) test ≈ 5.1%,
# [0d,1a) val ≈ 5.1%, the rest train.  Hex-string comparison is
# engine-portable (same primitive as sampling.SAMPLE_PREFIX_BELOW).
SPLIT_TEST_BELOW = "0d"
SPLIT_VAL_BELOW = "1a"

SPLIT_ORACLE = f"""
WITH tagged AS (
  SELECT CASE
           WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{SPLIT_TEST_BELOW}' THEN 'test'
           WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{SPLIT_VAL_BELOW}' THEN 'val'
           ELSE 'train'
         END AS split,
         len(list_filter(string_split_regex(text, '\\s+'), x -> x != '')) AS n_tokens
  FROM documents
)
SELECT split,
       CAST(count(*) AS BIGINT)      AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       round(count(*) * 1.0 / sum(count(*)) OVER (), 4) AS doc_frac
FROM tagged
GROUP BY split
"""


@query("split3", oracle=SPLIT_ORACLE)
def split_3way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by md5-prefix range over the
    stable key, with per-split document and token accounting.  The
    membership expression is map-side and content-independent, so the
    split is identical across engines, re-runs, and partition layouts —
    the property held-out evaluation needs (contrast ``rand()`` seeds,
    which are layout-dependent in a distributed scan).  The unbounded
    window computing doc_frac runs on the 3-row AGGREGATED result, not
    the corpus."""
    d = load_table(spark, sf_dir, "documents")
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    tagged = d.select(
        F.when(prefix < SPLIT_TEST_BELOW, "test")
        .when(prefix < SPLIT_VAL_BELOW, "val")
        .otherwise("train")
        .alias("split"),
        F.size(F.filter(words("text"), lambda x: x != "")).alias("n_tokens"),
    )
    agg = tagged.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )
    total = Window.partitionBy()
    return agg.select(
        "split",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_docs") / F.sum("n_docs").over(total), 4).alias(
            "doc_frac"
        ),
    )


QUALITY_CLF_ORACLE = """
WITH scored AS (
  SELECT source,
         COALESCE(list_sum(list_transform(
           list_filter(string_split_regex(text, '\\s+'), x -> x != ''),
           t -> strpos('0123456789abcdef', substr(md5(t), 1, 1)) - 9
         )), 0) AS score
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE score > 0) AS BIGINT) AS n_pass,
       round(count(*) FILTER (WHERE score > 0) * 1.0 / count(*), 4)
         AS pass_rate,
       round(avg(score), 2) AS avg_score
FROM scored
GROUP BY source
"""


@query("qclf", oracle=QUALITY_CLF_ORACLE)
def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick linear quality classifier over documents: each
    token hashes (md5 first hex digit) to one of 16 buckets carrying an
    integer weight in [-8, 7]; the document score is the weight sum,
    folded in a single JVM-side ``F.aggregate`` pass; pass = score > 0.
    The weight table here is the hash digit itself minus 8 — a
    deterministic stand-in for trained classifier weights (the
    container ships no model), but the inference plumbing is exactly
    what a fastText-style int8-quantized filter runs at 100 TB: one
    linear scan, no Python, no shuffle until the per-source rollup.
    Integer summation keeps the fold exact and portable (no
    float-association drift between engines)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(words("text"), lambda x: x != "")
    score = F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc
        + F.conv(F.substring(F.md5(t), 1, 1), 16, 10).cast("int")
        - F.lit(8),
    )
    scored = d.select("source", score.alias("score"))
    return scored.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count(F.when(F.col("score") > 0, 1)).alias("n_pass"),
        F.round(
            F.count(F.when(F.col("score") > 0, 1)) / F.count("*"), 4
        ).alias("pass_rate"),
        F.round(F.avg("score"), 2).alias("avg_score"),
    )


CORPUS_MIX_ORACLE = """
WITH toks AS (
  SELECT lang,
         len(list_filter(string_split_regex(text, '\\s+'), x -> x != ''))
           AS n_tokens
  FROM documents
),
agg AS (
  SELECT lang,
         CAST(count(*) AS BIGINT)      AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS n_tokens
  FROM toks GROUP BY lang
)
SELECT lang, n_docs, n_tokens,
       round(n_tokens * 1.0 / sum(n_tokens) OVER (), 4) AS tok_share,
       round(sqrt(n_tokens * 1.0 / sum(n_tokens) OVER ()), 4) AS samp_w
FROM agg
"""


@query("cmix", oracle=CORPUS_MIX_ORACLE)
def corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus mixture statistics: document/token totals,
    token share, and a temperature-scaled sampling weight (sqrt of the
    share — temperature 0.5 upweights low-resource languages, the
    standard multilingual mixing move).  sqrt is IEEE-correctly-rounded
    on every engine, so the weight is reproducible where ``pow(x, t)``
    would drift in the last ulp.  All heavy lifting is the one
    map-side token count + groupBy; the share window runs over the
    O(n_langs) aggregate.  The weight is unnormalized — the sampler
    divides by the weight sum at use time."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        F.size(F.filter(words("text"), lambda x: x != "")).alias("n_tokens"),
    )
    agg = toks.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )
    total = Window.partitionBy()
    share = F.col("n_tokens") / F.sum("n_tokens").over(total)
    return agg.select(
        "lang",
        "n_docs",
        "n_tokens",
        F.round(share, 4).alias("tok_share"),
        F.round(F.sqrt(share), 4).alias("samp_w"),
    )


# ---------------------------------------------------------------------------
# Cross-split leakage audit (train/test contamination)
# ---------------------------------------------------------------------------

LEAKAGE_ORACLE = f"""
WITH f AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_filter(list_distinct(string_split_regex(text, '\\s+')), x -> x != '')), ' ')) AS fp,
         CASE
           WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{SPLIT_TEST_BELOW}' THEN 'test'
           WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{SPLIT_VAL_BELOW}' THEN 'val'
           ELSE 'train'
         END AS split
  FROM documents
)
SELECT least(a.split, b.split)    AS split_lo,
       greatest(a.split, b.split) AS split_hi,
       CAST(count(*) AS BIGINT)   AS n_pairs
FROM f a
JOIN f b
  ON a.fp = b.fp AND a.doc_id < b.doc_id AND a.split <> b.split
GROUP BY 1, 2
"""


@query("leak", oracle=LEAKAGE_ORACLE)
def split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split contamination audit: pairs of duplicate documents
    (same order-insensitive content fingerprint) that landed in
    DIFFERENT splits of the deterministic 3-way split — exactly the
    train/test leakage that inflates every downstream eval.  Composes
    two already-verified primitives (`split3`'s md5-range split,
    `textfp`'s fingerprint), so the audit itself is oracle-checkable.

    Scale: the self-join keys on the 32-hex-char fingerprint — the
    shuffle carries (fp, doc_id, split), never text; duplicate-cluster
    sizes bound each join group (the same guarantee `dd_exact`
    relies on).  Counts roll up per unordered split pair."""
    d = load_table(spark, sf_dir, "documents")
    pre = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(pre < SPLIT_TEST_BELOW, "test")
        .when(pre < SPLIT_VAL_BELOW, "val")
        .otherwise("train")
    )
    f = d.select(
        "doc_id",
        doc_fingerprint("text").alias("fp"),
        split.alias("split"),
    )
    a, b = f.alias("a"), f.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.split") != F.col("b.split")),
        )
        .groupBy(
            F.least("a.split", "b.split").alias("split_lo"),
            F.greatest("a.split", "b.split").alias("split_hi"),
        )
        .agg(F.count("*").alias("n_pairs"))
    )
