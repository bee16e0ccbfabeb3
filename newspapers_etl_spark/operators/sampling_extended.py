"""Fixed-size per-stratum sampling: deterministic top-k by key hash,
computed with the salted two-phase pattern so no stratum ever funnels
through a single task.

Complements `sampling.py`'s fraction-based hash sample: evaluation
sets and human-review queues need EXACTLY k documents per language,
not a percentage — and the selection must be reproducible across
engines, re-runs, and partition layouts, so the order key is
`md5(doc_id)`, never `rand()`.

Scale design — why not one `row_number` window per stratum: a window
partitioned by `lang` sends every row of a language to ONE task; with
a handful of languages over 100 TB that is a handful of tasks doing
all the work.  The salted two-phase form bounds every task:

  phase 1: rank within (lang, salt) — SALTS-many bounded partitions
           per language, each emits at most k survivors;
  phase 2: rank the <= SALTS*k survivors per language globally.

Any row in the true top-k of its language is in the top-k of its own
salt bucket (fewer competitors), so phase 1 never evicts a final
winner — the result is exactly the unsalted top-k, at a fan-in of
SALTS*k rows per language instead of the full stratum.  The oracle
computes the naive single-window form; matching hashes ARE the proof
of the rewrite's correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.functions.text import quality_score
from newspapers_etl_spark.registry import query

TOPK_K = 20
TOPK_SALTS = 8

SAMPLE_TOPK_ORACLE = f"""
SELECT lang, doc_id,
       CAST(row_number() OVER (
         PARTITION BY lang
         ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
       ) AS INT) AS rk
FROM documents
QUALIFY rk <= {TOPK_K}
"""


@query("tklang", oracle=SAMPLE_TOPK_ORACLE)
def sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly {TOPK_K} documents per language, selected by md5(doc_id)
    order (reproducible), ranked — via salted pre-ranking so no
    language stratum concentrates on one task."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "lang",
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("sample_key"),
        F.pmod(F.xxhash64("doc_id"), F.lit(TOPK_SALTS)).alias("salt"),
    )
    local = Window.partitionBy("lang", "salt").orderBy("sample_key", "doc_id")
    survivors = (
        keyed.withColumn("lrk", F.row_number().over(local))
        .filter(F.col("lrk") <= TOPK_K)
        .drop("lrk", "salt")
    )
    final = Window.partitionBy("lang").orderBy("sample_key", "doc_id")
    return (
        survivors.withColumn("rk", F.row_number().over(final).cast("int"))
        .filter(F.col("rk") <= TOPK_K)
        .select("lang", "doc_id", "rk")
    )


# ---------------------------------------------------------------------------
# Token-budget corpus selection (distributed prefix sum)
# ---------------------------------------------------------------------------

TOK_BUDGET = 800  # strictly binding at sf0.01 (~1.1-1.6k tokens/source)
TB_SALTS = 8

TOK_BUDGET_ORACLE = f"""
WITH t AS (
  SELECT source, doc_id,
         doc_id % {TB_SALTS} AS salt,
         md5(CAST(doc_id AS VARCHAR)) AS sel_key,
         len(string_split_regex(text, '\\s+')) AS n_tokens
  FROM documents
), c AS (
  SELECT source, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source
                             ORDER BY salt, sel_key, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM t
)
SELECT source, doc_id,
       CAST(n_tokens  AS BIGINT) AS n_tokens,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM c
WHERE cum_tokens <= {TOK_BUDGET}
"""


@query("tokbud", oracle=TOK_BUDGET_ORACLE)
def token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select documents per source up to a fixed TOKEN budget — the
    corpus-mixing primitive when the recipe says "N billion tokens of
    source X", not "N documents".  Selection order is deterministic
    (bucket-major: salt, then md5 of the stable key), so the chosen
    subset is identical across engines, re-runs, and layouts.

    Scale design — a distributed prefix sum, not one window per source:
    a cumulative sum partitioned only by `source` sends every row of a
    source through ONE task (the same funnel `topk_lang` avoids).  The
    two-phase form bounds every task:

      phase 1: cumulative sum within (source, salt) — TB_SALTS bounded
               partitions per source;
      phase 2: per-bucket token totals (a tiny sources x salts
               aggregate) are offset-summed over the salt order and
               broadcast back, so each row's global running total is
               bucket_offset + local_cum with no second data shuffle.

    Defining the selection order as bucket-major makes the composition
    exact — the oracle runs the naive single-window form over the same
    (salt, sel_key, doc_id) order and must produce the identical
    subset, which is the proof of the rewrite.  The salt is
    ``doc_id % TB_SALTS`` (not a seeded hash) so the oracle can mirror
    it verbatim."""
    d = load_table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.size(F.split("text", r"\s+")).alias("n_tokens"),
        F.pmod(F.col("doc_id"), F.lit(TB_SALTS)).alias("salt"),
        F.md5(F.col("doc_id").cast("string")).alias("sel_key"),
    )
    w_local = (
        Window.partitionBy("source", "salt")
        .orderBy("sel_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Stage the windowed narrow relation ONCE (lazy localCheckpoint):
    # it feeds two consumers — the offset aggregate and the final
    # selection — and Catalyst plans shared DataFrames as duplicated
    # subtrees (here: two parquet scans, two tokenizations, two window
    # passes; exchange reuse doesn't fire because column pruning
    # de-canonicalizes the branches).  The staged relation has already
    # dropped text, so the materialization is ids+counts, a fraction of
    # the input width.  On a cluster this becomes reliable checkpoint /
    # an intermediate table, same as the CC loop (operators/dedup.py).
    local = d.withColumn(
        "local_cum", F.sum("n_tokens").over(w_local)
    ).localCheckpoint(eager=False)
    # The last running total per bucket IS the bucket sum — totals come
    # from the staged windowed side, never a second pass over the text.
    bucket_totals = local.groupBy("source", "salt").agg(
        F.max("local_cum").alias("bucket_tokens")
    )
    w_off = (
        Window.partitionBy("source")
        .orderBy("salt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_totals.withColumn(
        "tok_offset", F.coalesce(F.sum("bucket_tokens").over(w_off), F.lit(0))
    ).select("source", "salt", "tok_offset")
    return (
        local.join(F.broadcast(offsets), ["source", "salt"])
        .withColumn(
            "cum_tokens", (F.col("tok_offset") + F.col("local_cum")).cast("long")
        )
        .filter(F.col("cum_tokens") <= TOK_BUDGET)
        .select(
            "source",
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "cum_tokens",
        )
    )


# ---------------------------------------------------------------------------
# Quality-weighted acceptance sampling (soft filtering)
# ---------------------------------------------------------------------------

QUAL_SAMPLE_ORACLE = """
WITH feats AS (
  SELECT doc_id, source,
         CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE) AS n_tokens,
         CASE WHEN len(text) > 0
              THEN CAST(len(regexp_replace(text, '[\\w\\s]', '', 'g')) AS DOUBLE)
                   / len(text)
              ELSE 0.0 END AS p_ratio,
         CASE WHEN len(string_split_regex(text, '\\s+')) > 0
              THEN CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                        x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE)
                   / len(string_split_regex(text, '\\s+'))
              ELSE 0.0 END AS s_ratio
  FROM documents
), scored AS (
  SELECT doc_id, source,
         round((CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END
               + CASE WHEN p_ratio < 0.2 THEN 1.0 ELSE 0.0 END
               + CASE WHEN s_ratio > 0.0 AND s_ratio < 0.6 THEN 1.0 ELSE 0.0 END)
               / 3.0, 6) AS quality
  FROM feats
)
SELECT doc_id, source, quality
FROM scored
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
      CASE WHEN quality < 0.2 THEN ''
           WHEN quality < 0.5 THEN '55'
           WHEN quality < 0.9 THEN 'aa'
           ELSE 'g0' END
"""


@query("qsamp", oracle=QUAL_SAMPLE_ORACLE)
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft quality filtering: keep a document with probability equal to
    its quality score, instead of a hard threshold — the FineWeb-style
    move that downsamples mediocre text without discarding it entirely.

    The acceptance test is deterministic: md5(doc_id)'s 2-hex-char
    prefix (a uniform draw over 256 buckets, the `strat`
    primitive) compared against a per-row threshold derived from the
    quality score (0 -> reject all, 1/3 -> below '55' = 85/256, 2/3 ->
    below 'aa' = 170/256, 1 -> 'g0', which every hex prefix sorts
    under, = accept all).  Same doc, same verdict, on any engine or
    layout — reproducible ablations.

    Scale: pure map-side column arithmetic over the scan — zero
    shuffles, zero UDFs; the quality features and the membership test
    inline into one whole-stage-codegen pass."""
    d = load_table(spark, sf_dir, "documents")
    qual = quality_score("text")
    threshold = (
        F.when(qual < 0.2, F.lit(""))
        .when(qual < 0.5, F.lit("55"))
        .when(qual < 0.9, F.lit("aa"))
        .otherwise(F.lit("g0"))
    )
    accepted = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < threshold
    return d.filter(accepted).select("doc_id", "source", qual.alias("quality"))
