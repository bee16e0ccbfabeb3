"""Training-data sampling and packing operators.

Two ops every large-scale training pipeline runs between dedup and
tokenization, absent from the reference (whose only selection is the
date-range filter, reference src/01-scrape-images.py:484-497):

- **Deterministic hash sampling**: reproducible subsets selected by a
  content-independent hash of the stable key, never `rand()` — the
  sample is identical across engines, re-runs, and partition layouts,
  so ablations and held-out splits are exactly re-creatable.  The
  predicate is a map-side expression; at 100 TB the sample is a scan
  with zero shuffles before the per-stratum accounting.
- **Sequence packing**: greedy concatenation of documents into
  fixed-token-budget context windows.  Packing is SHARD-LOCAL (the
  window partitions by a deterministic shard of the key): a global
  ORDER BY would serialize the corpus through one task at scale, while
  shard-local packing runs one bounded window per shard and loses only
  the tail-fragment efficiency of each shard — the standard trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.functions.text import words
from newspapers_etl_spark.registry import query

# Keep rows whose md5(key) hex prefix sorts below the threshold: 0x34/256
# of the keyspace ≈ 20.3%.  Hex-string comparison is engine-portable
# (Spark and DuckDB md5 produce identical lowercase hex).
SAMPLE_PREFIX_BELOW = "34"
PACK_TOKEN_BUDGET = 512
PACK_SHARDS = 8

SAMPLE_ORACLE = f"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(count(*) FILTER (
         WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{SAMPLE_PREFIX_BELOW}'
       ) AS BIGINT) AS n_sampled,
       round(count(*) FILTER (
         WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{SAMPLE_PREFIX_BELOW}'
       ) * 1.0 / count(*), 4) AS sample_ratio
FROM documents
GROUP BY lang
"""


@query("strat", oracle=SAMPLE_ORACLE)
def sample_strat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum accounting of a deterministic ~20% hash sample over
    documents: total vs sampled per lang, with the realized ratio.  The
    membership predicate — md5 of the stable key against a hex
    threshold — is the reproducible-split primitive (same rows in, same
    sample out, on any engine or layout); the stratum report is how a
    pipeline audits that no language got starved by the hash."""
    d = load_table(spark, sf_dir, "documents")
    in_sample = (
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
        < SAMPLE_PREFIX_BELOW
    )
    return d.groupBy("lang").agg(
        F.count("*").alias("n_total"),
        F.count(F.when(in_sample, 1)).alias("n_sampled"),
        F.round(
            F.count(F.when(in_sample, 1)) / F.count("*"), 4
        ).alias("sample_ratio"),
    )


PACK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         doc_id % {PACK_SHARDS} AS shard,
         len(string_split_regex(text, '\\s+')) AS n_tokens
  FROM documents
),
packed AS (
  SELECT shard, n_tokens,
         CAST(floor(
           (sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) - n_tokens)
           / {PACK_TOKEN_BUDGET}) AS BIGINT) AS pack_id
  FROM toks
)
SELECT shard, pack_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM packed
GROUP BY shard, pack_id
"""


@query("packsq", oracle=PACK_ORACLE)
def pack_seqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-local greedy sequence packing: within each deterministic
    shard, documents (ordered by key) are assigned to the context
    window their running token offset falls into — pack_id =
    floor(start_offset / budget).  One window per shard, no global
    sort; the output is the packing manifest (docs and tokens per
    window) a tokenizer job consumes.  Offset-based assignment admits
    one straddling doc per boundary (standard greedy packing — the
    tokenizer truncates or spills the straddler)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.pmod("doc_id", F.lit(PACK_SHARDS)).alias("shard"),
        F.size(words("text")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.select(
        "shard",
        "n_tokens",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / PACK_TOKEN_BUDGET
        ).alias("pack_id"),
    )
    return packed.groupBy("shard", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )
