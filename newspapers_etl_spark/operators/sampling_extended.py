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


@query("topk_lang", oracle=SAMPLE_TOPK_ORACLE)
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
