"""KMV (k-minimum-values) distinct sketch — the hand-built mergeable
NDV estimator (Bar-Yossef et al. 2002; Beyer et al., SIGMOD 2007).

Spark ships HLL (`approx_count_distinct`, registered as `andv`);
KMV is the complementary sketch a pipeline wants when it needs
(a) a MERGEABLE summary it can store and combine across partitions /
days / sources with plain SQL (the merge of two KMV sets is just
"union, keep the k smallest" — no opaque binary state), and (b) an
unbiased estimator with a known error bound ~1/sqrt(k-2).

Estimator: hash every element to uniform (0, 1]; if the k-th smallest
hash among n distinct elements is R_k, then E[R_k] ≈ k/n, so
NDV ≈ (k-1)/R_k (the -1 makes it unbiased).  With fewer than k
distinct elements the sketch is the exact distinct set.

Spark shape: duplicates collapse map-side (groupBy group+hash is
partial-aggregable), so the one shuffle carries DISTINCT 8-byte hashes
per group — the same discipline as every fingerprint operator here;
the k-smallest selection is a bounded per-group window.  At extreme
per-group cardinality, pre-select k-per-(group, salt) first (the
`topk_lang` two-phase move) so no group funnels through one task —
KMV's merge rule makes that composition EXACT (asserted in
tests/test_new_ops.py), which is the whole point of the sketch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.functions.text import words
from newspapers_etl_spark.registry import query

KMV_K = 256  # sketch size; relative error ~ 1/sqrt(k-2) ≈ 6%

# xxhash64 → uniform (0, 1]: shift the signed 64-bit value into
# unsigned position and scale.  +1 keeps 0 out (R_k = 0 would divide
# by zero on a pathological hash collision at the origin).
_UNIT = 1.8446744073709552e19  # 2^64


def _unit_hash(col) -> Column:
    return (F.xxhash64(col).cast("double") + 9.223372036854776e18 + 1.0) / _UNIT


def kmv_sketch(df: DataFrame, group: str, element) -> DataFrame:
    """Per-group KMV sketch rows: the k smallest unit hashes of the
    distinct elements — (group, rank, u).  This relation IS the
    storable/mergeable summary; `kmv_estimate` reduces it."""
    distinct = (
        df.select(F.col(group).alias("grp"), _unit_hash(element).alias("u"))
        .groupBy("grp", "u")
        .agg(F.lit(1))
        .select("grp", "u")
    )
    w = Window.partitionBy("grp").orderBy(F.asc("u"))
    return (
        distinct.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KMV_K)
        .select("grp", "rank", "u")
    )


def kmv_estimate(sketch: DataFrame) -> DataFrame:
    """Reduce sketch rows to (grp, n_kept, est_ndv): exact count when
    the group held fewer than k distinct elements, else (k-1)/R_k."""
    return sketch.groupBy("grp").agg(
        F.count("*").alias("n_kept"),
        F.round(
            F.when(
                F.count("*") < KMV_K, F.count("*").cast("double")
            ).otherwise((F.lit(KMV_K) - 1) / F.max("u")),
            2,
        ).alias("est_ndv"),
    )


@query("kmv")  # rows-only: estimates ride on Spark's xxhash64
def kmv_vocabulary_ndv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary-size estimate (distinct tokens) via the
    KMV sketch: (lang, n_kept, est_ndv).  The error bound vs the exact
    per-language distinct count and the EXACT merge property (sketch of
    part A ∪ part B == sketch of whole) are pytest-asserted; values are
    hash-derived, hence rows-only like `andv`."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "lang", F.explode(words("text")).alias("tok")
    )
    est = kmv_estimate(kmv_sketch(toks, "lang", "tok"))
    return est.select(F.col("grp").alias("lang"), "n_kept", "est_ndv")
