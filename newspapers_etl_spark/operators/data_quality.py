"""Data-quality audit: a declarative expectations suite evaluated in
one Spark job, one row per check.

The reference's only validation is ad-hoc: it counts files against the
manifest after download and re-checks existence before re-uploading
(reference src/01-scrape-images.py:141-149, 520-543).  This operator is
that idea grown into what a 100 TB ingest actually runs before
promoting a snapshot: domain checks, nullability, primary-key
uniqueness, referential integrity, and cross-column consistency — all
producing a tiny `(table, check, n_rows, n_bad)` relation a sink gate
can assert on (`n_bad == 0` or a tolerated rate).

Scale design, per check class:
* Domain/null/consistency checks on one table are CONDITIONAL
  AGGREGATES — all checks for a table fuse into a single scan with
  map-side partials, so adding a check is free (no extra pass).
* PK uniqueness is `count(*) - count(DISTINCT pk)` — one shuffle on
  the key, partial-agg'd.
* FK orphan checks are key-only anti-join counts: both sides project
  to the join key before the shuffle, so text/payload columns never
  move.  With AQE the parent side broadcasts when small.
* Coverage (parents with no children) is the mirrored anti join.
The result is O(#checks) rows — the audit itself never becomes data.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.registry import query

DQ_ORACLE = """
SELECT 'lineitem' AS tbl, 'qty_in_1_50' AS chk,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
FROM lineitem
UNION ALL
SELECT 'lineitem', 'discount_in_0_01',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem', 'price_positive',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem', 'fk_orderkey',
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
       CAST((SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
UNION ALL
SELECT 'orders', 'fk_custkey',
       (SELECT CAST(count(*) AS BIGINT) FROM orders),
       CAST((SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
UNION ALL
SELECT 'orders', 'pk_unique',
       CAST(count(*) AS BIGINT),
       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
FROM orders
UNION ALL
SELECT 'customer', 'has_orders',
       (SELECT CAST(count(*) AS BIGINT) FROM customer),
       CAST((SELECT count(*) FROM customer c
             WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS BIGINT)
UNION ALL
SELECT 'documents', 'text_nonempty',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END) AS BIGINT)
FROM documents
UNION ALL
SELECT 'documents', 'n_chars_consistent',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN n_chars != len(text) THEN 1 ELSE 0 END) AS BIGINT)
FROM documents
UNION ALL
SELECT 'documents', 'pk_unique',
       CAST(count(*) AS BIGINT),
       CAST(count(*) - count(DISTINCT doc_id) AS BIGINT)
FROM documents
UNION ALL
SELECT 'documents', 'k_anon_5',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
FROM (SELECT lang, source, count(*) AS n
      FROM documents GROUP BY lang, source) g
UNION ALL
SELECT 'embeddings', 'zero_norm',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN embedding IS NULL
                      OR len(embedding) = 0
                      OR len(list_filter(embedding, x -> x IS NULL OR isnan(x))) > 0
                      OR list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) = 0
                 THEN 1 ELSE 0 END) AS BIGINT)
FROM embeddings
"""


def _domain_checks(df: DataFrame, tbl: str, checks: list[tuple[str, F.Column]]) -> DataFrame:
    """All domain checks for one table as a single conditional
    aggregate (one scan), unpivoted to one row per check."""
    aggs = [F.count("*").alias("n_rows")] + [
        F.sum(F.when(bad, 1).otherwise(0)).alias(f"bad_{i}")
        for i, (_, bad) in enumerate(checks)
    ]
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{name}', bad_{i}" for i, (name, _) in enumerate(checks)
    )
    return wide.selectExpr(
        f"'{tbl}' AS tbl",
        f"stack({len(checks)}, {stack}) AS (chk, n_bad)",
        "n_rows",
    ).select("tbl", "chk", "n_rows", "n_bad")


def _orphan_check(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str,
    tbl: str, chk: str,
) -> DataFrame:
    """Key-only anti-join count + total count, emitted as one row.
    Both inputs are projected to their key column before any exchange."""
    c = child.select(F.col(child_key).alias("__key"))
    p = parent.select(F.col(parent_key).alias("__key"))
    orphans = c.join(p, "__key", "left_anti").agg(F.count("*").alias("n_bad"))
    total = child.agg(F.count("*").alias("n_rows"))
    return (
        total.crossJoin(orphans)
        .select(
            F.lit(tbl).alias("tbl"), F.lit(chk).alias("chk"), "n_rows", "n_bad"
        )
    )


def _k_anon_check(
    df: DataFrame, quasi: list[str], k: int, tbl: str
) -> DataFrame:
    """k-anonymity over a quasi-identifier set: any combination of the
    quasi columns shared by fewer than k rows re-identifies its members
    if this data is released or trained on.  n_rows = quasi-groups,
    n_bad = groups below k.  The group count partial-aggregates
    map-side, and only the O(groups) relation reaches the final fold —
    the check costs one narrow shuffle regardless of corpus size."""
    groups = df.groupBy(*quasi).agg(F.count("*").alias("__n"))
    return groups.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("__n") < k, 1).otherwise(0)).alias("n_bad"),
    ).select(
        F.lit(tbl).alias("tbl"),
        F.lit(f"k_anon_{k}").alias("chk"),
        "n_rows",
        "n_bad",
    )


def _pk_check(df: DataFrame, pk: str, tbl: str) -> DataFrame:
    return df.agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count_distinct(pk)).alias("n_bad"),
    ).select(F.lit(tbl).alias("tbl"), F.lit("pk_unique").alias("chk"), "n_rows", "n_bad")


@query("dqaud", oracle=DQ_ORACLE)
def dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full expectations suite over the snapshot: domain bounds and
    consistency (fused single-scan conditional aggregates), PK
    uniqueness, FK orphans, parent-coverage, and k-anonymity over the
    (lang, source) quasi-identifier, and embedding-vector health
    (NaN / zero-norm) — 12 checks, 12 rows."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    documents = load_table(spark, sf_dir, "documents")

    parts = [
        _domain_checks(
            lineitem,
            "lineitem",
            [
                ("qty_in_1_50", (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)),
                ("discount_in_0_01", (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)),
                ("price_positive", F.col("l_extendedprice") <= 0),
            ],
        ),
        _orphan_check(lineitem, "l_orderkey", orders, "o_orderkey", "lineitem", "fk_orderkey"),
        _orphan_check(orders, "o_custkey", customer, "c_custkey", "orders", "fk_custkey"),
        _pk_check(orders, "o_orderkey", "orders"),
        _orphan_check(customer, "c_custkey", orders, "o_custkey", "customer", "has_orders"),
        _domain_checks(
            documents,
            "documents",
            [
                ("text_nonempty", F.col("text").isNull() | (F.col("text") == "")),
                ("n_chars_consistent", F.col("n_chars") != F.length("text")),
            ],
        ),
        _pk_check(documents, "doc_id", "documents"),
        _k_anon_check(documents, ["lang", "source"], 5, "documents"),
        _embedding_health_check(load_table(spark, sf_dir, "embeddings")),
    ]
    return reduce(DataFrame.unionByName, parts)


def _embedding_health_check(embeddings: DataFrame) -> DataFrame:
    """Embedding-vector health: NULL/empty vectors, NaN/NULL elements,
    and exact-zero norm (an un-normalizable vector poisons every cosine
    downstream — similarity, SemDeDup, IVF assignment).  One conditional
    aggregate over a single scan; the sum-of-squares is exactly 0.0 only
    when every element is exactly 0, so the check is order-independent
    and oracle-mirrorable despite float addition."""
    sq_norm = F.aggregate(
        "embedding", F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
    )
    bad = (
        F.col("embedding").isNull()
        | (F.size("embedding") == 0)
        | F.exists("embedding", lambda x: x.isNull() | F.isnan(x))
        | (sq_norm == 0.0)
    )
    return _domain_checks(embeddings, "embeddings", [("zero_norm", bad)])
