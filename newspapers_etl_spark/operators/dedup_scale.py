"""At-scale SimHash instantiation: the 32-bit Manku multi-table
near-dup join, registered so the shape actually used at corpus scale
has a bench number.

The registered ``sh_pairs``/``sh_bkts`` queries run the 16-bit
FIXTURE hash (operators/dedup.py:796) to keep the bench comparable
across rounds; the recall guarantee of the wide construction was until
now verified only in tests/test_dedup_recall.py.  This module
instantiates the same construction at the production width — 32-bit
hash, block widths (6,6,5,5,5,5), C(6,3)=20 tables with 15-17-bit
keys — end-to-end on the documents table.

Two deliberate differences from the fixture query, both scale-true:

* Hamming verification uses ``F.bit_count`` on the XOR (one JVM
  popcount instruction) instead of the 16-term literal-mask sum —
  at 32/64 bits the inlined mask chain stops being free (codegen size
  grows linearly with width; the fixture keeps it for bit-level
  auditability).
* Width parameters flow through ``simhash(bits=)`` /
  ``simhash_table_keys(widths=)`` — the fold cost is linear in bits,
  so this query's bench delta vs ``sh_pairs`` IS the price of the
  production hash width.

Rows-only correctness (hash values are engine-specific, same posture
as ``sh_pairs``); the d<=3 recall guarantee for exactly this
(32, (6,6,5,5,5,5)) instantiation is pytest-proven exhaustively in
tests/test_dedup_recall.py::test_simhash_multitable_guarantees_recall_at_d3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.registry import query

SIMHASH32_BITS = 32
SIMHASH32_BLOCK_WIDTHS = (6, 6, 5, 5, 5, 5)
SIMHASH32_HAMMING_D = 3


@query("sh32")  # rows-only: hash values are engine-specific
def dedup_simhash32_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash near-dup pairs at Hamming <= 3, Manku multi-table
    blocking with hash-value collapse — the corpus-scale twin of
    ``sh_pairs`` (see module docstring for the deliberate deltas).

    Plan shape is identical: distinct hash values explode their 20
    table keys, equi-join on (table_id, key), popcount-verify, then
    two answer-bounded expansions back to doc pairs (cross-cluster via
    the hash-pair join, within-cluster via one full-hash equi-join)."""
    # Lazy import: operators.dedup registers 10 queries at import time;
    # a top-level import here would splice its block into THIS module's
    # registry slot (see test_registry_registration_order_is_contiguous).
    from newspapers_etl_spark.operators.dedup import simhash, simhash_table_keys

    d = load_table(spark, sf_dir, "documents")
    # (doc_id, sh) feeds five subplans; persist so the 32-bit fold (2x
    # the fixture fold cost, the dominant expression) runs once.
    members = d.select(
        "doc_id", simhash("text", bits=SIMHASH32_BITS).alias("sh")
    ).persist()
    uniq = members.select("sh").distinct()
    keyed = uniq.select(
        "sh",
        F.explode(simhash_table_keys("sh", SIMHASH32_BLOCK_WIDTHS)).alias("t"),
    ).select(
        "sh", F.col("t.table_id").alias("table_id"), F.col("t.key").alias("key")
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    hash_pairs = (
        a.join(
            b,
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.sh") < F.col("b.sh")),
        )
        .select(
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= SIMHASH32_HAMMING_D)
        .distinct()
    )
    ma = members.select(F.col("doc_id").alias("m_a"), F.col("sh").alias("sh_a"))
    mb = members.select(F.col("doc_id").alias("m_b"), F.col("sh").alias("sh_b"))
    cross = hash_pairs.join(ma, "sh_a").join(mb, "sh_b").select(
        F.least("m_a", "m_b").alias("id_a"),
        F.greatest("m_a", "m_b").alias("id_b"),
        "hamming",
    )
    p = members.alias("p")
    q = members.alias("q")
    within = p.join(
        q,
        (F.col("p.sh") == F.col("q.sh")) & (F.col("p.doc_id") < F.col("q.doc_id")),
    ).select(
        F.col("p.doc_id").alias("id_a"),
        F.col("q.doc_id").alias("id_b"),
        F.lit(0).alias("hamming"),
    )
    return cross.unionByName(within)
