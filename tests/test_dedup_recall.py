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
    candidate_pairs,
    hamming16,
    lsh_bands,
    minhash_signature,
    shingles,
    simhash,
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
