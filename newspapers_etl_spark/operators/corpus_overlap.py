"""Sub-document dedup and cross-source contamination operators.

Two corpus-hygiene ops every large-scale training pipeline runs that
the document-level dedup family (operators/dedup.py) cannot express:

- **Chunk-level exact dedup** (C4/RefinedWeb-style "paragraph" dedup):
  split each document into fixed-token-budget chunks, fingerprint each
  chunk, and charge every chunk whose identical text already appeared
  in an earlier document as a duplicate.  Catches boilerplate and
  partially-copied passages that whole-document fingerprints miss —
  the sf0.01 fixture has 22 documents with PARTIAL chunk duplication
  and zero fully-duplicated ones, i.e. exactly the population invisible
  to ``dd_exact``.
- **Cross-source shingle overlap**: the pairwise trigram-Jaccard
  matrix across sources — the "which feeds mirror each other"
  diagnostic a pipeline consults before weighting a corpus mix
  (operators/corpus.py), and the aggregate-level cousin of the per-doc
  MinHash family.

The reference's only dedup is the per-issue filename `seen` set
(reference src/01-scrape-images.py:330-343); both ops here generalize
that idea to content chunks, per SURVEY §2 A2/P3 and the LLM-pipeline
mandate.

Scale design (100 TB):
- Chunking is a per-row ``transform``/``slice`` over the token array —
  JVM-side, no shuffle.  Only a 16-byte ``unhex(md5(chunk))`` key plus
  ``doc_id`` enters the exchange, never chunk text (same discipline as
  operators/dedup.py exact dedup); first-occurrence attribution is a
  single window-min over that key, and the per-doc rollup re-shuffles
  just (doc_id, flag) pairs.  Two narrow shuffles total.
- The overlap matrix is an INVERTED INDEX, not a self-join: the
  DISTINCT (source, shingle-hash) relation groups by hash into the
  (sorted) set of sources carrying that shingle, and the pair list is
  generated INSIDE each bucket by a nested ``transform`` — at most
  C(n_sources, 2) pairs per shingle, no join, no broadcast of the gram
  relation (an earlier self-join formulation broadcast the full distinct
  gram set — fine under fixture stats, catastrophic at corpus scale).
  This op is for source-level overlap (dozens..thousands of groups);
  per-document overlap at corpus scale belongs to MinHash/LSH
  (dedup.py).  Source cardinalities are a separate O(sources)-row
  branch that joins back as a broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.functions.text import words
from newspapers_etl_spark.registry import query

CHUNK_TOKENS = 30
SHINGLE = 3

CHUNK_DEDUP_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS ts FROM documents
),
chunks AS (
  SELECT doc_id,
         unnest([md5(array_to_string(ts[(i*{CHUNK_TOKENS}+1):(i*{CHUNK_TOKENS}+{CHUNK_TOKENS})], ' '))
                 FOR i IN range(0, CAST(ceil(len(ts)/{CHUNK_TOKENS}.0) AS BIGINT))]) AS h
  FROM toks WHERE len(ts) > 0
),
m AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY h) AS keeper FROM chunks)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(*) FILTER (WHERE keeper < doc_id) AS BIGINT) AS n_dup_chunks
FROM m GROUP BY doc_id
"""


@query("ddchk", oracle=CHUNK_DEDUP_ORACLE)
def dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact dedup: per document, how many
    {CHUNK_TOKENS}-token chunks it contains and how many of them are
    byte-identical to a chunk of an EARLIER document (min-doc_id
    keeper, the deterministic C4 convention).  A downstream writer
    drops the flagged chunks; this query is the audit manifest.
    Chunk text never shuffles — only its 16-byte md5."""
    d = load_table(spark, sf_dir, "documents")
    ts = F.col("ts")
    n_chunks = F.ceil(F.size(ts) / F.lit(CHUNK_TOKENS)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(
            " ", F.slice(ts, i * CHUNK_TOKENS + 1, F.lit(CHUNK_TOKENS))
        ),
    )
    hashed = (
        d.select("doc_id", words("text").alias("ts"))
        .where(F.size(ts) > 0)
        .select("doc_id", F.explode(chunks).alias("chunk"))
        .select("doc_id", F.unhex(F.md5("chunk")).alias("h"))
    )
    keeper = F.min("doc_id").over(Window.partitionBy("h"))
    return (
        hashed.select("doc_id", keeper.alias("keeper"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.count(F.when(F.col("keeper") < F.col("doc_id"), 1)).alias(
                "n_dup_chunks"
            ),
        )
    )


SOURCE_OVERLAP_ORACLE = f"""
WITH toks AS (
  SELECT source, string_split_regex(text, '\\s+') AS ts
  FROM documents WHERE len(string_split_regex(text, '\\s+')) >= {SHINGLE}
),
grams AS (
  SELECT DISTINCT source,
         unnest([md5(array_to_string(ts[i:i+{SHINGLE - 1}], ' '))
                 FOR i IN range(1, len(ts) - {SHINGLE - 2})]) AS h
  FROM toks
),
sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM grams GROUP BY source),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM grams a JOIN grams b USING (h)
  WHERE a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, n_shared,
       sa.n AS n_a, sb.n AS n_b,
       round(CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.source = src_a
JOIN sizes sb ON sb.source = src_b
"""


@query("ovlp", oracle=SOURCE_OVERLAP_ORACLE)
def source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise trigram-shingle Jaccard across sources: for every
    source pair, the shared distinct-shingle count, both vocabulary
    sizes, and the Jaccard coefficient.  Surfaces mirrored/syndicated
    feeds (the fixture plants hot pairs at 2-4x the background
    overlap) so the corpus-mix stage can collapse them before
    weighting.  Inverted-index shape: shingles group by 16-byte md5,
    source pairs generate inside each bucket (sorted set, so src_a <
    src_b by construction) — no self-join; cardinalities join back via
    broadcast."""
    d = load_table(spark, sf_dir, "documents")
    ts = F.col("ts")
    shingles = F.transform(
        F.sequence(F.lit(1), F.size(ts) - (SHINGLE - 1)),
        lambda i: F.concat_ws(" ", F.slice(ts, i, F.lit(SHINGLE))),
    )
    grams = (
        d.select("source", words("text").alias("ts"))
        .where(F.size(ts) >= SHINGLE)
        .select("source", F.explode(shingles).alias("gram"))
        .select("source", F.unhex(F.md5("gram")).alias("h"))
        .distinct()
    )
    sizes = grams.groupBy("source").agg(F.count("*").alias("n"))
    srcs = F.col("srcs")
    pair_structs = F.flatten(
        F.transform(
            srcs,
            lambda a, i: F.transform(
                F.slice(srcs, i + 2, F.size(srcs)),
                lambda b: F.struct(a.alias("src_a"), b.alias("src_b")),
            ),
        )
    )
    inter = (
        grams.groupBy("h")
        .agg(F.sort_array(F.collect_set("source")).alias("srcs"))
        .where(F.size(srcs) >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .select("p.src_a", "p.src_b")
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        inter.join(
            F.broadcast(sizes.withColumnsRenamed({"source": "src_a", "n": "n_a"})),
            "src_a",
        )
        .join(
            F.broadcast(sizes.withColumnsRenamed({"source": "src_b", "n": "n_b"})),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            "n_shared",
            "n_a",
            "n_b",
            F.round(
                F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )
