"""Document chunking (`chnk`): split every document into fixed-width
overlapping character windows with STABLE, replayable chunk ids — the
step between a raw corpus and anything embedding-shaped (context-window
packing, passage retrieval, chunk-level dedup all consume this
relation).  No reference counterpart (the reference stores whole pages,
reference src/01-scrape-images.py); the shape is the standard
fixed-window chunker from public RAG/ETL practice.

Determinism contract (what makes chunks JOINABLE across runs):
- chunk boundaries are a pure function of (text length, WINDOW,
  STRIDE) — no tokenizer state, no locale;
- ``chunk_id = md5(doc_id ':' chunk_ix)`` — re-running the chunker on
  an unchanged document reproduces identical ids, so downstream
  embeddings/indexes keyed by chunk_id survive pipeline re-runs, and a
  changed document changes its chunks' CONTENT hashes but not their
  ids (the run_manifest drift-localization property, at chunk grain).

Scale design: the whole operator is one ``posexplode(sequence(...))``
over a column expression — map-side, zero shuffles, zero UDFs, inside
whole-stage codegen.  Output rows carry the chunk's md5 and length,
never the text itself, so the relation that ships downstream is ~40
bytes/chunk regardless of window size (the 16-byte-keys-not-text
dedup discipline); a consumer that needs bytes re-derives them from
(doc_id, chunk_ix) against the source, which parquet serves with the
doc_id predicate pushed down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.registry import query

WINDOW = 200  # chars per chunk
STRIDE = 150  # chunk start spacing (WINDOW - STRIDE = 50 chars overlap)

CHNK_ORACLE = f"""
SELECT doc_id,
       CAST(i AS INTEGER) AS chunk_ix,
       md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)) AS chunk_id,
       md5(substr(text, CAST(i * {STRIDE} + 1 AS BIGINT), {WINDOW}))
         AS chunk_md5,
       CAST(length(substr(text, CAST(i * {STRIDE} + 1 AS BIGINT), {WINDOW}))
            AS INTEGER) AS n_chunk
FROM documents,
     unnest(range(0, (length(text) - 1) // {STRIDE} + 1)) AS t(i)
WHERE text IS NOT NULL AND length(text) > 0
"""


def chunk_relation(
    d: DataFrame, window: int = WINDOW, stride: int = STRIDE
) -> DataFrame:
    """The chunk relation over any (doc_id, text) input — the reusable
    core (`chnk` binds it to the fixture documents table).  A document
    of length L yields ⌊(L−1)/stride⌋ + 1 chunks: every character is
    covered, consecutive chunks overlap by window−stride chars, only
    the final chunk may be short, and NULL/empty texts yield no rows."""
    d = d.filter(F.col("text").isNotNull() & (F.length("text") > 0))
    chunks = d.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor((F.length("text") - 1) / stride).cast("int"),
            )
        ).alias("chunk_ix"),
    ).select(
        "doc_id",
        "chunk_ix",
        # substring(col, colPos, len) needs the SQL form: the F.substring
        # builtin only takes literal pos/len.
        F.expr(
            f"substring(text, chunk_ix * {stride} + 1, {window})"
        ).alias("chunk"),
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_ix").cast("int").alias("chunk_ix"),
        F.md5(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("chunk_ix").cast("string"),
            )
        ).alias("chunk_id"),
        F.md5("chunk").alias("chunk_md5"),
        F.length("chunk").cast("int").alias("n_chunk"),
    )


@query("chnk", oracle=CHNK_ORACLE)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, chunk_ix, chunk_id, chunk_md5, n_chunk) for every
    {WINDOW}-char window at {STRIDE}-char stride over non-empty fixture
    documents (``chunk_relation`` for the boundary contract).

    Cross-engine discipline: both engines' substring/length are
    1-based and CHARACTER-counted (not bytes), and both md5 the UTF-8
    encoding — so the oracle hashes the identical windows."""
    return chunk_relation(load_table(spark, sf_dir, "documents"))
