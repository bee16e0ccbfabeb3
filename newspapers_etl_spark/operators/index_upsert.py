"""Registered UPSERT roundtrips for both maintained indexes — the
update face of the tombstone + applied-ledger protocol (VERDICT r11
next-round #3; the halves live in operators/ivf_maintenance.py and
operators/retrieval.py, the composition is
``upsert_ivf_index`` / ``upsert_bm25_docs``).

No reference counterpart (the reference only ever inserts,
src/01-scrape-images.py persists each scrape once); at 100 TB the
UPDATE is the most common index mutation there is — an embedding-model
upgrade re-embeds existing ids, a document edit re-tokenizes existing
doc_ids — and an index without it forces O(index) rebuilds for
O(batch) events.  Both oracles are mechanical: an upsert must behave
as if the substituted rows were always there, so the replay is the
existing index oracle over a corpus CTE with the updated rows
substituted (CASE WHEN on the update slice), exactly the WHERE-filter
move the deletion oracles made (operators/index_delete.py).

The fixture substitutions are cross-engine-exact by construction:
- IVF: the updated embedding is the REVERSED vector (``F.reverse`` /
  ``list_reverse`` — a permutation, no float arithmetic), on a slice
  (``vec_id % 8 = 3``) DISJOINT from the fit slice (``vec_id % 8 = 0``)
  so the frozen models are untouched, which is the production posture:
  an upsert never refits (or every stored code's cell would move).
- BM25: the updated text is the document doubled (``text || ' ' ||
  text`` — doubles every tf and dl, so scores move measurably;
  null-propagating on BOTH engines, hence ``F.concat``, never the
  null-swallowing ``F.concat_ws``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.operators.ivf_maintenance import (
    FIT_PREDICATE,
    build_ivf_index,
    codes_fingerprint,
    fit_models,
    ivf_frozen_ctes,
    read_ivf_codes,
    scratch_index_dir,
    upsert_ivf_index,
)
from newspapers_etl_spark.operators.retrieval import (
    bm25_oracle_sql,
    retrieval_bm25_topk_from_postings,
    upsert_bm25_docs,
    write_bm25_postings,
)
from newspapers_etl_spark.registry import query

# Deterministic fixture update slices.  The IVF slice must stay
# disjoint from ivf_maintenance.FIT_PREDICATE (vec_id % 8 = 0): the
# oracle fits on the REAL embeddings table (frozen-model contract), so
# a substitution touching the fit slice would diverge the two fits.
IVF_UP_PRED = "vec_id % 8 = 3"
DOC_UP_PRED = "doc_id % 9 = 4"

IVF_UP_ORACLE = f"""
WITH emb_u AS (
  SELECT vec_id,
         CASE WHEN {IVF_UP_PRED} THEN list_reverse(embedding)
              ELSE embedding END AS embedding
  FROM embeddings
),
{ivf_frozen_ctes(source="emb_u")}
SELECT a.vec_id, CAST(a.cell AS INTEGER) AS cell,
       array_to_string(list(CAST(e.code AS VARCHAR) ORDER BY e.sub), '-')
         AS codes_fp
FROM asg a JOIN enc e USING (vec_id)
GROUP BY a.vec_id, a.cell
"""

BM25_UP_ORACLE = bm25_oracle_sql(
    source="docs_u",
    prelude=f"""docs_u AS (
  SELECT doc_id,
         CASE WHEN ({DOC_UP_PRED}) THEN text || ' ' || text
              ELSE text END AS text
  FROM documents
),
""",
)


@query("ivfup", oracle=IVF_UP_ORACLE)
def ivf_upsert_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index the full corpus under the frozen fit-slice models, UPSERT
    the ``vec_id % 8 = 3`` slice with its reversed vectors (delete +
    re-append under one batch discipline), read the result back through
    the pointer: old codes suppressed by the root-scoped tombstone, new
    codes live in the never-covered append root.  Same (vec_id, cell,
    codes_fp) shape as ``ivf_app``; the oracle replays fit + frozen
    assignment + encode over the substituted corpus."""
    e = load_table(spark, sf_dir, "embeddings")
    models = fit_models(e.filter(F.expr(FIT_PREDICATE)))
    if not models[0] or not models[1]:
        return spark.createDataFrame(
            [], "vec_id long, cell int, codes_fp string"
        )
    path = scratch_index_dir("ivf-up", sf_dir)
    build_ivf_index(spark, e, path, e_encode=e, models=models)
    old = e.filter(F.expr(IVF_UP_PRED))
    new = old.select("vec_id", F.reverse("embedding").alias("embedding"))
    upsert_ivf_index(spark, old, new, path, batch_id="u1")
    return codes_fingerprint(read_ivf_codes(spark, path))


@query("bm25u", oracle=BM25_UP_ORACLE)
def bm25_upsert_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the posting index, UPSERT the ``doc_id % 9 = 4`` documents
    with their text doubled (delete the stored tokenization + append
    the new one under one batch discipline), score from the result:
    df recounted from survivors + re-appended postings, avgdl from the
    subtracted-then-added (n, sum_dl) pair — identical to scoring the
    substituted corpus directly (the oracle), by construction."""
    path = scratch_index_dir("bm25-up", sf_dir)
    write_bm25_postings(spark, sf_dir, path)
    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.expr(DOC_UP_PRED))
    new = old.select(
        "doc_id", F.concat("text", F.lit(" "), "text").alias("text")
    )
    upsert_bm25_docs(spark, old, new, path, batch_id="u1")
    return retrieval_bm25_topk_from_postings(spark, path)
