"""Registered deletion roundtrips for both maintained indexes — the
driver-facing face of the tombstone protocol (VERDICT r10 next-round
#5; the maintenance machinery itself lives in
operators/ivf_maintenance.py and operators/retrieval.py).

No reference counterpart (the reference never deletes,
src/01-scrape-images.py persists everything it scrapes); at 100 TB a
corpus SHRINKS too — dedup kills documents, takedowns remove them —
and an index that can only grow forces O(index) rebuilds for O(batch)
events.  Both oracles are mechanical: the surviving corpus is a WHERE
filter, so the replay is the existing index oracle over the filtered
input — deletion correctness reduces to "the index behaves as if the
deleted rows were never there".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.operators.ivf_maintenance import (
    FIT_PREDICATE,
    IVF_APP_ORACLE,
    build_ivf_index,
    codes_fingerprint,
    delete_from_ivf_index,
    fit_models,
    read_ivf_codes,
    scratch_index_dir,
)
from newspapers_etl_spark.operators.retrieval import (
    bm25_oracle_sql,
    delete_bm25_docs,
    retrieval_bm25_topk_from_postings,
    write_bm25_postings,
)
from newspapers_etl_spark.registry import query

# Deterministic fixture delete slices (cross-engine-replayable modulo
# predicates, the FIT/BASE_PREDICATE posture).
IVF_DEL_PRED = "vec_id % 5 = 0"
DOC_DEL_PRED = "doc_id % 7 = 0"

# The survivors of a delete are a WHERE filter over the append oracle's
# full-corpus replay (fit + frozen assignment + encode are untouched by
# deletion — models never refit on delete, or every stored code's cell
# would silently move).
IVF_DEL_ORACLE = f"""
SELECT * FROM (
{IVF_APP_ORACLE}
) WHERE NOT ({IVF_DEL_PRED})
"""

BM25_DEL_ORACLE = bm25_oracle_sql(where=f"NOT ({DOC_DEL_PRED})")


@query("ivfdel", oracle=IVF_DEL_ORACLE)
def ivf_delete_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index the full corpus under the frozen fit-slice models, DELETE
    the ``vec_id % 5 = 0`` slice through the tombstone ledger, read the
    survivors back through the pointer (the anti-join path — nothing is
    rewritten).  Same (vec_id, cell, codes_fp) shape as ``ivf_app``."""
    e = load_table(spark, sf_dir, "embeddings")
    models = fit_models(e.filter(F.expr(FIT_PREDICATE)))
    if not models[0] or not models[1]:
        return spark.createDataFrame(
            [], "vec_id long, cell int, codes_fp string"
        )
    path = scratch_index_dir("ivf-del", sf_dir)
    build_ivf_index(spark, e, path, e_encode=e, models=models)
    delete_from_ivf_index(
        spark, e.filter(F.expr(IVF_DEL_PRED)), path, batch_id="d1"
    )
    return codes_fingerprint(read_ivf_codes(spark, path))


@query("bm25d", oracle=BM25_DEL_ORACLE)
def bm25_delete_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the posting index, DELETE the ``doc_id % 7 = 0`` documents
    through the tombstone ledger, score from the surviving postings:
    df recounted from survivors, avgdl from the subtracted (n, sum_dl)
    pair — identical to scoring the filtered corpus directly (the
    oracle), by construction."""
    path = scratch_index_dir("bm25-del", sf_dir)
    write_bm25_postings(spark, sf_dir, path)
    docs = load_table(spark, sf_dir, "documents")
    delete_bm25_docs(
        spark, docs.filter(F.expr(DOC_DEL_PRED)), path, batch_id="d1"
    )
    return retrieval_bm25_topk_from_postings(spark, path)
