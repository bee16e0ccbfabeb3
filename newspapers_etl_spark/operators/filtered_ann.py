"""Metadata-filtered ANN search (`fann`): IVF top-k under a scalar
predicate — the multi-tenant / attribute-scoped flavor of vector search
every production retrieval stack needs (search only MY tenant's
documents, only this language, only this date range).

North-star operator, no reference counterpart (the reference's notion
of lookup is a Drive-folder listing, reference src/01-scrape-images.py:
482-522); the shape follows the public FAISS/Milvus "filtered search"
pattern re-expressed as DataFrame ops.

Semantics: PRE-filter.  The predicate restricts the candidate set
BEFORE ranking, so the returned top-k is the true top-k of the filtered
corpus (a post-filter over an unfiltered top-k silently under-fills
whenever fewer than k survivors rank above the cut).  The registered
query scopes each probe to its own ``label`` — the tenant-id pattern —
and excludes the probe row itself.

Scale design (the two classic filtered-ANN failure modes, addressed):
- The filter becomes part of the JOIN KEY, not a residual predicate:
  candidates join on ``(cell, label)``, so a selective filter PRUNES
  work instead of wasting scored rows.  At 100 TB the code relation is
  stored partitioned by cell with the filter column a pushable parquet
  predicate/partition key — the scan reads only probed cells' files,
  and row groups failing the label predicate never decompress.
- A filter shrinks each probed cell's survivor count, so recall under a
  fixed nprobe DROPS (the over-probe-under-filter trap): the registered
  query probes ``FANN_NPROBE = 4`` cells — double the unfiltered
  ``ivftk``'s 2 — making the scan fraction `nprobe/cells` a knob paid
  only when filtering.  The probe side stays a broadcast; the corpus
  never shuffles to be scored.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.functions.lloyd_sql import (
    SQL_DOT,
    final_assignment_cte,
    lloyd_centroid_ctes,
    probe_cells_cte,
)
from newspapers_etl_spark.functions.litfast import lit_doubles
from newspapers_etl_spark.functions.vectors import dot, l2_norm
from newspapers_etl_spark.operators.similarity import (
    IVF_CELLS,
    IVF_ITERATIONS,
    N_PROBES,
    TOP_K,
    _centroids,
    _nearest_cell,
)
from newspapers_etl_spark.registry import query

# Double the unfiltered nprobe: the label filter keeps ~1/n_labels of
# each probed cell, so holding recall needs more cells per probe (the
# over-probe-under-filter knob; see module docstring).
FANN_NPROBE = 4

_C_FINAL = f"c{IVF_ITERATIONS}"

FANN_ORACLE = f"""
WITH {lloyd_centroid_ctes(IVF_CELLS, IVF_ITERATIONS)},
{final_assignment_cte("corpus", _C_FINAL)},
{probe_cells_cte("probes", _C_FINAL, N_PROBES, FANN_NPROBE)},
sims AS (
  SELECT pr.probe_id, co.vec_id,
         round({SQL_DOT.format(a="co.embedding", b="pr.pvec")}
               / (pr.pnrm * co.nrm), 6) AS sim
  FROM corpus co
  JOIN embeddings ce ON ce.vec_id = co.vec_id
  JOIN probes pr ON co.cell = pr.cell
  JOIN embeddings pe ON pe.vec_id = pr.probe_id
  WHERE ce.label = pe.label AND co.vec_id <> pr.probe_id
)
SELECT probe_id, vec_id, sim,
       CAST(row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id)
            AS INTEGER) AS rnk
FROM sims
QUALIFY rnk <= {TOP_K}
"""


def ranked_cells_expr(
    cents: list[tuple[int, list[float]]], nprobe: int, vec: str = "embedding"
) -> Column:
    """The probe's ``nprobe`` nearest cells by dot product (ties to the
    smaller cell id) as ONE literal-model array expression — the
    quantizer ships inside the plan, no join (`ivftk`'s ranked-cell
    slice, factored for callers that vary nprobe)."""
    cell_scores = [
        (cid, dot(vec, lit_doubles(c))) for cid, c in cents
    ]
    return F.slice(
        F.transform(
            F.array_sort(
                F.array(
                    *[
                        F.struct((-s).alias("neg"), F.lit(cid).alias("cell"))
                        for cid, s in cell_scores
                    ]
                )
            ),
            lambda x: x.getField("cell"),
        ),
        1,
        nprobe,
    )


@query("fann", oracle=FANN_ORACLE)
def sim_filtered_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-scoped IVF top-k: per probe, the exact top-k cosine
    neighbours among corpus rows sharing the probe's ``label`` inside
    its ``FANN_NPROBE`` probed cells, probe row excluded.

    The candidate join is an equi-join on BOTH keys ``(cell, label)``
    with the (probe × probed-cell) side broadcast — the filter prunes
    candidates map-side instead of discarding scored rows, and the
    corpus relation never shuffles.  Ranking is on the ROUNDED
    similarity with vec_id tie-break (the `bftk` cross-engine ordering
    discipline)."""
    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    cents = _centroids(e, IVF_CELLS, IVF_ITERATIONS, fit_fraction=1.0)
    if not cents:
        return spark.createDataFrame(
            [], "probe_id long, vec_id long, sim double, rnk int"
        )
    corpus = e.select(
        "vec_id",
        "label",
        "embedding",
        l2_norm("embedding").alias("nrm"),
        _nearest_cell("embedding", cents).alias("cell"),
    )
    probes = e.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("label"),
        F.col("embedding").alias("probe_vec"),
        l2_norm("embedding").alias("probe_nrm"),
        F.explode(ranked_cells_expr(cents, FANN_NPROBE)).alias("cell"),
    )
    cands = (
        corpus.join(F.broadcast(probes), ["cell", "label"])
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            F.round(
                dot("probe_vec", "embedding")
                / (F.col("probe_nrm") * F.col("nrm")),
                6,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        cands.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("probe_id", "vec_id", "sim", "rnk")
    )
