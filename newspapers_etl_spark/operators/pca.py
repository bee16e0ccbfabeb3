"""Distributed PCA over the embedding column: map-side covariance
aggregation + driver-side eigendecomposition + literal projection.

The classic scale recipe for PCA on N×d data with small d (here 64):
X^T X is a d² -sized statistic, so it aggregates map-side — each task
folds its rows into d² partial sums and the shuffle carries d² values
PER PARTITION, never a row.  The eigendecomposition runs on the driver
over the d×d matrix (numpy.linalg.eigh — O(d³) on 64×64 is microseconds)
and the resulting projection matrix re-enters the plan as literals, so
projecting the full corpus is a second map-only scan with ZERO
shuffles — the same literal-model discipline as ``pq_cds`` and the
IVF quantizer.

Two registered queries:
- ``ecov`` (ORACLE-BACKED): the d×d covariance matrix itself as
  (i, j, cov) rows — DuckDB mirrors it with an unnest self-join, so the
  distributed outer-product aggregation is hash-verified end to end.
- ``pca_proj`` (rows-only): top-PCA_K principal-component scores per
  vector.  Eigenvectors are model output (sign-fixed for determinism,
  but float eigensolvers are not portably bit-identical across
  engines), so the check is the pytest battery: orthonormality,
  descending eigenvalues, NumPy-vs-plan projection equality, and
  per-component score variance ≈ eigenvalue.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.functions.litfast import lit_doubles
from newspapers_etl_spark.registry import query

EMB_DIM = 64
PCA_K = 8  # components kept by pca_proj

COV_ORACLE = f"""
WITH comp AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
)
SELECT CAST(a.i - 1 AS INTEGER) AS i,
       CAST(b.i - 1 AS INTEGER) AS j,
       round(avg(a.v * b.v) - avg(a.v) * avg(b.v), 6) + 0.0 AS cov
FROM comp a JOIN comp b USING (vec_id)
GROUP BY a.i, b.i
"""


@query("ecov", oracle=COV_ORACLE)
def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The d×d covariance matrix as (i, j, cov) rows, E[xy] − E[x]E[y]
    form so one pass suffices.

    The outer product is built MAP-SIDE as one flattened d² array per
    row (nested ``transform`` — no self-join, no per-row shuffle) and
    posexploded into (pos, xy) pairs that partial-aggregate before the
    single d²-key shuffle; the per-component means aggregate on the
    same scan and join back broadcast (d rows).  At 100 TB the shuffle
    still carries exactly d² rows per map partition — this is the
    textbook distributed X^T X."""
    e = load_table(spark, sf_dir, "embeddings")
    emb_d = F.transform("embedding", lambda x: x.cast("double"))
    outer = F.flatten(
        F.transform(emb_d, lambda x: F.transform(emb_d, lambda y: x * y))
    )
    xy = (
        e.select(F.posexplode(outer).alias("pos", "xy"))
        .groupBy("pos")
        .agg(F.avg("xy").alias("e_xy"))
        .select(
            (F.col("pos") / EMB_DIM).cast("int").alias("i"),
            F.pmod("pos", F.lit(EMB_DIM)).cast("int").alias("j"),
            "e_xy",
        )
    )
    means = (
        e.select(F.posexplode(emb_d).alias("k", "v"))
        .groupBy("k")
        .agg(F.avg("v").alias("mean"))
    )
    mi = means.select(F.col("k").alias("i"), F.col("mean").alias("mean_i"))
    mj = means.select(F.col("k").alias("j"), F.col("mean").alias("mean_j"))
    return (
        xy.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i",
            "j",
            (
                F.round(
                    F.col("e_xy") - F.col("mean_i") * F.col("mean_j"), 6
                )
                + F.lit(0.0)  # normalize IEEE -0.0 (engines disagree)
            ).alias("cov"),
        )
    )


def fit_pca(
    spark: SparkSession, sf_dir: str, k: int = PCA_K
) -> tuple[list[float], list[list[float]], list[float]]:
    """Fit PCA on the embeddings table: returns (mean vector, k
    eigenvectors sorted by descending eigenvalue, their eigenvalues).

    The driver pull is the d×d covariance plus the d-vector mean —
    O(d²) floats regardless of corpus size (the IVF-centroid
    precedent), then ``numpy.linalg.eigh`` on the symmetric matrix.
    Each eigenvector's sign is fixed so its largest-|component| entry
    is positive — eigh's sign choice is arbitrary and would otherwise
    flip between BLAS builds."""
    import numpy as np

    cov_rows = embedding_covariance(spark, sf_dir).collect()
    cov = np.zeros((EMB_DIM, EMB_DIM))
    for r in cov_rows:
        cov[r["i"], r["j"]] = r["cov"]
    e = load_table(spark, sf_dir, "embeddings")
    mean_rows = (
        e.select(
            F.posexplode(
                F.transform("embedding", lambda x: x.cast("double"))
            ).alias("k", "v")
        )
        .groupBy("k")
        .agg(F.avg("v").alias("m"))
        .collect()
    )
    mean = [0.0] * EMB_DIM
    for r in mean_rows:
        # 9-dp driver-side rounding (the similarity._centroids
        # discipline): the covariance above is already rounded before
        # eigh, but an unrounded mean would leak F.avg's summation-
        # order ulp wobble into the rounded-to-6dp projections.
        mean[r["k"]] = round(float(r["m"]), 9)
    vals, vecs = np.linalg.eigh(cov)  # ascending eigenvalues
    order = np.argsort(vals)[::-1][:k]
    comps: list[list[float]] = []
    eigvals: list[float] = []
    for idx in order:
        v = vecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append([float(x) for x in v])
        eigvals.append(float(vals[idx]))
    return mean, comps, eigvals


def _project(mean: list[float], comp: list[float]) -> Column:
    """Map-side centered dot product against one literal component."""
    centered = F.zip_with(
        F.transform("embedding", lambda x: x.cast("double")),
        lit_doubles(mean),
        lambda x, m: x - m,
    )
    return F.aggregate(
        F.zip_with(
            centered,
            lit_doubles(comp),
            lambda x, c: x * c,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


@query("pcapr")  # rows-only: eigenvector floats are model-derived
def pca_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector principal-component scores: (vec_id, component,
    score) for the top PCA_K components, posexploded to scalars.

    The fitted model (mean + k eigenvectors) is literal in the plan, so
    projection is one map-only scan with zero shuffles — the plan shape
    that whitens 100 TB of embeddings as a preprocessing step for the
    cosine/PQ operators upstream."""
    mean, comps, _vals = fit_pca(spark, sf_dir, PCA_K)
    e = load_table(spark, sf_dir, "embeddings")
    scores = F.array(
        *[F.round(_project(mean, comp), 6) for comp in comps]
    )
    return e.select("vec_id", F.posexplode(scores).alias("component", "score"))
