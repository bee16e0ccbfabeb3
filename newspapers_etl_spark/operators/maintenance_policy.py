"""End-to-end index maintenance POLICY: drift alert → churn decision →
conditional rebuild, executed as one chain (VERDICT r11/r12 next-round
#5) — the composition the three monitors were built for.

No reference counterpart (the reference has no vector search,
src/01-scrape-images.py:482-522); at 100 TB the pieces only pay off
when something strings them together: ``dremb`` ALERTS (PSI over the
frozen-quantizer cell histograms — one codes-grain aggregate),
``ivf_ref`` DECIDES (would-be reassignment churn from the stored
(n, svec) stats, one codes scan), ``ivfrb`` ACTS (whole-generation
swap behind one pointer flip, the single deliberately-O(corpus) op).
The policy gates each stage on the previous one — the decision scan
runs only on alert, the rebuild only on a churn verdict — so the
steady-state cost of being monitored is ONE bounded histogram
aggregate per ingest wave.

The registered query plants the shift the production chain exists to
catch: a batch re-embedded by a "mis-calibrated" model (every
component +1.0 — exact in double on BOTH engines, so the plant is
replayable) appended to a healthy index.  Occupancy mass concentrates
in the +region cells → PSI ≈ 4.6-6.1 ≫ the 0.2 alert bar; the stats
pairs drag the refreshed means toward the shifted mass → churn ≈
0.34-0.41 > the 0.1 rebuild bar; the rebuild refits on the live union
and re-encodes.  (A same-distribution batch walks the null path:
ref/cand cell proportions match → every PSI term is exactly 0 → no
alert, no decision scan, no rebuild — pinned in pytest.)

Float discipline: the PSI total is a sum of per-cell terms scaled to
1e-9-resolution INTEGERS before summing (the bm25 s9 lesson — a double
sum of ln-bearing parts can straddle a rounding boundary between
engines; an integer sum cannot), and every threshold compare happens
on integers or on the ivf_ref-proven round-then-compare churn.  The
emitted PSI metric is the single IEEE division s9/1e9 — identical
doubles on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.operators.ivf_maintenance import (
    FIT_PREDICATE,
    append_ivf_index,
    build_ivf_index,
    fit_models,
    ivf_frozen_ctes,
    read_ivf_codes,
    rebuild_ivf_index,
    scratch_index_dir,
)
from newspapers_etl_spark.operators.ivf_refresh import (
    REF_DECISION_CTES,
    REFRESH_CHURN_THRESHOLD,
    centroid_refresh_decision,
)
from newspapers_etl_spark.registry import query

# PSI alert bar (the drift_monitor thresholds: >0.2 investigate).
PSI_ALERT = 0.2
_PSI_S9_BAR = int(PSI_ALERT * 1e9)

# The planted batch: re-embedded duplicates of the corpus under a
# shifted model, landed under offset ids (vec_id + OFF keeps both
# replayable and disjoint; fixture vec_ids are far below OFF, and
# OFF % 8 = 0 keeps the offset rows' residues aligned for the
# rebuild's fit slice).
OFF = 1_000_000

_CHURN_SQL = "round(CAST(d.moved AS DOUBLE) / d.total, 6)"

MNT_POL_ORACLE = f"""
WITH emb_u AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {OFF} AS vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE) + 1.0)
           AS embedding
  FROM embeddings
),
{ivf_frozen_ctes(source="emb_u")},
{REF_DECISION_CTES},
counts AS (
  SELECT cell,
         CAST(sum(CASE WHEN vec_id < {OFF} THEN 1 ELSE 0 END) AS BIGINT)
           AS ref_n,
         CAST(sum(CASE WHEN vec_id < {OFF} THEN 0 ELSE 1 END) AS BIGINT)
           AS cand_n
  FROM asg GROUP BY cell
),
tot AS (
  SELECT CAST(sum(ref_n) AS DOUBLE) AS ref_tot,
         CAST(sum(cand_n) AS DOUBLE) AS cand_tot,
         CAST(count(*) AS DOUBLE) AS n_cells
  FROM counts
),
psi AS (
  SELECT sum(CAST(round(
           ((c.ref_n + 0.5) / (t.ref_tot + 0.5 * t.n_cells)
            - (c.cand_n + 0.5) / (t.cand_tot + 0.5 * t.n_cells))
           * ln(((c.ref_n + 0.5) / (t.ref_tot + 0.5 * t.n_cells))
                / ((c.cand_n + 0.5) / (t.cand_tot + 0.5 * t.n_cells)))
           * 1e9) AS BIGINT)) AS s9
  FROM counts c CROSS JOIN tot t
),
dec AS (
  SELECT CAST(count(*) AS BIGINT) AS total,
         CAST(sum(CASE WHEN n.ncell != a.cell THEN 1 ELSE 0 END) AS BIGINT)
           AS moved
  FROM asg a JOIN nr n USING (vec_id)
)
SELECT 'drift' AS stage, CAST(p.s9 AS DOUBLE) / 1e9 AS metric,
       p.s9 > {_PSI_S9_BAR} AS act
FROM psi p
UNION ALL
SELECT 'refresh',
       CASE WHEN p.s9 > {_PSI_S9_BAR} THEN {_CHURN_SQL} END,
       CASE WHEN p.s9 > {_PSI_S9_BAR}
            THEN {_CHURN_SQL} > {REFRESH_CHURN_THRESHOLD}
            ELSE FALSE END
FROM psi p CROSS JOIN dec d
UNION ALL
SELECT 'rebuild',
       CASE WHEN p.s9 > {_PSI_S9_BAR}
             AND {_CHURN_SQL} > {REFRESH_CHURN_THRESHOLD}
            THEN (SELECT CAST(count(*) AS DOUBLE) FROM nnall) END,
       (p.s9 > {_PSI_S9_BAR}
        AND {_CHURN_SQL} > {REFRESH_CHURN_THRESHOLD}) AS act
FROM psi p CROSS JOIN dec d
"""


def _psi_s9(spark: SparkSession, path: str, off: int) -> int | None:
    """The smoothed-PSI total between the sub-``off`` (reference) and
    offset (candidate) halves of the index at ``path``, as a
    1e-9-scaled integer — computed from the stored (vec_id, cell)
    CODES, never the raw vectors (``embedding_drift_over``'s algebra
    with the assignment scan swapped for the codes relation, exactly
    the swap its docstring promises), totals as window sums over the
    bounded cell histogram."""
    counts = (
        read_ivf_codes(spark, path)
        .select(
            "cell",
            F.when(F.col("vec_id") < off, 1).otherwise(0).alias("is_ref"),
        )
        .groupBy("cell")
        .agg(
            F.sum("is_ref").cast("long").alias("ref_n"),
            F.sum(1 - F.col("is_ref")).cast("long").alias("cand_n"),
        )
    )
    w = Window.partitionBy(F.lit(1))
    counts = counts.select(
        "ref_n",
        "cand_n",
        F.sum("ref_n").over(w).cast("double").alias("ref_tot"),
        F.sum("cand_n").over(w).cast("double").alias("cand_tot"),
        F.count("*").over(w).cast("double").alias("n_cells"),
    )
    p = (F.col("ref_n") + 0.5) / (F.col("ref_tot") + 0.5 * F.col("n_cells"))
    q = (F.col("cand_n") + 0.5) / (F.col("cand_tot") + 0.5 * F.col("n_cells"))
    row = counts.agg(
        F.sum(F.round((p - q) * F.log(p / q) * 1e9).cast("long")).alias("s9")
    ).collect()[0]
    # NULL sum == the index holds zero code rows: surface None so the
    # chain emits the nothing-to-monitor row (metric NULL) instead of a
    # fabricated PSI of 0.0 — the oracle's psi CTE yields NULL for the
    # same state, and 0.0 would claim "measured, no drift" untruthfully.
    return int(row["s9"]) if row["s9"] is not None else None


def maintenance_policy_chain(
    spark: SparkSession,
    e_source: DataFrame,
    path: str,
    off: int = OFF,
    psi_threshold: float = PSI_ALERT,
    churn_threshold: float = REFRESH_CHURN_THRESHOLD,
) -> DataFrame:
    """Run the gated chain over the index at ``path`` and return one
    row per stage — (stage, metric, act):

    - ``drift``:   metric = PSI between the ref/cand halves, act = the
      alert.  No alert → the remaining stages are gated off (metric
      NULL, act false) and the chain cost ONE histogram aggregate.
    - ``refresh``: metric = reassignment churn under the refreshed
      centroids (one codes scan, runs only on alert), act = the
      rebuild verdict.
    - ``rebuild``: on a churn verdict the rebuild RUNS
      (``rebuild_ivf_index`` over ``e_source``, the live system of
      record) and metric = the re-encoded live-vector count read back
      through the flipped pointer; otherwise NULL/false.

    The threshold compares are integer-exact (PSI) or the
    ivf_ref-proven round-then-compare (churn), so the branch taken is
    the branch the oracle replays.

    An EMPTY index (zero code rows) is nothing-to-monitor, not
    zero-drift: the drift row comes back metric NULL / act false (the
    oracle's psi CTE is NULL for the same state) and every later stage
    stays gated off."""
    s9 = _psi_s9(spark, path, off)
    if s9 is None:
        return spark.createDataFrame(
            [("drift", None, False), ("refresh", None, False),
             ("rebuild", None, False)],
            "stage string, metric double, act boolean",
        )
    alert = s9 > int(psi_threshold * 1e9)
    rows: list[tuple] = [("drift", s9 / 1e9, alert)]
    rebuild = False
    if alert:
        d = centroid_refresh_decision(spark, path, churn_threshold).collect()[0]
        rebuild = bool(d["refresh"]) if d["refresh"] is not None else False
        rows.append(("refresh", d["churn"], rebuild))
    else:
        rows.append(("refresh", None, False))
    if rebuild:
        rebuild_ivf_index(spark, e_source, path)
        n = read_ivf_codes(spark, path).count()
        rows.append(("rebuild", float(n), True))
    else:
        rows.append(("rebuild", None, False))
    return spark.createDataFrame(
        rows, "stage string, metric double, act boolean"
    )


@query("mntpol", oracle=MNT_POL_ORACLE)
def maintenance_policy_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The full lifecycle with the policy in the loop: index the corpus
    under the frozen fit-slice models, append the planted-shift batch
    (every component +1.0, offset ids), then let the chain run — on the
    fixture it alerts, measures churn, and REBUILDS; the oracle replays
    every stage (frozen assignment over the union corpus for the PSI
    histogram, the shared decision fragment for churn, the gated counts
    for the rebuild row) and takes the same branch because every
    compare is exact."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    models = fit_models(e.filter(F.expr(FIT_PREDICATE)))
    if not models[0] or not models[1]:
        return spark.createDataFrame(
            [], "stage string, metric double, act boolean"
        )
    path = scratch_index_dir("mnt-pol", sf_dir)
    build_ivf_index(spark, e, path, e_encode=e, models=models)
    batch = e.select(
        (F.col("vec_id") + OFF).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x.cast("double") + F.lit(1.0)
        ).alias("embedding"),
    )
    append_ivf_index(spark, batch, path, batch_id="b1")
    return maintenance_policy_chain(
        spark, e.unionByName(batch), path
    )
