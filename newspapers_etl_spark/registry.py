"""Query registry backing the driver contract (__spark_entry__.py).

Each operator family registers named queries here via the ``@query``
decorator: a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus,
where SQL-expressible, the equivalent DuckDB oracle SQL.  Column names
and types are aligned on both sides (the driver sorts columns by name
and value-hashes, so every computed column is aliased identically and
integer sums are CAST to BIGINT in the oracle — DuckDB's sum(int) is
HUGEINT).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

# Registration order matters: the driver's correctness harness checks
# queries in registration order (capped around ~50 per round), so the
# families with the least oracle-verification history go FIRST.
#
# ROTATION POLICY (one line per round, newest first):
#   r7 (planned): after r6, no registered query lacks a driver hash row
#       in some round, so the rotation reverts to pure oldest-first:
#       the r4-hashed families lead (extraction_queries 8,
#       incremental_stream 4, corpus_overlap 2, relational's LAST 19 —
#       its first 2 re-hash in r6 — = 33), then the oldest r5-hashed
#       blocks (relational_extended 9, scd 3, multimodal 4 = 16) and
#       dedup's first queries fill to ~50.  Any query ADDED or CHANGED
#       in r7 preempts this order, as always.  Mind the import-graph
#       constraint: a module imported at top level by an earlier-
#       declared module registers at the importer's position (ivfadc →
#       semantic_dedup/similarity, scd_stream → scd).  Also due when
#       dedup enters the window: fold the duplicated sh_pairs/sh32
#       Manku pipeline into one parametric helper (deferred in r6
#       precisely because touching dedup.py would have pulled its 10
#       queries into an already-full window).
#   r6 (executed): the eight r5-late registrations lead — ivfadc (also
#       CHANGED r6: residual-PQ option), emb_cov, pca_proj, ev_rollup,
#       st_rollup, kmv_ndv, src_csv, src_jsonl (never driver-hashed;
#       each sweep-green + pytest-covered) — then the r6-new modules
#       (dedup_scale: sh32; model_fit: fit_pq/fit_pca/fit_anc) and the
#       r6-CHANGED families (semantic_dedup: _nearest_code vec param;
#       data_quality: embedding zero-norm check), then the r3-green
#       families whose last hash row is oldest (corpus 5 — incl.
#       leakage, r5-new, never hashed — sampling 2, text_analysis 6,
#       events_windows 6, pandas_surface 3, pipeline 2,
#       sinks.verified 1 = 25; 48 total with the semantic_dedup/
#       similarity blocks that ivfadc's top-level imports realize
#       first), then relational's first 2 queries fill the window to
#       exactly 50; r4/r5-hashed families
#       ride their fresh history at the back.  Window test updated in
#       the same commit (tests/test_sql_entrypoint.py).
#   r5 (executed): every never-driver-hashed query enters the window —
#       the late-r4 block (diagnostics, url_ops, text_scoring,
#       data_quality, snapshot_diff, events_analytics, sampling_extended,
#       st_enrich/st_scd/st_state, semantic_dedup) leads, followed by
#       relational_extended (win_dist/cohorts new r4, never hashed) and
#       scd (scd_enr new r4, never hashed); then the modules CHANGED
#       this round — multimodal (real codecs for mm_decode/mm_frames)
#       and dedup (Bloom prepass in dd_spans, checkpoint_dir in
#       cc_clust) — then incremental (last hashed r2) closes the
#       window at exactly 50.  corpus..pipeline/sinks (r3-green,
#       unchanged) and the r4-re-hashed families go to the back; they
#       rotate forward in r6.
#   r4: relational + extraction (green r1/r2 only — oldest history) and
#       similarity (ann_stats (ex sim_lsh_stats) never yet inside any window) lead;
#       streaming moves up because st_sess/st_join were
#       registered THIS round with no history; dedup follows
#       (jaccard re-registered scale-true + dd_spans new);
#       corpus_overlap (2 new queries) closes the window at exactly 50.
#       incremental (r2 green, unchanged) and the r3-green family
#       (relational_extended/corpus/sampling/text/multimodal/events/
#       pandas/pipeline/scd/sinks) ride their history.
#   r3: corpus..streaming (new that round) + relational_extended
#       (agg_pctl_approx fix) + dedup (decontam/clusters new) led;
#       relational/extraction rode on r1/r2 green history.
# Rule of thumb: families whose last green hash row is oldest — or
# that contain a query never checked in ANY window — go first; a query
# changed in the current round must sit inside the first ~50.
_OPERATOR_MODULES = (
    # semantic_dedup and similarity precede ivfadc because ivfadc
    # imports both at top level — their registration blocks realize
    # first no matter what is declared, and the realized-order test
    # demands the declaration tell the truth.  Both belong in the
    # window anyway (semantic_dedup CHANGED r6; similarity rides).
    "newspapers_etl_spark.operators.semantic_dedup",      # 2   green r5; _nearest_code vec param CHANGED r6
    "newspapers_etl_spark.operators.similarity",          # 5   re-hashed r4 (ivfadc dependency, rides in-window)
    "newspapers_etl_spark.operators.ivfadc",              # 1   never hashed (ivfadc); residual option NEW r6
    "newspapers_etl_spark.operators.pca",                 # 2   never hashed (emb_cov/pca_proj)
    "newspapers_etl_spark.operators.rollup",              # 2   never hashed (ev_rollup/st_rollup)
    "newspapers_etl_spark.operators.sketches",            # 1   never hashed (kmv_ndv)
    "newspapers_etl_spark.sources.text_formats",          # 4   never hashed (src_csv/src_jsonl); src_orc/src_xml NEW r6
    "newspapers_etl_spark.operators.dedup_scale",         # 1   NEW r6 (sh32)
    "newspapers_etl_spark.operators.model_fit",           # 3   NEW r6 (fit_pq/fit_pca/fit_anc)
    "newspapers_etl_spark.operators.text_lm",             # 1   NEW r6 (ppl2)
    "newspapers_etl_spark.operators.data_quality",        # 1   green r5; embedding health check CHANGED r6
    "newspapers_etl_spark.operators.corpus",              # 5   4 green r3; leakage NEW r5, never hashed
    "newspapers_etl_spark.operators.sampling",            # 2   green r3, unchanged
    "newspapers_etl_spark.operators.text_analysis",       # 6   green r3, unchanged
    "newspapers_etl_spark.operators.events_windows",      # 6   green r3, unchanged
    "newspapers_etl_spark.operators.pandas_surface",      # 3   green r3, unchanged
    "newspapers_etl_spark.operators.pipeline",            # 2   green r3, unchanged
    "newspapers_etl_spark.sinks.verified",                # 1   green r3, unchanged
    # ---- 48 queries above; relational's first 2 close the window ----
    "newspapers_etl_spark.operators.relational",          # 21  re-hashed r4 (first 2 in-window)
    "newspapers_etl_spark.operators.extraction_queries",  # 8   re-hashed r4
    "newspapers_etl_spark.streaming.incremental_stream",  # 4   re-hashed r4
    "newspapers_etl_spark.operators.corpus_overlap",      # 2   re-hashed r4
    "newspapers_etl_spark.operators.relational_extended", # 9   re-hashed r5
    "newspapers_etl_spark.operators.scd",                 # 3   re-hashed r5
    "newspapers_etl_spark.operators.multimodal",          # 4   re-hashed r5
    "newspapers_etl_spark.operators.dedup",               # 10  re-hashed r5
    "newspapers_etl_spark.operators.incremental",         # 3   re-hashed r5
    "newspapers_etl_spark.operators.diagnostics",         # 1   re-hashed r5
    "newspapers_etl_spark.operators.url_ops",             # 1   re-hashed r5
    "newspapers_etl_spark.operators.text_scoring",        # 6   re-hashed r5
    "newspapers_etl_spark.operators.snapshot_diff",       # 1   re-hashed r5
    "newspapers_etl_spark.operators.events_analytics",    # 3   re-hashed r5
    "newspapers_etl_spark.operators.sampling_extended",   # 3   re-hashed r5
    "newspapers_etl_spark.streaming.enrichment",          # 1   re-hashed r5
    "newspapers_etl_spark.streaming.scd_stream",          # 1   re-hashed r5
    "newspapers_etl_spark.streaming.stateful",            # 1   re-hashed r5
)

_loaded = False


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is DuckDB-runnable ANSI SQL over
    the pre-registered fixture views, or None for non-SQL-expressible ops
    (driver then records a weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _ensure_loaded() -> None:
    """Import every declared operator module; any failure raises.  All
    declared modules exist, so a missing one is a packaging bug, not an
    in-progress build — silent tolerance would shrink the registered
    surface without failing anything."""
    global _loaded
    if _loaded:
        return
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    _loaded = True


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return dict(ORACLE)
