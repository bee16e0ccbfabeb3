"""Incremental execution ops: start / continue / retry-failed / verify
(SURVEY.md §2.7 St1-St4).

The reference's operational model is a day-partitioned micro-batch loop
(reference .github/workflows/main.yml:77-95) with four declared
operations (main.yml:14-23): full run, continue (skip processed),
retry-failed (replay gaps), verify (completeness audit), driven by
skip-if-exists idempotency (src/01-scrape-images.py:357-359,462-465).

Here each op is a declarative plan over the ``events`` stream table,
with the day partition as the micro-batch unit:

- *continue*  = anti-join the day list against the processed log (J1) —
  only unprocessed partitions are ever scanned further.
- *verify*    = per-partition expected-vs-delivered accounting (A1's
  success_count == total pattern, src/01-scrape-images.py:456-477).
- *retry*     = re-emit full rows for exactly the incomplete partitions
  (a broadcast semi-join against the audit result).

The "delivered" side is a deterministic simulation (2% of event_ids are
dropped) so the DuckDB oracle can check every op end-to-end; the real
sink-backed equivalent (read the target, anti-join, append) is
``incremental_append`` below, exercised by the idempotency test in
tests/test_incremental.py.

Scale design: all three ops reduce events to per-DAY rows before any
join — the join inputs are ~30 rows per month, broadcast-joined, so the
gating itself never shuffles the fact table; the retry op's row-level
scan is pruned to failed partitions by the pushed-down day predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.registry import query

# Deterministic simulated state, shared by Spark and oracle:
# - processed log: the first PROCESSED_THROUGH days are already done
# - delivery loss: event_ids divisible by LOSS_MOD never arrived
PROCESSED_THROUGH = "2024-01-10"
LOSS_MOD = 50

# ---------------------------------------------------------------------------
# continue: unprocessed day partitions only
# ---------------------------------------------------------------------------

CONTINUE_ORACLE = f"""
WITH days AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
),
processed AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events WHERE ts < TIMESTAMP '{PROCESSED_THROUGH} 00:00:00'
)
SELECT d.day, d.n_events
FROM days d ANTI JOIN processed p ON d.day = p.day
"""


@query("incct", oracle=CONTINUE_ORACLE)
def incr_continue_unprocessed_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The *continue-scraping* op: day partitions not in the processed
    log, with their pending row counts.  Both sides aggregate to one row
    per day BEFORE the anti-join, so the gate compares day lists (~30
    rows), not facts; the small processed side is broadcast."""
    e = load_table(spark, sf_dir, "events")
    days = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n_events"))
    )
    processed = (
        e.filter(F.col("ts") < F.lit(PROCESSED_THROUGH).cast("timestamp"))
        .select(F.to_date("ts").alias("day"))
        .distinct()
    )
    return days.join(F.broadcast(processed), "day", "left_anti")


# ---------------------------------------------------------------------------
# verify: per-partition completeness audit
# ---------------------------------------------------------------------------

VERIFY_ORACLE = f"""
WITH expected AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n_expected
  FROM events GROUP BY 1
),
delivered AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n_delivered
  FROM events WHERE event_id % {LOSS_MOD} != 0 GROUP BY 1
)
SELECT e.day,
       e.n_expected,
       coalesce(d.n_delivered, 0) AS n_delivered,
       e.n_expected - coalesce(d.n_delivered, 0) AS n_missing,
       CASE WHEN e.n_expected = coalesce(d.n_delivered, 0)
            THEN 'complete' ELSE 'incomplete' END AS status
FROM expected e LEFT JOIN delivered d ON e.day = d.day
"""


@query("incvr", oracle=VERIFY_ORACLE)
def incr_verify_day_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The *verify-month* op (declared but unimplemented in the
    reference, main.yml:23): expected-vs-delivered counts per day
    partition with an all-success status — A1's accounting as an audit
    query.  Aggregate-before-join: each side is one row per day."""
    e = load_table(spark, sf_dir, "events")
    expected = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n_expected")
    )
    delivered = (
        e.filter(F.pmod("event_id", F.lit(LOSS_MOD)) != 0)
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n_delivered"))
    )
    joined = expected.join(delivered, "day", "left_outer")
    n_delivered = F.coalesce("n_delivered", F.lit(0))
    return joined.select(
        "day",
        "n_expected",
        n_delivered.alias("n_delivered"),
        (F.col("n_expected") - n_delivered).alias("n_missing"),
        F.when(F.col("n_expected") == n_delivered, "complete")
        .otherwise("incomplete")
        .alias("status"),
    )


# ---------------------------------------------------------------------------
# retry-failed: replay rows of incomplete partitions
# ---------------------------------------------------------------------------

RETRY_ORACLE = f"""
WITH incomplete AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events GROUP BY 1
  HAVING count(*) FILTER (WHERE event_id % {LOSS_MOD} != 0) < count(*)
)
SELECT ev.event_id, ev.ts, ev.user_id, ev.event_type, ev.value
FROM events ev SEMI JOIN incomplete i
  ON CAST(date_trunc('day', ev.ts) AS DATE) = i.day
"""


@query("incrt", oracle=RETRY_ORACLE)
def incr_retry_failed_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The *retry-failed* op: full rows for exactly the day partitions
    the audit flags incomplete — partition-grain replay, the reference's
    failure isolation unit (one day per process, main.yml:77-95).  The
    incomplete-day list is tiny and broadcast; at 100 TB the semi-join
    predicate doubles as a dynamic partition-pruning filter on a
    day-partitioned source."""
    e = load_table(spark, sf_dir, "events")
    incomplete = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count("*").alias("n_expected"),
            F.count(F.when(F.pmod("event_id", F.lit(LOSS_MOD)) != 0, 1)).alias(
                "n_delivered"
            ),
        )
        .filter(F.col("n_delivered") < F.col("n_expected"))
        .select("day")
    )
    return (
        e.withColumn("day", F.to_date("ts"))
        .join(F.broadcast(incomplete), "day", "left_semi")
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# Idempotent incremental append (the real sink-backed continue op)
# ---------------------------------------------------------------------------


def _read_target(spark: SparkSession, target_dir: str) -> DataFrame | None:
    """Read the append target, or None ONLY when it genuinely does not
    exist yet.  Any other read failure (transient FS error, corrupt
    footer) re-raises — a bare except here would silently fall back to
    fresh=src and append EVERY row again, breaking the exactly-once
    claim with duplicates."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(target_dir)
    except AnalysisException as e:
        if (e.getCondition() or "") == "PATH_NOT_FOUND":
            return None
        raise


def incremental_append(
    spark: SparkSession,
    src: DataFrame,
    target_dir: str,
    key_cols: list[str],
) -> int:
    """Append to a parquet target exactly the src rows whose keys are not
    already present (exactly-once effect via anti-join, the Spark
    translation of skip-if-exists at src/01-scrape-images.py:357-359).
    Returns the number of rows appended.  Re-running with the same src is
    a no-op — verified by tests/test_incremental.py.

    At scale the existing-keys side is a key-only projection (column
    pruning reaches the parquet scan) and the anti-join shuffles keys,
    not payloads; for a day-partitioned target, read only the partitions
    overlapping src's key range instead of the whole catalog."""
    target = _read_target(spark, target_dir)
    if target is None:  # first run writes all
        fresh = src
    else:
        fresh = src.join(target.select(*key_cols), key_cols, "left_anti")
    # Two actions (count + write) are fine here: fresh is cheap to
    # recompute and counting after the write would race with readers.
    n = fresh.count()
    if n:
        fresh.write.mode("append").parquet(target_dir)
    return n


def incremental_append_partitioned(
    spark: SparkSession,
    src: DataFrame,
    target_dir: str,
    key_cols: list[str],
    partition_col: str,
) -> int:
    """Partition-aware incremental append: the existing-keys scan reads
    ONLY the target partitions whose ``partition_col`` value appears in
    this batch (static partition pruning — the predicate is a literal IN
    list, so the parquet reader skips every other directory).  At 100 TB
    with thousands of day partitions this turns the dedup gate from a
    full-catalog scan into a read of the handful of days the batch
    touches.  The batch's partition values are collected first — a
    day-grain batch has a handful, like the reference's one-day unit
    (main.yml:77-95)."""
    values = [r[0] for r in src.select(partition_col).distinct().collect()]
    target = _read_target(spark, target_dir)
    if target is None:  # first run
        fresh = src
    else:
        existing = target.filter(
            F.col(partition_col).isin(values)
        ).select(*key_cols)
        fresh = src.join(existing, key_cols, "left_anti")
    n = fresh.count()
    if n:
        fresh.write.mode("append").partitionBy(partition_col).parquet(target_dir)
    return n


# ---------------------------------------------------------------------------
# Operation dispatcher: the reference's four declared workflow ops
# ---------------------------------------------------------------------------


def audit_against_target(
    spark: SparkSession, src: DataFrame, target_dir: str, ts_col: str = "ts"
) -> DataFrame:
    """Per-day expected (src) vs actual (target) accounting — the
    verify op against a REAL sink (the simulated-loss variant above is
    the oracle-checkable query)."""
    expected = src.groupBy(F.to_date(ts_col).alias("day")).agg(
        F.count("*").alias("n_expected")
    )
    tgt = _read_target(spark, target_dir)
    if tgt is None:  # no target yet: everything is missing
        actual = expected.select("day", F.lit(0).cast("long").alias("n_actual")).limit(0)
    else:
        actual = tgt.groupBy(F.to_date(ts_col).alias("day")).agg(
            F.count("*").alias("n_actual")
        )
    joined = expected.join(actual, "day", "left_outer")
    n_actual = F.coalesce("n_actual", F.lit(0))
    return joined.select(
        "day",
        "n_expected",
        n_actual.alias("n_actual"),
        (F.col("n_expected") - n_actual).alias("n_missing"),
        F.when(F.col("n_expected") == n_actual, "complete")
        .otherwise("incomplete")
        .alias("status"),
    )


def run_operation(
    spark: SparkSession,
    op: str,
    src: DataFrame,
    target_dir: str,
    key_cols: list[str],
    ts_col: str = "ts",
):
    """Dispatch one of the reference's four workflow operations
    (reference .github/workflows/main.yml:14-23; only start-month is
    implemented there — the other three are declared with no job steps,
    main.yml:61-62 — so this supplies all four):

    - ``start``:    fresh full load (overwrite) — start-month.
    - ``continue``: anti-join-gated append of unseen keys — the
      skip-if-exists discipline (src/01-scrape-images.py:357-359,462-465).
    - ``retry-failed``: re-deliver rows of day partitions the audit
      flags incomplete; the anti-join keeps re-delivery idempotent.
    - ``verify``:   return the per-day completeness audit DataFrame.

    Returns rows-appended (int) for the write ops, the audit DataFrame
    for verify."""
    if op == "start":
        src.write.mode("overwrite").parquet(target_dir)
        return src.count()
    if op == "continue":
        return incremental_append(spark, src, target_dir, key_cols)
    if op == "retry-failed":
        bad_days = (
            audit_against_target(spark, src, target_dir, ts_col)
            .filter(F.col("status") == "incomplete")
            .select("day")
        )
        replay = src.withColumn("day", F.to_date(ts_col)).join(
            F.broadcast(bad_days), "day", "left_semi"
        ).drop("day")
        return incremental_append(spark, replay, target_dir, key_cols)
    if op == "verify":
        return audit_against_target(spark, src, target_dir, ts_col)
    raise ValueError(f"unknown operation {op!r}")
