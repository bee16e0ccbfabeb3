"""SCD Type-2 merge (CDC upsert) without a table format.

MERGE INTO needs Delta/Iceberg; on plain parquet the same semantics
compose from the operators this engine already has — change-detection
join, anti-join, union — exactly the incremental discipline the
reference runs against its Drive catalog (skip unchanged, add new,
reference src/01-scrape-images.py:462-465), extended with history
tracking: every change CLOSES the current version (valid_to = change
ts) and INSERTS a new open one, so any past state remains queryable
("what was this customer's segment last March").

Scale design: one equi-join on the business key decides
changed/unchanged/new; all three output classes are map-side
projections of that single join — no window over history is needed for
the merge itself (only open rows participate), so the cost is one
shuffle of the CURRENT snapshot + updates, independent of history
depth.  History stays append-only; pair with a partitioned write on
valid_from for time-pruned reads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OPEN_END = "9999-12-31 23:59:59"  # sentinel for the open version


def scd2_init(snapshot: DataFrame, effective: Column) -> DataFrame:
    """Bootstrap a history relation from a first snapshot: every row is
    an open current version."""
    return snapshot.select(
        "*",
        effective.alias("valid_from"),
        F.lit(OPEN_END).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    track_cols: list[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Apply one batch of updates to an SCD2 history.

    - unchanged keys (or attribute-identical updates): kept as-is —
      re-delivering the same update is a no-op (idempotent re-delivery,
      the St4 discipline).
    - changed keys: current version closed at the update ts, new open
      version inserted.
    - new keys: inserted as open versions.
    Closed history rows pass through untouched."""
    closed_hist = history.filter(~F.col("is_current"))
    current = history.filter(F.col("is_current"))

    u = updates.select(
        F.col(key), *[F.col(c) for c in track_cols], F.col(ts_col).alias("_ts")
    )
    # "changed" = any tracked attribute differs (null-safe OR chain)
    cond = None
    for c in track_cols:
        piece = ~F.col(f"cur.{c}").eqNullSafe(F.col(f"upd.{c}"))
        cond = piece if cond is None else (cond | piece)

    cur = current.alias("cur")
    upd = u.alias("upd")
    joined = cur.join(upd, F.col(f"cur.{key}") == F.col(f"upd.{key}"), "left_outer")

    untouched = joined.filter(F.col(f"upd.{key}").isNull() | ~cond).select("cur.*")
    closing = joined.filter(F.col(f"upd.{key}").isNotNull() & cond)
    closed_now = closing.select(
        *[F.col(f"cur.{c}") for c in current.columns if c not in ("valid_to", "is_current")],
        F.col("upd._ts").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened_now = closing.select(
        F.col(f"upd.{key}").alias(key),
        *[F.col(f"upd.{c}").alias(c) for c in track_cols],
        *[
            F.col(f"cur.{c}").alias(c)
            for c in current.columns
            if c not in (key, *track_cols, "valid_from", "valid_to", "is_current")
        ],
        F.col("upd._ts").alias("valid_from"),
        F.lit(OPEN_END).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    ).select(*current.columns)

    brand_new = (
        u.join(current.select(key), key, "left_anti")
        .select(
            F.col(key),
            *[F.col(c) for c in track_cols],
            F.col("_ts").alias("valid_from"),
            F.lit(OPEN_END).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    # align brand_new columns (missing untracked attrs become nulls)
    for c in current.columns:
        if c not in brand_new.columns:
            brand_new = brand_new.withColumn(c, F.lit(None))
    brand_new = brand_new.select(*current.columns)

    return closed_hist.unionByName(untouched).unionByName(closed_now).unionByName(
        opened_now
    ).unionByName(brand_new)


def scd2_as_of(history: DataFrame, at: Column) -> DataFrame:
    """Point-in-time view: the version valid at `at` per key."""
    return history.filter((F.col("valid_from") <= at) & (at < F.col("valid_to")))
