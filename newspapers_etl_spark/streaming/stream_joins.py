"""Watermarked stream-stream interval join (SURVEY.md §2.7/§2.3).

The reference never joins two live feeds, but its domain implies the
shape: match each page-view search result to the manifest fetched for
it moments later (reference src/01-scrape-images.py:434-443 — the
manifest GET follows the search hit within the same run).  On streams
this is the classic clicks↔purchases attribution join.

Both sides carry a watermark and the join predicate bounds event-time
distance (purchase within ``within`` AFTER the click) — that pair of
constraints is what lets the engine expire join state: a buffered click
can be dropped once the other side's watermark passes click.ts +
within.  Without the interval bound, state grows unboundedly; this is
THE scale constraint for stream-stream joins at 100 TB/day."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    within: str = "1 hour",
    watermark: str = "35 days",
    ts_col: str = "ts",
) -> DataFrame:
    """Inner join right-events to left-events with the same key where
    right.ts ∈ [left.ts, left.ts + within].  Output: key, both
    timestamps, both values, and the event-time lag in seconds."""
    lt = left.withWatermark(ts_col, watermark).alias("l")
    rt = right.withWatermark(ts_col, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{ts_col}") >= F.col(f"l.{ts_col}"))
        & (F.col(f"r.{ts_col}") <= F.col(f"l.{ts_col}") + F.expr(f"INTERVAL {within}"))
    )
    return lt.join(rt, cond, "inner").select(
        F.col(f"l.{key}").alias(key),
        F.col(f"l.{ts_col}").alias("left_ts"),
        F.col(f"r.{ts_col}").alias("right_ts"),
        F.col("l.value").alias("left_value"),
        F.col("r.value").alias("right_value"),
        (
            F.unix_timestamp(f"r.{ts_col}") - F.unix_timestamp(f"l.{ts_col}")
        ).alias("lag_seconds"),
    )
