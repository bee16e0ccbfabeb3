"""Skew-mitigation helpers: key salting for aggregations and joins.

The reference's data is naturally skewed — one dominant newspaper
('Dagens Nyheter', the default paper id, reference
src/01-scrape-images.py:491, README.md:56) dwarfs the small papers, so a
title-keyed shuffle sends most rows to one task.  AQE's skew-join
splitting (on in session.py) handles the join case at runtime; these
helpers are the PLAN-level tool for the aggregation case and for engines
/ sinks where AQE can't reach (e.g. a skewed groupBy feeding a
partitioned write).

Salted aggregation = two-phase: group on (key, salt) first — spreading
the hot key over ``n_salts`` tasks — then re-group on key to merge the
partials.  Only works for algebraic aggregates (sum/count/min/max);
the helpers take the partial and merge expression lists explicitly so
the caller states both phases.

Equivalence to the unsalted plan is proven in tests/test_skew.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, col_name: str = "_salt") -> DataFrame:
    """Uniform random-ish salt in [0, n_salts) — derived from
    spark_partition_id + a per-row monotonic id so it's cheap and needs
    no RNG state; any roughly-uniform int works."""
    return df.withColumn(
        col_name,
        F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int"),
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partials: list[Column],
    merges: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation:

        df.groupBy(keys, salt).agg(partials)   # hot key spread n_salts ways
          .groupBy(keys).agg(merges)           # tiny merge, one row per (key, salt)

    ``partials`` aggregate raw rows; ``merges`` combine the partial
    columns (by the names the partials alias).  For a plain count:
    partial = count(*) AS c, merge = sum(c) AS c.  The first shuffle
    carries (key, salt) so no task sees more than ~1/n_salts of the hot
    key; the second shuffle carries at most n_salts rows per key."""
    salted = with_salt(df, n_salts)
    phase1 = salted.groupBy(*keys, "_salt").agg(*partials)
    return phase1.groupBy(*keys).agg(*merges)


def salted_broadcast_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: salt the skewed side, EXPLODE the small side
    across all salt values (replication factor n_salts — only viable
    because the small side is broadcast anyway), join on (key, salt).
    Result is identical to the plain join; the hot key's rows land on
    n_salts tasks instead of one.  Prefer AQE skew-join when both sides
    are large; this is for the broadcast-sized dimension case where the
    planner's broadcast already avoids the shuffle but a downstream
    per-key operation (window, write) still skews."""
    salted = with_salt(skewed, n_salts)
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted.join(F.broadcast(replicated), [key, "_salt"]).drop("_salt")
