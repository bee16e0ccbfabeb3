"""Multi-dimensional write clustering (Z-order) for data skipping.

A linearly-sorted layout gives parquet row-group min/max selectivity on
the LEADING sort column only; a predicate on any other column reads the
whole table.  Interleaving the bits of several columns' rank buckets
(Morton / Z-order) makes row-group ranges compact in EVERY interleaved
dimension at once, so range predicates on any clustered column skip
most row groups.  This is the layout lever a 100 TB corpus needs when
reads filter by more than one key (e.g. (source, date) or
(customer, order date)) — the same mechanism table formats expose as
`OPTIMIZE ... ZORDER BY`.

Scale design:
- Per-column bucket boundaries come from `approxQuantile` (one pass,
  mergeable sketch); only `2^bits - 1` scalars per column reach the
  driver — a model, not data, same as the IVF centroids.
- Bucketing + bit interleaving are pure JVM-side expressions (a chain
  of shift/OR terms unrolled at plan-build time — no UDF).
- The write is `repartitionByRange(z)` + `sortWithinPartitions(z)`:
  ONE range shuffle, the same cost as any sorted write; clustering
  quality shows up purely in the row-group statistics.

The reference has no analog (its layout is one folder per issue,
reference src/01-scrape-images.py:441-452); this generalizes its
"lay files out for the reads you'll do" intent to multi-key scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 8  # 256 buckets per dimension; 2 cols → 16-bit z-key


def bucket_expr(col: str, boundaries: list[float], cast: str = "double") -> Column:
    """Map a value to its bucket index [0, len(boundaries)] against
    sorted split points — a binary-search-free unrolled comparison sum:
    bucket = number of boundaries <= value.  len(boundaries) is
    2^bits - 1, so the sum has a bounded, plan-time-known width and
    stays inside whole-stage codegen."""
    c = F.col(col).cast(cast)
    acc = F.lit(0)
    for b in boundaries:
        acc = acc + F.when(c >= F.lit(b), 1).otherwise(0)
    return acc


def interleave_bits(cols: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton-interleave k bucket indexes, each `bits` wide, into one
    long: output bit (i*k + j) = bit i of column j.  Unrolled to
    shift/AND/OR terms — k*bits terms, all JVM-side."""
    acc = F.lit(0).cast("long")
    k = len(cols)
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            acc = acc.bitwiseOR(F.shiftleft(bit, i * k + j))
    return acc


def zorder_write(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    bits: int = DEFAULT_BITS,
    row_group_bytes: int = 64 * 1024,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the Z-order of
    ``cluster_cols``: equi-depth bucket each column (approxQuantile
    boundaries), interleave the bucket bits, range-partition + sort by
    the z-key, and size row groups (``parquet.block.size``) so min/max
    statistics have skipping granularity.  The z-key is a transient
    write-layout column — dropped from the output schema (recomputable
    from the boundaries)."""
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    zcols = []
    for c in cluster_cols:
        bounds = df.selectExpr(f"CAST({c} AS DOUBLE) AS v").approxQuantile(
            "v", probs, 0.001
        )
        # dedupe plateaus (skewed columns repeat boundaries); order kept
        bounds = sorted(set(bounds))
        zcols.append(bucket_expr(c, bounds))
    z = interleave_bits(zcols, bits).alias("_z")
    (
        df.select("*", z)
        .repartitionByRange(F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.option("parquet.block.size", row_group_bytes)
        .mode(mode)
        .parquet(path)
    )
