"""Z-order write clustering: row-group min/max statistics must give
range predicates selectivity on EVERY clustered dimension (a linear
sort only serves its leading column), and the layout must be a pure
reordering — same rows, same schema."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.sinks.clustering import (
    bucket_expr,
    interleave_bits,
    zorder_write,
)

SF01 = "/root/testdata/sf0.01"


def _frac_groups_overlapping(path: str, col: str, lo, hi) -> float:
    """Fraction of row groups whose [min, max] for `col` intersects
    [lo, hi] — exactly the skipping decision a parquet reader makes."""
    total = hit = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            total += 1
            if st.min <= hi and st.max >= lo:
                hit += 1
    assert total >= 20, f"only {total} row groups — stats too coarse to test"
    return hit / total


def test_interleave_bits_is_morton_order(spark):
    """Bit-exact check against a Python Morton reference."""
    rows = [(a, b) for a in range(8) for b in range(8)]
    df = spark.createDataFrame(rows, "a int, b int").select(
        "a", "b", interleave_bits([F.col("a"), F.col("b")], bits=3).alias("z")
    )

    def morton(a, b):
        z = 0
        for i in range(3):
            z |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
        return z

    for r in df.collect():
        assert r.z == morton(r.a, r.b), (r.a, r.b, r.z)


def test_bucket_expr_counts_boundaries(spark):
    df = spark.createDataFrame([(x,) for x in [0.0, 5.0, 10.0, 99.0]], "v double")
    out = df.select(bucket_expr("v", [1.0, 6.0, 50.0]).alias("bkt")).collect()
    assert [r.bkt for r in out] == [0, 1, 2, 3]


def test_zorder_skips_row_groups_on_both_dims(spark, tmp_path):
    src = load_table(spark, SF01, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    zorder_write(src, zpath, ["l_orderkey", "l_partkey"], bits=6, row_group_bytes=32 * 1024)
    (
        src.repartitionByRange(F.col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
        .write.option("parquet.block.size", 32 * 1024)
        .parquet(lpath)
    )

    # middle ~10% range of each key domain
    ok = src.agg(F.min("l_orderkey"), F.max("l_orderkey")).first()
    pk = src.agg(F.min("l_partkey"), F.max("l_partkey")).first()

    def mid_range(lo, hi):
        span = hi - lo
        return lo + int(0.45 * span), lo + int(0.55 * span)

    o_lo, o_hi = mid_range(ok[0], ok[1])
    p_lo, p_hi = mid_range(pk[0], pk[1])

    z_on_order = _frac_groups_overlapping(zpath, "l_orderkey", o_lo, o_hi)
    z_on_part = _frac_groups_overlapping(zpath, "l_partkey", p_lo, p_hi)
    lin_on_order = _frac_groups_overlapping(lpath, "l_orderkey", o_lo, o_hi)
    lin_on_part = _frac_groups_overlapping(lpath, "l_partkey", p_lo, p_hi)

    # linear serves its leading column well and the second not at all
    assert lin_on_order < 0.5
    assert lin_on_part > 0.85, "fixture should make the baseline non-selective"
    # z-order serves BOTH dimensions
    assert z_on_order < 0.6, f"z-order not selective on dim 1: {z_on_order:.2f}"
    assert z_on_part < 0.6, f"z-order not selective on dim 2: {z_on_part:.2f}"

    # layout change only: identical multiset of rows
    got = sorted(map(tuple, spark.read.parquet(zpath).collect()))
    want = sorted(map(tuple, src.collect()))
    assert got == want
