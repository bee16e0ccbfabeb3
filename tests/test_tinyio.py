"""Driver-local tiny-relation parquet I/O (functions/tinyio.py) — the
r17 optimization that moved model/stats roots off the per-job floor.
What must hold: both directions of the layout interop (Spark reads
tinyio roots, tinyio reads Spark roots), doubles round-trip bit-exact,
and the driver-side stats fold is bit-identical to the Spark
``_merge_cell_stats`` it replaced on the two-contribution publish
shape."""

from __future__ import annotations

import math
import struct

import pytest

from newspapers_etl_spark.functions.tinyio import (
    bm25_stats_schema,
    ivf_stats_schema,
    model_schema,
    read_model_rows,
    read_tiny_rows,
    write_model,
    write_tiny_parquet,
)
from newspapers_etl_spark.operators.ivf_maintenance import (
    _fold_stats_rows,
    _merge_cell_stats,
    _neg_stats_rows,
)

# The awkward doubles: denormal min, -0.0, max magnitude, ulp-odd
# fractions, and a plain value — all must survive parquet both ways.
ODD = [5e-324, -0.0, 1.7976931348623157e308, 0.1 + 0.2, 1.0 / 3.0]


def _bits(x: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", x))[0]


def test_spark_reads_tinyio_model_bit_exact(spark, tmp_path):
    p = str(tmp_path / "model" / "centroids")
    write_model(p, "cell", "cvec", [(0, ODD), (1, [2.5, -2.5, 0.0, 1e-300, 7.0])])
    rows = {r["cell"]: list(r["cvec"]) for r in spark.read.parquet(p).collect()}
    assert [_bits(v) for v in rows[0]] == [_bits(v) for v in ODD]
    assert rows[1][3] == 1e-300


def test_tinyio_reads_spark_root(spark, tmp_path):
    p = str(tmp_path / "sparkw")
    spark.createDataFrame(
        [(1, ODD), (0, [9.0] * 5)], "cell int, cvec array<double>"
    ).write.mode("overwrite").parquet(p)
    out = read_model_rows(p, "cell", "cvec")
    assert [c for c, _ in out] == [0, 1]  # id-sorted like the old orderBy
    assert [_bits(v) for v in out[1][1]] == [_bits(v) for v in ODD]


def test_empty_stats_root_readable_as_zero_rows(spark, tmp_path):
    p = str(tmp_path / "gen")
    write_tiny_parquet(p, {"cell": [], "n": [], "svec": []}, ivf_stats_schema())
    assert spark.read.parquet(p).count() == 0
    assert read_tiny_rows(p) == []


def test_bm25_stats_null_sum_dl_roundtrip(spark, tmp_path):
    p = str(tmp_path / "bmstats")
    write_tiny_parquet(
        p, {"n": [0.0], "sum_dl": [None]}, bm25_stats_schema()
    )
    row = spark.read.parquet(p).collect()[0]
    assert row["n"] == 0.0 and row["sum_dl"] is None


def test_fold_matches_spark_merge_bitwise(spark):
    # The publish shape: previous generation + one (possibly negated)
    # batch contribution, cells overlapping partially.
    old = [
        {"cell": 0, "n": 3, "svec": [0.1 + 0.2, -0.0, 5e-324]},
        {"cell": 1, "n": 2, "svec": [1.5, 2.5, -3.5]},
    ]
    batch = [
        {"cell": 0, "n": 1, "svec": [1.0 / 3.0, 7.0, 5e-324]},
        {"cell": 2, "n": 4, "svec": [-1.0, 0.25, 9.0]},
    ]
    folded = _fold_stats_rows(old, batch)
    both = spark.createDataFrame(
        [(r["cell"], r["n"], r["svec"]) for r in old + batch],
        "cell int, n long, svec array<double>",
    )
    expected = {
        r["cell"]: (int(r["n"]), [_bits(v) for v in r["svec"]])
        for r in _merge_cell_stats(both).collect()
    }
    got = {c: (n, [_bits(v) for v in sv]) for c, n, sv in folded}
    assert got == expected


def test_fold_negation_drops_zeroed_cells():
    old = [{"cell": 0, "n": 2, "svec": [1.5, -2.0]},
           {"cell": 1, "n": 1, "svec": [4.0, 4.0]}]
    neg = _neg_stats_rows([{"cell": 0, "n": 2, "svec": [1.5, -2.0]}])
    out = _fold_stats_rows(old, neg)
    # cell 0 cancels to n==0 and is dropped; cell 1 is untouched.
    assert out == [(1, 1, [4.0, 4.0])]
    # the negation itself mirrors the old Spark projection, -0.0 included
    assert math.copysign(1.0, neg[0]["svec"][1]) == 1.0


def test_write_tiny_parquet_is_overwrite(tmp_path):
    p = str(tmp_path / "ow")
    write_tiny_parquet(p, {"n": [1.0], "sum_dl": [2.0]}, bm25_stats_schema())
    write_tiny_parquet(p, {"n": [9.0], "sum_dl": [8.0]}, bm25_stats_schema())
    assert read_tiny_rows(p) == [{"n": 9.0, "sum_dl": 8.0}]


def test_remote_uri_refused(tmp_path):
    with pytest.raises(NotImplementedError):
        write_tiny_parquet(
            "s3://bucket/x", {"n": [1.0], "sum_dl": [1.0]}, bm25_stats_schema()
        )


def test_read_skips_hidden_directories(tmp_path):
    """Hadoop listing ignores underscore/dot paths at EVERY level; the
    driver-local reader must too, or a crashed publish's ``_gen-N``
    staging dir inside a legacy stats root leaks its already-merged row
    into the live read (the bm25 append-crash-retry scenario — the
    hidden dir's part file even sorts FIRST, shadowing the live row)."""
    p = str(tmp_path / "root")
    write_tiny_parquet(p, {"n": [5.0], "sum_dl": [50.0]}, bm25_stats_schema())
    # a crashed, never-published generation inside the root
    write_tiny_parquet(
        f"{p}/_gen-00000001", {"n": [9.0], "sum_dl": [90.0]}, bm25_stats_schema()
    )
    write_tiny_parquet(
        f"{p}/.tmp-stage", {"n": [7.0], "sum_dl": [70.0]}, bm25_stats_schema()
    )
    assert read_tiny_rows(p) == [{"n": 5.0, "sum_dl": 50.0}]
