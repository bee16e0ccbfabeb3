"""Differential tests: every registered relational query vs the DuckDB
oracle at sf0.001 (the driver repeats this at sf0.01 — SURVEY.md §5.2)."""

from __future__ import annotations

import pytest

from newspapers_etl_spark.registry import all_oracles, all_queries
from tests.conftest import assert_matches_oracle


def _oracle_cases():
    qs, os_ = all_queries(), all_oracles()
    return sorted(os_.keys() & qs.keys())


@pytest.mark.parametrize("name", _oracle_cases())
def test_query_matches_oracle(spark, oracle, sf_dir, name):
    df = all_queries()[name](spark, sf_dir)
    assert_matches_oracle(df, oracle, all_oracles()[name])


def _rows_only_cases():
    qs, os_ = all_queries(), all_oracles()
    return sorted(set(qs) - set(os_))


@pytest.mark.parametrize("name", _rows_only_cases())
def test_rows_only_queries_run(spark, sf_dir, name):
    df = all_queries()[name](spark, sf_dir)
    # Rows-only queries must still produce output on the fixtures — a
    # 0-row result here means a broken filter, not a weaker check.
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_approx_distinct_within_error_bound(spark, sf_dir):
    """The HLL estimate has no cross-engine oracle, but it DOES have an
    accuracy contract: within ~3×rsd (rsd=0.02) of the exact count."""
    from pyspark.sql import functions as F

    from newspapers_etl_spark.catalog import load_table
    from newspapers_etl_spark.operators.relational import agg_approx_distinct

    approx = {r.l_returnflag: r.approx_parts for r in agg_approx_distinct(spark, sf_dir).collect()}
    exact = {
        r.l_returnflag: r.n
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count_distinct("l_partkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(3, 0.06 * exact[k]), (
            f"{k}: approx {approx[k]} vs exact {exact[k]}"
        )


def test_percentile_approx_within_rank_error_bound(spark, sf_dir):
    """The GK-sketch estimate has no cross-engine oracle (DuckDB's
    approx_quantile is a t-digest), but it DOES have an accuracy
    contract: each estimate's RANK within its group is within
    n/accuracy of the requested quantile's rank (accuracy=10000 in the
    registered query)."""
    from pyspark.sql import functions as F

    from newspapers_etl_spark.catalog import load_table
    from newspapers_etl_spark.operators.relational_extended import (
        agg_percentile_approx,
    )

    rows = agg_percentile_approx(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    vals = {
        flag: sorted(
            r.l_quantity for r in li.filter(F.col("l_returnflag") == flag).collect()
        )
        for flag in {r.l_returnflag for r in rows}
    }
    for r in rows:
        group = vals[r.l_returnflag]
        n = len(group)
        assert r.n_rows == n
        # rank of the estimate in the sorted group (range covers ties)
        import bisect

        lo = bisect.bisect_left(group, r.quantile_est)
        hi = bisect.bisect_right(group, r.quantile_est)
        target = r.q * (n - 1)
        tol = max(1.0, n / 10_000)
        assert lo - tol <= target <= hi + tol, (
            f"{r.l_returnflag} q={r.q}: est {r.quantile_est} rank "
            f"[{lo},{hi}] vs target {target:.1f} (n={n})"
        )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_oracle_keys_subset_of_queries():
    assert set(all_oracles()) <= set(all_queries())
