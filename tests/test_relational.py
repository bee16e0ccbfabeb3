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


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_oracle_keys_subset_of_queries():
    assert set(all_oracles()) <= set(all_queries())
