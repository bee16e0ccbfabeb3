"""Shared pytest fixtures: one SparkSession per test run, DuckDB oracle
connection with fixture views pre-registered (mirrors the driver's harness),
and a compare helper implementing the same row-count + schema +
order-insensitive value comparison the driver uses."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from newspapers_etl_spark.catalog import TABLES, table_path
from newspapers_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("newspapers_etl_spark_tests", cpus=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def oracle(sf_dir):
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    yield con
    con.close()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style tolerance: queries pre-round, this is a final guard
        return round(v, 6)
    if hasattr(v, "isoformat"):  # date/datetime/pd.Timestamp → canonical str
        return str(v).removesuffix(" 00:00:00")
    return v


def normalize_rows(cols, rows):
    """Sort columns by name, rows by value — order-insensitive multiset
    comparison, mirroring the driver's value-hash semantics."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def assert_matches_oracle(spark_df, oracle_con, sql):
    sdf = spark_df.toPandas()
    odf = oracle_con.sql(sql).df()
    s_cols, s_rows = normalize_rows(
        list(sdf.columns), [tuple(r) for r in sdf.itertuples(index=False)]
    )
    o_cols, o_rows = normalize_rows(
        list(odf.columns), [tuple(r) for r in odf.itertuples(index=False)]
    )
    assert s_cols == o_cols, f"column mismatch: spark={s_cols} oracle={o_cols}"
    assert len(s_rows) == len(o_rows), (
        f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_rows, o_rows) if a != b
    ]
    assert not mismatches, f"value mismatch (first 3): {mismatches[:3]}"
