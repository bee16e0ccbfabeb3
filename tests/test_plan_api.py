"""The plans.py audit API itself: each helper must report the shapes
the plan tests rely on — and the assert helpers must FAIL on plans
that violate the claim (an audit that can't fail audits nothing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from newspapers_etl_spark import plans
from newspapers_etl_spark.catalog import load_table


def test_pushed_filters_and_read_schema_visible(spark, sf_dir):
    df = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "O")
        .select("o_orderkey")
    )
    pushed = plans.pushed_filters(df)
    assert any("o_orderstatus" in p for p in pushed), pushed
    schemas = plans.read_schemas(df)
    # column pruning: the scan must not read columns the query never uses
    assert schemas and all("o_orderpriority" not in s for s in schemas), schemas


def test_shuffle_count_counts_hash_exchanges_only(spark, sf_dir):
    scan = load_table(spark, sf_dir, "orders").select("o_orderkey")
    assert plans.shuffle_count(scan) == 0
    agg = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .count()
    )
    assert plans.shuffle_count(agg) == 1
    assert len(plans.exchange_headers(agg)) >= 1


def test_assert_exchanges_narrow_fails_on_wide_shuffle(spark, sf_dir):
    wide = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .count()
    )
    with pytest.raises(AssertionError, match="o_orderpriority"):
        plans.assert_exchanges_narrow(wide, forbidden=("o_orderpriority",))
    # and passes when the forbidden column is absent
    plans.assert_exchanges_narrow(wide, forbidden=("no_such_col",))


def test_assert_take_ordered_distinguishes_topk_from_sort(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    topk = o.orderBy(F.desc("o_totalprice")).limit(5)
    plans.assert_take_ordered(topk)
    full_sort = o.orderBy(F.desc("o_totalprice"))
    with pytest.raises(AssertionError):
        plans.assert_take_ordered(full_sort)


def test_formatted_contains_per_node_details(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders").groupBy("o_orderstatus").count()
    text = plans.formatted(df)
    assert "PushedFilters" in text or "ReadSchema" in text
