"""Declared-schema validation: catalog.SCHEMAS must match the parquet
footers exactly (name + type, per field, in order) so the declarations
documented in catalog.py are live, not dead (ADVICE r1)."""

from __future__ import annotations

import pytest

from newspapers_etl_spark.catalog import SCHEMAS, TABLES, load_table


@pytest.mark.parametrize("name", TABLES)
def test_declared_schema_matches_parquet_footer(spark, sf_dir, name):
    actual = load_table(spark, sf_dir, name).schema
    declared = SCHEMAS[name]
    got = [(f.name, f.dataType.simpleString()) for f in actual.fields]
    want = [(f.name, f.dataType.simpleString()) for f in declared.fields]
    assert got == want, f"{name}: parquet footer {got} != declared {want}"
