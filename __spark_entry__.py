"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``newspapers_etl_spark``; this module is the thin
adapter over its query registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# The driver may invoke this file from any cwd; make the package importable.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from newspapers_etl_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7.2) on sf0.001; driver checks rows>0.

    Resolved through the registry, NOT by importing the operator module
    directly: a direct import would register relational's 21 queries at
    whatever moment entry() first runs — if the harness smoke-checks
    entry() BEFORE calling queries(), that splices the whole block to
    the front of the registration order and silently shifts the ~50-
    query correctness window.  all_queries() always realizes the
    declared _OPERATOR_MODULES order."""
    return registry.all_queries()["flags"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys get rows-only checks."""
    return registry.all_oracles()
