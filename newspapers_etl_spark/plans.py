"""Programmatic physical-plan audit surface.

The scale discipline this engine claims — filters reach the scan,
exchanges carry narrow keys instead of payload text, small sides are
broadcast, top-k never global-sorts — is only real if it is CHECKABLE.
This module exposes the plan introspection the test suite pins those
claims with (tests/test_plans.py and friends), as a first-class API a
user can point at their own composed queries before shipping them to a
1000-executor cluster.  The reference has no equivalent: its execution
plan is a Python ``for`` loop (reference src/01-scrape-images.py:497-515).

All helpers take a DataFrame and inspect ``queryExecution`` on the JVM
side; nothing executes the plan (AQE plans are inspected pre-execution,
so shapes that only materialize at runtime — e.g. AQE skew splits —
are out of scope here and covered by the bench instead)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical plan string (post-optimizer, pre-execution)."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df: DataFrame) -> str:
    """``explain(mode="formatted")`` as a string — operator tree plus
    per-node details (PushedFilters, ReadSchema, join build sides)."""
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def exchange_headers(df: DataFrame) -> list[str]:
    """First line of every Exchange in the plan — the partitioning
    expression, i.e. exactly WHAT pays network cost at scale."""
    return [
        chunk.splitlines()[0]
        for chunk in executed_plan(df).split("Exchange ")[1:]
    ]


def shuffle_count(df: DataFrame) -> int:
    """Hash-partitioned exchanges only (broadcast exchanges are cheap
    dim shipments, not data shuffles)."""
    return executed_plan(df).count("Exchange hashpartitioning")


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters list that reached a scan, one string per
    scan node.  Empty brackets mean the scan reads everything."""
    return re.findall(r"PushedFilters: \[[^\]]*\]", executed_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — the column-pruning audit: a scan
    whose schema lists payload columns the query never returns is
    reading bytes for nothing."""
    return re.findall(r"ReadSchema: struct<[^>]*>", executed_plan(df))


def assert_exchanges_narrow(df: DataFrame, forbidden: tuple[str, ...]) -> None:
    """Raise if any exchange header mentions a forbidden (wide payload)
    column — the 'text never shuffles' claim, made checkable.  Matches
    on the partitioning header, which names the carried attributes."""
    offenders = [
        h
        for h in exchange_headers(df)
        if any(col in h for col in forbidden)
    ]
    if offenders:
        raise AssertionError(
            f"exchanges carry forbidden columns {forbidden}: {offenders}"
        )


def assert_take_ordered(df: DataFrame) -> None:
    """Raise unless the plan's top-k is TakeOrderedAndProject (per-
    partition heaps + k-row merge) rather than a global Sort."""
    if "TakeOrderedAndProject" not in executed_plan(df):
        raise AssertionError(
            "no TakeOrderedAndProject in plan — top-k is global-sorting:\n"
            + executed_plan(df)[:1500]
        )


def lint_violations(name: str, df: DataFrame) -> list[str]:
    """The registry-wide plan floor, shared by the CLI `lint` subcommand
    and tests/test_plan_lint.py:

    * no CartesianProduct;
    * no row-at-a-time SCALAR Python UDF (``BatchEvalPython``).
      ``BatchEvalPythonUDTF`` is exempt on measurement, not principle:
      the Arrow UDTF converts each eval()'s yielded rows per input row,
      and at the registered chunker's shape that overhead loses to
      pickling by ~3x (A/B in operators/pandas_surface.py) — while
      scalar Python UDFs always have an Arrow form that wins;
    * no exchange PARTITIONED BY the document text column.
    """
    plan = executed_plan(df)
    out: list[str] = []
    if "CartesianProduct" in plan:
        out.append(f"{name}: CartesianProduct in plan")
    if re.search(r"BatchEvalPython(?!UDTF)", plan):
        out.append(f"{name}: row-at-a-time Python UDF in plan")
    for head in exchange_headers(df):
        if "text#" in head:
            out.append(f"{name}: exchange keyed on text: {head}")
    return out
