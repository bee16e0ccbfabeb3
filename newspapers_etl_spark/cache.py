"""Caller-owned release path for query-internal caches.

Four registered queries persist an intermediate relation because it
feeds multiple subplans of the one DataFrame they return (``jaccard``'s
shingle sets, ``dd_spans``'s window stream + repeated-key set,
``sh_pairs``/``sh32``'s (doc_id, sh) members — see
operators/dedup.py:manku_neardup_pairs).  The query contract (return an
unexecuted DataFrame) makes in-query ``unpersist()`` impossible: the
cache must outlive the call so the caller's action can use it.  In the
bench harness every measured run clears the cache between queries
(bench.py); a LONG-LIVED interactive session, or a sweep that runs many
queries on one SparkSession, owns the release instead — wrap the work in
:func:`cached_intermediates` or call :func:`clear_cached_intermediates`
when done.  Both are storage-only operations: they never change results,
only free executor storage memory.
"""

from __future__ import annotations

from collections.abc import Iterator
from contextlib import contextmanager

from pyspark.sql import SparkSession


def clear_cached_intermediates(spark: SparkSession) -> None:
    """Release every cached relation on the session, including the
    intermediates persisted inside jaccard/dd_spans/sh_pairs/sh32.
    Safe at any point: a cleared cache re-materializes on next use."""
    spark.catalog.clearCache()


@contextmanager
def cached_intermediates(spark: SparkSession) -> Iterator[SparkSession]:
    """Scope query-internal caches to a block::

        with cached_intermediates(spark):
            sh_pairs_df = all_queries()["sh_pairs"](spark, sf_dir)
            sh_pairs_df.count()
        # (doc_id, sh) cache released here

    Clears on exit even when the block raises."""
    try:
        yield spark
    finally:
        clear_cached_intermediates(spark)
