"""Caller-owned cache release (VERDICT r6 #7 / ADVICE r6 #3).

jaccard/dd_spans/sh_pairs/sh32 persist() intermediates that the
returned DataFrame references; newspapers_etl_spark.cache is the one
documented release path for long-lived sessions."""

from newspapers_etl_spark.cache import (
    cached_intermediates,
    clear_cached_intermediates,
)
from newspapers_etl_spark.registry import all_queries


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_cached_intermediates_releases_query_caches(spark, sf_dir):
    clear_cached_intermediates(spark)  # isolate from earlier tests
    assert _cache_empty(spark)
    with cached_intermediates(spark):
        n = all_queries()["sh_pairs"](spark, sf_dir).count()
        assert n >= 0
        # The (doc_id, sh) members relation is cached while in scope.
        assert not _cache_empty(spark)
    assert _cache_empty(spark)


def test_cached_intermediates_releases_on_error(spark, sf_dir):
    clear_cached_intermediates(spark)
    try:
        with cached_intermediates(spark):
            all_queries()["sh32"](spark, sf_dir).count()
            assert not _cache_empty(spark)
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert _cache_empty(spark)
