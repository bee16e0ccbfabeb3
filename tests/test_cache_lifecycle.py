"""Caller-owned cache release (VERDICT r6 #7 / ADVICE r6 #3).

jaccard/dd_spans/sh_pairs/sh32 persist() intermediates that the
returned DataFrame references; newspapers_etl_spark.cache is the one
documented release path for long-lived sessions.  The scope is
session-GLOBAL by design (ADVICE r7 #2 — the names now say so): the
third test pins that a pre-existing caller cache is also dropped, so
nobody can re-introduce a scoped-release reading."""

from newspapers_etl_spark.cache import (
    all_session_caches_cleared,
    clear_all_session_caches,
)
from newspapers_etl_spark.registry import all_queries


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_cache_block_releases_query_caches(spark, sf_dir):
    clear_all_session_caches(spark)  # isolate from earlier tests
    assert _cache_empty(spark)
    with all_session_caches_cleared(spark):
        n = all_queries()["shprs"](spark, sf_dir).count()
        assert n >= 0
        # The (doc_id, sh) members relation is cached while in scope.
        assert not _cache_empty(spark)
    assert _cache_empty(spark)


def test_cache_block_releases_on_error(spark, sf_dir):
    clear_all_session_caches(spark)
    try:
        with all_session_caches_cleared(spark):
            all_queries()["sh32"](spark, sf_dir).count()
            assert not _cache_empty(spark)
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert _cache_empty(spark)


def test_cache_release_is_session_global_as_named(spark, sf_dir):
    """The documented contract: caches that existed BEFORE the block
    are dropped too — global, not scoped (re-persist after the block
    if you need them back; results are unaffected either way)."""
    clear_all_session_caches(spark)
    from newspapers_etl_spark.catalog import load_table

    pre = load_table(spark, sf_dir, "region").persist()
    pre.count()
    assert not _cache_empty(spark)
    with all_session_caches_cleared(spark):
        pass
    assert _cache_empty(spark)
