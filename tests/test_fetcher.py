"""Effectful-fetch operator tests (SURVEY.md §2.8 U2): determinism,
one-client-per-partition reuse, and retry-with-backoff on transient
failures."""

from __future__ import annotations

import hashlib
from functools import partial

from pyspark.sql import functions as F

from newspapers_etl_spark.sources.fetcher import FlakyStubTransport, fetch_urls


def _urls(spark, n=40, parts=4):
    return (
        spark.range(n)
        .select(F.concat(F.lit("https://img/"), F.col("id")).alias("url"))
        .repartition(parts)
    )


def test_fetch_is_deterministic_and_complete(spark):
    out = fetch_urls(_urls(spark)).collect()
    assert len(out) == 40
    for r in out:
        assert r.ok and r.attempts == 1 and r.error is None
        expected = hashlib.sha256(r.url.encode()).digest() * (1 + len(r.url) % 4)
        assert bytes(r.content) == expected
        assert r.n_bytes == len(expected)


def test_one_client_per_partition(spark):
    out = fetch_urls(_urls(spark, n=40, parts=4)).collect()
    by_client: dict[str, int] = {}
    for r in out:
        by_client[r.client_id] = by_client.get(r.client_id, 0) + 1
    # 4 partitions → at most 4 client instances, never one per row.
    assert len(by_client) <= 4, f"client per row? {len(by_client)} clients"


def test_retry_recovers_transient_failures(spark):
    out = fetch_urls(
        _urls(spark),
        transport_factory=partial(FlakyStubTransport, fail_attempts=2, url_mod=3),
    ).collect()
    assert all(r.ok for r in out)
    flaky = [r for r in out if int(r.url.rsplit("/", 1)[-1]) % 3 == 0]
    plain = [r for r in out if int(r.url.rsplit("/", 1)[-1]) % 3 != 0]
    assert flaky and all(r.attempts == 3 for r in flaky)
    assert all(r.attempts == 1 for r in plain)


def test_exhausted_retries_reported_not_raised(spark):
    out = fetch_urls(
        _urls(spark, n=10, parts=2),
        transport_factory=partial(FlakyStubTransport, fail_attempts=99, url_mod=1),
        max_attempts=2,
    ).collect()
    assert len(out) == 10
    for r in out:
        assert not r.ok and r.attempts == 2
        assert "TimeoutError" in r.error
        assert r.content is None
