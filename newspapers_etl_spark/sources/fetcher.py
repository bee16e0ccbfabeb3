"""Effectful fetch operator (SURVEY.md §2.8 U2): distributed binary
fetch over URL partitions via ``mapInPandas``.

The reference fetches serially — one ``requests.get`` per file with a
3-attempt/2 s retry loop (reference src/01-scrape-images.py:353-385) and
a fresh Drive client built per upload (:105, an anti-pattern).  The
Spark translation:

- Parallelism is the PARTITION: each task fetches its URL slice, so
  throughput scales with executors instead of one Python loop.
- ONE client per partition (built at iterator start, closed at end) —
  connection/session reuse amortized over the whole slice.
- In-partition retry with exponential backoff (the reference's
  ``@retry`` semantics, :54-74: 5 attempts, ×2 from 1 s) for
  rate-limit-style transient errors; crash-grade failures are left to
  Spark task retry (``spark.task.maxFailures``), which re-runs the
  whole partition idempotently.
- Failures don't poison the batch: each row carries (ok, error) so the
  pipeline can route failures to the retry op
  (operators/incremental.py:incr_retry_failed_partitions).

HTTP libraries are deliberately not imported here: the default
transport is a deterministic STUB (this container has no network); swap
``transport_factory`` for a real session factory in production — the
partition plumbing, retry logic, Arrow batching, and schema are real.
"""

from __future__ import annotations

import hashlib
import time
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

FETCH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("attempts", T.IntegerType()),
        T.StructField("error", T.StringType()),
        T.StructField("client_id", T.StringType()),
    ]
)


class StubTransport:
    """Deterministic fake transport: content is derived from the URL, so
    retries/speculative tasks produce identical bytes.  ``client_id``
    exposes instance identity so tests can prove one-client-per-
    partition."""

    def __init__(self) -> None:
        self.client_id = hex(id(self))

    def get(self, url: str) -> bytes:
        h = hashlib.sha256(url.encode()).digest()
        return h * (1 + len(url) % 4)

    def close(self) -> None:
        pass


class FlakyStubTransport(StubTransport):
    """Stub transport with injectable transient failures, for testing
    the retry path: URLs whose trailing integer is divisible by
    ``url_mod`` fail their first ``fail_attempts`` calls (deterministic
    per URL, per client).  ``url_mod=1`` fails everything — use with a
    small ``max_attempts`` to test retry exhaustion.  Must live in an
    importable module so Spark workers can unpickle the factory."""

    def __init__(self, fail_attempts: int = 2, url_mod: int = 3) -> None:
        super().__init__()
        self.fail_attempts = fail_attempts
        self.url_mod = url_mod
        self.seen: dict[str, int] = {}

    def get(self, url: str) -> bytes:
        self.seen[url] = self.seen.get(url, 0) + 1
        tail = url.rsplit("/", 1)[-1]
        flaky = tail.isdigit() and int(tail) % self.url_mod == 0
        if flaky and self.seen[url] <= self.fail_attempts:
            raise TimeoutError("simulated transient failure")
        return super().get(url)


def make_fetcher(
    transport_factory: Callable[[], object] = StubTransport,
    max_attempts: int = 5,
    backoff_s: float = 0.001,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """Build the mapInPandas worker.  ``backoff_s`` is the initial delay,
    doubled per attempt (the reference's @retry policy); keep it tiny in
    tests, ~1 s in production."""

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = transport_factory()  # ONE client per partition
        cid = getattr(client, "client_id", "client")
        try:
            for pdf in batches:
                rows = []
                for url in pdf["url"]:
                    content, err, attempt = None, None, 0
                    delay = backoff_s
                    while attempt < max_attempts:
                        attempt += 1
                        try:
                            content = client.get(url)
                            err = None
                            break
                        except Exception as e:  # transient: back off, retry
                            err = f"{type(e).__name__}: {e}"
                            if attempt < max_attempts:
                                time.sleep(delay)
                                delay *= 2
                    rows.append(
                        {
                            "url": url,
                            "ok": content is not None,
                            "content": content,
                            "n_bytes": len(content) if content is not None else 0,
                            "attempts": attempt,
                            "error": err,
                            "client_id": cid,
                        }
                    )
                yield pd.DataFrame(rows, columns=[f.name for f in FETCH_SCHEMA])
        finally:
            close = getattr(client, "close", None)
            if close:
                close()

    return fetch_partition


def fetch_urls(
    urls: DataFrame,
    transport_factory: Callable[[], object] = StubTransport,
    max_attempts: int = 5,
    backoff_s: float = 0.001,
) -> DataFrame:
    """Fetch every URL in ``urls`` (column ``url``) distributedly.
    Repartition upstream to size partitions for the external service's
    rate limits — more partitions = more concurrent clients."""
    fetcher = make_fetcher(transport_factory, max_attempts, backoff_s)
    return urls.select("url").mapInPandas(fetcher, FETCH_SCHEMA)
