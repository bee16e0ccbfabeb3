"""Custom Python Data Source: the archive-search scan (SURVEY.md §2.1
S1) as a real Spark connector with source-side predicate pushdown.

The reference pushes its date-range and paper-id predicates into the
archive search URL so the SERVER filters (reference
src/01-scrape-images.py:482-522, URL build :487-491) and its workflow
iterates one day-partition per process (main.yml:77-95).  This
connector reproduces both behaviors with Spark's Data Source API:

- ``pushFilters`` accepts issue_date comparisons and narrows the day
  range BEFORE planning — the Spark analog of encoding ``from=/to=``
  into the search URL; unsupported filters are returned for Spark to
  apply post-scan.
- ``partitions`` emits one InputPartition per remaining day — the
  day-loop as genuine scan parallelism: each task "fetches" one day,
  and pruned days are never scheduled at all.

Rows are a deterministic synthetic stand-in for the live archive (the
container has no network; the reference's real transport is Selenium).
A production connector swaps ``_issues_for_day`` for the HTTP call —
partitioning, pushdown, and schema handling stay identical.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from datetime import date, timedelta
from typing import Iterator, List, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

SOURCE_NAME = "newspaper_archive"
ARCHIVE_SCHEMA = "issue_date date, title string, manifest_id string, n_pages int"
DEFAULT_START = "1994-01-01"
DEFAULT_END = "1994-03-31"
DEFAULT_PAPERS = 5


@dataclass
class DayPartition(InputPartition):
    day: str  # ISO date — one archive search per day, like the workflow loop
    n_papers: int


def _issues_for_day(day: str, n_papers: int) -> Iterator[tuple]:
    """Deterministic synthetic issues: every paper publishes daily;
    manifest id and page count derive from (title, day) so retries and
    speculative tasks see identical rows."""
    for p in range(n_papers):
        title = f"paper_{p}"
        digest = hashlib.sha256(f"{title}|{day}".encode()).hexdigest()
        yield (
            date.fromisoformat(day),
            title,
            f"dark-{digest[:16]}",
            4 + int(digest[16:18], 16) % 28,
        )


class ArchiveReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.start = date.fromisoformat(options.get("start", DEFAULT_START))
        self.end = date.fromisoformat(options.get("end", DEFAULT_END))
        self.n_papers = int(options.get("papers", DEFAULT_PAPERS))

    def pushFilters(self, filters: List[Filter]) -> Iterator[Filter]:
        """Fold issue_date comparisons into the scan's day range (the
        reference's from=/to= URL parameters); yield back everything
        else for Spark to evaluate."""
        for f in filters:
            if getattr(f, "attribute", None) == ("issue_date",) and isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ):
                v = f.value
                if isinstance(f, EqualTo):
                    self.start = max(self.start, v)
                    self.end = min(self.end, v)
                elif isinstance(f, GreaterThan):
                    self.start = max(self.start, v + timedelta(days=1))
                elif isinstance(f, GreaterThanOrEqual):
                    self.start = max(self.start, v)
                elif isinstance(f, LessThan):
                    self.end = min(self.end, v - timedelta(days=1))
                else:  # LessThanOrEqual
                    self.end = min(self.end, v)
            else:
                yield f

    def partitions(self) -> Sequence[DayPartition]:
        """One partition per day AFTER pushdown — pruned days are never
        scheduled (observable as the scan's partition count)."""
        days = []
        d = self.start
        while d <= self.end:
            days.append(DayPartition(day=d.isoformat(), n_papers=self.n_papers))
            d += timedelta(days=1)
        # Zero-partition scans are legal but Spark wants >=1; emit an
        # empty marker partition for a fully-pruned range.
        return days or [DayPartition(day="", n_papers=0)]

    def read(self, partition: DayPartition) -> Iterator[tuple]:
        if not partition.day:
            return
        yield from _issues_for_day(partition.day, partition.n_papers)


class ArchiveStreamReader(SimpleDataSourceStreamReader):
    """The reference's workflow day-loop (main.yml:77-95) as an
    engine-managed streaming source: the OFFSET is the next unread day,
    each micro-batch delivers exactly one day of issues, and the
    checkpoint persists the offset — scraper_state.json replaced by the
    engine's offset log, restart-safe for free."""

    def __init__(self, options: dict) -> None:
        self.start = options.get("start", DEFAULT_START)
        self.end = options.get("end", DEFAULT_END)
        self.n_papers = int(options.get("papers", DEFAULT_PAPERS))

    def initialOffset(self) -> dict:
        return {"day": self.start}

    def read(self, start: dict):
        day = start["day"]
        if day > self.end:  # caught up: empty batch, offset unchanged
            return [], start
        nxt = (date.fromisoformat(day) + timedelta(days=1)).isoformat()
        # materialized list: the engine pickles prefetched rows into its
        # cache for exactly-once replay
        return list(_issues_for_day(day, self.n_papers)), {"day": nxt}

    def readBetweenOffsets(self, start: dict, end: dict):
        """Deterministic replay for recovery: regenerate every day in
        [start, end) — same rows as the original delivery."""
        d = date.fromisoformat(start["day"])
        stop = date.fromisoformat(end["day"])
        while d < stop:
            yield from _issues_for_day(d.isoformat(), self.n_papers)
            d += timedelta(days=1)


class ArchiveDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def schema(self) -> str:
        return ARCHIVE_SCHEMA

    def reader(self, schema) -> ArchiveReader:
        return ArchiveReader(dict(self.options))

    def simpleStreamReader(self, schema) -> ArchiveStreamReader:
        return ArchiveStreamReader(dict(self.options))


def register(spark) -> None:
    spark.dataSource.register(ArchiveDataSource)
