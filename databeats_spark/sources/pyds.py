"""A native Spark Python DataSource for offset-paginated APIs.

sources/rest.py distributes KEYED enrichment via mapInPandas; this is
the other half done the Spark-4-native way: the paginated SEARCH scan
(reference dag.py:170-230's serial `while offset < 1000` cursor) as a
first-class ``spark.read.format("paged_search")`` source.

The unlock vs. the reference's serial cursor: an offset/limit API is
RANDOM-ACCESS — page N is addressable without fetching pages 0..N-1.
So every page becomes an ``InputPartition`` and the cluster fetches
all pages concurrently; the reference's 5.41 req/s single-thread crawl
(BASELINE.md) becomes wall-clock of the slowest single page. Planner
integration comes free: the source reports partitions, Spark schedules
one task per page, and failures retry per-page, not per-crawl.

No network in this container, so the transport is the overridable
``fetch_page`` hook; the built-in implementation is a deterministic
simulator (seeded by options), which the tests pin. A production
subclass overrides ``fetch_page`` with a requests-backed client and
registers under its own name — the partition planning, option
plumbing, and schema contract are the real, tested parts.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


def _sim_page(seed: int, page: int, page_size: int) -> list[tuple]:
    """Deterministic page simulator shared by the batch and streaming
    readers (the injectable-transport stand-in for a real HTTP crawl)."""
    rows = []
    for i in range(page_size):
        h = hashlib.md5(f"{seed}:{page}:{i}".encode()).hexdigest()
        rows.append((page, f"t_{h[:12]}", f"track {h[12:20]}", int(h[20:24], 16) % 101))
    return rows

SEARCH_SCHEMA = "page INT, track_id STRING, track_name STRING, popularity INT"
DEFAULT_PAGES = 4
DEFAULT_PAGE_SIZE = 50  # the API page cap (reference dag.py:182)


class PagedSearchDataSource(DataSource):
    """``spark.read.format("paged_search")`` — options:
    pages (int), page_size (int ≤ 50), seed (int)."""

    @classmethod
    def name(cls) -> str:
        return "paged_search"

    def schema(self) -> str:
        return SEARCH_SCHEMA

    def reader(self, schema) -> "PagedSearchReader":
        return PagedSearchReader(self.options)

    def simpleStreamReader(self, schema) -> "PagedSearchStreamReader":
        return PagedSearchStreamReader(self.options)


class PagedSearchReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.pages = int(options.get("pages", DEFAULT_PAGES))
        self.page_size = min(int(options.get("page_size", DEFAULT_PAGE_SIZE)), DEFAULT_PAGE_SIZE)
        self.seed = int(options.get("seed", 0))

    def partitions(self) -> list[InputPartition]:
        # one task per page: the whole crawl runs at cluster width
        return [InputPartition(p) for p in range(self.pages)]

    def fetch_page(self, page: int) -> list[tuple]:
        """Transport hook — override with a real HTTP client in
        production. The built-in is a seeded deterministic simulator."""
        return _sim_page(self.seed, page, self.page_size)

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        yield from self.fetch_page(partition.value)


class PagedSearchStreamReader(SimpleDataSourceStreamReader):
    """``spark.readStream.format("paged_search")`` — incremental crawl.

    The offset is the next unread page (``{"page": n}``), so the
    micro-batch log IS the crawl cursor: restarts resume from the
    checkpointed offset, and replay of an uncommitted batch goes
    through ``readBetweenOffsets`` with the exact page range — the
    exactly-once contract for an offset-paginated API. Each batch
    advances at most ``pages_per_batch`` pages (rate limiting); when
    caught up it returns an empty batch with an unchanged offset, so
    availableNow drains terminate."""

    def __init__(self, options: dict) -> None:
        self.pages = int(options.get("pages", DEFAULT_PAGES))
        self.page_size = min(int(options.get("page_size", DEFAULT_PAGE_SIZE)), DEFAULT_PAGE_SIZE)
        self.seed = int(options.get("seed", 0))
        self.pages_per_batch = int(options.get("pages_per_batch", 2))

    def initialOffset(self) -> dict:
        return {"page": 0}

    def fetch_page(self, page: int) -> list[tuple]:
        """Same transport hook as the batch reader."""
        return _sim_page(self.seed, page, self.page_size)

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        first = int(start["page"])
        last = min(first + self.pages_per_batch, self.pages)
        rows = [r for p in range(first, last) for r in self.fetch_page(p)]
        return iter(rows), {"page": last}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        for p in range(int(start["page"]), int(end["page"])):
            yield from self.fetch_page(p)

    def commit(self, end: dict) -> None:
        pass


def register(spark) -> None:
    spark.dataSource.register(PagedSearchDataSource)
