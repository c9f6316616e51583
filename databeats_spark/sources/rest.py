"""REST ingestion connector — the reference's extraction surface
(S1-S5, S9) re-expressed as a distributed keyed batch fetch.

The reference fetches single-threaded on the Airflow worker with
hand-rolled pagination and 5 rotated credentials (dag.py:170-367,
config.py:19-20). Here:

- **paginated search scans** (S1-S3) stay driver-side by nature (a
  serial cursor), producing a small seed DataFrame;
- **keyed batch fetches** (S4: audio features for N track ids; S5:
  artist enrichment) distribute via ``mapInPandas``: ids are
  range-partitioned, each partition chunks its ids 50 at a time
  (the API page limit, dag.py:339-341), issues one call per chunk,
  and yields Arrow batches. Credential rotation happens per-partition
  (X4) so concurrency multiplies across keys.

No network calls in this repo: the transport is an injectable
``fetch(endpoint, ids) -> list[dict]`` callable. Tests inject a
deterministic fake; production injects a requests-backed client. The
Spark-side plumbing — partitioning, chunking, schema, backpressure —
is the part that matters at scale and is fully real.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

Fetch = Callable[[str, list[str]], list[dict]]

BATCH_SIZE = 50  # Spotify API page/ids limit (reference dag.py:182, 339)


def keyed_batch_fetch(
    keys: DataFrame,
    key_col: str,
    endpoint: str,
    fetch: Fetch,
    result_schema: T.StructType,
    batch_size: int = BATCH_SIZE,
    num_partitions: int | None = None,
) -> DataFrame:
    """S4/S5: distributed enrichment of a key set via a batched API.

    ``keys`` is deduplicated, optionally repartitioned (one task per
    credential/worker), and each partition issues ceil(n/batch) calls.
    """
    distinct = keys.select(key_col).distinct()
    if num_partitions:
        distinct = distinct.repartition(num_partitions)

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[key_col].tolist()
            out: list[dict] = []
            for i in range(0, len(ids), batch_size):
                out.extend(fetch(endpoint, ids[i : i + batch_size]))
            if out:
                yield pd.DataFrame(out)

    return distinct.mapInPandas(fetch_partition, schema=result_schema)


def missing_keys(existing: DataFrame, candidates: DataFrame, key_col: str) -> DataFrame:
    """S5's anti-join semantics (reference dag.py:85-93 skips ids
    already present with an `in` check): candidates not in existing."""
    return (
        candidates.select(key_col)
        .distinct()
        .join(existing.select(key_col).distinct(), key_col, "left_anti")
    )


def search_scan(
    spark,
    endpoint: str,
    fetch: Fetch,
    result_schema: T.StructType,
    pages: int = 20,
    page_size: int = BATCH_SIZE,
) -> DataFrame:
    """S1-S3: a serial paginated search cursor (the API offers no
    parallel cursor), materialized once into a DataFrame seed. The
    1000-row cap mirrors the reference (dag.py:182-183)."""
    rows: list[dict] = []
    for page in range(pages):
        batch = fetch(endpoint, [f"offset={page * page_size}", f"limit={page_size}"])
        if not batch:
            break
        rows.extend(batch)
    return spark.createDataFrame(rows, schema=result_schema) if rows else spark.createDataFrame(
        [], schema=result_schema
    )


def dedup_union(history: DataFrame, fresh: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """U1 + A3: history ∪ fresh with deterministic newest-wins dedup
    (reference concat + drop_duplicates, dag.py:457-464)."""
    from databeats_spark.operators.dedup import dedup_first

    merged = history.unionByName(fresh.select(*history.columns))
    return dedup_first(merged, key_cols, [F.col(order_col).desc()])


def rotating_credential_fetch(credentials: list[str], base_fetch: Callable[[str, str, list[str]], list[dict]]) -> Fetch:
    """X4: per-partition credential rotation (reference dag.py keeps 5
    rotated Spotify client ids and swaps on 429).

    Returns a ``Fetch`` for :func:`keyed_batch_fetch` that picks the
    credential by the executor task's partition id — each parallel
    crawler task holds ONE credential for its lifetime, so rate limits
    apply per credential lane and a pool of N credentials yields N
    independent lanes (pair with ``num_partitions=len(credentials)``).
    ``base_fetch(credential, endpoint, ids)`` is the injectable
    transport; the tests pin the lane assignment, production supplies
    the HTTP client. Rotation-on-429 stays INSIDE base_fetch (retry
    with the next credential) — the lane choice here is the
    load-balancing layer, not the error-handling layer.
    """
    def fetch(endpoint: str, ids: list[str]) -> list[dict]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        lane = (ctx.partitionId() if ctx is not None else 0) % len(credentials)
        return base_fetch(credentials[lane], endpoint, ids)

    return fetch
