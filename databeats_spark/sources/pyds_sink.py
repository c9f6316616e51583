"""A native Spark Python DataSource WRITER for batched collection
stores — the sink half of the connector seam.

sources/pyds.py covers the READ side (paginated API scan); this is the
write side done the Spark-4-native way: the reference's document-store
sinks — Mongo ``insert_many`` history append (dag.py:369-377, K1) and
the BigQuery TRUNCATE+APPEND snapshot (K2/K3) — as a first-class
``df.write.format("collection_append")`` target with both semantics:

- ``mode("append")``  → append new part files (K1 history append);
- ``mode("overwrite")`` → commit-time snapshot swap (K2/K3): the new
  generation is PROMOTED FIRST, then prior generations (parts,
  manifests, epoch dirs) are removed. The swap is not atomic on a
  plain filesystem — a driver crash between promote and cleanup
  leaves BOTH generations on disk, never zero — so readers must key
  off the latest manifest generation; a production subclass swaps in
  the store's atomic truncate+load primitive here.

The scale/correctness contract is two-phase commit: every task streams
its rows in ``batch_size`` chunks through the ``send_batch`` transport
hook into a STAGED location and returns a commit message; only the
driver's ``commit`` promotes staged output into the collection (and,
for overwrite, removes the old generation). A failed/speculated task's
staging is dropped by ``abort`` — half-written tasks can never be
observed by readers. The per-task unit is a stream of bounded batches
(the Mongo ``insert_many``/BQ load-job shape), never a whole-partition
buffer, so executor memory stays flat at any partition size. Rows
cross the JVM→Python boundary as Arrow RecordBatches
(``DataSourceArrowWriter``) — no per-row Python objects on the Spark
side; each Arrow batch is re-chunked to the transport bound.

No network in this container, so the built-in ``send_batch`` writes
durable JSONL into the staging area (the injectable-transport stand-in,
same pattern as pyds.py's ``fetch_page``). A production subclass
overrides ``send_batch`` with an idempotent bulk-write client and
``_promote``/``_truncate_prior`` with the store's commit primitives; the
two-phase structure, batching, option plumbing, and abort path are the
real, tested parts.

There is also a streaming twin: ``df.writeStream.format(
"collection_append")`` stages per epoch and promotes into
``epoch=<id>/`` directories at ``commit(batchId)`` — a replayed epoch
re-promotes the same directory (idempotent under checkpoint retry,
the same epoch-partition pattern as streaming/ingest_guard.py).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)

DEFAULT_BATCH_SIZE = 50  # the reference's insert_many chunk (dag.py:373)


@dataclass
class CollectionCommit(WriterCommitMessage):
    staged_file: str
    n_rows: int
    n_batches: int


class CollectionAppendDataSource(DataSource):
    """``df.write.format("collection_append")`` — options:
    path (collection directory, required), batch_size (int)."""

    @classmethod
    def name(cls) -> str:
        return "collection_append"

    def writer(self, schema, overwrite: bool) -> "CollectionWriter":
        return CollectionWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "CollectionStreamWriter":
        return CollectionStreamWriter(self.options)


class _StagedBatchWriter:
    """Shared task-side logic: stream rows in bounded batches through
    the transport hook into a staged file."""

    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("collection_append requires a 'path' option")
        self.batch_size = int(options.get("batch_size", DEFAULT_BATCH_SIZE))
        # per-JOB staging namespace: the writer is constructed once on
        # the driver and pickled to every task, so the token isolates
        # this job's staged files — commit-time sweeping can never
        # touch a CONCURRENT writer's staging on the same collection
        self.job_token = uuid.uuid4().hex

    @property
    def staging_dir(self) -> str:
        return os.path.join(self.path, "_staging", self.job_token)

    def send_batch(self, staged_file: str, batch: list[dict]) -> None:
        """Transport hook — override with a bulk-write client in
        production. The built-in appends durable JSONL to the staged
        file (values serialized with default=str for dates/decimals)."""
        with open(staged_file, "a", encoding="utf-8") as f:
            for doc in batch:
                f.write(json.dumps(doc, default=str) + "\n")

    def write(self, iterator: Iterator) -> CollectionCommit:
        """Arrow path: rows arrive as RecordBatches (zero per-row
        Python objects on the Spark side); each is re-chunked to the
        transport's ``batch_size`` bound — memory stays one Arrow
        batch + one transport chunk regardless of partition size."""
        os.makedirs(self.staging_dir, exist_ok=True)
        staged = os.path.join(self.staging_dir, f"task-{uuid.uuid4().hex}.jsonl")
        # create the file even for an empty partition so commit counts match
        open(staged, "a", encoding="utf-8").close()
        n_rows = n_batches = 0
        for rb in iterator:
            for start in range(0, rb.num_rows, self.batch_size):
                chunk = rb.slice(start, self.batch_size).to_pylist()
                self.send_batch(staged, chunk)
                n_rows += len(chunk)
                n_batches += 1
        return CollectionCommit(staged_file=staged, n_rows=n_rows, n_batches=n_batches)

    # driver-side helpers -------------------------------------------------

    def _truncate_prior(self, keep_generation: str) -> None:
        """Remove every artifact of prior generations: part files and
        manifests whose generation differs from ``keep_generation``,
        plus any streaming ``epoch=*`` directories — so row totals
        derived from manifests never double-count after an overwrite."""
        keep_part = f"part-{keep_generation}-"
        keep_manifest = f"_manifest-{keep_generation}.json"
        for name in os.listdir(self.path):
            full = os.path.join(self.path, name)
            if name.startswith("part-") and name.endswith(".jsonl"):
                if not name.startswith(keep_part):
                    os.remove(full)
            elif name.startswith("_manifest-") and name != keep_manifest:
                os.remove(full)
            elif name.startswith("epoch=") and os.path.isdir(full):
                shutil.rmtree(full)

    def _sweep_staging(self) -> None:
        """Drop THIS job's orphaned staged files — attempts that failed
        or were speculated and whose commit message never reached the
        driver (the winning attempt's file was already moved out by
        ``_promote``). Scoped to the job token: a concurrent writer's
        staging under the same collection path is never touched."""
        if os.path.isdir(self.staging_dir):
            shutil.rmtree(self.staging_dir, ignore_errors=True)
        try:  # tidy the shared parent when this was the last job
            os.rmdir(os.path.join(self.path, "_staging"))
        except OSError:
            pass

    def _promote(self, messages, dest_dir: str, generation: str) -> int:
        os.makedirs(dest_dir, exist_ok=True)
        total = 0
        for i, m in enumerate(messages):
            if m is None:
                continue
            shutil.move(
                m.staged_file, os.path.join(dest_dir, f"part-{generation}-{i:05d}.jsonl")
            )
            total += m.n_rows
        return total

    def _drop_staged(self, messages) -> None:
        for m in messages or []:
            if m is not None and os.path.exists(m.staged_file):
                os.remove(m.staged_file)


class CollectionWriter(_StagedBatchWriter, DataSourceArrowWriter):
    def __init__(self, options: dict, overwrite: bool) -> None:
        super().__init__(options)
        self.overwrite = overwrite

    def commit(self, messages) -> None:
        # Promote the NEW generation first so a crash mid-commit leaves
        # both generations (recoverable via latest manifest), never none.
        gen = uuid.uuid4().hex[:8]
        total = self._promote(messages, self.path, gen)
        manifest = {
            "generation": gen,
            "mode": "overwrite" if self.overwrite else "append",
            "n_rows": total,
            "n_tasks": len([m for m in messages if m is not None]),
        }
        with open(os.path.join(self.path, f"_manifest-{gen}.json"), "w") as f:
            json.dump(manifest, f)
        if self.overwrite:
            self._truncate_prior(gen)
        self._sweep_staging()

    def abort(self, messages) -> None:
        self._drop_staged(messages)


class CollectionStreamWriter(_StagedBatchWriter, DataSourceStreamArrowWriter):
    """Per-epoch promotion: epoch=<id>/ directories, replay-idempotent
    (a retried epoch overwrites its own directory and nothing else)."""

    def commit(self, messages, batchId: int) -> None:
        epoch_dir = os.path.join(self.path, f"epoch={int(batchId)}")
        if os.path.isdir(epoch_dir):
            shutil.rmtree(epoch_dir)  # replay: re-promote the same epoch
        self._promote(messages, epoch_dir, f"e{int(batchId)}")
        # epochs commit sequentially, so any file still staged belongs
        # to a lost attempt of THIS epoch — safe to sweep
        self._sweep_staging()

    def abort(self, messages, batchId: int) -> None:
        self._drop_staged(messages)


def register(spark) -> None:
    spark.dataSource.register(CollectionAppendDataSource)
