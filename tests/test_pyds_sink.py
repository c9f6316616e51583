"""collection_append Python DataSource writer: two-phase commit,
append vs overwrite semantics, bounded batching, abort cleanup, and
the per-epoch streaming twin."""

from __future__ import annotations

import glob
import json
import os

from databeats_spark.sources.pyds_sink import (
    CollectionStreamWriter,
    CollectionWriter,
    register,
)
from tests.conftest import SF_SMOKE


def _rows_on_disk(path: str) -> int:
    return sum(
        1
        for f in glob.glob(os.path.join(path, "part-*.jsonl"))
        for _ in open(f, encoding="utf-8")
    )


def _manifest_totals(path: str) -> int:
    return sum(
        json.load(open(f))["n_rows"]
        for f in glob.glob(os.path.join(path, "_manifest-*.json"))
    )


def test_append_writes_all_rows_and_clears_staging(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "coll")
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "lang")
    n = docs.count()
    docs.write.format("collection_append").option("path", out).mode("append").save()
    assert _rows_on_disk(out) == n
    assert _manifest_totals(out) == n
    assert glob.glob(os.path.join(out, "_staging", "*")) == []  # two-phase: staging drained
    # append again: history doubles (K1 semantics)
    docs.write.format("collection_append").option("path", out).mode("append").save()
    assert _rows_on_disk(out) == 2 * n


def test_overwrite_truncates_prior_generation(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "snap")
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id")
    n = docs.count()
    for _ in range(2):  # snapshot twice: count must stay flat (K2/K3)
        docs.write.format("collection_append").option("path", out).mode("overwrite").save()
    assert _rows_on_disk(out) == n
    # prior-generation manifests are removed too, so manifest-derived
    # row totals never double-count after an overwrite
    assert len(glob.glob(os.path.join(out, "_manifest-*.json"))) == 1
    assert _manifest_totals(out) == n


def test_overwrite_clears_stale_epoch_dirs(spark, tmp_path):
    """A batch overwrite snapshot supersedes prior streaming epochs:
    epoch=* directories from an earlier streaming run are part of the
    prior generation and must not survive the swap."""
    register(spark)
    out = str(tmp_path / "snap")
    os.makedirs(os.path.join(out, "epoch=0"))
    with open(os.path.join(out, "epoch=0", "part-e0-00000.jsonl"), "w") as f:
        f.write('{"doc_id": "stale"}\n')
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id")
    docs.write.format("collection_append").option("path", out).mode("overwrite").save()
    assert glob.glob(os.path.join(out, "epoch=*")) == []
    assert _rows_on_disk(out) == docs.count()


def test_commit_sweeps_orphaned_task_attempts(tmp_path):
    """A failed/speculated attempt stages a file but its commit message
    never reaches the driver (the retry's does). commit() must sweep
    the orphan so staging never accumulates."""
    import pyarrow as pa

    out = str(tmp_path / "coll")
    w = CollectionWriter({"path": out, "batch_size": "10"}, overwrite=False)
    batch = lambda: iter([pa.RecordBatch.from_pylist([{"id": i} for i in range(4)])])
    orphan = w.write(batch())  # lost attempt — message never delivered
    winner = w.write(batch())  # winning retry of the same task
    w.commit([winner])
    assert _rows_on_disk(out) == 4
    assert glob.glob(os.path.join(out, "_staging", "*")) == []
    assert not os.path.exists(orphan.staged_file)


def test_batches_are_bounded_by_batch_size(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "batched")
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id")
        .repartition(4)
    )
    docs.write.format("collection_append").option("path", out).option(
        "batch_size", "7"
    ).mode("append").save()
    total = json.load(open(glob.glob(os.path.join(out, "_manifest-*.json"))[0]))
    assert total["n_rows"] == docs.count()
    assert total["n_tasks"] == 4


def test_abort_drops_staged_files(spark, tmp_path):
    import pyarrow as pa

    out = str(tmp_path / "aborted")
    w = CollectionWriter({"path": out, "batch_size": "5"}, overwrite=False)
    msg = w.write(iter([pa.RecordBatch.from_pylist([{"id": i} for i in range(12)])]))
    assert os.path.exists(msg.staged_file)
    assert msg.n_rows == 12 and msg.n_batches == 3  # 5 + 5 + 2
    w.abort([msg])
    assert not os.path.exists(msg.staged_file)
    assert _rows_on_disk(out) == 0  # nothing promoted


def test_stream_epoch_replay_is_idempotent(spark, tmp_path):
    """A replayed micro-batch (same batchId after a checkpoint retry)
    re-promotes its OWN epoch directory wholesale — row count stays
    flat, other epochs untouched."""
    import pyarrow as pa

    out = str(tmp_path / "coll")
    w = CollectionStreamWriter({"path": out, "batch_size": "10"})
    batch = [pa.RecordBatch.from_pylist([{"id": i} for i in range(25)])]
    w.commit([w.write(iter(batch))], batchId=0)
    w.commit([w.write(iter(batch))], batchId=1)

    def n_rows(epoch):
        return sum(
            1
            for f in glob.glob(os.path.join(out, f"epoch={epoch}", "part-*.jsonl"))
            for _ in open(f, encoding="utf-8")
        )

    assert n_rows(0) == 25 and n_rows(1) == 25
    # retry of epoch 1: fresh staging, same batchId
    w.commit([w.write(iter(batch))], batchId=1)
    assert n_rows(1) == 25, "replayed epoch duplicated rows"
    assert n_rows(0) == 25, "replay touched a foreign epoch"


def test_streaming_sink_promotes_per_epoch(spark, tmp_path):
    register(spark)
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "coll"), str(tmp_path / "ckpt")
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "source")
    docs.write.parquet(src)
    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.format("collection_append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    epoch_dirs = glob.glob(os.path.join(out, "epoch=*"))
    assert epoch_dirs, "no epochs promoted"
    total = sum(
        1
        for d in epoch_dirs
        for f in glob.glob(os.path.join(d, "part-*.jsonl"))
        for _ in open(f, encoding="utf-8")
    )
    assert total == docs.count()
