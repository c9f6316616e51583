"""Bloom-bitmap streaming dedup guard: admitted fingerprints are
unique across batches AND within a batch (first-arrival-wins), the
admitted set matches the exact-anti-join ground truth at a well-sized
bitmap (FPR ~0 at test scale), re-drains are no-ops, and a fresh-
checkpoint replay of the same files converges to the same corpus."""

from __future__ import annotations

import pandas as pd
import pytest

from databeats_spark.streaming.bloom_guard import admitted_docs, run_bloom_guard

_M = 1 << 14  # 16K bits for <20 keys: FPR negligible, test is exact


def _write_drop(path: str, rows: list[tuple[int, str]]) -> None:
    pd.DataFrame(rows, columns=["doc_id", "fp"]).to_parquet(path)


def _stream(spark, incoming: str):
    return spark.readStream.schema("doc_id BIGINT, fp STRING").parquet(incoming)


@pytest.fixture()
def staged(tmp_path):
    incoming = tmp_path / "incoming"
    incoming.mkdir()
    return str(incoming), str(tmp_path / "bloom_state")


def _drain(spark, incoming, state):
    run_bloom_guard(spark, _stream(spark, incoming), state, m_bits=_M)
    return sorted(
        (r.doc_id, r.fp) for r in admitted_docs(spark, state).collect()
    )


def test_bloom_guard_admits_novel_rejects_dups_exactly_once(spark, staged):
    incoming, state = staged

    # drop 1: three novel docs + an in-batch dup (3 repeats fp "a" —
    # min-id 0 must win)
    _write_drop(f"{incoming}/drop1.parquet", [(0, "a"), (1, "b"), (2, "c"), (3, "a")])
    got = _drain(spark, incoming, state)
    assert got == [(0, "a"), (1, "b"), (2, "c")]

    # drop 2: dup of an admitted fp + two novel
    _write_drop(f"{incoming}/drop2.parquet", [(4, "b"), (5, "d"), (6, "e")])
    got = _drain(spark, incoming, state)
    assert got == [(0, "a"), (1, "b"), (2, "c"), (5, "d"), (6, "e")]
    fps = [fp for _, fp in got]
    assert len(fps) == len(set(fps))  # the one-sided exactness contract

    # no-new-files re-drain: unchanged
    assert _drain(spark, incoming, state) == got


def test_bloom_guard_fresh_checkpoint_replay_converges(spark, staged, tmp_path):
    incoming, state = staged
    _write_drop(f"{incoming}/drop1.parquet", [(0, "a"), (1, "b")])
    _drain(spark, incoming, state)
    _write_drop(f"{incoming}/drop2.parquet", [(2, "a"), (3, "c")])
    first = _drain(spark, incoming, state)
    assert first == [(0, "a"), (1, "b"), (3, "c")]

    # at-least-once replay: same files through a FRESH checkpoint into
    # the SAME state — per-epoch dynamic overwrite + the exclude-own-
    # epoch probe make the re-run land on the identical corpus
    import shutil

    shutil.rmtree(f"{state}/_ckpt")
    again = _drain(spark, incoming, state)
    assert again == first
