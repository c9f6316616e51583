"""Streaming near-dup ingest guard: exact and near duplicates of
already-accepted documents are rejected at ingest, in-batch dups keep
the first arrival, novel docs pass, and re-drains are exactly-once.

The guard's sketch parameters are seeded and the inputs are fixed, so
every accept/reject decision here is deterministic — these are pins,
not probabilistic expectations.
"""

from __future__ import annotations

import shutil

import pandas as pd
import pytest

from databeats_spark.streaming.ingest_guard import accepted_corpus, run_ingest_guard

_BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm stove and the birds sing in the tall green trees"
)
_NOVEL = [
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi",
    "one two three four five six seven eight nine ten eleven twelve thirteen fourteen",
    "red orange yellow green blue indigo violet colors of the rainbow arc high",
    "spark shuffles partitions across executors while catalyst optimizes the plan tree",
    "ducks swim on the quiet pond as autumn leaves drift onto the water surface",
]


def _write_drop(spark, path: str, rows: list[tuple[int, str]]) -> None:
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(path)


def _stream(spark, incoming: str):
    return spark.readStream.schema("doc_id BIGINT, text STRING").parquet(incoming)


@pytest.fixture()
def staged(tmp_path):
    incoming = tmp_path / "incoming"
    incoming.mkdir()
    return str(incoming), str(tmp_path / "guard_state")


def test_guard_accepts_rejects_and_is_exactly_once(spark, staged, tmp_path):
    incoming, state = staged

    # drop 1: five distinct docs — all accepted
    _write_drop(spark, f"{incoming}/drop1.parquet", list(enumerate(_NOVEL)))
    run_ingest_guard(spark, _stream(spark, incoming), state)
    ids = sorted(r.doc_id for r in accepted_corpus(spark, state).select("doc_id").collect())
    assert ids == [0, 1, 2, 3, 4]

    # drop 2: exact dup of 0, near dup of 1 (one word changed), one
    # novel doc, and an in-batch near-dup pair (7 first, 8 later)
    near_of_1 = _NOVEL[1].replace("fourteen", "fifteen")
    drop2 = [
        (5, _NOVEL[0]),            # exact dup of accepted 0 -> reject
        (6, near_of_1),            # near dup of accepted 1  -> reject
        (7, _BASE),                # novel                   -> accept
        (8, _BASE + " indeed"),    # in-batch near dup of 7  -> reject
    ]
    second = tmp_path / "drop2.parquet"
    _write_drop(spark, str(second), drop2)
    shutil.copy(str(second), f"{incoming}/drop2.parquet")
    run_ingest_guard(spark, _stream(spark, incoming), state)

    ids = sorted(r.doc_id for r in accepted_corpus(spark, state).select("doc_id").collect())
    assert ids == [0, 1, 2, 3, 4, 7], ids

    # re-drain with no new files: exactly-once, state unchanged
    run_ingest_guard(spark, _stream(spark, incoming), state)
    again = sorted(r.doc_id for r in accepted_corpus(spark, state).select("doc_id").collect())
    assert again == [0, 1, 2, 3, 4, 7]


def test_guard_matches_batch_semantics_on_exact_dups(spark, staged):
    """Every exact duplicate (Jaccard 1 ⇒ identical signatures ⇒
    identical band keys) must be caught regardless of drop boundaries:
    stream twin of dedup_exact's keep-first rule."""
    incoming, state = staged
    _write_drop(
        spark,
        f"{incoming}/d1.parquet",
        [(0, _NOVEL[0]), (1, _NOVEL[1]), (2, _NOVEL[0])],  # 2 dups 0 in-batch
    )
    run_ingest_guard(spark, _stream(spark, incoming), state)
    _write_drop(spark, f"{incoming}/d2.parquet", [(3, _NOVEL[1]), (4, _NOVEL[2])])
    run_ingest_guard(spark, _stream(spark, incoming), state)

    ids = sorted(r.doc_id for r in accepted_corpus(spark, state).select("doc_id").collect())
    assert ids == [0, 1, 4], ids


def test_compact_state_preserves_decisions(spark, staged, tmp_path):
    """Compaction folds the epoch partitions into one consolidated
    partition without changing a single accept/reject decision: the
    corpus is identical before/after, and a post-compaction drain still
    rejects duplicates of pre-compaction documents."""
    import os

    from databeats_spark.streaming.ingest_guard import compact_state

    incoming, state = staged
    _write_drop(spark, f"{incoming}/d1.parquet", list(enumerate(_NOVEL[:3])))
    run_ingest_guard(spark, _stream(spark, incoming), state)
    _write_drop(spark, f"{incoming}/d2.parquet", [(10, _NOVEL[3])])
    run_ingest_guard(spark, _stream(spark, incoming), state)

    before = sorted(r.doc_id for r in accepted_corpus(spark, state).select("doc_id").collect())
    compact_state(spark, state)
    after = sorted(r.doc_id for r in accepted_corpus(spark, state).select("doc_id").collect())
    assert before == after == [0, 1, 2, 10]
    # every table folded to the single reserved partition
    for table in ("accepted", "sigs", "bands"):
        parts = [p for p in os.listdir(f"{state}/{table}") if p.startswith("epoch=")]
        assert parts == ["epoch=-1"], parts

    # the consolidated index still rejects dups of old docs
    _write_drop(spark, f"{incoming}/d3.parquet", [(20, _NOVEL[0]), (21, _NOVEL[4])])
    run_ingest_guard(spark, _stream(spark, incoming), state)
    final = sorted(r.doc_id for r in accepted_corpus(spark, state).select("doc_id").collect())
    assert final == [0, 1, 2, 10, 21], final
