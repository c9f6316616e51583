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

def test_guard_accepts_docs_too_short_to_shingle(spark, staged):
    """Docs with fewer than shingle_n tokens can never be near-dups, so
    the guard must ACCEPT and write them (they contribute no sketch
    state) — novel data is never silently dropped at ingest."""
    incoming, state = staged
    _write_drop(
        spark,
        f"{incoming}/d1.parquet",
        [(0, _NOVEL[0]), (1, "hi"), (2, "ok then"), (3, _NOVEL[1])],
    )
    run_ingest_guard(spark, _stream(spark, incoming), state)
    ids = sorted(r.doc_id for r in accepted_corpus(spark, state).select("doc_id").collect())
    assert ids == [0, 1, 2, 3], ids

    # and short docs still don't shield later near-dups from rejection
    _write_drop(spark, f"{incoming}/d2.parquet", [(4, "hi"), (5, _NOVEL[0])])
    run_ingest_guard(spark, _stream(spark, incoming), state)
    ids = sorted(r.doc_id for r in accepted_corpus(spark, state).select("doc_id").collect())
    assert ids == [0, 1, 2, 3, 4], ids


# chain triple: A≈B and B≈C under the guard's seeded sketch (band
# collision + est Jaccard ≥ 0.5) but A≉C (0.4375, no shared bucket) —
# probed against the actual minhash_signatures/lsh_band_keys output.
_CHAIN_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi omicron pi rho sigma tau upsilon"
_CHAIN_B = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu red orange yellow green cyan blue violet"
_CHAIN_C = "one two epsilon zeta eta theta iota kappa lam mu nu red orange yellow green cyan blue violet"


def test_guard_in_batch_chain_matches_cross_batch(spark, staged, tmp_path):
    """A~B, B~C, A!~C must resolve the same whether the three docs
    arrive in one micro-batch or three: B rejected against A, C ACCEPTED
    (its only near-dup, B, was itself rejected and never enters the
    index). In-batch rejection iterates to a fixpoint so a rejected doc
    never serves as a rejector."""
    # one batch
    incoming, state = staged
    _write_drop(
        spark,
        f"{incoming}/d1.parquet",
        [(0, _CHAIN_A), (1, _CHAIN_B), (2, _CHAIN_C)],
    )
    run_ingest_guard(spark, _stream(spark, incoming), state)
    one_batch = sorted(r.doc_id for r in accepted_corpus(spark, state).select("doc_id").collect())

    # three batches, same docs, fresh state
    incoming2 = tmp_path / "incoming2"
    incoming2.mkdir()
    state2 = str(tmp_path / "guard_state2")
    for i, text in enumerate((_CHAIN_A, _CHAIN_B, _CHAIN_C)):
        _write_drop(spark, f"{incoming2}/d{i}.parquet", [(i, text)])
        run_ingest_guard(spark, _stream(spark, str(incoming2)), state2)
    cross_batch = sorted(r.doc_id for r in accepted_corpus(spark, state2).select("doc_id").collect())

    assert one_batch == cross_batch == [0, 2], (one_batch, cross_batch)
