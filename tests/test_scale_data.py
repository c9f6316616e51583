"""Invariants of the sf0.2 augmentation (scripts/make_scale_data.py).

The byte-scale curve (SCALE.md) divides by "2x data", so the
augmentation must really be 2x in the units each mover shuffles:
- token counts must be preserved EXACTLY by the marker substitution
  (replacement, not insertion — the first cut inserted and silently
  made documents 2.25x in tokens, bending the curve to 2.4);
- cross-copy word-3-shingle overlap must be far below every near-dup
  threshold, or the dedup movers would be measuring planted duplicates.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from scripts.make_scale_data import SALTED_TEXT  # noqa: E402


def _salt(duck, doc_id: int, text: str) -> str:
    return duck.execute(
        f"SELECT {SALTED_TEXT} FROM (SELECT ? AS doc_id, ? AS text)",
        [doc_id, text],
    ).fetchone()[0]


def test_salting_preserves_token_count_and_breaks_shingles(duck):
    text = " ".join(f"w{i % 7}tok{i % 13}" for i in range(40))
    salted = _salt(duck, 123, text)
    toks, stoks = text.split(), salted.split()
    assert len(stoks) == len(toks)  # replacement, never insertion
    # every 4th position is the unique marker, the rest untouched
    for i, (a, b) in enumerate(zip(toks, stoks)):
        if i % 4 == 0:
            assert b == f"zzq123q{i + 1}"
        else:
            assert b == a
    # word-3-shingle Jaccard far below near-dup thresholds (~25% max)
    sh = lambda ts: {" ".join(ts[i:i + 3]) for i in range(len(ts) - 2)}
    a, b = sh(toks), sh(stoks)
    assert len(a & b) / len(a | b) < 0.30


def test_markers_are_unique_across_docs_and_positions(duck):
    text = "alpha beta gamma delta epsilon zeta eta theta"
    s1, s2 = _salt(duck, 1, text), _salt(duck, 2, text)
    m1 = {t for t in s1.split() if t.startswith("zzq")}
    m2 = {t for t in s2.split() if t.startswith("zzq")}
    assert m1 and m2 and not (m1 & m2)
