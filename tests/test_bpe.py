"""Distributed BPE vs a pure-Python reference implementation."""

from __future__ import annotations

import re
from collections import Counter

from databeats_spark.ml.bpe import apply_bpe, train_bpe
from databeats_spark.sources.tables import load_tables
from tests.conftest import SF_SMOKE


def _ref_bpe(texts: list[str], n_merges: int):
    """Sennrich-style reference: dict-of-words, greedy re.sub merge."""
    vocab = Counter()
    for t in texts:
        for w in t.split():
            if w:
                vocab[" ".join(list(w) + ["</w>"])] += 1
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, freq in vocab.items():
            toks = syms.split(" ")
            for x, y in zip(toks, toks[1:]):
                pairs[(x, y)] += freq
        if not pairs:
            break
        # max by (count, then LOWEST (a,b)) — mirror orderBy(desc(n), a, b)
        n_max = max(pairs.values())
        if n_max < 2:
            break
        a, b = min(p for p, n in pairs.items() if n == n_max)
        merges.append((a, b))
        # callable replacement: literal, no template escapes (re.sub's
        # string replacement would turn '\a' into BEL, mirroring the
        # Java $-group bug the engine escapes against)
        pat = re.compile(rf"(?<!\S){re.escape(a)} {re.escape(b)}(?!\S)")
        merged = a + b
        vocab = Counter({pat.sub(lambda _: merged, syms): f for syms, f in vocab.items()})
    return merges, vocab


def test_merges_match_reference(spark):
    docs = load_tables(spark, SF_SMOKE, ["documents"]).documents.limit(50)
    texts = [r["text"] for r in docs.select("text").collect()]
    ref_merges, ref_vocab = _ref_bpe(texts, 12)
    got_merges, got_vocab = train_bpe(docs, 12)
    assert got_merges == ref_merges
    got = {r["w"]: r["syms"] for r in got_vocab.collect()}
    want = {}
    for syms, _ in ref_vocab.items():
        w = syms.replace(" ", "").replace("</w>", "")
        want[w] = syms
    assert got == want


def test_merges_with_regex_special_symbols(spark):
    """Merged symbols containing $ / \\ must be treated literally in the
    replacement (Java replaceAll group-reference semantics): '$1 $1 x'
    learns the ('$','1</w>')-family merges, whose replacement strings
    contain '$' followed by a digit."""
    texts = ["$1 $1 $1 \\a \\a x$2 x$2"] * 3
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    ref_merges, ref_vocab = _ref_bpe(texts, 6)
    got_merges, got_vocab = train_bpe(docs, 6)
    assert got_merges == ref_merges
    got = {r["w"]: r["syms"] for r in got_vocab.collect()}
    want = {s.replace(" ", "").replace("</w>", ""): s for s in ref_vocab}
    assert got == want
    pieces = apply_bpe(docs, got_merges)
    for r in pieces.collect():
        assert "".join(r["pieces"]) == r["w"] + "</w>"


def test_apply_bpe_segments_every_word(spark):
    docs = load_tables(spark, SF_SMOKE, ["documents"]).documents.limit(50)
    merges, _ = train_bpe(docs, 8)
    assert len(merges) == 8
    pieces = apply_bpe(docs.select("text"), merges)
    rows = pieces.collect()
    assert len(rows) > 0
    for r in rows:
        # round-trip: pieces concatenate back to word + terminator
        assert "".join(r["pieces"]) == r["w"] + "</w>"
        assert r["n_pieces"] >= 1


def test_oracle_early_stop_differential(spark, tmp_path):
    """The unrolled DuckDB oracle must track Spark's early stop: on a
    corpus whose mergeable pairs exhaust after 2 rounds, rounds 3..10
    find no pair with n >= 2 — Spark breaks out of the loop, and the
    oracle's LEFT JOIN ON TRUE guard must keep the vocabulary unchanged
    (a plain cross join would silently EMPTY it) so both the merge list
    and the final-vocab histogram still agree."""
    import duckdb

    from databeats_spark.registry.mining import (
        _bpe_merges,
        _bpe_segmentation,
        _BPE_MERGES_SQL,
        _BPE_SEGMENTATION_SQL,
    )

    sf_dir = str(tmp_path)
    # 'ab' x2 -> merges (a,b) then (ab,</w>); 'cd' is hapax, so round 3
    # has no pair with n >= 2 and training stops at 2 of 10 merges.
    spark.createDataFrame(
        [(1, "ab ab"), (2, "cd")], "doc_id long, text string"
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet/*.parquet'"
    )

    got = [tuple(r) for r in _bpe_merges(spark, sf_dir).collect()]
    want = [tuple(r) for r in con.execute(_BPE_MERGES_SQL).fetchall()]
    assert got == want == [(0, "a", "b", "ab"), (1, "ab", "</w>", "ab</w>")]

    got = [tuple(r) for r in _bpe_segmentation(spark, sf_dir).collect()]
    want = [tuple(r) for r in con.execute(_BPE_SEGMENTATION_SQL).fetchall()]
    # 'ab' -> 1 piece (freq 2); 'cd' -> 'c d </w>' 3 pieces (freq 1)
    assert got == want == [(1, 1, 2), (3, 1, 1)]
