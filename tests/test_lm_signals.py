"""Semantics pins for the r10 LM-signal additions: stupid_backoff_logprob
and term_burstiness are re-derived brute-force in pure Python from the
parquet (certifying formula/split/ordering, not just Spark↔DuckDB
agreement), and the backoff/escape branches — which a closed synthetic
vocabulary never exercises at any SF — are pinned on a planted corpus.
"""

from __future__ import annotations

import math

import pandas as pd

from tests.conftest import SF_SMOKE

ALPHA = 0.4  # Stupid Backoff discount (Brants et al. 2007)


def _tok(text: str) -> list[str]:
    # split(' ') exactly as the plan does — empties kept for the bigram
    # stream, dropped for the unigram stream (the _doc_words contract)
    return str(text).split(" ")


def _backoff_replica():
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    train = docs[docs.doc_id % 2 == 0]
    held = docs[docs.doc_id % 2 == 1]
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    ctx: dict[str, int] = {}
    for text in train.text:
        toks = _tok(text)
        for w in toks:
            if w != "":
                uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
    n1 = sum(uni.values())
    rows = []
    for r in held.itertuples():
        toks = _tok(r.text)
        if len(toks) < 2:
            continue
        n_backoff = n_oov = 0
        logs = []
        for a, b in zip(toks, toks[1:]):
            if (a, b) in bi:
                s = float(bi[(a, b)]) / float(ctx[a])
            elif b in uni:
                n_backoff += 1
                s = ALPHA * float(uni[b]) / float(n1)
            else:
                n_backoff += 1
                n_oov += 1
                s = ALPHA / float(n1)
            logs.append(math.log(s))
        rows.append(
            (
                int(r.doc_id),
                len(toks) - 1,
                n_backoff,
                n_oov,
                round(sum(logs) / len(logs), 6),
            )
        )
    rows.sort(key=lambda x: x[0])
    return rows


def test_stupid_backoff_matches_python_replica(spark):
    from databeats_spark.registry import queries

    got = queries()["stupid_backoff_logprob"](spark, SF_SMOKE).toPandas()
    expect = _backoff_replica()
    assert list(got["doc_id"]) == [e[0] for e in expect]
    assert list(got["n_bigrams"]) == [e[1] for e in expect]
    assert list(got["n_backoff"]) == [e[2] for e in expect]
    assert list(got["n_oov"]) == [e[3] for e in expect]
    for got_s, e in zip(got["avg_logscore"], expect):
        assert abs(got_s - e[4]) < 1e-9, (got_s, e)


def test_stupid_backoff_backoff_and_escape_branches(spark, tmp_path):
    """Planted corpus where all three score branches fire: the synthetic
    tables have a closed vocabulary, so n_backoff/n_oov are ~0 there and
    hash parity alone would never exercise the backoff arithmetic."""
    from databeats_spark.registry.signals import _stupid_backoff_logprob

    sf_dir = str(tmp_path / "sf")
    spark.createDataFrame(
        [
            (0, "a b a c a b", "s", 11),  # train: uni a:3 b:2 c:1, N=6
            (1, "a b c x", "s", 7),  # held: seen / backoff / escape
        ],
        "doc_id bigint, text string, source string, n_chars int",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    got = _stupid_backoff_logprob(spark, sf_dir).toPandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert int(row["n_bigrams"]) == 3
    assert int(row["n_backoff"]) == 2  # (b,c) backoff + (c,x) escape
    assert int(row["n_oov"]) == 1  # x never seen in training
    # (a,b): c_b=2 over ctx(a)=3; (b,c): 0.4*c(c)/N = 0.4/6; (c,x): 0.4/6
    expect = (
        math.log(2.0 / 3.0) + math.log(0.4 * 1.0 / 6.0) + math.log(0.4 / 6.0)
    ) / 3.0
    assert abs(row["avg_logscore"] - round(expect, 6)) < 1e-9


def _burstiness_replica():
    from databeats_spark.registry.signals import BURST_MIN_COUNT, BURST_TOP

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    n_docs = len(docs)
    per_doc: dict[tuple[int, str], int] = {}
    for r in docs.itertuples():
        for w in _tok(r.text):
            if w != "":
                per_doc[(int(r.doc_id), w)] = per_doc.get((int(r.doc_id), w), 0) + 1
    by_w: dict[str, list[int]] = {}
    for (_, w), c in per_doc.items():
        by_w.setdefault(w, []).append(c)
    rows = []
    for w, cs in by_w.items():
        n_total = sum(cs)
        if n_total < BURST_MIN_COUNT:
            continue
        df = len(cs)
        sum_sq = sum(c * c for c in cs)
        vmr = round(float(sum_sq) / n_total - float(n_total) / n_docs, 6)
        rows.append((w, n_total, df, vmr, round(float(n_total) / df, 6)))
    rows.sort(key=lambda x: (-x[3], x[0]))
    return rows[:BURST_TOP]


def test_term_burstiness_matches_python_replica(spark):
    from databeats_spark.registry import queries

    got = queries()["term_burstiness"](spark, SF_SMOKE).toPandas()
    expect = _burstiness_replica()
    assert list(got["w"]) == [e[0] for e in expect]
    assert list(got["n_total"]) == [e[1] for e in expect]
    assert list(got["df"]) == [e[2] for e in expect]
    for got_v, e in zip(got["vmr"], expect):
        assert abs(got_v - e[3]) < 1e-9
    for got_b, e in zip(got["burstiness"], expect):
        assert abs(got_b - e[4]) < 1e-9


def test_burstiness_separates_planted_bursty_term(spark, tmp_path):
    """A term concentrated in one doc must out-score a term spread
    uniformly at the same corpus frequency (the Church-Gale point)."""
    from databeats_spark.registry.signals import _term_burstiness

    sf_dir = str(tmp_path / "sf")
    spread = [(i, "flat " + " ".join(["pad"] * 3), "s", 20) for i in range(8)]
    docs = [(8, " ".join(["bursty"] * 8), "s", 60)] + spread
    spark.createDataFrame(
        docs, "doc_id bigint, text string, source string, n_chars int"
    ).write.parquet(f"{sf_dir}/documents.parquet")

    got = _term_burstiness(spark, sf_dir).toPandas().set_index("w")
    assert got.loc["bursty", "vmr"] > got.loc["flat", "vmr"]
    assert got.loc["bursty", "burstiness"] == 8.0
    assert got.loc["flat", "burstiness"] == 1.0
