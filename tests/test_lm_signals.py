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


# --- Good-Turing replica ------------------------------------------------

def test_good_turing_matches_python_replica(spark):
    from databeats_spark.registry import queries

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    per: dict[str, dict[str, int]] = {}
    for r in docs.itertuples():
        d = per.setdefault(r.source, {})
        for w in _tok(r.text):
            if w != "":
                d[w] = d.get(w, 0) + 1
    expect = []
    for src in sorted(per):
        cs = per[src]
        n = sum(cs.values())
        n1 = sum(1 for c in cs.values() if c == 1)
        n2 = sum(1 for c in cs.values() if c == 2)
        r1 = round(2.0 * n2 / n1, 6) if n1 > 0 else 0.0
        expect.append((src, n, len(cs), n1, n2, round(n1 / n, 6), r1))
    got = queries()["good_turing_mass"](spark, SF_SMOKE).toPandas()
    assert [tuple(r) for r in got[["source", "n_tok", "vocab", "n1", "n2"]].values] == [
        e[:5] for e in expect
    ]
    for row, e in zip(got.itertuples(), expect):
        assert abs(row.p0_unseen - e[5]) < 1e-9
        assert abs(row.r1_star - e[6]) < 1e-9


# --- NB overdispersion replica -------------------------------------------

def test_daily_overdispersion_matches_python_replica(spark):
    from databeats_spark.registry import queries

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["day"] = ev["ts"].dt.date
    expect = []
    for et, g in ev.groupby("event_type"):
        cs = g.groupby("day").size()
        d, n, ssq = len(cs), int(cs.sum()), int((cs**2).sum())
        mean = n / d
        var = ssq / d - mean * mean
        nbk = round(mean * mean / (var - mean), 6) if var > mean else 0.0
        expect.append((et, d, n, round(mean, 6), round(var / mean, 6), nbk))
    expect.sort(key=lambda r: r[0])
    got = queries()["daily_count_overdispersion"](spark, SF_SMOKE).toPandas()
    assert [tuple(r) for r in got[["event_type", "n_days", "n_events"]].values] == [
        e[:3] for e in expect
    ]
    for row, e in zip(got.itertuples(), expect):
        assert abs(row.daily_mean - e[3]) < 1e-9
        assert abs(row.vmr - e[4]) < 1e-9
        assert abs(row.nb_k - e[5]) < 1e-9


# --- DSIR replica ---------------------------------------------------------

def test_dsir_matches_python_replica(spark):
    import hashlib

    from databeats_spark.registry import queries
    from databeats_spark.registry.signals import DSIR_BUCKETS, DSIR_TARGET_LANG

    def bucket(f: str) -> int:
        return int(hashlib.md5(f.encode()).hexdigest()[:13], 16) % DSIR_BUCKETS

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    feats: list[tuple[int, str, int]] = []
    for r in docs.itertuples():
        toks = _tok(r.text)
        fs = [w for w in toks if w != ""] + [
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        ]
        feats.extend((int(r.doc_id), r.lang, bucket(f)) for f in fs)
    raw: dict[int, int] = {}
    tgt: dict[int, int] = {}
    for _, lang, b in feats:
        raw[b] = raw.get(b, 0) + 1
        if lang == DSIR_TARGET_LANG:
            tgt[b] = tgt.get(b, 0) + 1
    n_r, n_t = sum(raw.values()), sum(tgt.values())
    per_doc: dict[int, tuple[str, int, float]] = {}
    for doc_id, lang, b in feats:
        s = math.log((tgt.get(b, 0) + 1) / (n_t + DSIR_BUCKETS)) - math.log(
            (raw[b] + 1) / (n_r + DSIR_BUCKETS)
        )
        prev = per_doc.get(doc_id, (lang, 0, 0.0))
        per_doc[doc_id] = (lang, prev[1] + 1, prev[2] + s)
    expect = sorted(
        (d, v[0], v[1], round(v[2], 6)) for d, v in per_doc.items()
    )
    got = queries()["dsir_importance_weights"](spark, SF_SMOKE).toPandas()
    assert [tuple(r) for r in got[["doc_id", "lang", "n_feat"]].values] == [
        e[:3] for e in expect
    ]
    for row, e in zip(got.itertuples(), expect):
        assert abs(row.log_ir - e[3]) < 1e-8
    # semantics: target-language docs must score higher on average than
    # the rest (the whole point of importance resampling)
    g = got.groupby(got["lang"] == DSIR_TARGET_LANG)["log_ir"].mean()
    assert g[True] > g[False]


# --- source-lang MI replica -----------------------------------------------

def test_source_lang_mi_matches_python_replica(spark):
    from databeats_spark.registry import queries

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    cells = docs.groupby(["source", "lang"]).size()
    n = int(cells.sum())
    rows = cells.groupby("source").sum()
    cols = cells.groupby("lang").sum()
    mi = chi2 = 0.0
    for (src, lang), c in cells.items():
        r, s = int(rows[src]), int(cols[lang])
        mi += c / n * math.log(c * n / (r * s))
        e = r * s / n
        chi2 += (c - e) ** 2 / e
    kmin = min(len(rows), len(cols)) - 1
    got = queries()["source_lang_mi"](spark, SF_SMOKE).toPandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert int(row["n_docs"]) == n
    assert int(row["n_src"]) == len(rows)
    assert int(row["n_lang"]) == len(cols)
    assert abs(row["mi_nats"] - round(mi, 6)) < 1e-6
    assert abs(row["g_stat"] - round(2.0 * n * mi, 6)) < 1e-4
    assert abs(row["chi2"] - round(chi2, 6)) < 1e-4
    assert abs(row["cramers_v"] - round(math.sqrt(chi2 / (n * kmin)), 6)) < 1e-6
    assert row["mi_nats"] >= 0.0  # MI is non-negative by Gibbs


def test_mi_zero_under_planted_independence(spark, tmp_path):
    """A perfectly balanced source x lang table must read MI = chi2 = 0."""
    from databeats_spark.registry.signals import _source_lang_mi

    rows = []
    did = 0
    for src in ("a", "b"):
        for lang in ("en", "zh"):
            for _ in range(10):
                rows.append((did, "t", lang, src, 5))
                did += 1
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(f"{tmp_path}/sf/documents.parquet")
    got = _source_lang_mi(spark, f"{tmp_path}/sf").toPandas().iloc[0]
    assert got["mi_nats"] == 0.0
    assert got["chi2"] == 0.0
    assert got["cramers_v"] == 0.0


# --- Heaps exponent replica (r11) -------------------------------------------

def _heaps_replica():
    from databeats_spark.registry.signals import HEAPS_DECILES

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")[
        ["doc_id", "source", "text"]
    ]
    out = []
    for src, g in docs.sort_values("doc_id").groupby("source"):
        toks_per_doc = [
            [w for w in str(t).split(" ") if w != ""] for t in g.text
        ]
        # docs with zero tokens never enter the per-doc aggregate
        toks_per_doc = [t for t in toks_per_doc if t]
        n = len(toks_per_doc)
        seen: set[str] = set()
        cum_tok = cum_voc = 0
        curve = []
        for toks in toks_per_doc:
            cum_tok += len(toks)
            for w in toks:
                if w not in seen:
                    seen.add(w)
                    cum_voc += 1
            curve.append((cum_tok, cum_voc))
        pts = []
        for j in range(1, HEAPS_DECILES + 1):
            c = int(math.floor((j * n + 9) / 10.0))
            pts.append(curve[c - 1])
        p = float(len(pts))
        sx = sum(math.log(a) for a, _ in pts)
        sy = sum(math.log(b) for _, b in pts)
        sxy = sum(math.log(a) * math.log(b) for a, b in pts)
        sxx = sum(math.log(a) ** 2 for a, _ in pts)
        beta = (p * sxy - sx * sy) / (p * sxx - sx * sx)
        lnk = (sy - beta * sx) / p
        out.append((src, n, curve[-1][0], curve[-1][1], beta, lnk))
    return out


def test_heaps_exponent_matches_python_replica(spark):
    from databeats_spark.registry import queries

    got = queries()["heaps_exponent_by_source"](spark, SF_SMOKE).toPandas()
    expect = _heaps_replica()
    assert list(got.source) == [e[0] for e in expect]
    assert list(got.n_docs) == [e[1] for e in expect]
    assert list(got.n_tokens) == [e[2] for e in expect]
    assert list(got.vocab) == [e[3] for e in expect]
    for gb, gl, (_, _, _, _, beta, lnk) in zip(
        got.heaps_beta, got.heaps_lnk, expect
    ):
        assert abs(gb - beta) < 2e-6 and abs(gl - lnk) < 2e-6


def test_heaps_exponent_separates_template_from_rich_text(spark, tmp_path):
    """Planted corpora: a source of 30 identical template docs has a
    near-zero vocabulary-growth exponent (V saturates at doc 1); a
    source whose every token is globally unique grows V linearly
    (beta ~= 1). The ordering is the template-collapse signal."""
    from databeats_spark.registry.signals import _heaps_exponent_by_source

    rows = []
    did = 0
    tmpl = " ".join(f"w{i}" for i in range(20))
    for _ in range(30):
        rows.append((did, tmpl, "en", "tmpl", len(tmpl)))
        did += 1
    for d in range(30):
        text = " ".join(f"u{d}x{i}" for i in range(20))
        rows.append((did, text, "en", "rich", len(text)))
        did += 1
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(f"{tmp_path}/sf/documents.parquet")

    got = (
        _heaps_exponent_by_source(spark, f"{tmp_path}/sf")
        .toPandas()
        .set_index("source")
    )
    assert got.loc["rich", "heaps_beta"] > 0.95
    assert got.loc["tmpl", "heaps_beta"] < 0.1


# --- RAKE keyphrases replica (r11) ------------------------------------------

def _rake_replica():
    import re
    from collections import defaultdict

    from databeats_spark.registry.signals import (
        RAKE_MAX_PHRASE,
        RAKE_STOPWORDS,
        RAKE_TOP,
    )

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")[
        ["doc_id", "source", "text"]
    ]
    stop = set(RAKE_STOPWORDS)
    occs = defaultdict(list)  # source -> list of phrase tuples
    for r in docs.itertuples():
        toks = [w for w in re.split(r"\s+", str(r.text).strip()) if w]
        run: list[str] = []
        for t in toks + ["the"]:  # sentinel flush
            if t in stop:
                if run and len(run) <= RAKE_MAX_PHRASE:
                    occs[r.source].append(tuple(run))
                run = []
            else:
                run.append(t)
    out = {}
    for src, phrases in occs.items():
        freq: dict[str, int] = defaultdict(int)
        deg: dict[str, int] = defaultdict(int)
        for p in phrases:
            for w in p:
                freq[w] += 1
                deg[w] += len(p)
        scored = defaultdict(lambda: [0, 0.0])  # phrase -> [n, score]
        for p in phrases:
            s = 0.0
            for w in p:  # ordered fold, same order as the engines
                s += deg[w] / freq[w]
            key = " ".join(p)
            scored[key][0] += 1
            scored[key][1] = s
        ranked = sorted(scored.items(), key=lambda kv: (-kv[1][1], kv[0]))
        out[src] = [
            (i + 1, k, v[0], v[1]) for i, (k, v) in enumerate(ranked[:RAKE_TOP])
        ]
    return out


def test_rake_keyphrases_matches_python_replica(spark):
    from databeats_spark.registry import queries

    got = queries()["rake_keyphrases"](spark, SF_SMOKE).toPandas()
    expect = _rake_replica()
    assert set(got.source) == set(expect)
    for src, rows in expect.items():
        g = got[got.source == src].sort_values("rank")
        assert [
            (r.rank, r.phrase, r.n_occurrences) for r in g.itertuples()
        ] == [(rk, ph, n) for rk, ph, n, _ in rows]
        for r, (_, _, _, s) in zip(g.itertuples(), rows):
            assert abs(r.score - s) < 2e-6


def test_rake_planted_phrase_outranks_scattered_words(spark, tmp_path):
    """A repeated multiword phrase accumulates its words' degree mass
    and must outrank equally frequent but isolated single words."""
    from databeats_spark.registry.signals import _rake_keyphrases

    rows = []
    for d in range(10):
        text = "the neural scaling laws of solo and noise%d the" % d
        rows.append((d, text, "en", "s", len(text)))
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(f"{tmp_path}/sf/documents.parquet")

    got = _rake_keyphrases(spark, f"{tmp_path}/sf").toPandas()
    assert got.iloc[0].phrase == "neural scaling laws"
    assert got.iloc[0].n_occurrences == 10
