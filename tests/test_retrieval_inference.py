"""Semantics pins for the retrieval + inference tiers: BM25, RRF
fusion, the Kaplan-Meier curve, and the Poisson-bootstrap CI are each
re-derived brute-force in Python from the parquet — certifying the
arithmetic (formula, ordering, weight derivation), not just the
Spark↔DuckDB engine agreement the differential harness already gives.
"""

from __future__ import annotations

import hashlib
import math
import re

import pandas as pd

from tests.conftest import SF_SMOKE


# --- BM25 replica ------------------------------------------------------

def _bm25_replica():
    from databeats_spark.registry.retrieval import BM25_B, BM25_K1, BM25_TERMS

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    toks = {
        int(r.doc_id): re.split(r"\s+", str(r.text).strip())
        for r in docs.itertuples()
    }
    n_docs = len(toks)
    sum_dl = sum(len(t) for t in toks.values())
    avgdl = float(sum_dl) / float(n_docs)
    df = {
        term: sum(1 for t in toks.values() if term in t) for term in BM25_TERMS
    }
    scored = []
    for doc_id, t in toks.items():
        dl = len(t)
        score = 0.0
        hits = 0
        for term in BM25_TERMS:  # fixed left-to-right fold, as in the plan
            tf = t.count(term)
            hits += tf
            idf = math.log(
                1.0 + (float(n_docs) - float(df[term]) + 0.5) / (float(df[term]) + 0.5)
            )
            score = score + idf * (float(tf) * (BM25_K1 + 1.0)) / (
                float(tf) + BM25_K1 * (1.0 - BM25_B + BM25_B * (float(dl) / avgdl))
            )
        if hits > 0:
            scored.append((doc_id, dl, hits, score))
    scored.sort(key=lambda x: (-x[3], x[0]))
    return scored


def test_bm25_matches_python_replica(spark):
    from databeats_spark.registry import queries
    from databeats_spark.registry.retrieval import BM25_TOP

    got = queries()["bm25_topk"](spark, SF_SMOKE).toPandas()
    expect = _bm25_replica()[:BM25_TOP]
    assert list(got["doc_id"]) == [e[0] for e in expect]
    assert list(got["dl"]) == [e[1] for e in expect]
    assert list(got["n_hits"]) == [e[2] for e in expect]
    for got_s, e in zip(got["score"], expect):
        assert got_s == round(e[3], 6)
    assert list(got["rank"]) == list(range(1, len(expect) + 1))


# --- RRF replica ---------------------------------------------------------

def _fold_dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):  # left-to-right, matching functions.similarity.dot
        acc = acc + float(x) * float(y)
    return acc


def test_rrf_fusion_matches_python_replica(spark):
    from databeats_spark.registry import queries
    from databeats_spark.registry.retrieval import (
        RRF_K, RRF_POOL, RRF_QUERY_VEC, RRF_TOP,
    )

    lex_pool = [d for d, _, _, _ in [(e[0], *e[1:]) for e in _bm25_replica()]][:RRF_POOL]
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    vecs = {int(r.vec_id): list(r.embedding) for r in emb.itertuples()}
    q = vecs[RRF_QUERY_VEC]
    nq = math.sqrt(_fold_dot(q, q))
    cos = []
    for vid, v in vecs.items():
        if vid == RRF_QUERY_VEC:
            continue
        cs = _fold_dot(q, v) / (nq * math.sqrt(_fold_dot(v, v)))
        cos.append((vid, cs))
    cos.sort(key=lambda x: (-x[1], x[0]))
    dense_pool = [vid for vid, _ in cos[:RRF_POOL]]

    lex_rank = {d: i + 1 for i, d in enumerate(lex_pool)}
    dense_rank = {d: i + 1 for i, d in enumerate(dense_pool)}
    fused = []
    for d in set(lex_rank) | set(dense_rank):
        s = (1.0 / (float(RRF_K) + lex_rank[d]) if d in lex_rank else 0.0) + (
            1.0 / (float(RRF_K) + dense_rank[d]) if d in dense_rank else 0.0
        )
        fused.append((d, s))
    fused.sort(key=lambda x: (-x[1], x[0]))

    got = queries()["rrf_hybrid_topk"](spark, SF_SMOKE).toPandas()
    assert list(got["doc_id"]) == [d for d, _ in fused[:RRF_TOP]]
    for got_s, (_, s) in zip(got["rrf_score"], fused[:RRF_TOP]):
        assert got_s == round(s, 6)
    # fusion actually mixes: the fused head cites both systems
    assert got["lex_rank"].notna().any() and got["dense_rank"].notna().any()


# --- Kaplan-Meier replica ----------------------------------------------

def test_kaplan_meier_matches_python_replica(spark):
    from databeats_spark.registry import queries

    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    orders = orders.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    cutoff = orders["o_orderdate"].max()
    durs = []
    for _, grp in orders.groupby("o_custkey"):
        dates = list(grp["o_orderdate"])
        if len(dates) >= 2:
            durs.append(((dates[1] - dates[0]).days // 7, 1))
        else:
            durs.append(((cutoff - dates[0]).days // 7, 0))
    km: dict[int, list[int]] = {}
    for wk, ev in durs:
        km.setdefault(wk, [0, 0])[0 if ev else 1] += 1
    total = len(durs)
    surv, risk = 1.0, total
    expect = []
    for wk in sorted(km):
        d, c = km[wk]
        surv = surv * (1.0 - float(d) / float(risk))
        expect.append((wk, risk, d, c, round(surv, 6)))
        risk -= d + c
    assert risk == 0

    got = queries()["kaplan_meier_retention"](spark, SF_SMOKE).toPandas()
    assert [tuple(r) for r in got.itertuples(index=False)] == expect
    # the curve is a survival function: monotone nonincreasing from <=1
    assert (got["survival"].diff().dropna() <= 1e-12).all()
    assert got["survival"].iloc[0] <= 1.0


# --- Poisson bootstrap replica -------------------------------------------

def _pois_weight(doc_id: int, r: int) -> int:
    from databeats_spark.registry.inference import _POIS_CDF

    h = hashlib.md5(f"{doc_id}:{r}".encode()).hexdigest()
    u = int(h[:13], 16) / 4503599627370496.0
    for k, c in enumerate(_POIS_CDF):
        if u < float(c):
            return k
    return len(_POIS_CDF)


def test_poisson_bootstrap_matches_python_replica(spark):
    from databeats_spark.registry import queries
    from databeats_spark.registry.inference import (
        BOOT_HI_RANK, BOOT_LO_RANK, R_BOOT,
    )

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    got = queries()["poisson_bootstrap_ci"](spark, SF_SMOKE).toPandas()
    for src, grp in docs.groupby("source"):
        means = []
        for r in range(R_BOOT):
            sw = swx = 0
            for row in grp.itertuples():
                w = _pois_weight(int(row.doc_id), r)
                sw += w
                swx += w * int(row.n_chars)
            means.append((float(swx) / float(sw), r))
        means.sort()
        lo = round(means[BOOT_LO_RANK - 1][0], 6)
        hi = round(means[BOOT_HI_RANK - 1][0], 6)
        point = round(float(grp["n_chars"].sum()) / float(len(grp)), 6)
        row = got[got["source"] == src].iloc[0]
        assert row["n_docs"] == len(grp)
        assert row["mean_chars"] == point
        assert row["ci_lo"] == lo and row["ci_hi"] == hi
        # method sanity, not just parity: the CI brackets the estimate
        assert lo <= point <= hi
        assert hi > lo
