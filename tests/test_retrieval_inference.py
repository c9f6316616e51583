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


def test_ndcg_readout_matches_python_replica(spark):
    """bm25_ranking_quality vs an independent pure-Python NDCG/MRR/P@k
    computation over the same replica scoring (graded rel = distinct
    query terms present)."""
    from databeats_spark.registry import queries
    from databeats_spark.registry.retrieval import (
        BM25_TERMS, NDCG_K, REL_GOOD, REL_POS,
    )

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    toks = {
        int(r.doc_id): re.split(r"\s+", str(r.text).strip())
        for r in docs.itertuples()
    }
    scored = _bm25_replica()  # (doc_id, dl, hits, score) sorted by rank
    rels = {
        doc_id: sum(1 for term in BM25_TERMS if term in toks[doc_id])
        for doc_id, _, _, _ in scored
    }

    def dcg(rel_seq):
        acc = 0.0
        for r, rel in enumerate(rel_seq, start=1):
            acc += (2.0 ** float(rel) - 1.0) / (math.log(float(r) + 1.0) / math.log(2.0))
        return acc

    ranked_rels = [rels[d] for d, _, _, _ in scored[:NDCG_K]]
    ideal_rels = sorted((rels[d] for d, _, _, _ in scored), reverse=True)[:NDCG_K]
    want_dcg, want_idcg = dcg(ranked_rels), dcg(ideal_rels)
    mrr_rank = next(
        (r for r, rel in enumerate(ranked_rels, start=1) if rel >= REL_GOOD), None
    )
    hits_at_k = sum(1 for rel in ranked_rels if rel >= REL_POS)
    n_relevant = sum(1 for rel in rels.values() if rel >= REL_POS)

    got = queries()["bm25_ranking_quality"](spark, SF_SMOKE).collect()[0]
    assert got["k"] == NDCG_K
    assert abs(got["dcg"] - want_dcg) < 1e-6
    assert abs(got["idcg"] - want_idcg) < 1e-6
    assert abs(got["ndcg_at_k"] - want_dcg / want_idcg) < 1e-6
    assert abs(got["mrr"] - (1.0 / mrr_rank if mrr_rank else 0.0)) < 1e-6
    assert abs(got["precision_at_k"] - hits_at_k / float(NDCG_K)) < 1e-6
    assert abs(got["recall_at_k"] - hits_at_k / float(n_relevant)) < 1e-6
    assert got["n_relevant"] == n_relevant
    assert 0.0 < got["ndcg_at_k"] <= 1.0


def test_matryoshka_energy_matches_python_replica(spark):
    """matryoshka_energy_audit vs a pure-Python left-fold replica (same
    summation order as the plan's ordered F.aggregate, so bucket edges
    cannot flip on float noise)."""
    from collections import Counter

    from databeats_spark.registry import queries
    from databeats_spark.registry.vectors import MATRYOSHKA_BUCKETS, MATRYOSHKA_DIMS

    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    want: Counter = Counter()
    for v in emb["embedding"]:
        xs = [float(x) for x in v]

        def ssq(seq):
            acc = 0.0
            for x in seq:
                acc += x * x
            return acc

        den = ssq(xs)
        for d in MATRYOSHKA_DIMS:
            ratio = math.sqrt(ssq(xs[:d]) / den)
            want[(d, math.floor(ratio * float(MATRYOSHKA_BUCKETS)))] += 1

    got = {
        (r["trunc_dim"], r["ratio_bucket"]): r["n_vecs"]
        for r in queries()["matryoshka_energy_audit"](spark, SF_SMOKE).collect()
    }
    assert got == dict(want)
    # sanity of the semantics: larger prefixes retain at least as much
    # energy in aggregate (mean bucket is monotone in d)
    def mean_bucket(d):
        rows = [(b, n) for (dd, b), n in got.items() if dd == d]
        return sum(b * n for b, n in rows) / sum(n for _, n in rows)

    dims = sorted(MATRYOSHKA_DIMS)
    assert mean_bucket(dims[0]) <= mean_bucket(dims[1]) <= mean_bucket(dims[2])
