"""Semantics pins for the r10 uncertainty additions: the jackknife /
delta-method ratio CI and the empirical-Bayes source-rate shrinkage are
re-derived in pure Python/numpy from the parquet, and the shrinkage
direction is pinned on a planted corpus (small noisy sources move
toward the pool; large sources barely move).
"""

from __future__ import annotations

import math

import pandas as pd

from tests.conftest import SF_SMOKE


def _jackknife_replica():
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    orders["day"] = orders["o_orderdate"].dt.date
    # DECIMAL(18,2) day sums — replicate with integer cents
    orders["cents"] = (
        orders["o_totalprice"].map(lambda v: round(v, 2) * 100).round().astype("int64")
    )
    out = []
    for prio, g in orders.groupby("o_orderpriority"):
        cells = g.groupby("day").agg(x=("cents", "sum"), n=("cents", "size"))
        sx, sn, d = int(cells.x.sum()), int(cells.n.sum()), len(cells)
        assert d > 1, "jackknife precondition: more than one day per priority"
        theta = (sx / 100.0) / float(sn)
        theta_i = [
            ((sx - x) / 100.0) / float(sn - n) for x, n in zip(cells.x, cells.n)
        ]
        jmean = sum(theta_i) / d
        sum_dev2 = sum((t - jmean) ** 2 for t in theta_i)
        jk_se = math.sqrt((d - 1) / d * sum_dev2)
        sum_r2 = sum(
            (x / 100.0 - theta * float(n)) ** 2 for x, n in zip(cells.x, cells.n)
        )
        delta_se = math.sqrt(d / (d - 1) * sum_r2) / float(sn)
        out.append((prio, d, sn, theta, jk_se, delta_se))
    out.sort(key=lambda r: r[0])
    return out


def test_jackknife_ratio_ci_matches_python_replica(spark):
    from databeats_spark.registry import queries

    got = queries()["jackknife_ratio_ci"](spark, SF_SMOKE).toPandas()
    expect = _jackknife_replica()
    assert list(got["o_orderpriority"]) == [e[0] for e in expect]
    assert list(got["n_days"]) == [e[1] for e in expect]
    assert list(got["n_orders"]) == [e[2] for e in expect]
    for row, e in zip(got.itertuples(), expect):
        assert abs(row.rev_per_order - e[3]) < 1e-6
        assert abs(row.jk_se - e[4]) < 1e-6
        assert abs(row.delta_se - e[5]) < 1e-6
        assert abs(row.ci_lo - (e[3] - 1.96 * e[4])) < 1e-5
        assert abs(row.ci_hi - (e[3] + 1.96 * e[4])) < 1e-5
        # the two estimators must agree on scale (same data, same unit):
        # a 10x disagreement would mean one formula is wrong
        assert 0.2 < row.jk_se / row.delta_se < 5.0


def _eb_replica():
    from databeats_spark.registry.inference import EB_CHAR_THRESH

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    src = docs.groupby("source").agg(
        n_docs=("doc_id", "size"),
        n_short=("n_chars", lambda s: int((s < EB_CHAR_THRESH).sum())),
    )
    nn, ns, k = int(src.n_docs.sum()), int(src.n_short.sum()), len(src)
    sum_n2 = int((src.n_docs**2).sum())
    pbar = ns / nn
    c = pbar * (1.0 - pbar)
    s1 = sum(
        n * ((s / n) - pbar) ** 2 for n, s in zip(src.n_docs, src.n_short)
    )
    tau2 = max(0.0, (s1 - (k - 1) * c) / (nn - sum_n2 / nn))
    rows = []
    for source, r in src.iterrows():
        y = r.n_short / r.n_docs
        b = c / (c + r.n_docs * tau2)
        rows.append(
            (source, int(r.n_docs), int(r.n_short), y, tau2, b, pbar * b + y * (1 - b))
        )
    rows.sort(key=lambda x: x[0])
    return rows


def test_eb_shrunk_source_rates_matches_python_replica(spark):
    from databeats_spark.registry import queries

    got = queries()["eb_shrunk_source_rates"](spark, SF_SMOKE).toPandas()
    expect = _eb_replica()
    assert list(got["source"]) == [e[0] for e in expect]
    assert list(got["n_docs"]) == [e[1] for e in expect]
    assert list(got["n_short"]) == [e[2] for e in expect]
    for row, e in zip(got.itertuples(), expect):
        assert abs(row.raw_rate - e[3]) < 1e-6
        assert abs(row.tau2 - e[4]) < 1e-6
        assert abs(row.shrink_b - e[5]) < 1e-6
        assert abs(row.shrunk_rate - e[6]) < 1e-6
        # shrunk estimate must land between the raw rate and the pool
        lo, hi = sorted((e[3], sum(x[2] for x in expect) / sum(x[1] for x in expect)))
        assert lo - 1e-9 <= row.shrunk_rate <= hi + 1e-9


def test_eb_shrinkage_pulls_small_sources_harder(spark, tmp_path):
    """Planted corpus: a 4-doc source with an extreme rate shrinks most
    of the way to the pool; a 400-doc source with the same raw rate
    keeps most of its signal (the Efron-Morris point)."""
    from databeats_spark.registry.inference import (
        EB_CHAR_THRESH,
        _eb_shrunk_source_rates,
    )

    short, long = EB_CHAR_THRESH - 10, EB_CHAR_THRESH + 10
    rows = []
    did = 0
    for src, n, n_short in (("big", 400, 300), ("small", 4, 3), ("mid", 100, 20)):
        for i in range(n):
            rows.append((did, "t", src, short if i < n_short else long))
            did += 1
    spark.createDataFrame(
        rows, "doc_id bigint, text string, source string, n_chars bigint"
    ).write.parquet(f"{tmp_path}/sf/documents.parquet")

    got = (
        _eb_shrunk_source_rates(spark, f"{tmp_path}/sf")
        .toPandas()
        .set_index("source")
    )
    assert got.loc["small", "raw_rate"] == got.loc["big", "raw_rate"] == 0.75
    # same raw rate, but the small source moves much further toward pool
    pool_dist_small = abs(got.loc["small", "shrunk_rate"] - 0.75)
    pool_dist_big = abs(got.loc["big", "shrunk_rate"] - 0.75)
    assert pool_dist_small > 4 * pool_dist_big
    assert got.loc["small", "shrink_b"] > got.loc["big", "shrink_b"]


# --- Wilson ranking replica -----------------------------------------------

def test_wilson_ranking_matches_python_replica(spark):
    from databeats_spark.registry import queries
    from databeats_spark.registry.inference import WILSON_MIN_N, WILSON_TOP

    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    rows = []
    for pk, g in li.groupby("l_partkey"):
        n = len(g)
        if n < WILSON_MIN_N:
            continue
        r = int((g["l_returnflag"] == "R").sum())
        p = r / n
        z2 = 1.96 * 1.96
        lb = (
            p
            + z2 / (2.0 * n)
            - 1.96 * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
        ) / (1.0 + z2 / n)
        rows.append((int(pk), n, r, round(p, 6), round(lb, 6)))
    rows.sort(key=lambda x: (-x[4], x[0]))
    expect = rows[:WILSON_TOP]
    got = queries()["wilson_return_ranking"](spark, SF_SMOKE).toPandas()
    assert [tuple(r) for r in got[["l_partkey", "n", "n_ret"]].values] == [
        e[:3] for e in expect
    ]
    for row, e in zip(got.itertuples(), expect):
        assert abs(row.raw_rate - e[3]) < 1e-9
        assert abs(row.wilson_lb - e[4]) < 1e-9
        # the bound must sit strictly below the raw rate (shrinks toward 0)
        assert row.wilson_lb < row.raw_rate


def test_wilson_small_sample_cannot_outrank_large_evidence(spark, tmp_path):
    """3/3 returns must NOT outrank 28/40: the raw rate says 1.0 > 0.7,
    the Wilson lower bound says otherwise (the E. Miller point).
    WILSON_MIN_N is monkeypatched down so the planted 3-trial part
    participates."""
    import databeats_spark.registry.inference as inf

    rows = []
    ok = 0
    for pk, n, r in ((1, 3, 3), (2, 40, 28)):
        for i in range(n):
            ok += 1
            rows.append((ok, pk, "R" if i < r else "N"))
    df = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey", "l_returnflag"])
    sf = str(tmp_path / "wilson_sf")
    spark.createDataFrame(df).write.mode("overwrite").parquet(
        f"{sf}/lineitem.parquet"
    )
    old = inf.WILSON_MIN_N
    inf.WILSON_MIN_N = 3
    try:
        got = inf._wilson_return_ranking(spark, sf).toPandas().set_index("l_partkey")
    finally:
        inf.WILSON_MIN_N = old
    assert got.loc[1, "raw_rate"] > got.loc[2, "raw_rate"]
    assert got.loc[1, "wilson_lb"] < got.loc[2, "wilson_lb"]


# --- Cramér-von Mises replica ----------------------------------------------

def test_cvm_two_sample_matches_python_replica(spark):
    from databeats_spark.registry import queries

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["cents"] = ev["value"].map(lambda v: round(v, 2) * 100).round().astype("int64")
    per_user = ev.groupby("user_id")["cents"].sum()
    arms = {u: u % 2 for u in per_user.index}
    vals = sorted(set(per_user))
    c1 = {v: 0 for v in vals}
    c0 = {v: 0 for v in vals}
    for u, y in per_user.items():
        (c1 if arms[u] == 1 else c0)[y] += 1
    n1, n0 = sum(c1.values()), sum(c0.values())
    f1 = f0 = 0
    t_sum = 0.0
    for v in vals:
        f1 += c1[v]
        f0 += c0[v]
        w = c1[v] + c0[v]
        d = float(f1 * n0 - f0 * n1)
        t_sum += float(w) * d * d
    nn = n1 + n0
    expect_t = round(t_sum / (float(nn) * nn * n1 * n0), 6)
    got = queries()["cvm_two_sample"](spark, SF_SMOKE).toPandas()
    assert len(got) == 1
    assert int(got["n_treated"][0]) == n1
    assert int(got["n_control"][0]) == n0
    assert abs(got["cvm_t"][0] - expect_t) < 1e-9
    # A/A split by id parity: the statistic must sit in the null's
    # ballpark (E[T] ≈ 1/6 + 1/(6N)), not orders of magnitude off
    assert 0.0 <= got["cvm_t"][0] < 2.0


# --- SPRT e-value replica ----------------------------------------------------

def test_sprt_evalue_matches_python_replica(spark):
    from databeats_spark.registry import queries
    from databeats_spark.registry.events import SPRT_ALPHA, SPRT_MDE

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ctl = ev[ev.user_id % 2 == 0]
    p0 = float((ctl.event_type == "purchase").sum()) / len(ctl)
    p1 = min(p0 * (1.0 + SPRT_MDE), 0.99)
    trt = ev[ev.user_id % 2 == 1].copy()
    trt["day"] = trt["ts"].dt.strftime("%Y-%m-%d")
    daily = trt.groupby("day").agg(
        dn=("event_type", "size"),
        ds=("event_type", lambda s: int((s == "purchase").sum())),
    )
    expect = []
    n_t = s_t = 0
    for day, r in daily.sort_index().iterrows():
        n_t += int(r.dn)
        s_t += int(r.ds)
        llr = s_t * math.log(p1 / p0) + (n_t - s_t) * math.log(
            (1.0 - p1) / (1.0 - p0)
        )
        expect.append(
            (day, n_t, s_t, round(llr, 6), llr >= math.log(1.0 / SPRT_ALPHA))
        )
    got = queries()["sprt_evalue_monitor"](spark, SF_SMOKE).toPandas()
    assert list(got["day"]) == [e[0] for e in expect]
    assert list(got["n_t"]) == [e[1] for e in expect]
    assert list(got["s_t"]) == [e[2] for e in expect]
    for row, e in zip(got.itertuples(), expect):
        assert abs(row.log_e - e[3]) < 1e-6
        assert bool(row.decided) == e[4]
    # A/A by id parity must NOT decide (anytime-validity sanity)
    assert not got["decided"].any()


# --- Brier decomposition replica ---------------------------------------------

def test_brier_decomposition_matches_python_replica(spark):
    from databeats_spark.functions.text import LANG_MARKERS
    from databeats_spark.registry import queries
    from databeats_spark.registry.documents import CALIB_BINS

    import re as _re

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    po = []
    for r in docs.itertuples():
        toks = _re.split(r"\s+", str(r.text).strip())
        scores = {
            lang: sum(1 for w in toks if w in marks)
            for lang, marks in LANG_MARKERS.items()
        }
        guess, best = "und", 0
        for lang in LANG_MARKERS:  # first-wins strictly-greater argmax
            if scores[lang] > best:
                guess, best = lang, scores[lang]
        total = sum(scores.values())
        if total == 0:
            continue
        p = (best + 1) / (total + 2)
        o = 1 if guess == r.lang else 0
        b = min(int(CALIB_BINS * (best + 1) / (total + 2)), CALIB_BINS - 1)
        po.append((b, p, o))
    n = len(po)
    obar = sum(o for _, _, o in po) / n
    brier = sum((p - o) ** 2 for _, p, o in po) / n
    rel = res = 0.0
    for b in sorted({x[0] for x in po}):
        members = [(p, o) for bb, p, o in po if bb == b]
        nk = len(members)
        pbar_k = sum(p for p, _ in members) / nk
        obar_k = sum(o for _, o in members) / nk
        rel += nk * (pbar_k - obar_k) ** 2
        res += nk * (obar_k - obar) ** 2
    rel, res = rel / n, res / n
    unc = obar * (1.0 - obar)
    got = queries()["brier_decomposition"](spark, SF_SMOKE).toPandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert int(row["n_docs"]) == n
    assert abs(row["brier"] - round(brier, 6)) < 1e-6
    assert abs(row["reliability"] - round(rel, 6)) < 1e-6
    assert abs(row["resolution"] - round(res, 6)) < 1e-6
    assert abs(row["uncertainty"] - round(unc, 6)) < 1e-6
    # Murphy's identity on the BINNED forecast: binned Brier = REL − RES + UNC
    assert abs((rel - res + unc) - _binned_brier(po)) < 1e-12


def _binned_brier(po):
    """Brier of the bin-averaged forecast — Murphy's identity target."""
    n = len(po)
    out = 0.0
    for b in sorted({x[0] for x in po}):
        members = [(p, o) for bb, p, o in po if bb == b]
        nk = len(members)
        pbar_k = sum(p for p, _ in members) / nk
        out += sum((pbar_k - o) ** 2 for _, o in members)
    return out / n


# --- BH-FDR replica (r11) ---------------------------------------------------

def _zs_tail_p(z: float) -> float:
    """Two-sided p via the Zelen-Severo 26.2.17 polynomial — the SAME
    literals and association order both engines evaluate, so the
    replica is bit-equal, and the polynomial itself is checked against
    math.erfc below (|err| < 7.5e-8 by construction)."""
    az = abs(z)
    t = 1.0 / (1.0 + 0.2316419 * az)
    poly = (
        ((1.330274429 * t + -1.821255978) * t + 1.781477937) * t + -0.356563782
    ) * t + 0.319381530
    return 2.0 * (0.3989422804014327 * math.exp(-az * az / 2.0)) * poly * t


def test_bh_fdr_matches_python_replica(spark):
    from databeats_spark.registry import queries
    from databeats_spark.registry.inference import BH_ALPHA

    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")[
        ["l_partkey", "l_returnflag"]
    ]
    part = pd.read_parquet(f"{SF_SMOKE}/part.parquet")[["p_partkey", "p_brand"]]
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    g = j.groupby("p_brand").agg(
        n=("l_returnflag", "size"),
        r=("l_returnflag", lambda s: int((s == "R").sum())),
    )
    tot_n, tot_r = int(g.n.sum()), int(g.r.sum())
    rows = []
    for brand, row in g.iterrows():
        n, r = int(row.n), int(row.r)
        pb = r / n
        pr = (tot_r - r) / (tot_n - n)
        pp = tot_r / tot_n
        z = (pb - pr) / math.sqrt(pp * (1.0 - pp) * (1.0 / n + 1.0 / (tot_n - n)))
        p = _zs_tail_p(z)
        # the polynomial is a real normal tail, not engine folklore
        assert abs(p - math.erfc(abs(z) / math.sqrt(2.0))) < 1e-6
        rows.append((brand, n, r, z, p))
    rows.sort(key=lambda t: (t[4], t[0]))
    m = len(rows)
    k_star = max(
        (i for i in range(1, m + 1) if rows[i - 1][4] * m <= i * BH_ALPHA),
        default=0,
    )

    got = queries()["bh_fdr_discoveries"](spark, SF_SMOKE).toPandas()
    assert list(got.p_brand) == [t[0] for t in rows]
    assert list(got.n) == [t[1] for t in rows]
    assert list(got.r) == [t[2] for t in rows]
    for got_z, got_p, (_, _, _, z, p) in zip(got.z, got.p_value, rows):
        assert got_z == round(z, 6) and got_p == round(p, 6)
    assert list(got.discovered) == [i + 1 <= k_star for i in range(m)]


def test_bh_fdr_planted_null_and_signal(spark, tmp_path):
    """All-equal-rate corpus yields ZERO discoveries (p ~= 1 for every
    brand); plant one wildly elevated brand and it is discovered at
    rank 1."""
    from databeats_spark.registry.inference import _bh_fdr_discoveries

    def write(tag, brands):
        d = f"{tmp_path}/{tag}"
        li_rows, part_rows = [], []
        lid = 0
        for bi, (brand, n, r) in enumerate(brands):
            part_rows.append((bi, f"name{bi}", brand, "type", 1, 1.0))
            for i in range(n):
                li_rows.append((lid, bi, 0, 1, 1.0, 1.0, 0.0, 0.0,
                                "R" if i < r else "N", "O", "1995-01-01"))
                lid += 1
        spark.createDataFrame(
            part_rows,
            "p_partkey bigint, p_name string, p_brand string, p_type string, "
            "p_size bigint, p_retailprice double",
        ).write.parquet(f"{d}/part.parquet")
        spark.createDataFrame(
            li_rows,
            "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
            "l_linenumber bigint, l_quantity double, l_extendedprice double, "
            "l_discount double, l_tax double, l_returnflag string, "
            "l_linestatus string, l_shipdate string",
        ).write.parquet(f"{d}/lineitem.parquet")
        return d

    null_dir = write("null", [(f"B{i:02d}", 50, 10) for i in range(8)])
    got = _bh_fdr_discoveries(spark, null_dir).toPandas()
    assert not got.discovered.any()
    assert (got.p_value > 0.9).all()

    sig_dir = write(
        "sig", [("HOT", 200, 180)] + [(f"B{i:02d}", 50, 10) for i in range(8)]
    )
    got = _bh_fdr_discoveries(spark, sig_dir).toPandas()
    assert got.iloc[0].p_brand == "HOT" and bool(got.iloc[0].discovered)


# --- permutation test replica (r11) ----------------------------------------

def test_permutation_null_matches_python_replica(spark):
    import hashlib

    from databeats_spark.registry import queries
    from databeats_spark.registry.inference import PERM_K

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")[["user_id", "value"]]
    ev["cents"] = ev.value.map(lambda v: round(v, 2) * 100).round().astype("int64")
    per_user = ev.groupby("user_id").cents.sum()

    def diff_for(arm_of):
        s1 = n1 = s0 = n0 = 0
        for uid, c in per_user.items():
            if arm_of(int(uid)):
                s1 += int(c); n1 += 1
            else:
                s0 += int(c); n0 += 1
        return (s1 / 100.0) / n1 - (s0 / 100.0) / n0

    d_obs = diff_for(lambda u: u % 2 == 1)
    n_ge = 0
    for k in range(1, PERM_K + 1):
        dk = diff_for(
            lambda u, k=k: hashlib.md5(f"{u}:{k}".encode()).hexdigest()[0] < "8"
        )
        if abs(dk) >= abs(d_obs):
            n_ge += 1

    got = queries()["permutation_null_effect"](spark, SF_SMOKE).toPandas()
    assert int(got.n_perms[0]) == PERM_K
    assert int(got.n_ge[0]) == n_ge
    assert got.diff_obs[0] == round(d_obs, 6)
    assert got.p_perm[0] == round((n_ge + 1) / (PERM_K + 1), 6)


def test_permutation_detects_planted_effect(spark, tmp_path):
    """A genuinely shifted treatment arm gets the smallest possible
    permutation p (1/(K+1)); an A/A corpus (labels carry no signal)
    sits well inside its null distribution."""
    import numpy as np

    from databeats_spark.registry.inference import (
        PERM_K,
        _permutation_null_effect,
    )

    rng = np.random.default_rng(7)

    def write(tag, lift):
        d = f"{tmp_path}/{tag}"
        rows = []
        for eid in range(2000):
            uid = eid % 400
            base = float(rng.uniform(1, 5))
            v = base + (lift if uid % 2 == 1 else 0.0)
            rows.append((eid, "2024-01-01 00:00:00", uid, "view", round(v, 2), "{}"))
        spark.createDataFrame(
            rows,
            "event_id bigint, ts string, user_id bigint, event_type string, "
            "value double, props string",
        ).selectExpr(
            "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
            "event_type", "value", "props",
        ).write.parquet(f"{d}/events.parquet")
        return d

    hot = _permutation_null_effect(spark, write("hot", 50.0)).toPandas()
    assert hot.p_perm[0] == round(1 / (PERM_K + 1), 6)
    aa = _permutation_null_effect(spark, write("aa", 0.0)).toPandas()
    assert aa.p_perm[0] > 0.05
