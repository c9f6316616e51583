"""Semantics pin for adamic_adar_links: brute-force pure-Python
replica (edge set, degree cap, pairwise Σ 1/ln(deg)) plus a planted
pin that a shared NICHE part outscores a shared popular part."""

from __future__ import annotations

import itertools
import math

import pandas as pd

from tests.conftest import SF_SMOKE


def _aa_replica():
    from databeats_spark.registry.mining import (
        AA_MAX_DEG,
        AA_MIN_DEG,
        AA_TOP,
    )

    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")[
        ["o_orderkey", "o_custkey"]
    ]
    line = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ]
    edges = {
        (int(r.o_custkey), int(r.l_partkey))
        for r in orders.merge(
            line, left_on="o_orderkey", right_on="l_orderkey"
        ).itertuples()
    }
    by_part: dict[int, list[int]] = {}
    for u, p in edges:
        by_part.setdefault(p, []).append(u)
    scores: dict[tuple[int, int], tuple[int, float]] = {}
    for p, us in by_part.items():
        if not (AA_MIN_DEG <= len(us) <= AA_MAX_DEG):
            continue
        wt = 1.0 / math.log(float(len(us)))
        for u1, u2 in itertools.combinations(sorted(us), 2):
            n, s = scores.get((u1, u2), (0, 0.0))
            scores[(u1, u2)] = (n + 1, s + wt)
    rows = [
        (u1, u2, n, round(s, 6)) for (u1, u2), (n, s) in scores.items()
    ]
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:AA_TOP]


def test_adamic_adar_matches_python_replica(spark):
    from databeats_spark.registry import queries

    got = queries()["adamic_adar_links"](spark, SF_SMOKE).toPandas()
    expect = _aa_replica()
    assert [tuple(r) for r in got[["u1", "u2", "n_common"]].values] == [
        e[:3] for e in expect
    ]
    for got_s, e in zip(got["aa_score"], expect):
        assert abs(got_s - e[3]) < 1e-9


def test_adamic_adar_weights_niche_over_popular(spark, tmp_path):
    """Two customer pairs each share exactly one part; the pair sharing
    the 2-degree niche part must outscore the pair sharing the
    high-degree popular part (the 1/ln(deg) point)."""
    from databeats_spark.registry.mining import _adamic_adar_links

    # part 1: bought by customers 1,2 only (deg 2 — niche)
    # part 2: bought by customers 3,4 and 10 bystanders (deg 12 — popular)
    orders, lines, ok = [], [], 0
    for cust, parts in (
        (1, [1]),
        (2, [1]),
        (3, [2]),
        (4, [2]),
        *[(100 + i, [2]) for i in range(10)],
    ):
        ok += 1
        orders.append((ok, cust))
        for p in parts:
            lines.append((ok, p))
    spark.createDataFrame(
        [(o, c, "O", 1.0, None, "1-URGENT") for o, c in orders],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(f"{tmp_path}/sf/orders.parquet")
    spark.createDataFrame(
        lines, "l_orderkey bigint, l_partkey bigint"
    ).write.parquet(f"{tmp_path}/sf/lineitem.parquet")

    got = _adamic_adar_links(spark, f"{tmp_path}/sf").toPandas()
    scores = {(r.u1, r.u2): r.aa_score for r in got.itertuples()}
    assert scores[(1, 2)] > scores[(3, 4)]
    assert scores[(1, 2)] == round(1.0 / math.log(2.0), 6)


# --- LPA replica -----------------------------------------------------------

def _lpa_replica():
    """Synchronous LPA over the same 3-gram Jaccard graph, LPA_ROUNDS
    rounds, mode-of-neighbors with smallest-label ties."""
    from databeats_spark.registry.documents import (
        JACCARD_THRESHOLD,
        PAIR_DOC_LIMIT,
    )
    from databeats_spark.registry.mining import LPA_ROUNDS

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    docs = docs[docs.doc_id < PAIR_DOC_LIMIT]
    shingles = {}
    for r in docs.itertuples():
        toks = [w for w in str(r.text).split(" ") if w != ""]
        shingles[int(r.doc_id)] = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
    ids = sorted(shingles)
    adj: dict[int, set[int]] = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = shingles[a], shingles[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            if inter and inter / len(sa | sb) >= JACCARD_THRESHOLD:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(LPA_ROUNDS):
        new = {}
        for n, nbrs in adj.items():
            counts: dict[int, int] = {}
            for m in nbrs:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            new[n] = min(
                counts, key=lambda lab: (-counts[lab], lab)
            )
        labels = new
    out = sorted((n, lab) for n, lab in labels.items())
    sizes: dict[int, int] = {}
    for _, lab in out:
        sizes[lab] = sizes.get(lab, 0) + 1
    return [(n, lab, sizes[lab]) for n, lab in sorted(out, key=lambda x: (x[1], x[0]))]


def test_lpa_matches_python_replica(spark):
    from databeats_spark.registry import queries

    got = queries()["lpa_communities"](spark, SF_SMOKE).toPandas()
    expect = _lpa_replica()
    assert [tuple(r) for r in got[["doc_id", "label", "n_members"]].values] == expect


def test_lpa_separates_planted_communities(spark, tmp_path):
    """Two dense near-dup cliques with no cross edges must land in two
    distinct labels (and a clique's label is its smallest member id)."""
    from databeats_spark.registry.mining import _lpa_communities

    base_a = " ".join(f"alpha{i}" for i in range(30))
    base_b = " ".join(f"beta{i}" for i in range(30))
    rows = []
    for k in range(3):  # clique A: docs 0-2, near-identical
        rows.append((k, base_a + f" tail{k}", "s", 200))
    for k in range(3):  # clique B: docs 3-5
        rows.append((3 + k, base_b + f" tip{k}", "s", 200))
    spark.createDataFrame(
        rows, "doc_id bigint, text string, source string, n_chars int"
    ).write.parquet(f"{tmp_path}/sf/documents.parquet")

    got = _lpa_communities(spark, f"{tmp_path}/sf").toPandas()
    by_label = got.groupby("label")["doc_id"].apply(set).to_dict()
    assert by_label == {0: {0, 1, 2}, 3: {3, 4, 5}}
    assert set(got["n_members"]) == {3}
