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
