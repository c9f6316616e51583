"""Entity-resolution semantics vs an independent Python replica:
the blocked levenshtein pair set, the component partition (union-find)
and the keep-best survivorship are all re-derived brute-force from the
parquet — certifying the arithmetic, not just engine agreement."""

from __future__ import annotations

import pandas as pd

from tests.conftest import SF_SMOKE


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _load_slice():
    from databeats_spark.registry.linkage import ER_CUST_LIMIT

    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    return cust[cust["c_custkey"] < ER_CUST_LIMIT].reset_index(drop=True)


def _brute_pairs(cust: pd.DataFrame) -> set[tuple[int, int]]:
    from databeats_spark.registry.linkage import ER_NAME_DIST_MAX

    out = set()
    for _, blk in cust.groupby(["c_nationkey", "c_mktsegment"]):
        rows = blk.sort_values("c_custkey")[["c_custkey", "c_name"]].values
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                if _lev(rows[i][1], rows[j][1]) <= ER_NAME_DIST_MAX:
                    out.add((int(rows[i][0]), int(rows[j][0])))
    return out


def test_entity_match_pairs_match_python_levenshtein(spark):
    from databeats_spark.registry import queries

    got = queries()["entity_match_pairs"](spark, SF_SMOKE).toPandas()
    assert set(zip(got["id_a"], got["id_b"])) == _brute_pairs(_load_slice())
    assert (got["name_dist"] >= 1).all()  # distinct keys => distinct names


def test_entity_clusters_match_union_find(spark):
    from databeats_spark.registry import queries

    cust = _load_slice().set_index("c_custkey")
    pairs = _brute_pairs(cust.reset_index())
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups: dict[int, list[int]] = {}
    for node in parent:
        groups.setdefault(find(node), []).append(node)

    got = queries()["entity_clusters"](spark, SF_SMOKE).toPandas().set_index("entity_id")
    assert set(got.index) == set(groups)
    for eid, members in groups.items():
        row = got.loc[eid]
        assert row["n_members"] == len(members)
        best = min(members, key=lambda m: (-cust.loc[m, "c_acctbal"], m))
        assert row["survivor_id"] == best
        expect = round(sum(round(float(cust.loc[m, "c_acctbal"]), 2) for m in members), 2)
        assert abs(row["total_acctbal"] - expect) < 0.01


def test_sorted_neighborhood_candidates_match_pandas_replay(spark):
    """The SNM pair set must equal a literal pandas replay: within each
    nation, sort by (name, id) and compare each row with its previous
    SNM_WINDOW neighbors at levenshtein <= max — pinning the exact
    candidate semantics (including the cross-segment neighbors the
    blocked tier cannot see)."""
    from databeats_spark.registry import queries
    from databeats_spark.registry.linkage import ER_NAME_DIST_MAX, SNM_WINDOW

    got = queries()["sorted_neighborhood_pairs"](spark, SF_SMOKE).toPandas()
    cust = _load_slice()
    expect = set()
    for _, blk in cust.groupby("c_nationkey"):
        rows = blk.sort_values(["c_name", "c_custkey"])[["c_custkey", "c_name"]].values
        for p in range(len(rows)):
            for i in range(1, SNM_WINDOW + 1):
                if p - i < 0:
                    break
                if _lev(rows[p][1], rows[p - i][1]) <= ER_NAME_DIST_MAX:
                    a, b = int(rows[p][0]), int(rows[p - i][0])
                    expect.add((min(a, b), max(a, b)))
    assert set(zip(got["id_a"], got["id_b"])) == expect


def test_entity_kcore_matches_peel_replica_and_reaches_fixpoint(spark):
    """The k-core must equal a literal Python peel (iterate-to-fixpoint
    union of degree filters), which simultaneously proves KCORE_ROUNDS
    is enough at test scale: if the fixed unroll stopped early, the
    fixpoint replica would disagree."""
    from databeats_spark.registry import queries
    from databeats_spark.registry.linkage import KCORE_K

    pairs = _brute_pairs(_load_slice())
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    while True:
        drop = {n for n in alive if len(adj[n] & alive) < KCORE_K}
        if not drop:
            break
        alive -= drop
    expect = {n: len(adj[n] & alive) for n in alive}

    got = queries()["entity_kcore"](spark, SF_SMOKE).toPandas()
    assert dict(zip(got["node"], got["degree"])) == expect
    assert (got["degree"] >= KCORE_K).all()
