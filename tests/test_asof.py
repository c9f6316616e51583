"""asof_join edge semantics: inclusive equality, unmatched lefts,
per-key isolation, deterministic tie-breaks."""

from __future__ import annotations

import pandas as pd

from databeats_spark.operators.joins import asof_join


def _run(spark, left_rows, right_rows, **kw):
    left = spark.createDataFrame(pd.DataFrame(left_rows, columns=["k", "ts", "lid"]))
    right = spark.createDataFrame(pd.DataFrame(right_rows, columns=["k", "ts", "val"]))
    out = asof_join(left, right, on="ts", by=["k"], value_cols=["val"], **kw)
    return {r["lid"]: r["val"] for r in out.collect()}


def test_backward_inclusive(spark):
    got = _run(
        spark,
        [("a", 10, 1), ("a", 20, 2), ("a", 30, 3)],
        [("a", 10, 100), ("a", 25, 200)],
    )
    # ts=10 matches the equal-instant right row (inclusive);
    # ts=20 still sees the ts=10 purchase; ts=30 sees ts=25
    assert got == {1: 100, 2: 100, 3: 200}


def test_unmatched_left_is_null(spark):
    got = _run(spark, [("a", 5, 1), ("a", 50, 2)], [("a", 10, 100)])
    assert got[1] is None
    assert got[2] == 100


def test_keys_are_isolated(spark):
    got = _run(
        spark,
        [("a", 20, 1), ("b", 20, 2)],
        [("a", 10, 100), ("b", 15, 999)],
    )
    assert got == {1: 100, 2: 999}


def test_equal_instant_tie_break(spark):
    # two right rows at the same (k, ts): the LAST in tie-break order wins
    left = [("a", 10, 1)]
    right = [("a", 10, 100), ("a", 10, 300), ("a", 10, 200)]
    got = _run(spark, left, right, right_tie_breakers=["val"])
    assert got == {1: 300}


def test_randomized_vs_pandas_merge_asof(spark):
    # pandas merge_asof (backward, inclusive) is the same contract —
    # a second independent oracle on random data
    import numpy as np

    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], 80),
            "ts": rng.choice(np.arange(0, 1000), 80, replace=False).astype(int),
        }
    ).assign(lid=range(80))
    right = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], 40),
            "ts": rng.choice(np.arange(0, 1000) + 0, 40, replace=False).astype(int),
            "val": rng.integers(0, 1000, 40),
        }
    )
    exp = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts"),
        on="ts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    ).set_index("lid")["val"]

    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame(right)
    out = asof_join(sl, sr, on="ts", by=["k"], value_cols=["val"]).toPandas().set_index("lid")["val"]
    for lid in exp.index:
        e, g = exp[lid], out[lid]
        assert (pd.isna(e) and pd.isna(g)) or e == g, (lid, e, g)


def test_forward_inclusive(spark):
    got = _run(
        spark,
        [("a", 10, 1), ("a", 20, 2), ("a", 30, 3)],
        [("a", 10, 100), ("a", 25, 200)],
        direction="forward",
    )
    # ts=10 matches the equal-instant right row (inclusive);
    # ts=20 looks AHEAD to ts=25; ts=30 has no following purchase
    assert got == {1: 100, 2: 200, 3: None}


def test_randomized_forward_vs_pandas_merge_asof(spark):
    import numpy as np

    rng = np.random.default_rng(13)
    left = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], 80),
            "ts": rng.choice(np.arange(0, 1000), 80, replace=False).astype(int),
        }
    ).assign(lid=range(80))
    right = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], 40),
            "ts": rng.choice(np.arange(0, 1000), 40, replace=False).astype(int),
            "val": rng.integers(0, 1000, 40),
        }
    )
    exp = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts"),
        on="ts",
        by="k",
        direction="forward",
        allow_exact_matches=True,
    ).set_index("lid")["val"]

    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame(right)
    out = (
        asof_join(sl, sr, on="ts", by=["k"], value_cols=["val"], direction="forward")
        .toPandas()
        .set_index("lid")["val"]
    )
    for lid in exp.index:
        e, g = exp[lid], out[lid]
        assert (pd.isna(e) and pd.isna(g)) or e == g, (lid, e, g)
