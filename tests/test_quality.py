"""Deequ-style expectations operator: counts, null handling, one-scan plan."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from databeats_spark.operators.quality import expect


def test_violation_counts_and_null_handling(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 50.0)], "id: long, v: double"
    )
    out = {
        r["rule"]: r
        for r in expect(
            df,
            {
                "v_positive": F.col("v") > 0,
                "v_not_null": F.col("v").isNotNull(),
                "id_small": F.col("id") <= 4,
            },
        ).collect()
    }
    # NULL comparison result counts as a violation (unevaluable = failed)
    assert out["v_positive"]["n_violations"] == 2  # -5.0 and NULL
    assert out["v_not_null"]["n_violations"] == 1
    assert out["id_small"]["n_violations"] == 0
    assert all(r["n_rows"] == 4 for r in out.values())
    assert out["v_positive"]["violation_rate"] == 0.5


def test_all_rules_run_in_one_scan(spark):
    df = spark.range(100).withColumn("v", F.col("id") * 2.0)
    checked = expect(
        df, {f"r{i}": F.col("v") >= i for i in range(10)}
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        checked.explain("formatted")
    plan = buf.getvalue()
    # ten rules, ONE aggregate pass: a single exchange to the final agg
    # (formatted output lists each node twice: tree + details)
    assert plan.count("Exchange") <= 2
    assert plan.count("Scan") <= 2
