"""range_join semantics: bucketed equi-join rewrite must equal the
naive non-equi join exactly, including boundary and span edge cases."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from databeats_spark.operators.joins import range_join


def ts(minute, second=0):
    return datetime(2024, 1, 1, 12, minute, second)


def make_points(spark, rows):
    return spark.createDataFrame(rows, "k: long, pid: long, pts: timestamp")


def make_intervals(spark, rows):
    return spark.createDataFrame(rows, "k: long, iid: long, s: timestamp, e: timestamp")


def pairs(df):
    return sorted((r["pid"], r["iid"]) for r in df.collect())


def test_boundaries_inclusive_both_ends(spark):
    points = make_points(
        spark,
        [(1, 1, ts(0)), (1, 2, ts(30)), (1, 3, ts(59, 59)), (1, 4, ts(0, 1))],
    )
    iv = make_intervals(spark, [(1, 10, ts(0), ts(59, 59))])
    got = range_join(points, iv, ["k"], "pts", "s", "e", bucket="15 minutes")
    assert pairs(got) == [(1, 10), (2, 10), (3, 10), (4, 10)]


def test_outside_and_wrong_key_excluded(spark):
    points = make_points(spark, [(1, 1, ts(30)), (2, 2, ts(30))])
    iv = make_intervals(spark, [(1, 10, ts(0), ts(20)), (1, 11, ts(25), ts(35))])
    got = range_join(points, iv, ["k"], "pts", "s", "e", bucket="5 minutes")
    assert pairs(got) == [(1, 11)]


def test_interval_spanning_many_buckets_matches_once(spark):
    points = make_points(spark, [(1, 1, ts(30))])
    iv = make_intervals(spark, [(1, 10, ts(0), ts(59))])
    got = range_join(points, iv, ["k"], "pts", "s", "e", bucket="1 minute")
    # 60-bucket interval, but the pair appears exactly once
    assert pairs(got) == [(1, 10)]


def test_zero_length_interval(spark):
    points = make_points(spark, [(1, 1, ts(30)), (1, 2, ts(31))])
    iv = make_intervals(spark, [(1, 10, ts(30), ts(30))])
    got = range_join(points, iv, ["k"], "pts", "s", "e", bucket="1 hour")
    assert pairs(got) == [(1, 10)]


def test_equals_naive_non_equi_join_on_events(spark):
    from databeats_spark.sources.tables import load_tables
    from tests.conftest import SF_SMOKE

    ev = load_tables(spark, SF_SMOKE, ["events"]).events
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("pid"), F.col("ts").alias("pts")
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("iid"), F.col("ts").alias("e"))
        .withColumn("s", F.col("e") - F.expr("INTERVAL 90 minutes"))
    )
    got = range_join(clicks, purch, ["user_id"], "pts", "s", "e", bucket="37 minutes")
    naive = clicks.join(
        purch,
        (clicks["user_id"] == purch["user_id"])
        & (F.col("pts") >= F.col("s"))
        & (F.col("pts") <= F.col("e")),
    )
    got_pairs = sorted((r["pid"], r["iid"]) for r in got.collect())
    naive_pairs = sorted((r["pid"], r["iid"]) for r in naive.collect())
    assert got_pairs == naive_pairs and len(got_pairs) > 0


def test_plan_is_equi_join_not_nested_loop(spark):
    points = make_points(spark, [(1, 1, ts(0))])
    iv = make_intervals(spark, [(1, 10, ts(0), ts(59))])
    plan = range_join(points, iv, ["k"], "pts", "s", "e")._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
