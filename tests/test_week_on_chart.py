"""Golden tests for week_on_chart — the hardest semantic-parity item
(SURVEY §7 step 3). Hand-computed edge cases + a randomized
differential test against a clean-room pandas replica of the
reference algorithm."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from databeats_spark.operators.charts import week_on_chart
from tests.spotify_fixtures import T0, WEEK, gen_spotify, reference_week_on_chart

K = 3  # tiny chart size so hand cases are easy


def _df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["entity", "popularity", "timestamp"])
    sdf = spark.createDataFrame(pdf)
    return sdf.withColumn("ts", F.timestamp_seconds("timestamp"))


def _charts(spark, rows, k=K):
    out = week_on_chart(_df(spark, rows), "entity", ts_col="ts", k=k)
    return {r["entity"]: r["chart"] for r in out.collect()}


def w(i: int) -> int:
    return T0 + i * WEEK


def test_full_streak(spark):
    # on a k=3 chart every week for 4 weeks → chart = 4
    rows = [("a", 90, w(i)) for i in range(4)]
    rows += [("b", 50, w(i)) for i in range(4)]  # also charts (only 2 entities)
    assert _charts(spark, rows) == {"a": 4, "b": 4}


def test_off_chart_resets(spark):
    # 4 entities, k=3: 'd' is 4th every week → never charts → 0
    rows = []
    for i in range(3):
        rows += [("a", 90, w(i)), ("b", 80, w(i)), ("c", 70, w(i)), ("d", 10, w(i))]
    assert _charts(spark, rows) == {"a": 3, "b": 3, "c": 3, "d": 0}


def test_mid_series_drop_resets(spark):
    # 'b' off-chart in week 1 (rank 4), back on weeks 2-3 → streak 2
    rows = [("a", 90, w(0)), ("x", 85, w(0)), ("y", 84, w(0)), ("b", 10, w(0)),
            ("a", 90, w(1)), ("b", 80, w(1)),
            ("a", 90, w(2)), ("b", 80, w(2))]
    got = _charts(spark, rows)
    assert got["b"] == 2
    assert got["a"] == 3


def test_exact_7_day_gap_continues(spark):
    # weekly cadence == exactly 7-day gaps → continues (dag.py:143 "<= 7")
    rows = [("a", 90, w(0)), ("a", 90, w(1))]
    assert _charts(spark, rows)["a"] == 2


def test_14_day_gap_resets_streak(spark):
    # 'a' appears weeks 0,1 then skips week 2, returns week 3 (gap 14d):
    # the reference walk zeroes ON the gap row itself (dag.py:145-146 —
    # `else: chart = 0` fires even though 'a' is on week 3's chart), so
    # the streak is 0; only the NEXT consecutive week would count again.
    rows = [("a", 90, w(0)), ("a", 90, w(1)), ("a", 90, w(3))]
    rows += [("z", 50, w(i)) for i in range(4)]  # keeps every week populated
    got = _charts(spark, rows)
    assert got["a"] == 0
    assert got["z"] == 4
    # ...and the next consecutive on-chart week does restart the count
    rows2 = rows + [("a", 90, w(4)), ("z", 50, w(4))]
    got2 = _charts(spark, rows2)
    assert got2["a"] == 1
    assert got2["z"] == 5


def test_stale_entity_zeroed(spark):
    # 'a' charts weeks 0-1 but the series continues to week 3 without it:
    # newest - last(a) = 14d >= 7 → zeroed (dag.py:148-152)
    rows = [("a", 90, w(0)), ("a", 90, w(1))]
    rows += [("z", 50, w(i)) for i in range(4)]
    got = _charts(spark, rows)
    assert got["a"] == 0
    assert got["z"] == 4


def test_single_snapshot(spark):
    rows = [("a", 90, w(0)), ("b", 10, w(0)), ("c", 20, w(0)), ("d", 30, w(0))]
    got = _charts(spark, rows)
    assert got["a"] == 1  # charted once
    assert got["b"] == 0  # rank 4 at k=3


def test_rank_k_tie_cut_deterministic(spark):
    # 4 entities tie at popularity 50; k=3 keeps the 3 smallest entity
    # ids (pandas stable sort after (entity, ts) pre-sort)
    rows = [(e, 50, w(0)) for e in ["a", "b", "c", "d"]]
    got = _charts(spark, rows)
    assert got == {"a": 1, "b": 1, "c": 1, "d": 0}


def test_latest_attributes_kept(spark):
    # output carries the NEWEST row's attribute values (W2)
    pdf = pd.DataFrame(
        {"entity": ["a", "a"], "popularity": [90, 70], "timestamp": [w(0), w(1)]}
    )
    sdf = spark.createDataFrame(pdf).withColumn("ts", F.timestamp_seconds("timestamp"))
    row = week_on_chart(sdf, "entity", ts_col="ts", k=3).collect()[0]
    assert row["popularity"] == 70


@pytest.mark.parametrize("seed", [0, 7])
def test_differential_vs_reference_replica(spark, seed):
    tracks, _, _, _ = gen_spotify(n_tracks=120, n_weeks=6, seed=seed)
    expected = reference_week_on_chart(tracks, "track_id", k=50)
    exp = dict(zip(expected["track_id"], expected["chart"]))

    sdf = (
        spark.createDataFrame(tracks)
        .withColumn("ts", F.timestamp_seconds("timestamp"))
        .dropDuplicates(["track_id", "ts"])
    )
    got_df = week_on_chart(sdf, "track_id", ts_col="ts", k=50)
    got = {r["track_id"]: r["chart"] for r in got_df.collect()}

    assert got == exp
