"""Golden pipeline test: the full ETL plan (§3.1) over Spotify-shaped
fixtures — row counts, schema, chart values vs the reference replica,
retention filtering, and the dual parquet sinks."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from databeats_spark.plans.analytics import audio_comparison, genre_explode_counts, top_tracks_by
from databeats_spark.plans.etl import RETENTION_DAYS, transform, write_history, write_snapshot
from databeats_spark.schemas import AUDIO_FEATURE_COLS
from tests.spotify_fixtures import T0, WEEK, gen_spotify, reference_week_on_chart


def _inputs(spark, n_weeks=8):
    tracks, artists, albums, audio = gen_spotify(n_weeks=n_weeks)
    return (
        spark.createDataFrame(tracks),
        spark.createDataFrame(artists),
        spark.createDataFrame(albums),
        spark.createDataFrame(audio),
        (tracks, artists, albums, audio),
    )


def test_transform_end_to_end(spark):
    st, sa, sal, sau, (tracks, artists, albums, audio) = _inputs(spark)
    as_of = T0 + 8 * WEEK
    out = transform(st, sa, sal, sau, as_of_unix=as_of)

    t = out.tracks.toPandas()
    assert len(t) > 0
    # audio-less tracks dropped (dropna over feature columns)
    assert not t[list(AUDIO_FEATURE_COLS)].isna().any().any()
    # chart column present and within [0, n_weeks]
    assert t["chart"].between(0, 8).all()
    # timestamp restored to unix long at the edge
    assert t["timestamp"].between(T0, as_of).all()

    # chart parity with the reference replica (popularity!=0 + dedup
    # first — mirror the pipeline's prep steps)
    prepped = tracks[tracks["popularity"] != 0].drop_duplicates(["track_id", "timestamp"])
    exp = reference_week_on_chart(prepped, "track_id", k=50)
    exp_map = dict(zip(exp["track_id"], exp["chart"]))
    got_map = dict(zip(t["track_id"], t["chart"]))
    mism = {k: (got_map[k], exp_map[k]) for k in got_map if got_map[k] != exp_map.get(k)}
    assert not mism, f"chart mismatches: {dict(list(mism.items())[:5])}"

    a = out.artists.toPandas()
    assert {"artist_id", "artist_name", "genre", "popularity", "chart"} <= set(a.columns)


def test_retention_filter(spark):
    st, sa, sal, sau, _ = _inputs(spark)
    # as-of far in the future: everything is older than 60 days → empty
    out = transform(st, sa, sal, sau, as_of_unix=T0 + 100 * 24 * 3600 + 61 * 24 * 3600)
    assert out.tracks.count() == 0


def test_dual_sinks(spark, tmp_path):
    st, sa, sal, sau, _ = _inputs(spark)
    out = transform(st, sa, sal, sau, as_of_unix=T0 + 8 * WEEK)

    hist = str(tmp_path / "hist")
    snap = str(tmp_path / "snap")
    write_history(out.tracks, hist)
    write_snapshot(out.tracks, snap)
    n1 = spark.read.parquet(snap).count()

    # append semantics: second history write doubles rows
    write_history(out.tracks, hist)
    assert spark.read.parquet(hist).count() == 2 * n1
    # overwrite semantics: second snapshot write keeps count
    write_snapshot(out.tracks, snap)
    assert spark.read.parquet(snap).count() == n1
    # history is partitioned by week directory
    import os

    assert any(p.startswith("__week=") for p in os.listdir(hist))


def test_analytics_layer(spark):
    st, sa, sal, sau, _ = _inputs(spark)
    out = transform(st, sa, sal, sau, as_of_unix=T0 + 8 * WEEK)
    cached = out.tracks.cache()

    top_pop = top_tracks_by(cached, "popularity").toPandas()
    assert len(top_pop) <= 20
    assert top_pop["popularity"].is_monotonic_decreasing
    # dedup by track_name: no repeated names in the board
    assert top_pop["track_name"].is_unique

    top_chart = top_tracks_by(cached, "chart").toPandas()
    assert len(top_chart) <= 20

    art = out.artists.cache()
    g = genre_explode_counts(art).toPandas()
    assert g["n_artists"].is_monotonic_decreasing

    cmp = audio_comparison(cached, art, "Artist 1", "Artist 2", features=("danceability", "energy"))
    pdf = cmp.toPandas()
    assert set(pdf["artist_name"]) <= {"Artist 1", "Artist 2"}


def test_dashboard_views_compose_and_push_down(spark):
    from databeats_spark.views import create_dashboard_views
    from tests.conftest import SF_SMOKE

    created = create_dashboard_views(spark, SF_SMOKE)
    assert "v_top_customers" in created and "v_pricing_summary" in created
    assert "v_dedup_components" not in created  # eager entries excluded
    top = spark.sql("SELECT * FROM v_top_customers LIMIT 5").collect()
    assert len(top) == 5
    # composing over a view: SQL on SQL
    n = spark.sql(
        "SELECT count(*) AS n FROM v_pricing_summary WHERE count_order > 0"
    ).collect()[0]["n"]
    assert n > 0
    # a view is a named plan, not a materialization: filters written
    # against it still reach the parquet scan
    plan = spark.sql(
        "SELECT o_orderkey FROM orders WHERE o_custkey = 7"
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_custkey), EqualTo(o_custkey,7)]" in plan


def test_transform_observation_metrics(spark):
    from pyspark.sql import Observation

    st, sa, sal, sau, (tracks, artists, albums, audio) = _inputs(spark)
    obs = Observation("etl_merged_test")
    out = transform(st, sa, sal, sau, as_of_unix=T0 + 8 * WEEK, observation=obs)
    out.tracks.write.format("noop").mode("overwrite").save()  # any action
    got = obs.get
    # metrics accumulate during the job itself — no second pass
    # (n_tracks is an HLL estimate: allow its ~2% error band)
    assert 0 < got["n_tracks"] <= got["n_rows"] * 1.05
    assert 0 <= got["n_audioless"] <= got["n_rows"]
