"""Streaming tests: the availableNow-drained streaming aggregations
must agree with their batch twins over the same files."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from databeats_spark.sources.tables import load_tables
from databeats_spark.streaming.events import (
    run_available_now,
    stream_events,
    streaming_sessionization,
    windowed_event_stats,
)
from tests.conftest import SF_SMOKE


@pytest.fixture()
def events_dir(tmp_path):
    # copy the smoke events file into a dir the stream can watch
    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "part-000.parquet")
    return str(d)


def test_windowed_stats_match_batch(spark, events_dir):
    stream = stream_events(spark, events_dir)
    agg = windowed_event_stats(stream, window="1 day", watermark="2 days")
    run_available_now(agg, "win_stats", output_mode="complete")
    got = spark.sql("SELECT * FROM win_stats").toPandas()

    batch = load_tables(spark, SF_SMOKE, ["events"]).events
    exp = (
        batch.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
        .toPandas()
    )
    key = ["window_start", "event_type"]
    got_s = got.sort_values(key).reset_index(drop=True)
    exp_s = exp.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(exp_s) > 0
    assert (got_s["n"].values == exp_s["n"].values).all()
    assert (got_s["total_value"].values == exp_s["total_value"].values).all()


def test_incremental_second_file_appends(spark, events_dir, tmp_path):
    stream = stream_events(spark, events_dir)
    agg = windowed_event_stats(stream, window="1 day")
    run_available_now(agg, "win_inc", output_mode="complete")
    n1 = spark.sql("SELECT count(*) c FROM win_inc").collect()[0]["c"]
    assert n1 > 0
    # second drain with no new files adds nothing (exactly-once per file)
    run_available_now(agg, "win_inc2", output_mode="complete")
    # new query name → fresh sink; same rows re-derived from the source
    n2 = spark.sql("SELECT count(*) c FROM win_inc2").collect()[0]["c"]
    assert n2 == n1


def test_streaming_sessionization_totals(spark, events_dir):
    stream = stream_events(spark, events_dir)
    sess = streaming_sessionization(stream, gap="30 minutes")
    run_available_now(sess, "sess", output_mode="complete")
    got = spark.sql("SELECT sum(n_events) AS total, count(*) AS n_sessions FROM sess").collect()[0]
    # every event lands in exactly one session
    n_events = load_tables(spark, SF_SMOKE, ["events"]).events.count()
    assert got["total"] == n_events
    assert 0 < got["n_sessions"] <= n_events

    # agrees with the batch gaps-and-islands twin on session counts
    from databeats_spark.registry import queries

    batch = queries()["sessionization"](spark, SF_SMOKE).toPandas()
    per_user = (
        spark.sql("SELECT user_id, count(*) AS n FROM sess GROUP BY user_id")
        .toPandas()
        .set_index("user_id")["n"]
    )
    exp = batch.set_index("user_id")["n_sessions"]
    assert (per_user.sort_index() == exp.sort_index()).all()


def test_streaming_dedup_collapses_redelivery(spark, events_dir, tmp_path):
    # simulate at-least-once redelivery: the same file lands twice
    shutil.copy(f"{SF_SMOKE}/events.parquet", f"{events_dir}/part-001.parquet")
    stream = stream_events(spark, events_dir)
    from databeats_spark.streaming.events import streaming_dedup

    deduped = streaming_dedup(stream, keys=["event_id"])
    run_available_now(deduped, "dedup_sink", output_mode="append")
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_sink").collect()[0]
    n_unique = load_tables(spark, SF_SMOKE, ["events"]).events.select("event_id").distinct().count()
    assert got["n"] == got["d"] == n_unique


def test_stream_stream_join_matches_batch(spark, events_dir):
    from databeats_spark.streaming.events import stream_stream_click_attribution

    stream = stream_events(spark, events_dir)
    joined = stream_stream_click_attribution(stream, attribution_window="1 hour")
    run_available_now(joined, "attr_sink", output_mode="append")
    got = spark.sql("SELECT * FROM attr_sink").toPandas()

    ev = load_tables(spark, SF_SMOKE, ["events"]).events
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    exp = purchases.join(
        clicks,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 hour")),
    ).toPandas()
    assert len(got) == len(exp) > 0
    key = ["purchase_id", "click_id"]
    got_pairs = set(map(tuple, got[key].values.tolist()))
    exp_pairs = set(map(tuple, exp[key].values.tolist()))
    assert got_pairs == exp_pairs


def test_stream_static_enrichment_matches_batch(spark, tmp_path):
    import shutil

    from databeats_spark.sources.tables import load_tables
    from databeats_spark.streaming.events import (
        run_available_now,
        stream_events,
        stream_static_enrichment,
        user_value_segments,
    )

    d = tmp_path / "events_in"
    d.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "part-000.parquet")
    batch = load_tables(spark, SF_SMOKE, ["events"]).events
    segments = user_value_segments(batch)

    enriched = stream_static_enrichment(stream_events(spark, str(d)), segments)
    q = run_available_now(
        enriched.select("event_id", "user_id", "segment"), "enrich_test"
    )
    got = spark.table("enrich_test").toPandas().sort_values("event_id").reset_index(drop=True)
    q.stop()

    want = (
        stream_static_enrichment(batch, segments)
        .select("event_id", "user_id", "segment")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert got.equals(want)


def test_streaming_anomalies_match_batch_outliers(spark, tmp_path):
    import shutil

    from databeats_spark.sources.tables import load_tables
    from databeats_spark.streaming.events import (
        event_type_moments,
        run_available_now,
        stream_events,
        streaming_anomalies,
    )

    d = tmp_path / "events_anom"
    d.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "part-000.parquet")
    batch = load_tables(spark, SF_SMOKE, ["events"]).events
    moments = event_type_moments(batch)

    q = run_available_now(
        streaming_anomalies(stream_events(spark, str(d)), moments), "anom_test"
    )
    got = spark.table("anom_test").toPandas().sort_values("event_id").reset_index(drop=True)
    q.stop()

    want = (
        streaming_anomalies(batch, moments)
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert got.equals(want)


def test_streaming_srm_guard_matches_batch(spark, events_dir):
    """The drained SRM guard must equal the batch computation of the
    same per-window arm counts and chi-square over the same file, and
    the deterministic user_id%2 assignment must stay mostly unflagged."""
    from databeats_spark.streaming.events import streaming_srm_guard

    stream = stream_events(spark, events_dir)
    guard = streaming_srm_guard(stream, window="1 day", watermark="2 days")
    run_available_now(guard, "srm_guard", output_mode="complete")
    got = spark.sql("SELECT * FROM srm_guard").toPandas()

    batch = load_tables(spark, SF_SMOKE, ["events"]).events
    arm = (F.col("user_id") % 2).cast("bigint")
    exp = (
        batch.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.sum(F.when(arm == 1, 1).otherwise(0)).cast("bigint").alias("n_treated"),
            F.sum(F.when(arm == 0, 1).otherwise(0)).cast("bigint").alias("n_control"),
        )
        .select(F.col("w.start").alias("window_start"), "n_treated", "n_control")
        .toPandas()
    )
    got_s = got.sort_values("window_start").reset_index(drop=True)
    exp_s = exp.sort_values("window_start").reset_index(drop=True)
    assert len(got_s) == len(exp_s) > 0
    assert (got_s["n_treated"].values == exp_s["n_treated"].values).all()
    assert (got_s["n_control"].values == exp_s["n_control"].values).all()
    chi2 = (exp_s["n_treated"] - exp_s["n_control"]) ** 2 / (
        exp_s["n_treated"] + exp_s["n_control"]
    )
    assert (got_s["chi2"] - chi2).abs().max() < 1e-6
    assert (~got_s["srm_flag"]).mean() > 0.5
