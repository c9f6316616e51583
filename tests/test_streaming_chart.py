"""Incremental chart pipeline: two staged file drops must converge to
exactly the batch weekly_chart_streak result over the full data."""

from __future__ import annotations

import duckdb
import pytest

from databeats_spark.registry import queries
from databeats_spark.streaming.chart import chart_streaks_from_state, run_incremental_chart
from databeats_spark.streaming.events import stream_events
from tests.conftest import SF_SMOKE


@pytest.fixture()
def staged_events(tmp_path):
    """Split the smoke events table into two parquet drops by time."""
    src = f"{SF_SMOKE}/events.parquet"
    d = tmp_path / "incoming"
    d.mkdir()
    con = duckdb.connect()
    cut = con.sql(f"SELECT median(epoch_us(ts)) FROM '{src}'").fetchone()[0]
    con.sql(
        f"COPY (SELECT * FROM '{src}' WHERE epoch_us(ts) <= {cut}) TO '{d}/drop1.parquet' (FORMAT PARQUET)"
    )
    second = tmp_path / "drop2.parquet"
    con.sql(
        f"COPY (SELECT * FROM '{src}' WHERE epoch_us(ts) > {cut}) TO '{second}' (FORMAT PARQUET)"
    )
    return str(d), str(second)


def test_incremental_chart_converges_to_batch(spark, staged_events, tmp_path):
    incoming, second_file = staged_events
    state = str(tmp_path / "weekly_state")

    # drop 1
    run_incremental_chart(spark, stream_events(spark, incoming), state)
    partial = chart_streaks_from_state(spark, state).toPandas()
    assert len(partial) > 0  # mid-stream results are queryable

    # drop 2 arrives; the SAME checkpoint continues incrementally
    import shutil

    shutil.copy(second_file, incoming + "/drop2.parquet")
    run_incremental_chart(spark, stream_events(spark, incoming), state)

    got = chart_streaks_from_state(spark, state).toPandas()
    exp = queries()["weekly_chart_streak"](spark, SF_SMOKE).toPandas()
    assert got.reset_index(drop=True).equals(exp.reset_index(drop=True)), (
        f"incremental != batch\n{got}\nvs\n{exp}"
    )


def test_incremental_is_exactly_once_on_redrain(spark, staged_events, tmp_path):
    incoming, _ = staged_events
    state = str(tmp_path / "weekly_state2")
    run_incremental_chart(spark, stream_events(spark, incoming), state)
    first = chart_streaks_from_state(spark, state).toPandas()
    # draining again with no new files must not double-count
    run_incremental_chart(spark, stream_events(spark, incoming), state)
    again = chart_streaks_from_state(spark, state).toPandas()
    assert first.equals(again)


def test_sink_epoch_replay_is_idempotent(spark, staged_events, tmp_path):
    """foreachBatch is at-least-once: delivering the SAME (batch,
    epoch) twice — the crash-between-write-and-commit case — must
    leave the state and the streak readout unchanged. The pre-r10
    additive merge double-counted exactly here."""
    from databeats_spark.streaming.chart import weekly_state_sink

    incoming, _ = staged_events
    state = str(tmp_path / "weekly_state3")
    batch = spark.read.parquet(incoming)
    sink = weekly_state_sink(state)
    sink(batch, 0)
    once = chart_streaks_from_state(spark, state).toPandas()
    sink(batch, 0)  # the replay
    again = chart_streaks_from_state(spark, state).toPandas()
    assert once.equals(again)
