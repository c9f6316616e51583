"""Streaming SPRT monitor twin: a drained availableNow stream must
reproduce the batch registry query's readout exactly — including when
the history arrives in two separate files (incremental state fold)."""

from __future__ import annotations

import shutil

import pandas as pd

from tests.conftest import SF_SMOKE


def _events_schema(spark):
    return spark.read.parquet(f"{SF_SMOKE}/events.parquet").schema


def _assert_same(got: pd.DataFrame, expect: pd.DataFrame):
    assert list(got["day"]) == list(expect["day"])
    for col in ("n_t", "s_t"):
        assert list(got[col]) == list(expect[col])
    for col in ("p0", "log_e"):
        assert list(got[col]) == list(expect[col]), col  # bit-equal rounds
    assert list(got["decided"]) == list(expect["decided"])


def test_streaming_monitor_matches_batch_query(spark, tmp_path):
    from databeats_spark.registry import queries
    from databeats_spark.streaming.monitor import run_sprt_monitor

    src = str(tmp_path / "events")
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    ev.coalesce(1).write.parquet(src)
    got = run_sprt_monitor(
        spark, src, _events_schema(spark), query_name="sprt_state_a"
    ).toPandas()
    expect = queries()["sprt_evalue_monitor"](spark, SF_SMOKE).toPandas()
    _assert_same(got, expect)


def test_streaming_monitor_folds_incremental_files(spark, tmp_path):
    """The same history split into two files — the complete-mode state
    must fold both micro-batches into the identical readout (days that
    straddle the split get contributions from each)."""
    from databeats_spark.registry import queries
    from databeats_spark.streaming.monitor import run_sprt_monitor

    src = str(tmp_path / "events_inc")
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    # split by event parity — both halves cover the same calendar days
    ev.filter("event_id % 2 = 0").coalesce(1).write.parquet(src)
    ev.filter("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
    got = run_sprt_monitor(
        spark, src, _events_schema(spark), query_name="sprt_state_b"
    ).toPandas()
    expect = queries()["sprt_evalue_monitor"](spark, SF_SMOKE).toPandas()
    _assert_same(got, expect)
    shutil.rmtree(src, ignore_errors=True)


def test_durable_sink_restart_processes_only_new_files(spark, tmp_path):
    """Two-phase drain with a persistent checkpoint: phase 1 sees half
    the history, phase 2 (a RESTART of the same stream) must fold only
    the newly-arrived file, and the combined readout must equal the
    batch query over the full history."""
    from databeats_spark.registry import queries
    from databeats_spark.streaming.monitor import run_sprt_monitor_durable

    src = str(tmp_path / "events_d")
    state = str(tmp_path / "state_d")
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    schema = ev.schema
    ev.filter("event_id % 2 = 0").coalesce(1).write.parquet(src)
    first = run_sprt_monitor_durable(spark, src, schema, state).toPandas()
    # phase 1 readout covers only half the events
    assert int(first["n_t"].iloc[-1]) < 10_000
    ev.filter("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
    got = run_sprt_monitor_durable(spark, src, schema, state).toPandas()
    expect = queries()["sprt_evalue_monitor"](spark, SF_SMOKE).toPandas()
    _assert_same(got, expect)


def test_durable_sink_epoch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: calling the sink TWICE with the
    same (batch, epoch_id) — the crash-replay case — must leave the
    state, and therefore the readout, unchanged."""
    from databeats_spark.streaming.monitor import (
        sprt_monitor_from_partials,
        sprt_state_sink,
    )

    state = str(tmp_path / "state_r")
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    sink = sprt_state_sink(state)
    sink(ev, 0)
    once = sprt_monitor_from_partials(spark, state).toPandas()
    sink(ev, 0)  # the replay
    twice = sprt_monitor_from_partials(spark, state).toPandas()
    _assert_same(twice, once)
    # and an ADDITIVE merge would have doubled the counts:
    assert list(twice["n_t"]) == list(once["n_t"])
