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
