"""Incremental per-day distinct estimates: two staged drops converge
to within HLL error of the batch exact counts, re-drains are no-ops,
and — the algebraic point — re-merging the SAME data into existing
state leaves every estimate unchanged (sketch union is idempotent, so
at-least-once delivery needs no epoch bookkeeping)."""

from __future__ import annotations

import shutil

import duckdb
import pytest

from databeats_spark.streaming.distincts import (
    daily_distinct_estimates,
    daily_sketch_sink,
    run_incremental_distincts,
)
from databeats_spark.streaming.events import stream_events
from tests.conftest import SF_SMOKE


@pytest.fixture()
def staged_events(tmp_path):
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


def _estimates(spark, state):
    return {
        r["day"]: r["est_users"] for r in daily_distinct_estimates(spark, state).collect()
    }


def test_incremental_distincts_converge_and_are_idempotent(spark, staged_events, tmp_path):
    incoming, second_file = staged_events
    state = str(tmp_path / "sketches")

    run_incremental_distincts(spark, stream_events(spark, incoming), state)
    shutil.copy(second_file, incoming + "/drop2.parquet")
    run_incremental_distincts(spark, stream_events(spark, incoming), state)

    exact = {
        day: n
        for day, n in duckdb.sql(
            f"SELECT strftime(ts, '%Y-%m-%d'), count(DISTINCT user_id) "
            f"FROM '{SF_SMOKE}/events.parquet' GROUP BY 1"
        ).fetchall()
    }
    got = _estimates(spark, state)
    assert set(got) == set(exact)
    for day, n in exact.items():
        assert abs(got[day] - n) / n <= 0.05, (day, got[day], n)

    # no-new-files re-drain: unchanged
    run_incremental_distincts(spark, stream_events(spark, incoming), state)
    assert _estimates(spark, state) == got

    # at-least-once replay: drain the SAME files through a FRESH
    # checkpoint into the EXISTING state — every sketch re-merges its
    # own data, and union idempotence keeps every estimate identical
    q = (
        stream_events(spark, incoming)
        .writeStream.foreachBatch(daily_sketch_sink(state))
        .option("checkpointLocation", str(tmp_path / "fresh_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert _estimates(spark, state) == got
