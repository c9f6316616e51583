"""applyInPandasWithState: keyed state must accumulate across separate
availableNow drains (checkpointed state store) and converge to the
batch ground truth."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from databeats_spark.sources.tables import load_tables
from databeats_spark.streaming.events import stream_events
from databeats_spark.streaming.stateful import running_user_totals
from tests.conftest import SF_SMOKE


def _drain(spark, incoming, ckpt, out_dir):
    # memory sink cannot recover from a checkpoint; foreachBatch +
    # parquet append is the restart-capable pattern
    def sink(batch_df, epoch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        running_user_totals(stream_events(spark, incoming))
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_state_accumulates_across_drains(spark, tmp_path):
    import duckdb

    src = f"{SF_SMOKE}/events.parquet"
    incoming = tmp_path / "in"
    incoming.mkdir()
    con = duckdb.connect()
    cut = con.sql(f"SELECT median(event_id) FROM '{src}'").fetchone()[0]
    con.sql(f"COPY (SELECT * FROM '{src}' WHERE event_id <= {cut}) TO '{incoming}/a.parquet' (FORMAT PARQUET)")

    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "updates")
    _drain(spark, str(incoming), ckpt, out_dir)
    mid = spark.read.parquet(out_dir).count()
    assert mid > 0

    con.sql(f"COPY (SELECT * FROM '{src}' WHERE event_id > {cut}) TO '{incoming}/b.parquet' (FORMAT PARQUET)")
    _drain(spark, str(incoming), ckpt, out_dir)

    # n_events only grows per user: the max update row = final state
    final = (
        spark.read.parquet(out_dir)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .toPandas()
        .set_index("user_id")["n_events"]
        .sort_index()
    )
    exp = (
        load_tables(spark, SF_SMOKE, ["events"]).events.groupBy("user_id")
        .count()
        .toPandas()
        .set_index("user_id")["count"]
        .sort_index()
    )
    assert (final == exp).all(), f"\n{final}\nvs\n{exp}"
