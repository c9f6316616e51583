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


def _drain_typed(spark, incoming, ckpt, out_dir):
    from databeats_spark.streaming.stateful import running_user_type_counts

    def sink(batch_df, epoch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        running_user_type_counts(stream_events(spark, incoming))
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


@pytest.mark.skipif(
    not __import__("databeats_spark.streaming.stateful", fromlist=["x"]).has_transform_with_state_runtime(),
    reason="transformWithState state server needs protobuf (absent in this image)",
)
def test_transform_with_state_accumulates_across_drains(spark, tmp_path):
    import duckdb

    src = f"{SF_SMOKE}/events.parquet"
    incoming = tmp_path / "in"
    incoming.mkdir()
    con = duckdb.connect()
    cut = con.sql(f"SELECT median(event_id) FROM '{src}'").fetchone()[0]
    con.sql(f"COPY (SELECT * FROM '{src}' WHERE event_id <= {cut}) TO '{incoming}/a.parquet' (FORMAT PARQUET)")

    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "updates")
    _drain_typed(spark, str(incoming), ckpt, out_dir)
    assert spark.read.parquet(out_dir).count() > 0

    con.sql(f"COPY (SELECT * FROM '{src}' WHERE event_id > {cut}) TO '{incoming}/b.parquet' (FORMAT PARQUET)")
    _drain_typed(spark, str(incoming), ckpt, out_dir)

    # counts only grow: max update row per (user, type) = final state
    final = (
        spark.read.parquet(out_dir)
        .groupBy("user_id", "event_type")
        .agg(F.max("n_events").alias("n_events"))
        .toPandas()
        .set_index(["user_id", "event_type"])["n_events"]
        .sort_index()
    )
    exp = (
        load_tables(spark, SF_SMOKE, ["events"]).events
        .groupBy("user_id", "event_type")
        .count()
        .toPandas()
        .set_index(["user_id", "event_type"])["count"]
        .sort_index()
    )
    assert (final == exp).all(), f"\n{final}\nvs\n{exp}"

    # the ValueState grand total converges to the per-user event count
    totals = (
        spark.read.parquet(out_dir)
        .groupBy("user_id")
        .agg(F.max("user_total").alias("user_total"))
        .toPandas()
        .set_index("user_id")["user_total"]
        .sort_index()
    )
    exp_tot = (
        load_tables(spark, SF_SMOKE, ["events"]).events.groupBy("user_id")
        .count()
        .toPandas()
        .set_index("user_id")["count"]
        .sort_index()
    )
    assert (totals == exp_tot).all()


def test_user_type_counts_processor_logic():
    """Pure-Python check of UserTypeCounts against stub state objects —
    validates the accumulation semantics even where the protobuf state
    server (needed for the end-to-end run) is unavailable."""
    import pandas as pd

    from databeats_spark.streaming.stateful import UserTypeCounts

    class StubValue:
        def __init__(self):
            self.v = None
        def exists(self):
            return self.v is not None
        def get(self):
            return self.v
        def update(self, v):
            self.v = v

    class StubMap:
        def __init__(self):
            self.d = {}
        def containsKey(self, k):
            return k in self.d
        def getValue(self, k):
            return self.d[k]
        def updateValue(self, k, v):
            self.d[k] = v

    p = UserTypeCounts()
    p._by_type, p._total = StubMap(), StubValue()

    b1 = pd.DataFrame({"user_id": [7] * 3, "event_type": ["a", "a", "b"]})
    out1 = pd.concat(p.handleInputRows((7,), iter([b1]), None))
    assert out1.values.tolist() == [[7, "a", 2, 3], [7, "b", 1, 3]]

    b2 = pd.DataFrame({"user_id": [7] * 2, "event_type": ["b", "c"]})
    out2 = pd.concat(p.handleInputRows((7,), iter([b2]), None))
    assert out2.values.tolist() == [[7, "b", 2, 5], [7, "c", 1, 5]]
