"""Streaming twin of the SPRT e-value experiment monitor.

The batch registry query (`registry/events.py::_sprt_evalue_monitor`)
recomputes the daily cumulative log likelihood ratio from the full
event history; the monitor's natural deployment is a STREAM — decide
the moment the e-process crosses ln(1/α), not at the next batch run.

Shape: the streaming layer maintains ONE state row per calendar day
carrying both arms' exact BIGINT counts (treatment n/conversions,
control n/conversions) — a complete-mode aggregation whose state is
calendar-bounded (the SEQ_DAY_CAP posture: days, never events). The
serving computation (plug-in p0, cumulative LLR, the ln(1/α) line) is
the SAME closed form the batch query uses, applied to the compact
state table — so a drained stream reproduces the batch readout
EXACTLY (pinned in tests/test_streaming_monitor.py, including a
two-file incremental drain).

At 100 TB the raw events never re-scan: state is |days| rows. The
memory sink here is the test harness; production would foreachBatch
the same state rows into a day-partitioned table.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def sprt_daily_state(events: DataFrame) -> DataFrame:
    """Per-day, per-arm exact counts — the monitor's whole state.
    Works on a streaming OR batch events frame (same expressions)."""
    arm = (F.col("user_id") % 2).cast("bigint")
    conv = (F.col("event_type") == "purchase").cast("bigint")
    return events.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(F.when(arm == 1, 1).otherwise(0)).cast("bigint").alias("dn"),
        F.sum(F.when(arm == 1, conv).otherwise(0)).cast("bigint").alias("ds"),
        F.sum(F.when(arm == 0, 1).otherwise(0)).cast("bigint").alias("cn"),
        F.sum(F.when(arm == 0, conv).otherwise(0)).cast("bigint").alias("cs"),
    )


def sprt_monitor_from_state(state: DataFrame) -> DataFrame:
    """The batch query's closed form over the compact day-state table:
    identical expression shapes to registry/events.py, so a drained
    stream's readout is bit-equal to the batch query's."""
    from pyspark.sql import Window

    from databeats_spark.registry.events import SEQ_DAY_CAP, SPRT_ALPHA, SPRT_MDE

    # Mirror the batch query's row set EXACTLY (ADVICE r10): the batch
    # daily aggregate filters arm==1 BEFORE the day groupBy, so a
    # calendar day with only control-arm events produces no readout
    # row there — here that day still has a (dn=0) state row, kept for
    # the p0 aggregate but excluded from the readout. Likewise the
    # batch p0 is an UNCAPPED keyless aggregate over all control
    # events and its SEQ_DAY_CAP bounds treatment days only — so p0
    # folds the whole state and the cap applies after the dn>0 filter.
    p0_tbl = state.agg(
        (F.sum("cs").cast("double") / F.sum("cn").cast("double")).alias("p0")
    )
    bounded = state.filter(F.col("dn") > 0).limit(SEQ_DAY_CAP)
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = bounded.select(
        "day",
        F.sum("dn").over(w).cast("bigint").alias("n_t"),
        F.sum("ds").over(w).cast("bigint").alias("s_t"),
    ).crossJoin(F.broadcast(p0_tbl))
    p1 = F.least(F.col("p0") * (1.0 + SPRT_MDE), F.lit(0.99))
    llr = F.col("s_t").cast("double") * F.log(p1 / F.col("p0")) + (
        F.col("n_t") - F.col("s_t")
    ).cast("double") * F.log((1.0 - p1) / (1.0 - F.col("p0")))
    thresh = math.log(1.0 / SPRT_ALPHA)
    return cum.select(
        "day",
        "n_t",
        "s_t",
        F.round("p0", 6).alias("p0"),
        F.round(llr, 6).alias("log_e"),
        (llr >= thresh).alias("decided"),
    ).orderBy("day")


def sprt_state_sink(state_path: str):
    """foreachBatch sink: write each micro-batch's per-day partial
    counts into an EPOCH-partitioned state table. foreachBatch is
    at-least-once — a crash between the write and the checkpoint
    commit replays the batch — so idempotence comes from the layout,
    not from hoping: a replayed epoch dynamically overwrites exactly
    its own partition and the state is byte-identical afterwards
    (pinned in tests/test_streaming_monitor.py by calling the sink
    twice with the same epoch). The serving read folds partials per
    day, so state is (days × epochs) tiny partial rows — an additive
    merge against existing state (the simpler shape) would
    double-count on replay. On a long-lived stream bound the epochs
    factor with streaming/compaction.py::compact_sprt_state."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        daily = sprt_daily_state(batch_df).withColumn(
            "epoch", F.lit(int(epoch_id)).cast("bigint")
        )
        daily.write.mode("overwrite").partitionBy("epoch").parquet(state_path)

    return write


def sprt_monitor_from_partials(spark: SparkSession, state_path: str) -> DataFrame:
    """Serving read over the epoch-partitioned partials: fold per day,
    then the same closed form."""
    state = (
        spark.read.parquet(state_path)
        .groupBy("day")
        .agg(
            F.sum("dn").cast("bigint").alias("dn"),
            F.sum("ds").cast("bigint").alias("ds"),
            F.sum("cn").cast("bigint").alias("cn"),
            F.sum("cs").cast("bigint").alias("cs"),
        )
    )
    return sprt_monitor_from_state(state)


def run_sprt_monitor_durable(
    spark: SparkSession,
    events_path: str,
    schema,
    state_path: str,
) -> DataFrame:
    """Drain available event files into the durable epoch-partitioned
    state (restartable: the checkpoint under ``state_path + '_ckpt'``
    makes a re-run process only NEW files), then serve the readout."""
    stream = (
        spark.readStream.schema(schema).format("parquet").load(events_path)
    )
    q = (
        stream.writeStream.foreachBatch(sprt_state_sink(state_path))
        .option("checkpointLocation", state_path + "_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sprt_monitor_from_partials(spark, state_path)


def run_sprt_monitor(
    spark: SparkSession,
    events_path: str,
    schema,
    query_name: str = "sprt_monitor_state",
) -> DataFrame:
    """Drain ``events_path`` with an availableNow stream, maintaining
    the day-state aggregation in complete mode, then apply the serving
    computation. Returns the monitor readout DataFrame."""
    stream = (
        spark.readStream.schema(schema).format("parquet").load(events_path)
    )
    q = (
        sprt_daily_state(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sprt_monitor_from_state(spark.table(query_name))
