"""Incremental weekly-chart pipeline — the streaming modernization of
the reference's weekly batch snapshot + streak rebuild (SURVEY §2.12).

The reference recomputes everything from history each run
(dag.py:408-532). The scalable form splits the work:

1. **incremental layer** (streaming): each micro-batch's events fold
   into a per-(week, user) aggregate STATE TABLE via foreachBatch —
   idempotent partition-overwrite merge keyed by week, so replays and
   late files can only refresh a week, never double-count it into the
   streak;
2. **serving layer** (batch): chart membership + streak (the exact
   week_on_chart/streak operators) over the compact state table —
   (weeks × users) rows, not raw events.

At 100 TB the raw events never re-scan: the state table is smaller by
the events-per-user-week factor and the streak pass is bounded by it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from databeats_spark.functions.timeutils import week_index
from databeats_spark.operators.windows import streak_ending_at_latest, top_k_per_group


def weekly_state_sink(state_path: str):
    """foreachBatch merge: aggregate the micro-batch per (week, user)
    and overwrite exactly the touched week partitions (dynamic
    partition overwrite = the idempotent upsert for append-only event
    feeds re-aggregated from scratch per week)."""

    def pin_schema(df: DataFrame) -> DataFrame:
        # re-aggregation widens decimal precision each pass (28,2 →
        # 38,2) — pin the state schema so every epoch writes the same
        # parquet types
        return df.select(
            "wk",
            "user_id",
            F.col("wv_part").cast("decimal(28,2)").alias("wv_part"),
            F.col("n_events").cast("long").alias("n_events"),
        )

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        weekly = batch_df.groupBy(
            week_index("ts").alias("wk"), F.col("user_id")
        ).agg(
            F.sum(F.col("value").cast("decimal(18,2)")).alias("wv_part"),
            F.count(F.lit(1)).alias("n_events"),
        )
        # additive merge with existing state for the touched weeks only
        # (late data for an old week folds in; other weeks untouched)
        try:
            existing = spark.read.parquet(state_path)
            touched = weekly.select("wk").distinct()
            keep = existing.join(F.broadcast(touched), "wk", "left_semi")
            merged = (
                keep.unionByName(pin_schema(weekly))
                .groupBy("wk", "user_id")
                .agg(F.sum("wv_part").alias("wv_part"), F.sum("n_events").alias("n_events"))
            )
        except Exception:
            merged = weekly
        pin_schema(merged).write.mode("overwrite").partitionBy("wk").parquet(state_path)

    return merge


def run_incremental_chart(
    spark: SparkSession,
    events_stream: DataFrame,
    state_path: str,
) -> StreamingQuery:
    """Drain all available event files into the weekly state table."""
    q = (
        events_stream.writeStream.foreachBatch(weekly_state_sink(state_path))
        .option("checkpointLocation", state_path + "_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def chart_streaks_from_state(
    spark: SparkSession, state_path: str, k: int = 10
) -> DataFrame:
    """Serving query: top-k chart per week + streak ending at the
    newest week — identical semantics to the batch weekly_chart_streak
    registry query, computed from the compact state table."""
    weekly = spark.read.parquet(state_path).select(
        "wk", "user_id", F.col("wv_part").cast("double").alias("wv")
    )
    chart = top_k_per_group(weekly, ["wk"], [F.col("wv").desc(), F.col("user_id")], k)
    return (
        streak_ending_at_latest(chart, "user_id", "wk", latest_idx=None)
        .select("user_id", F.col("streak").cast("long").alias("streak"))
        .orderBy(F.col("streak").desc(), "user_id")
    )
