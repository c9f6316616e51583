"""Streaming exact-fingerprint dedup behind bloom-bitmap state — the
FIXED-SIZE-state rung of the streaming dedup ladder.

Where it sits: streaming_dedup (streaming/events.py) is exact but keeps
per-key state proportional to the distinct keys seen; ingest_guard
keeps a sketch index that grows ~100 B per accepted doc. This guard's
state is a bloom bitmap — capacity-planned ONCE (``m_bits``) and never
growing per doc — the same reason the HLL tier (streaming/distincts.py)
exists beside exact distinct.

Contract (one-sided exactness): no two admitted docs ever share a
fingerprint — the bloom has no false negatives, and within-batch
duplicates are exactly collapsed first-arrival-wins — but a novel doc
whose probe positions all collide with set bits is DROPPED. Loss rate
is the bloom FPR (~``(1 - e^(-k·n/m))^k``; ~0.05% at 10 bits/key,
k=2). The right trade for crawl ingest where duplicate admission is
expensive and novel-doc loss at 1e-3 is noise; when losses matter,
route bloom-positive docs to an exact verify tier instead
(operators/scale.py::bloom_anti_join — same bitmap, exact results).

Idempotency (the ingest_guard replay discipline applied to bitmap
state): the state table is (epoch, block, bits), written per epoch
with dynamic partition overwrite, and the probe bitmap is the bit_or
fold of every epoch EXCEPT the current one — so a replayed micro-batch
re-derives exactly the same admit set against exactly the pre-epoch
state and overwrites its own partitions. bit_or is idempotent and
associative, so the fold is also insensitive to epoch replay order.

Reference anchor: the reference's ingest path re-fetches and re-filters
page batches (dag.py pagination); dedup-at-ingest with bounded state is
its scale completion, not a port.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from databeats_spark.operators.scale import bloom_bitmap, bloom_probe

_BITMAP_SCHEMA = "block BIGINT, bits BIGINT, epoch BIGINT"


def _prior_bitmap(spark: SparkSession, path: str, current_epoch: int) -> DataFrame:
    """The probe bitmap: every epoch's partitions EXCEPT the current
    one (replay safety), folded per block with bit_or."""
    try:
        state = spark.read.parquet(path)
    except AnalysisException as exc:
        # only "state not created yet" is empty state; a corrupt table
        # must fail the micro-batch so the checkpoint retries instead
        # of silently re-admitting the whole history
        if exc.getCondition() != "PATH_NOT_FOUND":
            raise
        return spark.createDataFrame([], _BITMAP_SCHEMA).select("block", "bits")
    return (
        state.filter(F.col("epoch") != current_epoch)
        .groupBy("block")
        .agg(F.bit_or("bits").alias("bits"))
    )


def bloom_guard_sink(
    state_dir: str,
    id_col: str = "doc_id",
    key_col: str = "fp",
    m_bits: int = 1 << 20,
    n_hashes: int = 2,
):
    """foreachBatch sink: admit only fingerprint-novel docs; state is
    the per-epoch bloom bitmap (``{state_dir}/bitmap``), admitted rows
    land epoch-partitioned at ``{state_dir}/admitted``."""

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession

        # within-batch exact dedup, deterministic first-arrival-wins
        # (min id per fingerprint) so replays derive the same keep set
        w = Window.partitionBy(key_col).orderBy(id_col)
        batch = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

        prior = _prior_bitmap(spark, f"{state_dir}/bitmap", epoch_id)
        probed = bloom_probe(batch, prior, key_col, m_bits, n_hashes)
        admitted = probed.filter(~F.col("__bloom_hit")).drop("__bloom_hit")
        admitted = admitted.localCheckpoint()  # two consumers below

        # dynamic overwrite per write (never session-wide): only this
        # epoch's partition is replaced
        ep = F.lit(int(epoch_id)).cast("long")
        admitted.withColumn("epoch", ep).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("epoch").parquet(f"{state_dir}/admitted")
        delta = bloom_bitmap(admitted.select(key_col), key_col, m_bits, n_hashes)
        delta.withColumn("epoch", ep).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("epoch").parquet(f"{state_dir}/bitmap")

    return merge


def run_bloom_guard(
    spark: SparkSession,
    docs_stream: DataFrame,
    state_dir: str,
    id_col: str = "doc_id",
    key_col: str = "fp",
    m_bits: int = 1 << 20,
    n_hashes: int = 2,
) -> StreamingQuery:
    """Drain all available document files through the guard."""
    q = (
        docs_stream.writeStream.foreachBatch(
            bloom_guard_sink(state_dir, id_col, key_col, m_bits, n_hashes)
        )
        .option("checkpointLocation", f"{state_dir}/_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def admitted_docs(spark: SparkSession, state_dir: str) -> DataFrame:
    """Serving read of the admitted corpus."""
    return spark.read.parquet(f"{state_dir}/admitted").drop("epoch")
