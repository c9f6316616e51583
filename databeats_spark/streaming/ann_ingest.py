"""Continuous ANN index maintenance — the streaming capstone of the
media → embedding → IVF pipeline.

Batch half of the story: ``operators/multimodal.py::encode_payloads``
(injectable encoder) feeds ``ml/ann.py::IVFIndex.fit``; incremental
half: ``IVFIndex.add`` assigns a new batch to existing centroids
without a refit. This module runs that incremental half as a
Structured Streaming sink so a document/media stream keeps the index
current:

    stream -> attach payload -> encode (Arrow batches, injected model)
           -> assign to nearest existing centroid (KMeans transform)
           -> append to a centroid-partitioned parquet corpus

Exactly-once: every micro-batch writes under its own ``epoch=<id>``
partition with DYNAMIC partition overwrite (the ingest_guard pattern —
a replayed epoch overwrites exactly its own partition). The corpus
layout is partitioned by (epoch, centroid_id): searches still prune on
``centroid_id`` (partition pruning works at any partition level), and
epoch is a physical detail the reader never filters on.

Refit policy stays with the caller: ``drift()`` reports the latest
epoch's mean assignment distance against the fit-time corpus baseline
(see ``IVFIndex.mean_assignment_distance``); when it runs away, fit a
fresh index over the accumulated corpus and resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databeats_spark.ml.ann import IVFIndex
from databeats_spark.operators.multimodal import encode_payloads


class StreamingIVFIngest:
    """foreachBatch sink that grows an IVF corpus from a payload
    stream. ``encoder`` is the injectable batch model (see
    encode_payloads); ``index`` provides the frozen centroid book."""

    def __init__(
        self,
        index: IVFIndex,
        out_path: str,
        encoder=None,
        embed_dim: int = 8,
        id_col: str = "doc_id",
        payload_col: str = "payload",
    ) -> None:
        self.index = index
        self.out_path = out_path
        self.encoder = encoder
        self.embed_dim = embed_dim
        self.id_col = id_col
        self.payload_col = payload_col

    def sink(self, batch_df: DataFrame, batch_id: int) -> None:
        """The foreachBatch target: encode → assign → epoch-partitioned
        append (replay-idempotent via dynamic partition overwrite)."""
        from pyspark.ml.functions import array_to_vector

        emb = encode_payloads(
            batch_df,
            encoder=self.encoder,
            id_col=self.id_col,
            payload_col=self.payload_col,
            embed_dim=self.embed_dim,
        )
        assigned = self.index.kmeans.transform(
            emb.withColumn("__v", array_to_vector(F.col("embedding")))
        ).select(self.id_col, "embedding", "centroid_id")
        (
            assigned.withColumn("epoch", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch", "centroid_id")
            .parquet(self.out_path)
        )

    def corpus(self, spark: SparkSession) -> DataFrame:
        """Everything ingested so far: (id, embedding, centroid_id)."""
        return spark.read.parquet(self.out_path).select(
            self.id_col, "embedding", "centroid_id"
        )

    def as_index(self, spark: SparkSession) -> IVFIndex:
        """An IVFIndex over the streamed corpus (frozen centroid book +
        the centroid-partitioned files — probes prune partitions)."""
        return IVFIndex(
            self.index.kmeans, self.corpus(spark), self.id_col, "embedding"
        )

    def drift(self, spark: SparkSession) -> float:
        """Mean assignment distance of the LATEST epoch — compare with
        the fit-time baseline to decide when to refit."""
        full = spark.read.parquet(self.out_path)
        last = full.agg(F.max("epoch").alias("e")).collect()[0]["e"]
        latest = full.filter(F.col("epoch") == last).select(
            # the streamed corpus always carries 'embedding' (the
            # encoder's output name); the seed index may have been fit
            # with any vec_col — align to it
            self.id_col,
            F.col("embedding").alias(self.index.vec_col),
        )
        return self.index.mean_assignment_distance(latest)
