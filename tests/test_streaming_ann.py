"""Continuous ANN ingest: stream → injected encoder → centroid
assignment → epoch-partitioned corpus, exactly-once under replay,
searchable through the same IVF surface as the batch path."""

from __future__ import annotations

from pyspark.sql import functions as F

from databeats_spark.ml.ann import IVFIndex
from databeats_spark.operators.multimodal import attach_payload, encode_payloads
from databeats_spark.sources.tables import load_tables
from databeats_spark.streaming.ann_ingest import StreamingIVFIngest
from tests.conftest import SF_SMOKE


def _fit_seed_index(spark, docs):
    emb = encode_payloads(attach_payload(docs)).localCheckpoint()
    return IVFIndex.fit(emb, id_col="doc_id", vec_col="embedding", n_lists=4)


def test_stream_grows_searchable_corpus(spark, tmp_path):
    docs = load_tables(spark, SF_SMOKE, ["documents"]).documents
    seed = docs.filter(F.col("doc_id") < 100).select("doc_id", "text")
    idx = _fit_seed_index(spark, seed)

    # the stream: 3 files of payload-bearing docs, incl. an exact twin
    # of doc 7 under a new id
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "corpus"), str(tmp_path / "ckpt")
    arriving = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 190)).select(
        "doc_id", "text"
    )
    twin = seed.filter(F.col("doc_id") == 7).select(
        (F.col("doc_id") + 700_000).alias("doc_id"), "text"
    )
    payloads = attach_payload(arriving.unionByName(twin)).select("doc_id", "payload")
    payloads.repartition(3).write.parquet(src)

    ingest = StreamingIVFIngest(idx, out)
    q = (
        spark.readStream.schema(payloads.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(ingest.sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    corpus = ingest.corpus(spark)
    assert corpus.count() == 91  # 90 arrivals + the twin
    assert corpus.select("centroid_id").distinct().count() >= 2

    # searchable through the SAME IVF surface: the twin is the nearest
    # streamed neighbor of seed doc 7's embedding at cosine ~1.0
    q7 = encode_payloads(attach_payload(seed.filter(F.col("doc_id") == 7)))
    hits = ingest.as_index(spark).search(q7, k=3, n_probe=4).toPandas()
    best = hits.sort_values("rank").iloc[0]
    assert best["neighbor_id"] == 700_007 and abs(best["cos_sim"] - 1.0) < 1e-6

    # drift over in-distribution arrivals stays in the corpus band
    assert ingest.drift(spark) < 2 * idx.mean_assignment_distance(
        encode_payloads(attach_payload(seed))
    )


def test_epoch_replay_is_idempotent(spark, tmp_path):
    """Re-running the foreachBatch sink with the SAME batch id must
    overwrite exactly its own epoch partition — corpus count flat,
    other epochs untouched (the checkpoint-retry contract)."""
    docs = load_tables(spark, SF_SMOKE, ["documents"]).documents
    seed = docs.filter(F.col("doc_id") < 100).select("doc_id", "text")
    idx = _fit_seed_index(spark, seed)
    out = str(tmp_path / "corpus")
    ingest = StreamingIVFIngest(idx, out)

    b0 = attach_payload(seed.filter(F.col("doc_id") < 30)).select("doc_id", "payload")
    b1 = attach_payload(
        seed.filter((F.col("doc_id") >= 30) & (F.col("doc_id") < 50))
    ).select("doc_id", "payload")
    ingest.sink(b0, 0)
    ingest.sink(b1, 1)
    assert ingest.corpus(spark).count() == 50
    ingest.sink(b1, 1)  # replayed epoch
    assert ingest.corpus(spark).count() == 50, "replayed epoch duplicated rows"
    ingest.sink(b0, 0)  # out-of-order replay of the older epoch
    assert ingest.corpus(spark).count() == 50
