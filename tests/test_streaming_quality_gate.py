"""Streaming-vs-batch twin for the learned quality gate: the fitted
pipeline must serve a Structured Streaming feed and produce EXACTLY
the batch scores (same model, same rows — model serving is
deterministic row-local math)."""

from __future__ import annotations

import pytest

from databeats_spark.ml.quality_filter import train_quality_filter
from databeats_spark.sources.files import write_table
from databeats_spark.streaming.events import run_available_now
from databeats_spark.streaming.quality_gate import quality_gate, stream_documents
from tests.test_quality_filter import planted  # noqa: F401  (fixture reuse)


@pytest.fixture(scope="module")
def docs_dir(planted, tmp_path_factory):  # noqa: F811
    d = tmp_path_factory.mktemp("qgate") / "docs"
    write_table(planted.select("doc_id", "text"), str(d))
    return str(d)


def test_stream_scores_equal_batch_scores(spark, planted, docs_dir):  # noqa: F811
    qf = train_quality_filter(planted, seed=7)
    stream = stream_documents(spark, docs_dir)
    assert stream.isStreaming
    run_available_now(quality_gate(stream, qf), "qgate_stream")
    got = spark.sql("SELECT * FROM qgate_stream").toPandas().sort_values("doc_id")
    exp = quality_gate(spark.read.parquet(docs_dir), qf).toPandas().sort_values("doc_id")
    assert len(got) == 400
    assert list(got["doc_id"]) == list(exp["doc_id"])
    assert (got["p_good"].values == exp["p_good"].values).all()
    assert (got["keep"].values == exp["keep"].values).all()
    # the gate must actually separate: junk docs overwhelmingly dropped
    truth = planted.select("doc_id", "gold").toPandas().set_index("doc_id")["gold"]
    keep_rate_good = got[got["doc_id"].map(truth) == 1]["keep"].mean()
    keep_rate_bad = got[got["doc_id"].map(truth) == 0]["keep"].mean()
    assert keep_rate_good >= 0.9 and keep_rate_bad <= 0.1
