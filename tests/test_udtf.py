"""Python UDTF surface: the lateral table function must agree exactly
with its Column-expression twin (the production path)."""

from __future__ import annotations

import pandas as pd

from databeats_spark.functions.udtf_demo import sentence_rows_native, sentences
from databeats_spark.sources.tables import load_tables
from tests.conftest import SF_SMOKE


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)


def test_udtf_matches_native_twin(spark):
    docs = load_tables(spark, SF_SMOKE, ["documents"]).documents.select("doc_id", "text")
    docs.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("sentences", sentences())

    via_udtf = spark.sql(
        "SELECT d.doc_id, s.sentence_idx, s.sentence, s.n_words "
        "FROM udtf_docs d, LATERAL sentences(d.text) s"
    ).toPandas()
    via_native = sentence_rows_native(docs).toPandas()

    assert len(via_udtf) > 0
    a, b = _canon(via_udtf), _canon(via_native)
    assert a.equals(b), f"UDTF vs native mismatch:\n{a.head()}\nvs\n{b.head()}"
