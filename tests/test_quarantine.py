"""Corrupt-record quarantine gates (sources/files.py): malformed raw
lines must survive into the quarantine sink byte-for-byte while valid
rows flow on typed — and the FAILFAST curated-store posture must still
refuse the same file."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T
from pyspark.sql.utils import AnalysisException

from databeats_spark.sources.files import (
    QUARANTINE_COL,
    read_json,
    read_with_quarantine,
    quarantine_split_write,
    split_quarantine,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

GOOD = ['{"doc_id": 1, "text": "alpha"}', '{"doc_id": 2, "text": "beta"}']
BAD = ['{"doc_id": 3, "text": ', "not json at all", '{"doc_id": "x4x", "text": "gamma"}']


@pytest.fixture(scope="module")
def raw_path(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("quarantine") / "raw.jsonl"
    p.write_text("\n".join([GOOD[0], BAD[0], BAD[1], GOOD[1], BAD[2]]) + "\n")
    return str(p)


def test_split_recovers_valid_and_quarantines_raw(spark, raw_path):
    good, bad = split_quarantine(read_with_quarantine(spark, raw_path, SCHEMA))
    g = good.orderBy("doc_id").toPandas()
    assert list(g["doc_id"]) == [1, 2]
    assert list(g["text"]) == ["alpha", "beta"]
    assert QUARANTINE_COL not in g.columns
    quarantined = set(bad.toPandas()[QUARANTINE_COL])
    assert quarantined == set(BAD)  # raw lines preserved verbatim


def test_failfast_still_refuses_the_same_file(spark, raw_path):
    with pytest.raises(Exception) as e:
        read_json(spark, raw_path, SCHEMA).collect()
    assert "Malformed" in str(e.value) or "FAILFAST" in str(e.value)


def test_quarantine_split_write_roundtrip(spark, raw_path, tmp_path):
    df = read_with_quarantine(spark, raw_path, SCHEMA)
    quarantine_split_write(df, str(tmp_path / "good"), str(tmp_path / "bad"))
    good = spark.read.parquet(str(tmp_path / "good"))
    bad = spark.read.parquet(str(tmp_path / "bad"))
    assert good.count() == 2 and set(good.columns) == {"doc_id", "text"}
    assert bad.count() == 3 and QUARANTINE_COL in bad.columns
    assert set(bad.toPandas()[QUARANTINE_COL]) == set(BAD)


def test_non_text_format_rejected(spark):
    with pytest.raises(ValueError):
        read_with_quarantine(spark, "/tmp/x", SCHEMA, fmt="parquet")


def test_headerless_csv_keeps_first_row(spark, tmp_path):
    """header=False must flow through to the CSV parser — a headerless
    feed read with the default would swallow its first data row as a
    header (ADVICE r6)."""
    p = tmp_path / "raw.csv"
    p.write_text("1,alpha\n2,beta\nnot,a,number,row\n")
    good, bad = split_quarantine(
        read_with_quarantine(spark, str(p), SCHEMA, fmt="csv", header=False)
    )
    g = good.orderBy("doc_id").toPandas()
    assert list(g["doc_id"]) == [1, 2]  # first row survived as data
    # full-width pull on purpose — counting only the corrupt column of a
    # raw CSV scan is the documented QUERY_ONLY_CORRUPT_RECORD_COLUMN trap
    assert len(bad.toPandas()) == 1
