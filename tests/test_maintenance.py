"""Upsert / compaction maintenance operators."""

from __future__ import annotations

import os

from databeats_spark.operators.maintenance import apply_upsert, compact, upsert
from databeats_spark.sources.tables import load_tables
from tests.conftest import SF_SMOKE


def test_upsert_replaces_and_inserts(spark):
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "name", "v"]
    )
    updates = spark.createDataFrame([(2, "b2", 99), (9, "new", 1)], ["k", "name", "v"])
    out = {r["k"]: (r["name"], r["v"]) for r in upsert(target, updates, ["k"]).collect()}
    assert out == {1: ("a", 10), 2: ("b2", 99), 3: ("c", 30), 9: ("new", 1)}


def test_apply_upsert_roundtrip(spark, tmp_path):
    path = str(tmp_path / "tbl")
    load_tables(spark, SF_SMOKE, ["customer"]).customer.write.parquet(path)
    before = spark.read.parquet(path).count()

    updates = spark.createDataFrame(
        [(0, "UPDATED", 0, 0.0, "BUILDING"), (999999, "INSERTED", 0, 1.0, "AUTOMOBILE")],
        ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    apply_upsert(spark, path, updates, ["c_custkey"])
    after = spark.read.parquet(path)
    assert after.count() == before + 1  # one replace + one insert
    got = {r["c_custkey"]: r["c_name"] for r in after.filter("c_custkey IN (0, 999999)").collect()}
    assert got == {0: "UPDATED", 999999: "INSERTED"}


def test_compact_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "frag")
    ev = load_tables(spark, SF_SMOKE, ["events"]).events
    ev.repartition(17).write.parquet(path)
    n_files_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_files_before >= 17

    n = compact(spark, path, target_files=2)
    n_files_after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_files_after <= 2
    assert spark.read.parquet(path).count() == n == ev.count()
