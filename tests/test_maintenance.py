"""Upsert / compaction maintenance operators."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

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


def test_rollup_partials_equal_direct_aggregation(spark):
    from databeats_spark.operators.rollup import finish, rollup_to, time_partials
    from databeats_spark.sources.tables import load_tables
    from tests.conftest import SF_SMOKE
    from pyspark.sql import functions as F

    ev = load_tables(spark, SF_SMOKE, ["events"]).events
    rolled = (
        finish(rollup_to(time_partials(ev, grain="hour"), grain="day"))
        .orderBy("bucket", "event_type")
        .toPandas()
    )
    direct = (
        ev.groupBy(F.date_trunc("day", "ts").alias("bucket"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .orderBy("bucket", "event_type")
        .toPandas()
    )
    assert rolled.equals(direct)
    # week-from-hour equals week-from-day (rollup is associative)
    wk_from_hour = finish(rollup_to(time_partials(ev, grain="hour"), grain="week")).orderBy("bucket", "event_type").toPandas()
    wk_from_day = finish(rollup_to(rollup_to(time_partials(ev, grain="hour"), grain="day"), grain="week")).orderBy("bucket", "event_type").toPandas()
    assert wk_from_hour.equals(wk_from_day)


def test_format_roundtrip_orc_json_csv(spark, tmp_path):
    from databeats_spark.sources.files import read_table, write_table
    from databeats_spark.sources.tables import load_tables
    from tests.conftest import SF_SMOKE
    import pytest as _pytest

    nation = load_tables(spark, SF_SMOKE, ["nation"]).nation
    exp = nation.orderBy("n_nationkey").toPandas()
    for fmt in ("parquet", "orc", "json", "csv"):
        path = str(tmp_path / f"t_{fmt}")
        write_table(nation, path, fmt=fmt)
        got = read_table(spark, path, fmt=fmt, schema=nation.schema).orderBy("n_nationkey").toPandas()
        assert got.equals(exp), fmt
    with _pytest.raises(ValueError):
        write_table(nation, str(tmp_path / "x"), fmt="avro")
    with _pytest.raises(ValueError):
        read_table(spark, str(tmp_path / "t_json"), fmt="json")  # schema required


class TestScd2:
    def _dim(self, spark):
        from databeats_spark.sources.tables import load_tables
        from tests.conftest import SF_SMOKE

        c = load_tables(spark, SF_SMOKE, ["customer"]).customer
        return c.select(
            "c_custkey",
            "c_mktsegment",
            F.lit("2020-01-01").alias("valid_from"),
            F.lit(None).cast("string").alias("valid_to"),
        )

    def test_change_closes_and_opens(self, spark):
        from databeats_spark.operators.maintenance import scd2_apply

        dim = self._dim(spark)
        n0 = dim.count()
        changes = spark.createDataFrame(
            [(1, "MOVED", "2021-06-01"), (2, "MOVED", "2021-06-01")],
            "c_custkey long, c_mktsegment string, change_ts string",
        )
        out = scd2_apply(dim, changes, "c_custkey", ["c_mktsegment"], "change_ts")
        assert out.count() == n0 + 2  # two new versions appended
        k1 = {tuple(r) for r in out.filter(F.col("c_custkey") == 1).collect()}
        old = dim.filter(F.col("c_custkey") == 1).collect()[0]["c_mktsegment"]
        assert k1 == {
            (1, old, "2020-01-01", "2021-06-01"),
            (1, "MOVED", "2021-06-01", None),
        }
        # exactly one open row per key, everywhere
        opens = out.filter(F.col("valid_to").isNull()).groupBy("c_custkey").count()
        assert opens.filter(F.col("count") != 1).count() == 0

    def test_idempotent_and_new_key(self, spark):
        from databeats_spark.operators.maintenance import scd2_apply

        dim = self._dim(spark)
        changes = spark.createDataFrame(
            [(1, "MOVED", "2021-06-01"), (999999, "FRESH", "2021-06-01")],
            "c_custkey long, c_mktsegment string, change_ts string",
        )
        once = scd2_apply(dim, changes, "c_custkey", ["c_mktsegment"], "change_ts")
        assert once.filter(F.col("c_custkey") == 999999).count() == 1
        # re-applying the identical batch is a no-op (attr-equal changes)
        twice = scd2_apply(once, changes, "c_custkey", ["c_mktsegment"], "change_ts")
        assert twice.count() == once.count()
        assert twice.exceptAll(once).count() == 0

    def test_newest_change_wins_within_batch(self, spark):
        from databeats_spark.operators.maintenance import scd2_apply

        dim = self._dim(spark)
        changes = spark.createDataFrame(
            [(5, "MID", "2021-01-01"), (5, "LAST", "2021-09-09")],
            "c_custkey long, c_mktsegment string, change_ts string",
        )
        out = scd2_apply(dim, changes, "c_custkey", ["c_mktsegment"], "change_ts")
        open5 = out.filter((F.col("c_custkey") == 5) & F.col("valid_to").isNull()).collect()
        assert [(r["c_mktsegment"], r["valid_from"]) for r in open5] == [("LAST", "2021-09-09")]
