"""t1 smoke: the driver entry point and every registry query run at
sf0.001 and produce stable schemas."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from databeats_spark.registry import registry
from tests.conftest import SF_SMOKE


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"user_id", "streak"}


def test_queries_and_oracles_aligned():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20


@pytest.mark.parametrize("spec", registry(), ids=lambda s: s.name)
def test_query_smoke(spark, spec):
    df = spec.build(spark, SF_SMOKE)
    assert df.columns  # schema resolves
    df.limit(5).collect()  # plan executes


def test_entry_twice_same_session(spark):
    a = entry_mod.entry(spark).collect()
    b = entry_mod.entry(spark).collect()
    assert a == b and len(a) >= 1


def test_trailing_slash_sf_dir(spark):
    q = entry_mod.queries()
    n1 = q["pricing_summary"](spark, SF_SMOKE).count()
    n2 = q["pricing_summary"](spark, SF_SMOKE + "/").count()
    assert n1 == n2 > 0


def test_bad_sf_dir_raises_cleanly(spark):
    from pyspark.errors.exceptions.captured import AnalysisException

    q = entry_mod.queries()
    with pytest.raises(AnalysisException):
        q["pricing_summary"](spark, "/root/testdata/does_not_exist").count()


def test_id_key_contracts_behind_limit_noops(spark):
    """Several queries prove plan-boundedness with a semantic no-op
    .limit(N) placed after a filter like `vec_id < N` — a no-op ONLY
    while ids are unique non-negative keys (r5 ADVICE: if that fixture
    contract ever broke, the limit would silently truncate). Pin the
    contract at both test scales so a drifted generator fails loudly
    here, not as a silent wrong answer."""
    from pyspark.sql import functions as F

    from databeats_spark.sources.tables import load_tables
    from tests.conftest import SF_CORRECT, SF_SMOKE

    for sf in (SF_SMOKE, SF_CORRECT):
        t = load_tables(spark, sf, ["embeddings", "documents"])
        for df, key in ((t.embeddings, "vec_id"), (t.documents, "doc_id")):
            row = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct(key).alias("d"),
                F.min(key).alias("lo"),
            ).collect()[0]
            assert row["n"] == row["d"], f"{key} not unique at {sf}"
            assert row["lo"] >= 0, f"{key} negative at {sf}"
