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
