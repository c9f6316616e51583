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
