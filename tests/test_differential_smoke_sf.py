"""Scale-invariance differential: every oracle query compared at
sf0.001 too (the driver gate runs sf0.01 — a constant tuned to one
scale, an empty-at-small-scale edge, or a threshold that only works at
one corpus size shows up here).

Opt-in (DIFF_ALL_SF=1): doubles differential wall-time, so it is not
part of the default suite — run before round end and after touching
any query constant. Unlike the sf0.01 gate, empty results are allowed
(tiny-corpus slices legitimately produce none) as long as both engines
agree exactly.
"""

from __future__ import annotations

import os

import pytest

from databeats_spark.registry import registry
from tests.conftest import SF_SMOKE
from tests.test_differential import assert_frames_match

pytestmark = pytest.mark.skipif(
    os.environ.get("DIFF_ALL_SF") != "1",
    reason="opt-in scale-invariance sweep (set DIFF_ALL_SF=1)",
)

ORACLE_SPECS = [s for s in registry() if s.oracle is not None]


@pytest.fixture(scope="module")
def duck_smoke():
    import duckdb

    from databeats_spark.sources.tables import TESTDATA_TABLES

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=lambda s: s.name)
def test_oracle_parity_at_smoke_sf(spark, duck_smoke, spec):
    spark_pdf = spec.build(spark, SF_SMOKE).toPandas()
    duck_pdf = duck_smoke.execute(spec.oracle).fetchdf()
    assert_frames_match(spark_pdf, duck_pdf, spec.name)
