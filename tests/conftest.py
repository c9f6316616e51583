from __future__ import annotations

import os

import duckdb
import pytest

from databeats_spark.session import get_spark
from databeats_spark.sources.tables import TESTDATA_TABLES

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="databeats_tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for sf, prefix in ((SF_SMOKE, "smoke"), (SF_CORRECT, "t2")):
        for t in TESTDATA_TABLES:
            con.execute(
                f"CREATE VIEW {prefix}_{t} AS SELECT * FROM '{sf}/{t}.parquet'"
            )
    # default (driver-like) views point at the t2 scale
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_CORRECT}/{t}.parquet'")
    yield con
    con.close()
