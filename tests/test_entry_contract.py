"""Driver-contract robustness pins (the r2 regression class): the
grading driver builds a VANILLA SparkSession and calls the
__spark_entry__ surface — these probes run against the shared test
session but exercise the same call patterns driver_sim does.

- entry() must be re-runnable in one session (the driver smoke-checks
  it, then runs queries; nothing may depend on first-call state);
- sf_dir with a trailing slash must behave identically;
- a bad sf_dir must raise the standard PATH_NOT_FOUND analysis error,
  not something swallowed or misleading.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod  # noqa: E402

from tests.conftest import SF_CORRECT  # noqa: E402


def test_entry_is_rerunnable(spark):
    first = entrymod.entry(spark)
    n1 = first.count()
    n2 = entrymod.entry(spark).count()
    assert n1 == n2 and n1 > 0
    assert [f.name for f in first.schema.fields]  # stable, named schema


def test_trailing_slash_sf_dir(spark):
    q = entrymod.queries()["pricing_summary"]
    assert q(spark, SF_CORRECT).count() == q(spark, SF_CORRECT + "/").count()


def test_bad_sf_dir_raises_path_not_found(spark):
    from pyspark.errors import AnalysisException

    q = entrymod.queries()["pricing_summary"]
    with pytest.raises(AnalysisException, match="PATH_NOT_FOUND"):
        q(spark, "/root/testdata/sf_does_not_exist").count()


def test_every_window_query_has_matching_oracle_key(spark):
    """The driver zips queries() with oracle_sql(): every oracle key
    must name a real query, and the front-50 must exist."""
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 50
