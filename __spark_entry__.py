"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``databeats_spark`` package; this module
just adapts the registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the weekly-chart-streak
    pipeline — the re-expression of the reference's get_week_on_chart
    (dag.py:118-154) as pure window compositions."""
    from databeats_spark.registry import queries

    return queries()["weekly_chart_streak"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from databeats_spark.registry import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from databeats_spark.registry import oracle_sql as _oracle_sql

    return _oracle_sql()
