"""Declarative data-quality expectations — the Deequ-style check pass.

The reference validates nothing on ingest (its pandas pipelines crash
on surprise schema changes, reference dag.py); a 100 TB pipeline
instead declares expectations and aggregates violations in ONE scan:
every rule becomes a conditional-count column of the same aggregate,
so checking 20 rules costs exactly one pass over the data — never one
job per rule (the naive expectation-framework trap).

Rules are plain boolean Columns, so anything expressible in the
DataFrame API is a rule, and Catalyst folds all of them into a single
partial→final hash aggregate with map-side combine.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expect(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """Evaluate every expectation in one scan.

    ``rules`` maps rule name → boolean Column that is TRUE when the
    row SATISFIES the expectation (NULL counts as a violation — an
    unevaluable expectation is a failed one).

    Returns one row per rule: (rule, n_rows, n_violations,
    violation_rate) — the shape a pipeline gate thresholds on.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, cond in rules.items():
        aggs.append(
            F.sum(
                F.when(cond.isNull() | ~cond, 1).otherwise(0)
            ).cast("bigint").alias(f"__v_{name}")
        )
    wide = df.agg(*aggs)
    # unpivot the single wide row into (rule, n_violations)
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"), F.col(f"__v_{name}").alias("n_violations")
            )
            for name in rules
        ]
    )
    return (
        wide.select("n_rows", F.explode(pairs).alias("p"))
        .select(
            F.col("p.rule").alias("rule"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("p.n_violations").alias("n_violations"),
            F.round(F.col("p.n_violations") / F.col("n_rows"), 6).alias("violation_rate"),
        )
        .orderBy("rule")
    )
