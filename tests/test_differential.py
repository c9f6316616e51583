"""t2 differential correctness: every oracle-carrying registry query is
run on Spark AND DuckDB at sf0.01 and compared exactly — the local
mirror of the driver's CORRECTNESS gate (row count + schema + order-
insensitive values).

Comparisons are EXACT (no tolerance): the registry engineers
determinism via decimal aggregation, explicit casts, total-order
tie-breaks, and both-sides rounding. A failure here means the
engineering slipped, not that "floats differ".
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from databeats_spark.registry import registry
from tests.conftest import SF_CORRECT

ORACLE_SPECS = [s for s in registry() if s.oracle is not None]
ROWS_ONLY_SPECS = [s for s in registry() if s.oracle is None]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    a, b = canon(spark_pdf), canon(duck_pdf)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert x == y, f"{name}.{col}[{i}]: {x!r} != {y!r} (diff {x - y!r})"
            else:
                assert x == y, f"{name}.{col}[{i}]: {x!r} != {y!r}"


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=lambda s: s.name)
def test_oracle_parity(spark, duck, spec):
    sdf = spec.build(spark, SF_CORRECT)
    spark_pdf = sdf.toPandas()
    duck_pdf = duck.execute(spec.oracle).fetchdf()
    assert_frames_match(spark_pdf, duck_pdf, spec.name)
    assert len(spark_pdf) > 0, f"{spec.name}: empty result — not a meaningful check"


@pytest.mark.parametrize("spec", ROWS_ONLY_SPECS, ids=lambda s: s.name)
def test_rows_only_runs(spark, spec):
    sdf = spec.build(spark, SF_CORRECT)
    n = sdf.count()
    # Every rows-only spec (sketches, LSH/IVF top-k, near-dup candidate
    # paths) is non-empty at sf0.01 — an empty result means the query
    # silently broke, matching the non-empty guard on the oracle path.
    assert n > 0, f"{spec.name}: empty result — not a meaningful check"
