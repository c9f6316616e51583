"""As-of join — the classic time-series operator Spark has no native
node for (the reference has no theta/range/as-of joins either,
SURVEY §2.4; this is a north-star extension every event pipeline needs).

Semantics: for each left row, attach the right row with the greatest
``ts`` ≤ the left row's ``ts`` within the same ``by`` key (backward
as-of, inclusive — the DuckDB/pandas default).

Implementation is the union + running-last-value trick, entirely in
native window functions (no mapInPandas, no range explosion):

1. tag both sides, union by (by, ts) — ONE shuffle on the by-key;
2. per key, ordered by (ts, right-before-left at equal ts), the
   running ``last(value, ignorenulls)`` carries each right value
   forward to every later left row;
3. keep the left rows.

At 100 TB this is a single sort-merge pass — same cost profile as any
keyed window — versus a range join's quadratic blowup. pandas
``merge_asof`` per group via applyInPandas would be the fallback for
semantics window functions can't express (e.g. nearest rather than
backward); the backward case never needs Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    value_cols: Sequence[str],
    right_tie_breakers: Sequence[str] = (),
) -> DataFrame:
    """Backward inclusive as-of join.

    ``on``: the ordering column (same name both sides, e.g. event time);
    ``by``: equi-join keys; ``value_cols``: right-side columns to carry;
    ``right_tie_breakers``: makes the pick deterministic when multiple
    right rows share (by, on) — the LAST row in this order wins.
    """
    by = list(by)
    lcols = [c for c in left.columns]
    l_tagged = left.select(
        *by,
        F.col(on).alias("__on"),
        F.lit(0).alias("__is_r"),
        *[F.col(c) for c in lcols if c not in by and c != on],
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__v_{v}") for v in value_cols],
        *[F.lit(None).cast(right.schema[t].dataType).alias(f"__t_{t}") for t in right_tie_breakers],
    )
    r_tagged = right.select(
        *by,
        F.col(on).alias("__on"),
        F.lit(1).alias("__is_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in by and c != on],
        *[F.col(v).alias(f"__v_{v}") for v in value_cols],
        *[F.col(t).alias(f"__t_{t}") for t in right_tie_breakers],
    )
    unioned = l_tagged.unionByName(r_tagged)

    # right rows sort BEFORE left rows at equal ts (inclusive <=);
    # among right rows at the same instant, tie-breakers order the
    # winner last so running-last picks it deterministically
    order: list[Column] = [F.col("__on"), F.col("__is_r").desc()]
    order += [F.col(f"__t_{t}") for t in right_tie_breakers]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(f"__v_{v}"), ignorenulls=True).over(w).alias(v)
            for v in value_cols
        ],
    )
    out = carried.filter(F.col("__is_r") == 0).drop(
        "__is_r",
        *[f"__v_{v}" for v in value_cols],
        *[f"__t_{t}" for t in right_tie_breakers],
    )
    return out.withColumnRenamed("__on", on)
