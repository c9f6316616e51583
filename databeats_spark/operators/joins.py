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
    direction: str = "backward",
) -> DataFrame:
    """Inclusive as-of join, backward (default) or forward.

    ``on``: the ordering column (same name both sides, e.g. event time);
    ``by``: equi-join keys; ``value_cols``: right-side columns to carry;
    ``right_tie_breakers``: makes the pick deterministic when multiple
    right rows share (by, on) — the LAST row in this order wins;
    ``direction``: "backward" picks the most recent right row with
    right.on <= left.on, "forward" the nearest with right.on >= left.on
    (the mirror image: identical union + running-last plan, just with
    the ``on`` ordering reversed — no second code path to maintain).
    """
    assert direction in ("backward", "forward"), direction
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

    # right rows sort BEFORE left rows at equal ts (inclusive pick);
    # among right rows at the same instant, tie-breakers order the
    # winner last so running-last picks it deterministically. Forward
    # = the same running-last walk over the REVERSED on-ordering.
    on_order = F.col("__on") if direction == "backward" else F.col("__on").desc()
    order: list[Column] = [on_order, F.col("__is_r").desc()]
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


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: Sequence[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket: str = "1 hour",
) -> DataFrame:
    """Point-in-interval range join: every (point, interval) pair with
    equal ``keys`` and ``start_ts <= point_ts <= end_ts`` (inclusive
    both ends).

    Naively this is a non-equi join — Spark plans it as a broadcast
    nested loop (or worse, a cartesian product), which dies at scale.
    The scale path here is interval bucketing: quantize time into
    fixed-width buckets, map each point to its single bucket, explode
    each interval to every bucket it covers, then EQUI-join on
    (keys, bucket) and apply the exact containment filter. A point
    lies in exactly one bucket, so each qualifying pair matches
    exactly once — no dedup pass. Cost: shuffle on (keys, bucket) +
    an interval blowup of ceil(span/bucket)+1 rows, tunable via
    ``bucket`` to match the workload's typical span.

    Both inputs keep all their columns; name collisions (other than
    ``keys``) must be resolved upstream.
    """
    keys = list(keys)
    bucket_us = _interval_to_us(bucket)
    # integer `div`, not float division: µs epochs sit near 2^50 and
    # the bucket id must be exact for the equi-join to be lossless
    p = points.withColumn("__bkt", F.expr(f"unix_micros({point_ts}) div {bucket_us}"))
    i = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros({start_ts}) div {bucket_us}"),
                F.expr(f"unix_micros({end_ts}) div {bucket_us}"),
            )
        ),
    )
    return (
        p.join(i, keys + ["__bkt"])
        .filter(
            (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
        )
        .drop("__bkt")
    )


def _interval_to_us(spec: str) -> int:
    """'90 minutes' → microseconds. Units: seconds/minutes/hours/days."""
    qty, unit = spec.split()
    scale = {
        "second": 1_000_000,
        "seconds": 1_000_000,
        "minute": 60_000_000,
        "minutes": 60_000_000,
        "hour": 3_600_000_000,
        "hours": 3_600_000_000,
        "day": 86_400_000_000,
        "days": 86_400_000_000,
    }[unit]
    return int(qty) * scale
