"""Scale-path join strategies: skew salting and bucketed co-location.

Neither exists in the reference (single-process pandas has no shuffle
to optimize); both are load-bearing at 100 TB:

- **salted join**: a handful of hot keys (the reference data model has
  them — a few artists own most tracks, SURVEY §1) overload one
  shuffle partition. Salting fans the hot key's rows across
  ``salt_factor`` partitions by joining on (key, salt) with the small
  side replicated per salt value. AQE's skew-join split handles
  moderate skew automatically; explicit salting is for the pathological
  keys AQE can't subdivide (single-key aggregation hotspots).
- **bucketed tables**: pre-hash-partitioning both join sides on the
  key at WRITE time means later joins co-locate with no exchange at
  all — the bucketing discipline the README's 100 TB posture calls
  for. Verified by plan assertion (no Exchange above the join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the large side's hot keys fanned across
    ``salt_factor`` sub-partitions.

    The large side gets a random-but-deterministic salt per row
    (hash of the full row id space would do; xxhash64 of monotonic id
    keeps it cheap); the small side is exploded ×salt_factor so every
    (key, salt) bucket finds its match. Result is row-identical to the
    plain join — only the shuffle layout changes.
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_factor)).cast("int")
    salted_large = large.withColumn("__salt", salt)
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)).cast("array<int>"))
    )
    out = salted_large.join(salted_small, [key, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    buckets: int = 16,
) -> None:
    """Persist hash-bucketed + sorted by ``key``: subsequent joins and
    aggregations on ``key`` between same-bucketed tables require no
    shuffle (SortMergeJoin reads co-located buckets directly)."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner") -> DataFrame:
    """Join two same-key bucketed tables — exchange-free by layout."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def partitioned_running_total(
    df: DataFrame,
    order_by: list[Column],
    value_col: str,
    out_col: str = "running_total",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed prefix sum: running total of ``value_col`` over a
    GLOBAL total order, without the single-partition window funnel.

    ``Window.orderBy(...)`` with no partitionBy collapses all rows into
    ONE task — the classic scale-killer for cumulative metrics. The
    scalable form is the textbook two-phase scan:

    1. range-repartition on the order key (parallel, range-disjoint);
    2. per-partition subtotal (tiny: one row per partition);
    3. exclusive prefix over the subtotals (window over #partitions
       rows — negligible);
    4. broadcast the offsets back; within-partition running sum +
       offset = the exact global running total.

    ``order_by`` must be a TOTAL order (append a unique id) — ties that
    straddle a range boundary would otherwise make step 4 ambiguous.
    The range-partitioned input is localCheckpoint'd so the subtotal
    branch and the main branch cannot re-sample different range
    boundaries (blocks are released when the result is GC'd).
    """
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n_parts, *order_by)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    subtotals = ranged.groupBy("__pid").agg(F.sum(value_col).alias("__sub"))
    offsets = subtotals.select(
        "__pid",
        F.coalesce(
            F.sum("__sub").over(
                Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("__offset"),
    )
    within = F.sum(value_col).over(
        Window.partitionBy("__pid").orderBy(*order_by).rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ranged.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, within + F.col("__offset"))
        .drop("__pid", "__offset")
    )


def top_key_share(df: DataFrame, key: str) -> float:
    """Fraction of rows held by the single heaviest ``key`` value — the
    one-number form of the key_skew_profile diagnosis
    (registry/lifecycle.py), for guards that decide whether to salt a
    join. One hash-aggregate job, two rows back to the driver.

    Returns 0.0 for an empty input (nothing to skew)."""
    row = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(F.max("__n").alias("__top"), F.sum("__n").alias("__total"))
        .collect()[0]
    )
    if not row["__total"]:
        return 0.0
    return float(row["__top"]) / float(row["__total"])


def attach_global_scalar(df: DataFrame, *aggs: Column) -> DataFrame:
    """Attach global aggregate(s) of ``df`` as columns on every row of
    ``df``, computing ``df`` exactly once.

    The naive form — ``df.crossJoin(broadcast(df.agg(...)))`` — leaves
    ``df`` with two consumers. Static planning dedupes the shared
    subtree (ReusedExchange), but AQE in this Spark version does NOT
    reuse canonically-equal exchanges when one sits under the broadcast
    side, so a shared AGGREGATE would scan and shuffle twice. A lazy
    ``localCheckpoint`` pins one materialization: the broadcast scalar
    and the main branch both read the checkpointed blocks. Storage is
    executor-local and freed with the RDD by the context cleaner.

    Use when ``df`` contains a shuffle (an aggregate/join result). For
    a raw filtered scan, skip the helper: re-scanning parquet twice is
    cheaper than materializing the table to executor storage.

    At very large scale note spark.sql.broadcastTimeout: the scalar's
    broadcast waits on the checkpoint materialization, so the timeout
    must cover the shared subtree's runtime (or pre-materialize with
    ``df.localCheckpoint(eager=True)`` before calling).
    """
    base = df.localCheckpoint(eager=False)
    return base.crossJoin(F.broadcast(base.agg(*aggs)))
