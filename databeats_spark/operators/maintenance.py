"""Table maintenance operators: upsert (MERGE emulation), profiling,
compaction — the housekeeping a long-lived 100 TB table needs.

The reference maintains its snapshot by TRUNCATE + full reload
(dag.py:827-849). The scalable ladder implemented here:

- partition-level overwrite (plans/etl.write_history — already used);
- row-level :func:`upsert` — MERGE INTO emulated with anti-join +
  union (no Delta/Iceberg jars in this image; with them, this function
  body becomes one ``MERGE`` statement);
- :func:`profile_numeric` — one-pass per-column stats for data-quality
  gates (null rates, distincts, ranges);
- :func:`compact` — small-file compaction (streaming sinks and
  incremental merges accrete small files; scans degrade).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert(target: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE: rows in ``updates`` replace same-key rows in ``target``;
    unmatched update rows insert. One anti-join + union — both sides
    shuffle once on the key."""
    kept = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    return kept.unionByName(updates.select(*target.columns))


def apply_upsert(spark: SparkSession, path: str, updates: DataFrame, keys: list[str]) -> None:
    """Read-modify-write upsert for a parquet table (the no-lakehouse
    fallback; Delta's MERGE does this transactionally at file level).
    The result materializes BEFORE the overwrite via a temp suffix —
    overwriting a path that feeds the running plan would be read-
    your-own-delete."""
    target = spark.read.parquet(path)
    merged = upsert(target, updates, keys)
    tmp = path + "__staging"
    merged.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(path)


def profile_numeric(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass-per-column data-quality profile in long format:
    (column, n_rows, n_null, n_distinct, min_val, max_val, mean_val).
    Every metric is deterministic → oracle-checkable."""
    parts = []
    for c in cols:
        parts.append(
            df.select(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias("n_null"),
                F.countDistinct(c).alias("n_distinct"),
                F.min(c).cast("double").alias("min_val"),
                F.max(c).cast("double").alias("max_val"),
                F.round(
                    F.sum(F.col(c).cast("decimal(18,2)")).cast("double") / F.count(c), 6
                ).alias("mean_val"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


def compact(spark: SparkSession, path: str, target_files: int = 8) -> int:
    """Rewrite a parquet directory into ``target_files`` files;
    returns the row count (the invariant the caller should assert)."""
    df = spark.read.parquet(path)
    n = df.count()
    tmp = path + "__compacting"
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    compacted = spark.read.parquet(tmp)
    compacted.write.mode("overwrite").parquet(path)
    return n
