"""Modern SQL surfaces (round-2 batch) — Spark 4 features the
reference's pandas stack has no counterpart for, each pinned against
the oracle:

- recursive_week_spine: WITH RECURSIVE (Spark 4 recursion) generating
  a weekly calendar spine, gap-filled against per-week order counts.
  The IDENTICAL ANSI text runs on both engines (the sql_api_revenue
  pattern) — recursion depth is the spine length (bounded, driver-side
  iteration count), while the heavy side (orders) stays a single
  hash aggregate.
- variant_props_stats: semi-structured VARIANT ingestion —
  parse_json into a Variant column, typed extraction via variant_get,
  then plain grouped aggregation. The oracle reads the same JSON with
  DuckDB's extraction functions; outputs are plain BIGINTs so the
  hash compare stays engine-neutral.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databeats_spark.registry import QuerySpec
from databeats_spark.sources.tables import load_tables, register_views


# --- Q: recursive_week_spine ------------------------------------------
# A 25-week calendar spine built by recursion, LEFT-joined to weekly
# order counts so order-free weeks surface as zero (the gap-filling
# semantics weekly_resample gets from sequence(); here the spine is
# the ANSI-recursive form). date_trunc('week') is Monday-start on both
# engines; the week_start output is an ISO string per parity rules.

_RECURSIVE_WEEK_SPINE_SQL = """
WITH RECURSIVE spine(week_start) AS (
  SELECT CAST('1995-01-02' AS DATE)
  UNION ALL
  SELECT week_start + INTERVAL '7' DAY FROM spine
  WHERE week_start < CAST('1995-06-19' AS DATE)
),
weekly AS (
  SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
)
SELECT CAST(s.week_start AS VARCHAR(10)) AS week_start,
       CAST(COALESCE(w.n_orders, 0) AS BIGINT) AS n_orders
FROM spine s LEFT JOIN weekly w ON w.week_start = s.week_start
ORDER BY s.week_start
"""


def _recursive_week_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_RECURSIVE_WEEK_SPINE_SQL)


# --- Q: variant_props_stats -------------------------------------------
# The VARIANT data type end-to-end: JSON text → parse_json → Variant →
# variant_get typed extraction → grouped aggregation. Compared with
# json_props (get_json_object string extraction), Variant parses once
# into a binary-encoded tree and every later extraction is a cheap
# path walk — the 100 TB answer for repeatedly-queried JSON columns.

def _variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return (
        t.events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
        .orderBy("event_type")
    )


_VARIANT_PROPS_STATS_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
FROM events
GROUP BY event_type
ORDER BY event_type
"""


SPECS = [
    QuerySpec("recursive_week_spine", "WITH RECURSIVE calendar spine, identical ANSI on both engines", _recursive_week_spine, _RECURSIVE_WEEK_SPINE_SQL, tags=("sql", "timeseries")),
    QuerySpec("variant_props_stats", "VARIANT parse_json + variant_get typed extraction", _variant_props_stats, _VARIANT_PROPS_STATS_SQL, tags=("sql", "scalar")),
]
