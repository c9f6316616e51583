"""Classic decision-support shapes (round-2 batch) — the remaining
TPC-H query skeletons the registry didn't yet exercise, adapted to the
testdata schema (no partsupp table, so "offers" come from lineitem):

- Q2  shape: correlated-MIN subquery → window-rank rewrite
- Q11 shape: HAVING against a global scalar (broadcast 1-row agg)
- Q13 shape: distribution-of-aggregates (count-of-counts histogram)
- Q15 shape: max-over-aggregated-view with ties kept
- Q17 shape: per-group AVG subquery, division-free via cross-multiply
- Q22 shape: scalar-avg filter + NOT EXISTS anti join

Reference parity: the reference's pandas pipelines express none of
these (SURVEY §2.5 notes group-by iterate as its only agg pattern);
they are the Catalyst-native completions of that family. Oracle parity
follows the registry recipe — DECIMAL(18,2) money, BIGINT counts,
cross-multiplied comparisons instead of divisions, total-order ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from databeats_spark.operators.scale import attach_global_scalar
from databeats_spark.registry import QuerySpec
from databeats_spark.registry.relational import dec, money_sum
from databeats_spark.sources.tables import load_tables


# --- Q: min_cost_supplier — Q2 shape ----------------------------------
# "For each large part, which supplier ships it cheapest?" The oracle
# spells the textbook correlated-MIN subquery; the Spark side is the
# scale rewrite — one window rank over the part key (a single hash
# shuffle; the correlated form would be a per-row subquery). Ties on
# price broken by suppkey so exactly one row per part survives.

MIN_COST_PART_SIZE = 45


def _min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["part", "supplier", "nation", "lineitem"])
    offers = (
        t.lineitem.join(
            t.part.filter(F.col("p_size") > MIN_COST_PART_SIZE),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("p_partkey", "l_suppkey", dec("l_extendedprice").alias("price"))
    )
    w = Window.partitionBy("p_partkey").orderBy("price", "l_suppkey")
    best = offers.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    supp = t.supplier.join(
        F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        best.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            F.col("price").cast("double").alias("min_price"),
            F.col("s_suppkey").alias("suppkey"),
            "s_name",
            "n_name",
        )
        .orderBy("p_partkey")
    )


_MIN_COST_SUPPLIER_SQL = f"""
SELECT p_partkey,
       CAST(o.price AS DOUBLE) AS min_price,
       o.l_suppkey AS suppkey,
       s.s_name,
       n.n_name
FROM part p
JOIN LATERAL (
  SELECT CAST(l_extendedprice AS DECIMAL(18,2)) AS price, l_suppkey
  FROM lineitem
  WHERE l_partkey = p.p_partkey
  ORDER BY price, l_suppkey
  LIMIT 1
) o ON true
JOIN supplier s ON s.s_suppkey = o.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_size > {MIN_COST_PART_SIZE}
ORDER BY p_partkey
"""


# --- Q: important_parts — Q11 shape -----------------------------------
# Parts carrying more than 1.5× the average part's revenue (the share-
# vs-average form is scale-invariant: a fixed global-share threshold
# goes empty as the part count grows with SF). The global total+count
# scalar derives from the per-part aggregate itself; attach_global_
# scalar materializes that aggregate once (AQE here does not dedupe
# the shared exchange under the broadcast side, so the naive crossJoin
# would scan + shuffle lineitem twice). The threshold
# rev > 1.5 * total/n is cross-multiplied to 2*rev*n > 3*total so both
# engines compare exact decimals instead of dividing.

def _important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem"])
    per_part = t.lineitem.groupBy("l_partkey").agg(
        F.sum(dec("l_extendedprice")).alias("part_rev")
    )
    with_scalar = attach_global_scalar(
        per_part,
        F.sum("part_rev").alias("total_rev"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        with_scalar.filter(F.col("part_rev") * 2 * F.col("n_parts") > F.col("total_rev") * 3)
        .select("l_partkey", F.col("part_rev").cast("double").alias("part_rev"))
        .orderBy(F.desc("part_rev"), "l_partkey")
    )


_IMPORTANT_PARTS_SQL = """
WITH per_part AS (
  SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS part_rev
  FROM lineitem GROUP BY l_partkey
),
scalar AS (
  SELECT sum(part_rev) AS total_rev, CAST(count(*) AS BIGINT) AS n_parts
  FROM per_part
)
SELECT l_partkey, CAST(part_rev AS DOUBLE) AS part_rev
FROM per_part, scalar
WHERE part_rev * 2 * n_parts > total_rev * 3
ORDER BY part_rev DESC, l_partkey
"""


# --- Q: order_count_histogram — Q13 shape -----------------------------
# Distribution of customers by how many non-urgent orders they placed —
# the count-of-counts double aggregation, with the left join keeping
# zero-order customers in the 0 bucket. Two shuffles, both on keys with
# bounded cardinality growth; the second input is already one row per
# customer, so the histogram agg is tiny.

def _order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    orders = t.orders.filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        t.customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_ORDER_COUNT_HISTOGRAM_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --- Q: top_supplier_revenue — Q15 shape ------------------------------
# Supplier(s) with the maximum shipped revenue inside a quarter — the
# max-over-aggregated-view pattern. The max is a broadcast 1-row scalar
# (no global window, which would funnel every row through one
# partition); ties are all kept, per Q15 semantics, and the final sort
# is total-ordered on suppkey.

TOP_SUPPLIER_SHIP_START = "1996-01-01"
TOP_SUPPLIER_SHIP_END = "1996-04-01"


def _top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["supplier", "lineitem"])
    rev = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= TOP_SUPPLIER_SHIP_START)
            & (F.col("l_shipdate") < TOP_SUPPLIER_SHIP_END)
        )
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).alias("total_rev"))
    )
    # max scalar derives from the per-supplier aggregate; materialize it
    # once (see important_parts note on AQE and shared exchanges)
    return (
        attach_global_scalar(rev, F.max("total_rev").alias("max_rev"))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(load_tables(spark, sf_dir, ["supplier"]).supplier,
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            "s_name",
            F.col("total_rev").cast("double").alias("total_rev"),
        )
        .orderBy("suppkey")
    )


_TOP_SUPPLIER_REVENUE_SQL = f"""
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= '{TOP_SUPPLIER_SHIP_START}'
    AND l_shipdate < '{TOP_SUPPLIER_SHIP_END}'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey AS suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_rev
FROM rev r
JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
ORDER BY suppkey
"""


# --- Q: small_qty_revenue — Q17 shape ---------------------------------
# Revenue locked in small orders: lineitems whose quantity is below
# 20% of their part's average quantity. The per-part AVG subquery is an
# aggregate joined back on the part key; the avg comparison
# qty < 0.2 * (sum/n) is cross-multiplied to 5*qty*n < sum so both
# engines stay in exact decimal/bigint arithmetic (no division, no
# float threshold).

def _small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem"])
    per_part = t.lineitem.groupBy("l_partkey").agg(
        F.sum(dec("l_quantity")).alias("qty_sum"),
        F.count(F.lit(1)).alias("qty_n"),
    )
    return (
        t.lineitem.join(per_part, "l_partkey")
        .filter(dec("l_quantity") * 5 * F.col("qty_n") < F.col("qty_sum"))
        .agg(
            money_sum("l_extendedprice").alias("small_qty_rev"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


_SMALL_QTY_REVENUE_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty_sum,
         CAST(count(*) AS BIGINT) AS qty_n
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_qty_rev,
       CAST(count(*) AS BIGINT) AS n_small
FROM lineitem l
JOIN per_part p ON p.l_partkey = l.l_partkey
WHERE CAST(l.l_quantity AS DECIMAL(18,2)) * 5 * p.qty_n < p.qty_sum
"""


# --- Q: idle_high_balance — Q22 shape ---------------------------------
# Market segments' count + balance of customers holding more than half
# the average positive balance who placed no RECENT order (every
# customer has some order in this data, so the NOT EXISTS carries the
# Q22 date predicate): scalar-average filter (cross-multiplied,
# division-free) + NOT EXISTS anti join on the date-filtered orders.
# The scalar is a broadcast 1-row agg; the anti join hashes on custkey.

IDLE_CUTOFF = "1997-08-01"


def _idle_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    pos = t.customer.filter(dec("c_acctbal") > 0)
    avg_scalar = pos.agg(
        F.sum(dec("c_acctbal")).alias("bal_sum"), F.count(F.lit(1)).alias("bal_n")
    )
    rich = (
        t.customer.crossJoin(F.broadcast(avg_scalar))
        .filter(dec("c_acctbal") * 2 * F.col("bal_n") > F.col("bal_sum"))
    )
    recent = t.orders.filter(F.col("o_orderdate") >= IDLE_CUTOFF)
    idle = rich.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return (
        idle.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_idle"),
            money_sum("c_acctbal").alias("idle_bal"),
        )
        .orderBy("c_mktsegment")
    )


_IDLE_HIGH_BALANCE_SQL = f"""
WITH scalar AS (
  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS bal_sum,
         CAST(count(*) AS BIGINT) AS bal_n
  FROM customer WHERE CAST(c_acctbal AS DECIMAL(18,2)) > 0
)
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_idle,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS idle_bal
FROM customer c, scalar
WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * 2 * scalar.bal_n > scalar.bal_sum
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= '{IDLE_CUTOFF}'
  )
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


SPECS = [
    QuerySpec("min_cost_supplier", "Q2 shape: correlated-MIN subquery as window rank", _min_cost_supplier, _MIN_COST_SUPPLIER_SQL, tags=("join", "window", "subquery")),
    QuerySpec("important_parts", "Q11 shape: HAVING vs global scalar, cross-multiplied", _important_parts, _IMPORTANT_PARTS_SQL, tags=("agg", "subquery")),
    QuerySpec("order_count_histogram", "Q13 shape: count-of-counts distribution", _order_count_histogram, _ORDER_COUNT_HISTOGRAM_SQL, tags=("agg", "join")),
    QuerySpec("top_supplier_revenue", "Q15 shape: max over aggregated view, ties kept", _top_supplier_revenue, _TOP_SUPPLIER_REVENUE_SQL, tags=("agg", "subquery")),
    QuerySpec("small_qty_revenue", "Q17 shape: per-group AVG subquery, division-free", _small_qty_revenue, _SMALL_QTY_REVENUE_SQL, tags=("agg", "join")),
    QuerySpec("idle_high_balance", "Q22 shape: scalar-avg filter + NOT EXISTS", _idle_high_balance, _IDLE_HIGH_BALANCE_SQL, tags=("agg", "join")),
]
