"""Relational operator inventory over the TPC-H-ish tables.

Covers SURVEY.md §2.3-§2.8: projections/filters (P1-P3, F1-F8),
joins (J1-J6), aggregations (A1-A7), windows (W1-W6), sorts/limits
(O1-O3), set ops (U1-U2), plus grouping-set/rollup and running-total
extensions the reference leaves to Catalyst.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from databeats_spark.operators.dedup import dedup_first
from databeats_spark.operators.windows import (
    latest_per_key,
    per_parent_limit,
    running_total,
    top_k_per_group,
)
from databeats_spark.registry import QuerySpec
from databeats_spark.sources.tables import load_tables


def dec(c: str | Column) -> Column:
    """Exact-arithmetic money cast (see registry/__init__ parity rules)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(18,2)")


def money_sum(c: str | Column) -> Column:
    return F.sum(dec(c)).cast("double")


# --- Q: pricing_summary -----------------------------------------------
# TPC-H Q1 shape: scan-heavy groupBy with 8 aggregates. Exercises A1/A6
# partial aggregation (map-side combine) — the canonical 100 TB agg.

def _pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem"])
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    charge = disc_price * (F.lit(1) + dec("l_tax"))
    return (
        t.lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.round(F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.round(F.sum(dec("l_extendedprice")).cast("double") / F.count(F.lit(1)), 6).alias("avg_price"),
            F.round(F.sum(dec("l_discount")).cast("double") / F.count(F.lit(1)), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
       round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- Q: filter_project ------------------------------------------------
# F1/F2 predicates + P1 projection; filters and the 5-column ReadSchema
# must reach the parquet scan (PushedFilters in .explain).

def _filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem"])
    return (
        t.lineitem.filter(
            (F.col("l_discount") > 0.02)
            & (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_quantity") >= 25)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


_FILTER_PROJECT_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
       strftime(l_shipdate, '%Y-%m-%d') AS ship_date
FROM lineitem
WHERE l_discount > 0.02 AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_quantity >= 25
ORDER BY l_orderkey, l_linenumber
"""


# --- Q: top_customers --------------------------------------------------
# W4/O2: global top-20 by metric (reference app.py:62-63 "top 20 by
# popularity"). Aggregate first, then broadcast-join the small dim.

def _top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    return (
        t.orders.groupBy("o_custkey")
        .agg(money_sum("o_totalprice").alias("total_spend"), F.count(F.lit(1)).alias("n_orders"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "total_spend", "n_orders")
        .orderBy(F.col("total_spend").desc(), "c_custkey")
        .limit(20)
    )


_TOP_CUSTOMERS_SQL = """
SELECT c.c_custkey, c.c_name,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
       CAST(count(*) AS BIGINT) AS n_orders
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey, c.c_name
ORDER BY total_spend DESC, c.c_custkey
LIMIT 20
"""


# --- Q: top_orders_per_customer ----------------------------------------
# W1/W5 top-k per group with explicit tie-break (reference dag.py:127-135
# per-snapshot top-50; pandas head(50) keeps ties by prior sort order —
# here the (totalprice DESC, orderkey) total order pins determinism).

def _top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    out = top_k_per_group(
        t.orders,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
        keep_rank="rnk",
    )
    return out.select(
        "o_custkey", "o_orderkey", "o_totalprice", F.col("rnk").cast("long").alias("rnk")
    ).orderBy("o_custkey", "rnk")


_TOP_ORDERS_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
) WHERE rnk <= 3
ORDER BY o_custkey, rnk
"""


# --- Q: customer_order_stats -------------------------------------------
# J1 left-outer join + aggregate; customers with zero orders must
# survive with n_orders=0 (pandas left-join NaN vs Spark NULL hazard,
# SURVEY §7 "hard parts").

def _customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(money_sum("o_totalprice"), F.lit(0.0)).alias("spend"),
        )
        .orderBy("c_custkey")
    )


_CUSTOMER_ORDER_STATS_SQL = """
SELECT c.c_custkey,
       CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
       coalesce(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS spend
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey
ORDER BY c.c_custkey
"""


# --- Q: customers_without_orders ----------------------------------------
# J4 anti join (reference dag.py:85-93 "skip ids already present").

def _customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # anti join on a filtered right side (every customer has SOME order
    # in this data; "no order above 300k" keeps the check non-trivial)
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    big = t.orders.filter(F.col("o_totalprice") > 300000)
    return (
        t.customer.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    )


_CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
)
ORDER BY c_custkey
"""


# --- Q: customers_with_big_orders ---------------------------------------
# Semi join (EXISTS) — the dual of J4.

def _customers_with_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    big = t.orders.filter(F.col("o_totalprice") > 300000)
    return (
        t.customer.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


_CUSTOMERS_WITH_BIG_ORDERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
ORDER BY c_custkey
"""


# --- Q: revenue_by_nation ------------------------------------------------
# J2/J6 multi-join star query (TPC-H Q5 shape): fact ⋈ three dims.
# nation/region/customer are broadcast; only lineitem⋈orders shuffles.

def _revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "customer", "nation", "region"])
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    # Pre-aggregate the fact table on the join key BEFORE the join:
    # Catalyst won't push an aggregate through a join itself, and the
    # manual rewrite means the orderkey shuffle carries one partial row
    # per order (map-side combined) instead of every lineitem — ~4×
    # less shuffle I/O here, more at the skewed tail. Result-identical
    # because sum/count decompose over the orderkey partition.
    per_order = t.lineitem.groupBy("l_orderkey").agg(
        F.sum(revenue).alias("rev_dec"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        per_order.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name"), F.col("r_name").alias("region_name"))
        .agg(
            F.sum("rev_dec").cast("double").alias("revenue"),
            F.sum("cnt").cast("long").alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


_REVENUE_BY_NATION_SQL = """
SELECT n.n_name, r.r_name AS region_name,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name, r.r_name
ORDER BY revenue DESC, n.n_name
"""


# --- Q: promo_revenue_ratio — Q14 shape: conditional ratio per month -----

def _promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    promo_dec = F.sum(F.when(F.col("p_type") == "PROMO", rev))
    total_dec = F.sum(rev)
    return (
        t.lineitem.join(
            t.part.select("p_partkey", "p_type"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias("ship_month"))
        .agg(
            F.round(
                F.lit(100.0) * F.coalesce(promo_dec, F.lit(0)).cast("double")
                / total_dec.cast("double"),
                6,
            ).alias("promo_pct"),
            total_dec.cast("double").alias("total_revenue"),
        )
        .orderBy("ship_month")
    )


_PROMO_REVENUE_RATIO_SQL = """
SELECT strftime(date_trunc('month', l.l_shipdate), '%Y-%m') AS ship_month,
       round(100.0 * CAST(coalesce(sum(CASE WHEN p.p_type = 'PROMO'
                   THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2))) END), 0) AS DOUBLE)
             / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6)
         AS promo_pct,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS total_revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1
ORDER BY ship_month
"""


# --- Q: late_shipment_orders — Q4 shape: correlated EXISTS + extra pred --
# The semi join's condition mixes the equi key with a non-equi date
# predicate — Spark plans the equi part as the join and the rest as a
# post-join filter inside the semi, no nested loop.

LATE_DAYS = 60


def _late_shipment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    cond = (F.col("o_orderkey") == F.col("l_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_DAYS} days")
    )
    return (
        t.orders.join(t.lineitem.select("l_orderkey", "l_shipdate"), cond, "leftsemi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late_orders"))
        .orderBy("o_orderpriority")
    )


_LATE_SHIPMENT_ORDERS_SQL = f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL {LATE_DAYS} DAY
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- Q: union_dedup -------------------------------------------------------
# U1/U2 + A2: union two extracts, distinct (reference dag.py:457-460
# history∪fresh concat + the dead dedup CTAS dag.py:725-733).

def _union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    a = t.orders.filter(F.col("o_totalprice") > 200000).select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    b = t.orders.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_orderdate") >= F.lit("1997-01-01"))
    ).select("o_orderkey", "o_custkey", "o_orderstatus")
    return a.unionByName(b).distinct().orderBy("o_orderkey")


_UNION_DEDUP_SQL = """
SELECT DISTINCT o_orderkey, o_custkey, o_orderstatus
FROM (
  SELECT o_orderkey, o_custkey, o_orderstatus FROM orders WHERE o_totalprice > 200000
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
  WHERE o_orderstatus = 'F' AND o_orderdate >= TIMESTAMP '1997-01-01'
)
ORDER BY o_orderkey
"""


# --- Q: modal_priority ----------------------------------------------------
# A5 mode with deterministic tie-break (reference recommendation.py:65
# statistics.mode of predicted clusters).

def _modal_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    counted = t.orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(F.col("n").desc(), "o_orderpriority")
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderstatus", F.col("o_orderpriority").alias("modal_priority"), "n")
        .orderBy("o_orderstatus")
    )


_MODAL_PRIORITY_SQL = """
SELECT o_orderstatus, o_orderpriority AS modal_priority, CAST(n AS BIGINT) AS n
FROM (
  SELECT o_orderstatus, o_orderpriority, count(*) AS n,
         row_number() OVER (PARTITION BY o_orderstatus ORDER BY count(*) DESC, o_orderpriority) AS rn
  FROM orders GROUP BY o_orderstatus, o_orderpriority
) WHERE rn = 1
ORDER BY o_orderstatus
"""


# --- Q: nation_customer_stats ---------------------------------------------
# A1/A6/A7: multi-aggregate profile per dimension value.

def _nation_customer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "nation"])
    return (
        t.customer.join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
            money_sum("c_acctbal").alias("total_bal"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
        .orderBy("n_name")
    )


_NATION_CUSTOMER_STATS_SQL = """
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(count(DISTINCT c.c_mktsegment) AS BIGINT) AS n_segments,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
       min(c.c_acctbal) AS min_bal,
       max(c.c_acctbal) AS max_bal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""


# --- Q: segment_class ------------------------------------------------------
# D1/D2 conditional derived columns (reference app.py:42,52 id→name
# mapping; recommendation.py:75 boolean membership flag).

def _segment_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer"])
    return (
        t.customer.select(
            "c_custkey",
            F.when(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"), F.lit("consumer"))
            .otherwise(F.lit("other"))
            .alias("segment_class"),
            (F.col("c_acctbal") > 0).alias("positive_bal"),
        )
        .orderBy("c_custkey")
    )


_SEGMENT_CLASS_SQL = """
SELECT c_custkey,
       CASE WHEN c_mktsegment IN ('BUILDING','AUTOMOBILE') THEN 'consumer' ELSE 'other' END AS segment_class,
       (c_acctbal > 0) AS positive_bal
FROM customer
ORDER BY c_custkey
"""


# --- Q: rollup_quantity ------------------------------------------------------
# Grouping sets (free from Catalyst; absent in the reference, SURVEY §2.5).

def _rollup_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem"])
    return (
        t.lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("rf"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("ls"),
            "sum_qty",
            "n",
        )
        .orderBy("rf", "ls")
    )


_ROLLUP_QUANTITY_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS rf,
       coalesce(l_linestatus, 'ALL') AS ls,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY rf, ls
"""


# --- Q: running_spend ---------------------------------------------------------
# Window frame (ROWS UNBOUNDED PRECEDING) — cumulative per-entity metric.

def _running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    small = t.orders.filter(F.col("o_custkey") < 100)
    out = running_total(
        small,
        ["o_custkey"],
        [F.col("o_orderdate"), F.col("o_orderkey")],
        dec("o_totalprice"),
        out_col="running_spend",
    )
    return out.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.col("running_spend").cast("double").alias("running_spend"),
    ).orderBy("o_custkey", "order_date", "o_orderkey")


_RUNNING_SPEND_SQL = """
SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
FROM orders
WHERE o_custkey < 100
ORDER BY o_custkey, order_date, o_orderkey
"""


# --- Q: first_lineitems_per_order ----------------------------------------------
# W5 per-parent limit (reference: first 3 albums per artist,
# ETL_Experiment cell-19).

def _first_lineitems_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem"])
    out = per_parent_limit(
        t.lineitem.filter(F.col("l_orderkey") < 1000),
        "l_orderkey",
        [F.col("l_linenumber")],
        n=2,
    )
    return out.select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity").orderBy(
        "l_orderkey", "l_linenumber"
    )


_FIRST_LINEITEMS_SQL = """
SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
FROM (
  SELECT *, row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS rn
  FROM lineitem WHERE l_orderkey < 1000
) WHERE rn <= 2
ORDER BY l_orderkey, l_linenumber
"""


# --- Q: latest_order_per_customer ------------------------------------------------
# W2 latest-row-per-entity (reference dag.py:122,139 group.iloc[-1]).

def _latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    out = latest_per_key(t.orders, ["o_custkey"], "o_orderdate", tie_breakers=["o_orderkey"])
    return out.select(
        "o_custkey", "o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"), "o_totalprice"
    ).orderBy("o_custkey")


_LATEST_ORDER_SQL = """
SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_totalprice
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
ORDER BY o_custkey
"""


# --- Q: dedup_first_order ----------------------------------------------------------
# A3 deterministic dedup-by-key-subset (reference drop_duplicates keeps
# FIRST in current order, dag.py:462-464; Spark needs an explicit order).

def _dedup_first_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    out = dedup_first(
        t.orders,
        keys=["o_custkey", "o_orderstatus"],
        order_by=[F.col("o_orderdate"), F.col("o_orderkey")],
    )
    return out.select(
        "o_custkey", "o_orderstatus", "o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date")
    ).orderBy("o_custkey", "o_orderstatus")


_DEDUP_FIRST_ORDER_SQL = """
SELECT o_custkey, o_orderstatus, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderstatus ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
) WHERE rn = 1
ORDER BY o_custkey, o_orderstatus
"""


# --- Q: nation_market_share — Q8 shape: conditional share per year --------
# Two-sided star: the SUPPLIER side decides the numerator (is the line
# supplied by the target nation?), the CUSTOMER side gates membership
# (buyer lives in the target region — a semi join, so no fan-out). All
# dims broadcast; the only shuffles are lineitem→orders on orderkey and
# the final tiny per-year aggregate.

MKT_REGION = "EUROPE"
MKT_SUPP_NATION = "NATION_7"
MKT_PART_TYPE = "STANDARD"


def _nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir,
        ["lineitem", "orders", "customer", "supplier", "nation", "region", "part"],
    )
    region_custs = (
        t.customer.join(
            F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == MKT_REGION)
        .select("c_custkey")
    )
    supp_nation = t.supplier.join(
        F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    target_dec = F.sum(F.when(F.col("supp_nation") == MKT_SUPP_NATION, rev))
    total_dec = F.sum(rev)
    return (
        t.lineitem.join(
            t.part.filter(F.col("p_type") == MKT_PART_TYPE).select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            t.orders.filter(
                (F.col("o_orderdate") >= F.lit("1995-01-01"))
                & (F.col("o_orderdate") < F.lit("1997-01-01"))
            ).select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(region_custs, F.col("o_custkey") == F.col("c_custkey"), "leftsemi")
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.coalesce(target_dec, F.lit(0)).cast("double")
                / total_dec.cast("double"),
                6,
            ).alias("mkt_share"),
            total_dec.cast("double").alias("total_revenue"),
        )
        .orderBy("o_year")
    )


_NATION_MARKET_SHARE_SQL = f"""
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       round(CAST(coalesce(sum(CASE WHEN n2.n_name = '{MKT_SUPP_NATION}'
                   THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2))) END), 0) AS DOUBLE)
             / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6)
         AS mkt_share,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS total_revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = '{MKT_PART_TYPE}'
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE c.c_custkey = o.o_custkey AND r.r_name = '{MKT_REGION}'
  )
GROUP BY 1
ORDER BY o_year
"""


# --- Q: blocking_suppliers — Q21 shape: EXISTS + NOT EXISTS self-join -----
# "Suppliers who kept multi-supplier orders waiting": the late line's
# supplier qualifies only if ANOTHER supplier shipped on the order
# (semi self-join, orderkey equi + suppkey non-equi) and NO OTHER
# supplier was also late (anti self-join, same key shape). Spark plans
# both as hash joins on l_orderkey with the suppkey inequality as a
# post-join predicate — no nested loop, and the two self-joins reuse
# the lineitem shuffle partitioning.

BLOCKING_LATE_DAYS = 60


def _blocking_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "supplier"])
    li = t.lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        li.join(
            t.orders.filter(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {BLOCKING_LATE_DAYS} days")
        )
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("s2_suppkey")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("s3_suppkey")
    )
    blockers = late.join(
        others,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("s2_suppkey")),
        "leftsemi",
    ).join(
        late_others,
        (F.col("l_orderkey") == F.col("o3_orderkey"))
        & (F.col("l_suppkey") != F.col("s3_suppkey")),
        "leftanti",
    )
    return (
        blockers.join(
            t.supplier.select("s_suppkey", "s_name"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


_BLOCKING_SUPPLIERS_SQL = f"""
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l.l_shipdate > o.o_orderdate + INTERVAL {BLOCKING_LATE_DAYS} DAY
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM late l1
JOIN supplier s ON l1.l_suppkey = s.s_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
"""


SPECS = [
    QuerySpec("pricing_summary", "TPC-H Q1 shape: filter + 8-agg groupBy (A-series)", _pricing_summary, _PRICING_SUMMARY_SQL, bench=True, tags=("agg",)),
    QuerySpec("filter_project", "F1/F2 predicates + P1 projection with pushdown", _filter_project, _FILTER_PROJECT_SQL, bench=True, tags=("filter",)),
    QuerySpec("top_customers", "W4 global top-20 by aggregated metric", _top_customers, _TOP_CUSTOMERS_SQL, bench=True, tags=("agg", "join", "sort")),
    QuerySpec("top_orders_per_customer", "W1 top-k per group, deterministic ties", _top_orders_per_customer, _TOP_ORDERS_PER_CUSTOMER_SQL, tags=("window",)),
    QuerySpec("customer_order_stats", "J1 left join + agg with zero-order customers", _customer_order_stats, _CUSTOMER_ORDER_STATS_SQL, tags=("join",)),
    QuerySpec("customers_without_orders", "J4 anti join", _customers_without_orders, _CUSTOMERS_WITHOUT_ORDERS_SQL, tags=("join",)),
    QuerySpec("customers_with_big_orders", "semi join (EXISTS)", _customers_with_big_orders, _CUSTOMERS_WITH_BIG_ORDERS_SQL, tags=("join",)),
    QuerySpec("revenue_by_nation", "J2/J6 star join: fact + 4 broadcast dims", _revenue_by_nation, _REVENUE_BY_NATION_SQL, bench=True, tags=("join", "agg")),
    QuerySpec("union_dedup", "U1/U2 union + distinct", _union_dedup, _UNION_DEDUP_SQL, tags=("setop",)),
    QuerySpec("promo_revenue_ratio", "Q14 shape: conditional revenue ratio per ship month", _promo_revenue_ratio, _PROMO_REVENUE_RATIO_SQL, tags=("join", "agg")),
    QuerySpec("late_shipment_orders", "Q4 shape: correlated EXISTS with non-equi date predicate", _late_shipment_orders, _LATE_SHIPMENT_ORDERS_SQL, tags=("join", "subquery")),
    QuerySpec("modal_priority", "A5 mode with deterministic tie-break", _modal_priority, _MODAL_PRIORITY_SQL, tags=("agg",)),
    QuerySpec("nation_customer_stats", "A1/A6/A7 multi-agg profile", _nation_customer_stats, _NATION_CUSTOMER_STATS_SQL, tags=("agg",)),
    QuerySpec("segment_class", "D1/D2 conditional derived columns", _segment_class, _SEGMENT_CLASS_SQL, tags=("project",)),
    QuerySpec("rollup_quantity", "ROLLUP grouping sets", _rollup_quantity, _ROLLUP_QUANTITY_SQL, tags=("agg",)),
    QuerySpec("running_spend", "window frame running total", _running_spend, _RUNNING_SPEND_SQL, tags=("window",)),
    QuerySpec("first_lineitems_per_order", "W5 per-parent limit", _first_lineitems_per_order, _FIRST_LINEITEMS_SQL, tags=("window",)),
    QuerySpec("latest_order_per_customer", "W2 latest row per entity", _latest_order_per_customer, _LATEST_ORDER_SQL, tags=("window",)),
    QuerySpec("dedup_first_order", "A3 deterministic dedup-by-key", _dedup_first_order, _DEDUP_FIRST_ORDER_SQL, tags=("dedup",)),
    QuerySpec("nation_market_share", "Q8 shape: supplier-nation revenue share per year within a customer region", _nation_market_share, _NATION_MARKET_SHARE_SQL, tags=("join", "agg", "subquery")),
    QuerySpec("blocking_suppliers", "Q21 shape: EXISTS + NOT EXISTS self-joins on late multi-supplier orders", _blocking_suppliers, _BLOCKING_SUPPLIERS_SQL, tags=("join", "subquery")),
]
