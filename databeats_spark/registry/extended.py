"""Extended operator inventory — capabilities Catalyst gives for free
that the reference never surfaces (SURVEY §2.5/§2.8/§2.9 notes):
string scalar library, INTERSECT/EXCEPT, exact quantiles, lag/lead
deltas, correlated aggregate subqueries, term-frequency explodes, and
exact embedding near-dup pairs (the oracle twin of the LSH path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from databeats_spark.functions.similarity import cosine
from databeats_spark.registry import QuerySpec
from databeats_spark.registry.relational import dec, money_sum
from databeats_spark.sources.tables import load_tables


# --- Q: part_name_features — C-series string scalar functions ---------

def _part_name_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["part"])
    return (
        t.part.select(
            "p_partkey",
            F.upper("p_brand").alias("brand_upper"),
            F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
            F.substring("p_name", 1, 8).alias("name_prefix"),
            F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_padded"),
            F.length("p_name").cast("long").alias("name_len"),
            F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        )
        .orderBy("p_partkey")
    )


_PART_NAME_FEATURES_SQL = """
SELECT p_partkey,
       upper(p_brand) AS brand_upper,
       replace(p_type, ' ', '_') AS type_snake,
       substr(p_name, 1, 8) AS name_prefix,
       lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_padded,
       CAST(length(p_name) AS BIGINT) AS name_len,
       concat_ws('|', p_brand, p_type) AS brand_type
FROM part
ORDER BY p_partkey
"""


# --- Q: math_scalar_features — the numeric scalar library -----------------
# Transcendentals differ in the last ulp across libm implementations;
# round(…, 6) on both sides absorbs that, everything else is exact
# integer/IEEE arithmetic.

MATH_PART_LIMIT = 1000


def _math_scalar_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["part"])
    return (
        t.part.filter(F.col("p_partkey") < MATH_PART_LIMIT)
        .select(
            "p_partkey",
            F.round(F.sqrt("p_retailprice"), 6).alias("sqrt_price"),
            F.round(F.log("p_retailprice"), 6).alias("ln_price"),
            F.round(F.pow(F.col("p_size").cast("double"), F.lit(1.5)), 6).alias("size_pow"),
            (F.col("p_partkey") % 7).alias("key_mod7"),
            F.greatest(F.col("p_size").cast("long"), F.lit(25)).alias("size_floor25"),
            F.least(F.col("p_size").cast("long"), F.lit(25)).alias("size_cap25"),
            F.col("p_partkey").bitwiseAND(F.lit(255)).alias("key_and255"),
            F.col("p_partkey").bitwiseXOR(F.lit(93)).alias("key_xor93"),
            F.abs(F.col("p_size") - 25).cast("long").alias("size_dev"),
            F.signum(F.col("p_size") - 25).cast("long").alias("size_sign"),
        )
        .orderBy("p_partkey")
    )


_MATH_SCALAR_FEATURES_SQL = f"""
SELECT p_partkey,
       round(sqrt(p_retailprice), 6) AS sqrt_price,
       round(ln(p_retailprice), 6) AS ln_price,
       round(pow(CAST(p_size AS DOUBLE), 1.5), 6) AS size_pow,
       p_partkey % 7 AS key_mod7,
       greatest(CAST(p_size AS BIGINT), 25) AS size_floor25,
       least(CAST(p_size AS BIGINT), 25) AS size_cap25,
       p_partkey & 255 AS key_and255,
       xor(p_partkey, 93) AS key_xor93,
       CAST(abs(p_size - 25) AS BIGINT) AS size_dev,
       CAST(sign(p_size - 25) AS BIGINT) AS size_sign
FROM part
WHERE p_partkey < {MATH_PART_LIMIT}
ORDER BY p_partkey
"""


# --- Q: calendar_features — calendar arithmetic edge semantics ------------
# add_months clamps to month-end on BOTH engines (Jan 31 + 1 mo =
# Feb 29); day-of-week is spelled as ISO (Mon=1..Sun=7) because the
# engines' default conventions differ (Spark dayofweek: Sun=1; DuckDB
# dayofweek: Sun=0) — the classic silent-off-by-one, pinned here.

CALENDAR_ORDER_LIMIT = 2000


def _calendar_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    d = F.to_date("o_orderdate")
    return (
        t.orders.filter(F.col("o_orderkey") < CALENDAR_ORDER_LIMIT)
        .select(
            "o_orderkey",
            F.date_format(F.add_months(d, 1), "yyyy-MM-dd").alias("plus_month"),
            F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
            (F.weekday(d) + 1).cast("long").alias("isodow"),
            F.quarter(d).cast("long").alias("qtr"),
            F.dayofyear(d).cast("long").alias("doy"),
        )
        .orderBy("o_orderkey")
    )


_CALENDAR_FEATURES_SQL = f"""
SELECT o_orderkey,
       strftime(CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE), '%Y-%m-%d') AS plus_month,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       CAST(isodow(CAST(o_orderdate AS DATE)) AS BIGINT) AS isodow,
       CAST(quarter(CAST(o_orderdate AS DATE)) AS BIGINT) AS qtr,
       CAST(dayofyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS doy
FROM orders
WHERE o_orderkey < {CALENDAR_ORDER_LIMIT}
ORDER BY o_orderkey
"""


# --- Q: supplier_part_stats — the two remaining tables join ------------

def _supplier_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["supplier", "nation", "lineitem"])
    return (
        t.lineitem.join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_suppkey", "s_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.countDistinct("l_partkey").alias("n_parts"),
            money_sum("l_extendedprice").alias("total_price"),
        )
        .orderBy("s_suppkey")
    )


_SUPPLIER_PART_STATS_SQL = """
SELECT s.s_suppkey, s.s_name, n.n_name,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(count(DISTINCT l.l_partkey) AS BIGINT) AS n_parts,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY s.s_suppkey, s.s_name, n.n_name
ORDER BY s.s_suppkey
"""


# --- Q: repeat_customers — INTERSECT -----------------------------------

def _repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    open_c = t.orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    closed_c = t.orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_c.intersect(closed_c).orderBy("o_custkey")


_REPEAT_CUSTOMERS_SQL = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY o_custkey
"""


# --- Q: open_only_customers — EXCEPT ------------------------------------

def _open_only_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    open_c = t.orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    other = t.orders.filter(F.col("o_orderstatus") != "O").select("o_custkey")
    # subtract = SQL EXCEPT (distinct semantics); exceptAll is the
    # multiset variant and would keep duplicate open-order customers
    return open_c.subtract(other).orderBy("o_custkey")


_OPEN_ONLY_CUSTOMERS_SQL = """
SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus <> 'O'
ORDER BY o_custkey
"""


# --- Q: price_quantiles — exact interpolated quantiles -------------------

def _price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["part"])
    return (
        t.part.groupBy("p_brand")
        .agg(
            F.round(F.expr("percentile(p_retailprice, 0.5)"), 6).alias("median_price"),
            F.round(F.expr("percentile(p_retailprice, 0.9)"), 6).alias("p90_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("p_brand")
    )


_PRICE_QUANTILES_SQL = """
SELECT p_brand,
       round(quantile_cont(p_retailprice, 0.5), 6) AS median_price,
       round(quantile_cont(p_retailprice, 0.9), 6) AS p90_price,
       CAST(count(*) AS BIGINT) AS n
FROM part
GROUP BY p_brand
ORDER BY p_brand
"""


# --- Q: order_gaps — lag/lead deltas -------------------------------------

def _order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t.orders.filter(F.col("o_custkey") < 200)
        .select(
            "o_custkey",
            "o_orderkey",
            F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
            .cast("long")
            .alias("days_since_prev"),
            F.lead("o_orderkey").over(w).alias("next_orderkey"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


_ORDER_GAPS_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(date_diff('day',
            lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
            o_orderdate) AS BIGINT) AS days_since_prev,
       lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_orderkey
FROM orders
WHERE o_custkey < 200
ORDER BY o_custkey, o_orderkey
"""


# --- Q: above_average_customers — correlated aggregate subquery ----------

def _above_average_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from databeats_spark.operators.scale import attach_global_scalar

    t = load_tables(spark, sf_dir, ["orders"])
    spend = t.orders.groupBy("o_custkey").agg(money_sum("o_totalprice").alias("spend"))
    # the avg scalar derives from the per-customer aggregate itself;
    # attach_global_scalar materializes that aggregate once (AQE does
    # not dedupe the shared exchange under the broadcast side)
    return (
        attach_global_scalar(
            spend,
            (F.sum(dec("spend")).cast("double") / F.count(F.lit(1))).alias("avg_spend"),
        )
        .filter(F.col("spend") > F.col("avg_spend"))
        .select("o_custkey", "spend", F.round("avg_spend", 6).alias("avg_spend"))
        .orderBy("o_custkey")
    )


_ABOVE_AVERAGE_SQL = """
WITH spend AS (
  SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
), avg_s AS (
  SELECT CAST(sum(CAST(spend AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_spend FROM spend
)
SELECT s.o_custkey, s.spend, round(a.avg_spend, 6) AS avg_spend
FROM spend s, avg_s a
WHERE s.spend > a.avg_spend
ORDER BY s.o_custkey
"""


# --- Q: top_terms — term frequency over the corpus (text analytics) ------

def _top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    return (
        t.documents.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "term")
        .limit(50)
    )


_TOP_TERMS_SQL = """
SELECT term, CAST(count(*) AS BIGINT) AS freq
FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term FROM documents)
GROUP BY term
ORDER BY freq DESC, term
LIMIT 50
"""


# --- Q: embedding_near_dups — exact cosine near-dup pairs ----------------
# The oracle twin of the LSH embedding path: bounded brute force.

EMBED_PAIR_LIMIT = 500
EMBED_DUP_THRESHOLD = 0.4


def _embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["embeddings"])
    # the trailing .limit is a semantic no-op (ids below the bound
    # number at most the bound) that lets the plan lint PROVE the
    # verifier slice bounded instead of trusting an allowlist entry
    e = (
        t.embeddings.filter(F.col("vec_id") < EMBED_PAIR_LIMIT)
        .select("vec_id", "embedding")
        .limit(EMBED_PAIR_LIMIT)
    )
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("__va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("__vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", cosine("__va", "__vb"))
        .filter(F.col("cos_sim") >= EMBED_DUP_THRESHOLD)
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
        .orderBy("id_a", "id_b")
    )


_EMBEDDING_NEAR_DUPS_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < {EMBED_PAIR_LIMIT}
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= {EMBED_DUP_THRESHOLD}
ORDER BY id_a, id_b
"""


# --- Q: value_histogram — bucketed distribution ---------------------------

def _value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    bucket = F.floor(F.col("value") / 50).cast("long")
    return (
        t.events.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).cast("double").alias("total"),
        )
        .orderBy("bucket")
    )


_VALUE_HISTOGRAM_SQL = """
SELECT CAST(floor(value / 50) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM events
GROUP BY 1
ORDER BY bucket
"""


# --- Q: regex_extract_ids — regexp scalar functions -----------------------

def _regex_extract_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer"])
    return (
        t.customer.select(
            "c_custkey",
            F.regexp_extract("c_name", "[0-9]+", 0).alias("name_digits"),
            (F.regexp_extract("c_name", "[0-9]+", 0).cast("long") == F.col("c_custkey")).alias(
                "digits_match_key"
            ),
        )
        .orderBy("c_custkey")
    )


_REGEX_EXTRACT_IDS_SQL = """
SELECT c_custkey,
       regexp_extract(c_name, '[0-9]+') AS name_digits,
       (CAST(regexp_extract(c_name, '[0-9]+') AS BIGINT) = c_custkey) AS digits_match_key
FROM customer
ORDER BY c_custkey
"""


# --- Q: null_safe_compare — null semantics under joins --------------------

def _null_safe_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null semantics: left join produces NULLs, then null-safe (<=>)
    vs plain equality against a literal — the three-valued-logic
    behavior every engine must pin down identically."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    big = t.orders.filter(F.col("o_totalprice") > 300000).select(
        "o_custkey", F.lit("has_big").alias("flag")
    ).dropDuplicates(["o_custkey"])
    joined = t.customer.join(big, F.col("c_custkey") == F.col("o_custkey"), "left")
    return (
        joined.select(
            "c_custkey",
            F.col("flag").isNull().alias("flag_is_null"),
            F.col("flag").eqNullSafe(F.lit("has_big")).alias("nullsafe_eq"),
            # plain '=' with NULL is UNKNOWN → coalesce to make it a
            # materializable boolean on both engines
            F.coalesce(F.col("flag") == F.lit("has_big"), F.lit(False)).alias("plain_eq_coalesced"),
        )
        .orderBy("c_custkey")
    )


_NULL_SAFE_COMPARE_SQL = """
WITH big AS (
  SELECT DISTINCT o_custkey, 'has_big' AS flag FROM orders WHERE o_totalprice > 300000
)
SELECT c.c_custkey,
       (b.flag IS NULL) AS flag_is_null,
       (b.flag IS NOT DISTINCT FROM 'has_big') AS nullsafe_eq,
       coalesce(b.flag = 'has_big', false) AS plain_eq_coalesced
FROM customer c LEFT JOIN big b ON c.c_custkey = b.o_custkey
ORDER BY c.c_custkey
"""


# --- Q: lineitem_profile — data-quality profiling (one pass per column) ---

PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _lineitem_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from databeats_spark.operators.maintenance import profile_numeric

    t = load_tables(spark, sf_dir, ["lineitem"])
    return profile_numeric(t.lineitem, list(PROFILE_COLS)).orderBy("column")


def _lineitem_profile_sql() -> str:
    blocks = []
    for c in PROFILE_COLS:
        blocks.append(f"""
SELECT '{c}' AS "column",
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(min({c}) AS DOUBLE) AS min_val,
       CAST(max({c}) AS DOUBLE) AS max_val,
       round(CAST(sum(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) / count({c}), 6) AS mean_val
FROM lineitem""")
    return " UNION ALL ".join(blocks) + ' ORDER BY "column"'


# --- Q: approx_distinct_parts — sketch aggregation (rows-only) ------------
# HLL implementations differ between engines → no value oracle; the
# driver records the rows-only check and pytest bounds the error.

def _approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem"])
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .orderBy("l_returnflag")
    )


# --- Q: approx_distinct_parts_exact — oracle twin (r7 VERDICT item 6) ----
# Identical grouping pipeline with the exact countDistinct substituted
# for the HyperLogLog estimator: hash-matched vs DuckDB, certifying
# everything but the sketch itself.

def _approx_distinct_parts_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem"])
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").cast("bigint").alias("exact_parts"))
        .orderBy("l_returnflag")
    )


_APPROX_DISTINCT_PARTS_EXACT_SQL = """
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --- Q: sql_api_revenue — the same engine through the SQL surface --------

_SQL_API_QUERY = """
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


# --- Q: sql_lateral_topk — identical ANSI LATERAL text on both engines ----
# Correlated LATERAL subquery with ORDER BY + LIMIT: per-customer
# top-2 orders, the SQL spelling of the per-parent-limit window
# (first_lineitems_per_order is the DataFrame spelling). One string,
# both engines, verbatim.

_SQL_LATERAL_QUERY = """
SELECT c.c_custkey, t.o_orderkey, t.total
FROM customer c,
LATERAL (
  SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
  FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) t
WHERE c.c_custkey < 100
ORDER BY c.c_custkey, t.o_orderkey
"""


def _sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from databeats_spark.sources.tables import register_views

    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(_SQL_LATERAL_QUERY)


def _sql_api_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the spark.sql surface (C9): same Catalyst plan as the DataFrame
    # API — here the ORACLE string runs verbatim on Spark too, since
    # this query sits in the ANSI intersection of both dialects
    from databeats_spark.sources.tables import register_views

    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_SQL_API_QUERY)


# --- Q: priority_flags — bool_and / bool_or universal+existential aggs ----
# The remaining A-series aggregate family: EVERY / ANY as grouped
# flags. Identical builtin names on both engines; counts pinned to
# BIGINT per the parity rules.

def _priority_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    return (
        t.orders.groupBy("o_orderpriority")
        .agg(
            F.bool_and(dec("o_totalprice") > 1000).alias("all_above_1k"),
            F.bool_or(dec("o_totalprice") > 400000).alias("any_jumbo"),
            F.bool_and(F.col("o_orderstatus") != "P").alias("none_pending"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


_PRIORITY_FLAGS_SQL = """
SELECT o_orderpriority,
       bool_and(CAST(o_totalprice AS DECIMAL(18,2)) > 1000) AS all_above_1k,
       bool_or(CAST(o_totalprice AS DECIMAL(18,2)) > 400000) AS any_jumbo,
       bool_and(o_orderstatus <> 'P') AS none_pending,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


SPECS = [
    QuerySpec("part_name_features", "C-series string scalar functions", _part_name_features, _PART_NAME_FEATURES_SQL, tags=("scalar",)),
    QuerySpec("math_scalar_features", "numeric scalar library: sqrt/ln/pow/mod/bitops/sign", _math_scalar_features, _MATH_SCALAR_FEATURES_SQL, tags=("scalar",)),
    QuerySpec("calendar_features", "calendar arithmetic: month-end clamping, ISO dow, quarter", _calendar_features, _CALENDAR_FEATURES_SQL, tags=("scalar", "timeseries")),
    QuerySpec("sql_api_revenue", "spark.sql surface: identical ANSI text on both engines", _sql_api_revenue, _SQL_API_QUERY, tags=("sql", "agg")),
    QuerySpec("sql_lateral_topk", "correlated LATERAL subquery (identical ANSI text, top-2 per key)", _sql_lateral_topk, _SQL_LATERAL_QUERY, tags=("sql", "subquery")),
    QuerySpec("supplier_part_stats", "supplier/nation dim joins + multi-agg", _supplier_part_stats, _SUPPLIER_PART_STATS_SQL, tags=("join", "agg")),
    QuerySpec("repeat_customers", "INTERSECT set op", _repeat_customers, _REPEAT_CUSTOMERS_SQL, tags=("setop",)),
    QuerySpec("priority_flags", "bool_and/bool_or (EVERY/ANY) grouped flag aggregates", _priority_flags, _PRIORITY_FLAGS_SQL, tags=("agg",)),
    QuerySpec("open_only_customers", "EXCEPT set op", _open_only_customers, _OPEN_ONLY_CUSTOMERS_SQL, tags=("setop",)),
    QuerySpec("price_quantiles", "exact interpolated median/p90 per group", _price_quantiles, _PRICE_QUANTILES_SQL, tags=("agg",)),
    QuerySpec("order_gaps", "lag/lead window deltas", _order_gaps, _ORDER_GAPS_SQL, tags=("window",)),
    QuerySpec("above_average_customers", "correlated aggregate subquery", _above_average_customers, _ABOVE_AVERAGE_SQL, tags=("agg", "subquery")),
    QuerySpec("top_terms", "term-frequency explode over the corpus", _top_terms, _TOP_TERMS_SQL, bench=True, tags=("text",)),
    QuerySpec("embedding_near_dups", "exact cosine near-dup pairs (LSH oracle twin)", _embedding_near_dups, _EMBEDDING_NEAR_DUPS_SQL, tags=("similarity", "dedup")),
    QuerySpec("value_histogram", "bucketed value distribution", _value_histogram, _VALUE_HISTOGRAM_SQL, tags=("agg",)),
    QuerySpec("approx_distinct_parts", "HLL sketch vs exact distinct (rows-only)", _approx_distinct_parts, None, tags=("agg", "approx")),
    QuerySpec("approx_distinct_parts_exact", "oracle twin: identical grouping with exact countDistinct (certifies all but the sketch)", _approx_distinct_parts_exact, _APPROX_DISTINCT_PARTS_EXACT_SQL, tags=("agg", "approx")),
    QuerySpec("lineitem_profile", "data-quality column profiling (nulls/distincts/ranges)", _lineitem_profile, _lineitem_profile_sql(), tags=("profiling",)),
    QuerySpec("regex_extract_ids", "regexp_extract scalar functions", _regex_extract_ids, _REGEX_EXTRACT_IDS_SQL, tags=("scalar",)),
    QuerySpec("null_safe_compare", "null-safe equality / three-valued logic under left join", _null_safe_compare, _NULL_SAFE_COMPARE_SQL, tags=("scalar", "join")),
]
