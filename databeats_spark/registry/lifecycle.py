"""Data-lifecycle and activity shapes (round-4c batch) — the CDC /
compliance / engagement operators a production table owner runs beside
the analytics queries:

- snapshot_user_diff:      CDC-style snapshot compare of a derived
                           dimension (latest event value per user) at
                           two as-of instants: added / changed rows
- user_erasure_audit:      GDPR right-to-be-forgotten blast radius —
                           rows per table an erasure set would delete,
                           cascaded through the key graph
- k_anonymity_audit:       quasi-identifier re-identification risk
                           (Sweeney 2002): rows in QI groups smaller
                           than k, per market segment
- l_diversity_audit:       the homogeneity attack k-anonymity misses
                           (Machanavajjhala 2007): QI groups spanning
                           fewer than l distinct sensitive values
- t_closeness_audit:       the skew attack l-diversity misses (Li 2007):
                           QI groups whose sensitive-value EMD vs the
                           global distribution exceeds t — BIGINT
                           cumulative numerators, one final division
- dp_noisy_histogram:      the release step those gates guard — the
                           Laplace mechanism with a derandomized
                           (md5-seeded) noise source, so the whole
                           mechanism arithmetic is oracle-certified
- rolling_7d_active_users: sliding-window DISTINCT users per day via
                           bounded cover-day explode (the windowed
                           countDistinct no window frame can express)
- event_cooccurrence_lift: market-basket lift between event types at
                           the user level (P(a,b) / P(a)P(b))
- asof_next_purchase:      FORWARD as-of join — each click enriched
                           with the user's next (at-or-after) purchase
                           (operators/joins.asof_join direction-mirror;
                           DuckDB native forward ASOF is the oracle)

Reference parity: the reference has no CDC/compliance surface; these
extend SURVEY §2's join/window families the same way the as-of and
range joins did (north-star batch). Oracle parity per the registry
recipe: BIGINT counts, round(…, 6) ratio doubles, integer-microsecond
time math, ISO-string dates, total-order sorts.

Scale notes: snapshot diff is one full-outer equi-join of two keyed
aggregates; erasure audit is semi-join cascades on the key columns
(never row comparisons); the rolling-distinct explode is bounded at
7 rows per (user, day) pair — the windowed-distinct blowup is the
window length, not the data; co-occurrence pairs explode per-user
type SETS (bounded by the event-type catalog squared); the forward
as-of is the identical union + running-last plan as the backward one
with the ordering reversed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from databeats_spark.registry import QuerySpec
from databeats_spark.sources.tables import load_tables

# snapshot-compare as-of instants (events span 2024-01)
SNAP_T1 = "2024-01-15"
SNAP_T2 = "2024-01-25"
# erasure set: every 97th customer key
ERASURE_MOD = 97


# --- Q: snapshot_user_diff — CDC compare of a derived dimension -------
# "Latest event value per user" materialized at two as-of instants,
# then diffed: users new since T1 are `added`, users whose latest
# value moved are `changed` (unchanged rows drop out — CDC emits
# deltas). One window per snapshot (key-partitioned on user_id) and
# one full-outer equi-join on the key; row hashes never cross the
# network, only (key, value).

def _latest_value_before(events: DataFrame, cutoff: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.desc("us"), F.desc("event_id"))
    return (
        events.filter(F.col("us") < F.unix_micros(F.to_timestamp(F.lit(cutoff))))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", F.round("value", 6).alias("value"))
    )


def _snapshot_user_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    ev = t.events.select("user_id", "event_id", F.unix_micros("ts").alias("us"), "value")
    old = _latest_value_before(ev, SNAP_T1).withColumnRenamed("value", "old_value")
    new = _latest_value_before(ev, SNAP_T2).withColumnRenamed("value", "new_value")
    joined = old.join(new, "user_id", "full_outer")
    change = (
        F.when(F.col("old_value").isNull(), F.lit("added"))
        .when(F.col("new_value").isNull(), F.lit("removed"))
        .when(F.col("old_value") != F.col("new_value"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type") != "unchanged")
        .select("user_id", "change_type", "old_value", "new_value")
        .orderBy("user_id")
    )


_SNAPSHOT_USER_DIFF_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events
), old AS (
  SELECT user_id, round(value, 6) AS old_value
  FROM (
    SELECT user_id, value,
           row_number() OVER (PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
    FROM ev WHERE us < epoch_us(TIMESTAMP '{SNAP_T1}')
  ) WHERE rn = 1
), new AS (
  SELECT user_id, round(value, 6) AS new_value
  FROM (
    SELECT user_id, value,
           row_number() OVER (PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
    FROM ev WHERE us < epoch_us(TIMESTAMP '{SNAP_T2}')
  ) WHERE rn = 1
), joined AS (
  SELECT coalesce(old.user_id, new.user_id) AS user_id, old_value, new_value,
         CASE WHEN old_value IS NULL THEN 'added'
              WHEN new_value IS NULL THEN 'removed'
              WHEN old_value <> new_value THEN 'changed'
              ELSE 'unchanged' END AS change_type
  FROM old FULL OUTER JOIN new ON old.user_id = new.user_id
)
SELECT user_id, change_type, old_value, new_value
FROM joined WHERE change_type <> 'unchanged'
ORDER BY user_id
"""


# --- Q: scd2_band_history — slowly-changing-dimension type 2 build ----
# The warehouse-maintenance rung the snapshot diff implies: turn the
# purchase stream into a validity-interval (SCD2) dimension of each
# user's spend band. Change detection = lag over the per-user ordered
# stream (keep rows where the band moved), then valid_to = the NEXT
# change's valid_from over the FILTERED set, is_current on the open
# interval. Interval bounds are integer microseconds (the repo's
# exact time-math recipe); both windows are key-partitioned — at
# 100 TB this is one shuffle on user_id and two sorted passes.

SCD2_BANDS = (25.0, 75.0)  # low < 25 <= mid < 75 <= high


def _scd2_band_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    band = (
        F.when(F.col("value") < SCD2_BANDS[0], F.lit("low"))
        .when(F.col("value") < SCD2_BANDS[1], F.lit("mid"))
        .otherwise(F.lit("high"))
    )
    purchases = t.events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        band.alias("band"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    changes = (
        purchases.withColumn("__prev", F.lag("band").over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col("band")))
        .drop("__prev")
    )
    w2 = Window.partitionBy("user_id").orderBy("us", "event_id")
    return (
        changes.withColumn("valid_to_us", F.lead("us").over(w2))
        .select(
            "user_id",
            "band",
            F.col("us").alias("valid_from_us"),
            "valid_to_us",
            F.col("valid_to_us").isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from_us")
    )


_SCD2_BAND_HISTORY_SQL = f"""
WITH purchases AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CASE WHEN value < {SCD2_BANDS[0]} THEN 'low'
              WHEN value < {SCD2_BANDS[1]} THEN 'mid'
              ELSE 'high' END AS band
  FROM events WHERE event_type = 'purchase'
), marked AS (
  SELECT *, lag(band) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
  FROM purchases
), changes AS (
  SELECT user_id, event_id, us, band FROM marked
  WHERE prev IS NULL OR prev <> band
)
SELECT user_id, band, us AS valid_from_us,
       lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to_us,
       lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL AS is_current
FROM changes
ORDER BY user_id, valid_from_us
"""


# --- Q: cdc_snapshot_merge — incremental upsert-apply, proven --------
# The MERGE INTO pattern as a Spark plan: the state at T2 is built
# INCREMENTALLY — base = latest row per user before T1, delta = the
# [T1, T2) changelog's latest row, one full-outer key join where the
# delta side wins and 'error' rows act as tombstones (delete-on-
# merge, re-insert allowed). The ORACLE computes the T2 state
# DIRECTLY from the full history — hash equality proves
# merge(state(T1), delta) == state(T2), the invariant that makes
# incremental materialized views legal (the key-dimension sibling of
# daily_from_hourly_rollup's rollup-decomposition proof).

def _cdc_snapshot_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    ev = t.events.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        "value",
        (F.col("event_type") == "error").alias("is_tombstone"),
    )
    t1 = F.unix_micros(F.to_timestamp(F.lit(SNAP_T1)))
    t2 = F.unix_micros(F.to_timestamp(F.lit(SNAP_T2)))
    w = Window.partitionBy("user_id").orderBy(F.desc("us"), F.desc("event_id"))

    def latest(df: DataFrame) -> DataFrame:
        return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)

    base = latest(ev.filter(F.col("us") < t1)).select(
        "user_id",
        F.col("value").alias("b_value"),
        F.col("us").alias("b_us"),
        F.col("is_tombstone").alias("b_dead"),
    )
    delta = latest(ev.filter((F.col("us") >= t1) & (F.col("us") < t2))).select(
        "user_id",
        F.col("value").alias("d_value"),
        F.col("us").alias("d_us"),
        F.col("is_tombstone").alias("d_dead"),
    )
    merged = base.join(delta, "user_id", "full_outer")
    from_delta = F.col("d_us").isNotNull()
    return (
        merged.withColumn("src", F.when(from_delta, F.lit("delta")).otherwise(F.lit("base")))
        .withColumn("dead", F.when(from_delta, F.col("d_dead")).otherwise(F.col("b_dead")))
        .filter(~F.col("dead"))
        .select(
            "user_id",
            F.round(F.when(from_delta, F.col("d_value")).otherwise(F.col("b_value")), 6).alias(
                "value"
            ),
            F.when(from_delta, F.col("d_us")).otherwise(F.col("b_us")).alias("last_us"),
            "src",
        )
        .orderBy("user_id")
    )


_CDC_SNAPSHOT_MERGE_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, value,
         event_type = 'error' AS is_tombstone
  FROM events
), direct AS (
  SELECT user_id, value, us, is_tombstone,
         row_number() OVER (PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
  FROM ev WHERE us < epoch_us(TIMESTAMP '{SNAP_T2}')
)
SELECT user_id, round(value, 6) AS value, us AS last_us,
       CASE WHEN us >= epoch_us(TIMESTAMP '{SNAP_T1}') THEN 'delta' ELSE 'base' END AS src
FROM direct
WHERE rn = 1 AND NOT is_tombstone
ORDER BY user_id
"""


# --- Q: user_erasure_audit — right-to-be-forgotten blast radius -------
# Given an erasure key set (every 97th customer), count the rows each
# table loses: customers directly, orders via custkey, lineitems via
# the orderkeys of those orders. Pure key-column semi-join cascades —
# the audit never touches payload columns, and each count is one
# hash aggregate. The three counts union into rows (no scalar
# cross-joins).

def _user_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    keys = t.customer.filter(F.col("c_custkey") % ERASURE_MOD == 0).select("c_custkey")
    orders = t.orders.join(
        keys.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", "left_semi"
    )
    lineitems = t.lineitem.join(
        orders.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "left_semi"
    )
    count = lambda df, name: df.agg(  # noqa: E731
        F.lit(name).alias("entity"), F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    return (
        count(keys, "customer")
        .unionByName(count(orders, "orders"))
        .unionByName(count(lineitems, "lineitem"))
        .orderBy("entity")
    )


_USER_ERASURE_AUDIT_SQL = f"""
WITH keys AS (
  SELECT c_custkey FROM customer WHERE c_custkey % {ERASURE_MOD} = 0
), ords AS (
  SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM keys)
), li AS (
  SELECT l_orderkey FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM ords)
)
SELECT entity, n_rows FROM (
  SELECT 'customer' AS entity, CAST(count(*) AS BIGINT) AS n_rows FROM keys
  UNION ALL
  SELECT 'orders', CAST(count(*) AS BIGINT) FROM ords
  UNION ALL
  SELECT 'lineitem', CAST(count(*) AS BIGINT) FROM li
)
ORDER BY entity
"""


# --- Q: k_anonymity_audit — quasi-identifier re-identification risk ---
# The release-gate companion to user_erasure_audit (Sweeney 2002
# k-anonymity): group the table by its quasi-identifier tuple
# (nation, market segment, account-balance band) and measure how many
# rows sit in groups smaller than K — each such row is re-identifiable
# by an adversary who knows the QI values. The balance band is pure
# integer arithmetic — (floor(acctbal)+1000) div 1000, the +1000 shift
# keeps every operand nonnegative so Spark `div` (truncate) and DuckDB
# `//` agree — no ntile/float bucketing that could tie-break
# differently across engines. Scale shape: one hash aggregate on the
# QI tuple (the only corpus shuffle), then a re-aggregate of the group
# table — bounded by the QI catalog (nations x segments x 11 bands),
# never the data. One division per segment row, rounded per the
# ratio recipe.

K_ANON_THRESHOLD = 5


def _k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer"])
    band = F.expr("(CAST(floor(c_acctbal) AS BIGINT) + 1000) div 1000")
    groups = (
        t.customer.select("c_nationkey", "c_mktsegment", band.alias("bal_band"))
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    exposed = F.col("k") < K_ANON_THRESHOLD
    return (
        groups.groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum(exposed.cast("bigint")).cast("bigint").alias("exposed_groups"),
            F.sum(F.when(exposed, F.col("k")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("exposed_rows"),
            F.min("k").cast("bigint").alias("min_group_size"),
            F.round(
                F.sum(F.when(exposed, F.col("k")).otherwise(F.lit(0)))
                / F.sum("k"),
                6,
            ).alias("exposed_row_share"),
        )
        .orderBy("mktsegment")
    )


_K_ANONYMITY_AUDIT_SQL = f"""
WITH groups AS (
  SELECT c_nationkey, c_mktsegment,
         (CAST(floor(c_acctbal) AS BIGINT) + 1000) // 1000 AS bal_band,
         count(*) AS k
  FROM customer
  GROUP BY c_nationkey, c_mktsegment, bal_band
)
SELECT c_mktsegment AS mktsegment,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN k < {K_ANON_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT)
         AS exposed_groups,
       CAST(sum(CASE WHEN k < {K_ANON_THRESHOLD} THEN k ELSE 0 END) AS BIGINT)
         AS exposed_rows,
       CAST(min(k) AS BIGINT) AS min_group_size,
       round(sum(CASE WHEN k < {K_ANON_THRESHOLD} THEN k ELSE 0 END)
             / CAST(sum(k) AS DOUBLE), 6) AS exposed_row_share
FROM groups
GROUP BY mktsegment
ORDER BY mktsegment
"""


# --- Q: l_diversity_audit — sensitive-attribute homogeneity risk ------
# k-anonymity's blind spot (Machanavajjhala 2007 l-diversity): a QI
# group can be large yet HOMOGENEOUS — if every member shares the same
# sensitive value, group size protects nothing. Sensitive attribute
# here: the order priorities of the group's customers (joined through
# custkey). A group is weak when its members span fewer than L
# distinct priorities. Scale shape: the customer→orders join is a
# plain equi-join on the key both tables would be bucketed by; the QI
# aggregate shuffles (QI, priority) pairs — bounded by the QI catalog
# x the 5-value priority domain, never the order count — then the
# same catalog-bounded re-aggregate as k_anonymity_audit. Counts
# only; no floats anywhere.

L_DIVERSITY_THRESHOLD = 3


def _l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    band = F.expr("(CAST(floor(c_acctbal) AS BIGINT) + 1000) div 1000")
    qi = t.customer.select(
        "c_custkey", "c_nationkey", "c_mktsegment", band.alias("bal_band")
    )
    joined = qi.join(
        t.orders.select(F.col("o_custkey").alias("c_custkey"), "o_orderpriority"),
        "c_custkey",
    )
    groups = (
        joined.groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.countDistinct("o_orderpriority").alias("l"))
    )
    weak = F.col("l") < L_DIVERSITY_THRESHOLD
    return (
        groups.groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum(weak.cast("bigint")).cast("bigint").alias("weak_groups"),
            F.min("l").cast("bigint").alias("min_l"),
        )
        .orderBy("mktsegment")
    )


_L_DIVERSITY_AUDIT_SQL = f"""
WITH groups AS (
  SELECT c_nationkey, c_mktsegment,
         (CAST(floor(c_acctbal) AS BIGINT) + 1000) // 1000 AS bal_band,
         count(DISTINCT o_orderpriority) AS l
  FROM customer JOIN orders ON o_custkey = c_custkey
  GROUP BY c_nationkey, c_mktsegment, bal_band
)
SELECT c_mktsegment AS mktsegment,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN l < {L_DIVERSITY_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT)
         AS weak_groups,
       CAST(min(l) AS BIGINT) AS min_l
FROM groups
GROUP BY mktsegment
ORDER BY mktsegment
"""


# --- Q: t_closeness_audit — sensitive-distribution skew risk ----------
# The third rung of the release-gate ladder (Li/Li/Venkatasubramanian
# 2007 t-closeness): l-diversity's blind spot is a group that spans
# many sensitive values but in a SKEWED mix (99% URGENT still leaks).
# A QI group is weak when the Earth Mover's Distance between its
# order-priority distribution and the corpus-global one exceeds t.
# The priority domain is ordered (the '1-'..'5-' prefixes), so EMD has
# the closed cumulative form EMD = Σ_j |Σ_{i<=j}(p_i − q_i)| / (m−1).
# Arithmetic recipe: every cumulative term is kept as a BIGINT
# numerator over the common denominator g·N — d_i = c_i·N − Q_i·g —
# so the ONLY float operation is the final single division (then
# round 6); no float accumulates, no engine summation order exists.
# Bounds: products stay < 2^53 while g·N < 9e15 (sf0.1: g·N ≈ 2e10);
# beyond that the numerators move to DECIMAL(38,0) unchanged.
# Scale shape: one corpus shuffle (the customer→orders equi-join into
# the (QI, priority) cell aggregate — bounded by QI catalog × the
# 5-value domain), a catalog-bounded pivot, and the global
# distribution attached via attach_global_scalar (the cell table is a
# shuffled subtree, so the naive crossJoin would re-execute it under
# AQE — the derived-scalar rule).

T_CLOSENESS_THRESHOLD = 0.2
_PRIORITY_DOMAIN = (
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
)


def _t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from databeats_spark.operators.scale import attach_global_scalar

    t = load_tables(spark, sf_dir, ["customer", "orders"])
    band = F.expr("(CAST(floor(c_acctbal) AS BIGINT) + 1000) div 1000")
    qi = t.customer.select(
        "c_custkey", "c_nationkey", "c_mktsegment", band.alias("bal_band")
    )
    joined = qi.join(
        t.orders.select(F.col("o_custkey").alias("c_custkey"), "o_orderpriority"),
        "c_custkey",
    )
    pivoted = joined.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        *[
            F.sum(F.when(F.col("o_orderpriority") == p, 1).otherwise(0))
            .cast("bigint")
            .alias(f"c{i + 1}")
            for i, p in enumerate(_PRIORITY_DOMAIN)
        ],
        F.count(F.lit(1)).cast("bigint").alias("g"),
    )
    with_globals = attach_global_scalar(
        pivoted,
        *[F.sum(f"c{i + 1}").cast("bigint").alias(f"q{i + 1}") for i in range(5)],
        F.sum("g").cast("bigint").alias("n"),
    )
    # BIGINT cumulative-difference numerators over the g·N denominator
    d = [
        (F.col(f"c{i + 1}") * F.col("n") - F.col(f"q{i + 1}") * F.col("g"))
        for i in range(5)
    ]
    cums = [d[0], d[0] + d[1], d[0] + d[1] + d[2], d[0] + d[1] + d[2] + d[3]]
    t_num = F.abs(cums[0]) + F.abs(cums[1]) + F.abs(cums[2]) + F.abs(cums[3])
    t_val = F.round(t_num / (F.lit(4) * F.col("g") * F.col("n")), 6)
    scored = with_globals.select("c_mktsegment", t_val.alias("t"))
    weak = F.col("t") > T_CLOSENESS_THRESHOLD
    return (
        scored.groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum(weak.cast("bigint")).cast("bigint").alias("weak_groups"),
            F.max("t").alias("max_t"),
        )
        .orderBy("mktsegment")
    )


_T_CLOSENESS_AUDIT_SQL = f"""
WITH cells AS (
  SELECT c_nationkey, c_mktsegment,
         (CAST(floor(c_acctbal) AS BIGINT) + 1000) // 1000 AS bal_band,
         CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS c2,
         CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS c3,
         CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS c4,
         CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS c5,
         CAST(count(*) AS BIGINT) AS g
  FROM customer JOIN orders ON o_custkey = c_custkey
  GROUP BY 1, 2, 3
), globals AS (
  SELECT CAST(sum(c1) AS BIGINT) AS q1, CAST(sum(c2) AS BIGINT) AS q2,
         CAST(sum(c3) AS BIGINT) AS q3, CAST(sum(c4) AS BIGINT) AS q4,
         CAST(sum(c5) AS BIGINT) AS q5, CAST(sum(g) AS BIGINT) AS n
  FROM cells
), scored AS (
  SELECT c_mktsegment,
         round((abs(c1*n - q1*g)
              + abs((c1*n - q1*g) + (c2*n - q2*g))
              + abs((c1*n - q1*g) + (c2*n - q2*g) + (c3*n - q3*g))
              + abs((c1*n - q1*g) + (c2*n - q2*g) + (c3*n - q3*g) + (c4*n - q4*g)))
               / CAST(4 * g * n AS DOUBLE), 6) AS t
  FROM cells, globals
)
SELECT c_mktsegment AS mktsegment,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN t > {T_CLOSENESS_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT)
         AS weak_groups,
       max(t) AS max_t
FROM scored
GROUP BY mktsegment
ORDER BY mktsegment
"""


# --- Q: dp_noisy_histogram — derandomized Laplace release mechanism ---
# The release step the k/l/t gates guard: the per-(nation, segment)
# customer-count histogram under the Laplace mechanism (sensitivity 1
# — each customer contributes one row to one cell; ε = 1.0, so
# b = Δ/ε = 1). Derandomized per the repo's sampling posture
# (weighted_sample's 52-bit md5 uniform): u = (v + 0.5) / 2^52 from
# the cell key's md5 is strictly inside (0, 1) and never exactly 0.5
# (v is an integer, 0.5 + v can't hit 2^51), so the inverse-CDF
# noise = −b · sign(u − 0.5) · ln(1 − 2·|u − 0.5|) is total and
# bit-identical on both engines — the calibration audit certifies the
# ENTIRE mechanism arithmetic; a production release swaps only the
# hash uniform for a cryptographic RNG (the oracle-twin posture: the
# one uncertifiable ingredient is isolated, everything else is
# hash-matched). Scale shape: one hash aggregate on the cell key
# (the only corpus shuffle); the noise is a per-row projection over
# the catalog-bounded histogram.

DP_EPSILON = 1.0
_HASH_DENOM = float(1 << 52)  # 13 md5 hex chars = 52 bits, exact in a double


def _dp_noisy_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer"])
    cells = t.customer.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("true_n")
    )
    key = F.concat_ws("|", F.col("c_nationkey").cast("string"), "c_mktsegment")
    v = F.conv(F.substring(F.md5(key), 1, 13), 16, 10).cast("bigint")
    u = (v + F.lit(0.5)) / F.lit(_HASH_DENOM)
    sign = F.when(u >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    noise = -F.lit(1.0 / DP_EPSILON) * sign * F.log(1.0 - 2.0 * F.abs(u - 0.5))
    return (
        cells.select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("mktsegment"),
            F.round(noise, 6).alias("noise"),
            F.round(F.col("true_n") + noise, 6).alias("noisy_count"),
        )
        .orderBy("nationkey", "mktsegment")
    )


_DP_NOISY_HISTOGRAM_SQL = f"""
WITH cells AS (
  SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS true_n
  FROM customer GROUP BY 1, 2
), seeded AS (
  SELECT c_nationkey, c_mktsegment, true_n,
         (CAST(('0x' || substr(md5(CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment), 1, 13)) AS BIGINT)
          + 0.5) / {_HASH_DENOM!r} AS u
  FROM cells
), noised AS (
  SELECT c_nationkey, c_mktsegment, true_n,
         -{1.0 / DP_EPSILON!r} * (CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END)
           * ln(1.0 - 2.0 * abs(u - 0.5)) AS noise
  FROM seeded
)
SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
       round(noise, 6) AS noise,
       round(true_n + noise, 6) AS noisy_count
FROM noised
ORDER BY nationkey, mktsegment
"""


# --- Q: rolling_7d_active_users — sliding-window distinct count -------
# Distinct users over the trailing 7 days, per day. No window frame
# can deduplicate inside a sliding range, so the scale shape is the
# bounded cover-day explode: each (user, active-day) pair covers the 7
# calendar days it counts toward — the blowup is the WINDOW LENGTH
# (7×), never the data — then one countDistinct hash aggregate per
# cover day, reported only for days that actually had events.

ROLLING_DAYS = 7


def _rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    user_days = t.events.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    cover = user_days.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), ROLLING_DAYS - 1))
        ).alias("cover_d"),
    )
    actual_days = user_days.select(F.col("d").alias("cover_d")).distinct()
    return (
        cover.join(actual_days, "cover_d", "left_semi")
        .groupBy("cover_d")
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_active_7d"))
        .select(F.date_format("cover_d", "yyyy-MM-dd").alias("day"), "n_active_7d")
        .orderBy("day")
    )


_ROLLING_7D_ACTIVE_USERS_SQL = f"""
WITH user_days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), cover AS (
  SELECT user_id, CAST(unnest(generate_series(d, d + INTERVAL {ROLLING_DAYS - 1} DAY, INTERVAL 1 DAY)) AS DATE) AS cover_d
  FROM user_days
), actual AS (
  SELECT DISTINCT d AS cover_d FROM user_days
)
SELECT strftime(cover_d, '%Y-%m-%d') AS day,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_active_7d
FROM cover
WHERE cover_d IN (SELECT cover_d FROM actual)
GROUP BY cover_d
ORDER BY day
"""


# --- Q: event_cooccurrence_lift — market-basket lift at user level ----
# For every pair of event types, how much more often do they co-occur
# in one user's history than independence predicts: lift =
# P(a,b) / (P(a) · P(b)) over users. The per-user type SET is bounded
# by the event-type catalog, so the within-user pair explode is
# catalog², never events². The user total is a scalar over the raw
# scan (naive broadcast per the derived-scalar rule).

def _event_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    ut = t.events.select("user_id", "event_type").distinct()
    n_users = t.events.agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
    singles = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_type"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_users"))
    )
    sa = singles.select(F.col("event_type").alias("type_a"), F.col("n_type").alias("n_a"))
    sb = singles.select(F.col("event_type").alias("type_b"), F.col("n_type").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a",
            "type_b",
            "pair_users",
            F.round(
                (F.col("pair_users").cast("double") * F.col("n_users"))
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy("type_a", "type_b")
    )


_EVENT_COOCCURRENCE_LIFT_SQL = """
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
), n AS (
  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM events
), singles AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_type FROM ut GROUP BY event_type
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS pair_users
  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.pair_users,
       round((CAST(p.pair_users AS DOUBLE) * n.n_users) / (sa.n_type * sb.n_type), 6) AS lift
FROM pairs p
JOIN singles sa ON sa.event_type = p.type_a
JOIN singles sb ON sb.event_type = p.type_b
CROSS JOIN n
ORDER BY p.type_a, p.type_b
"""


# --- Q: asof_next_purchase — FORWARD as-of join -----------------------
# Each click enriched with the user's NEXT (at-or-after, inclusive)
# purchase value — the attribution mirror of asof_purchase_value.
# Spark side is the same union + running-last window with the on-
# ordering reversed (operators/joins.asof_join direction="forward");
# DuckDB's native forward ASOF (l.ts <= r.ts) is the oracle.

def _asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from databeats_spark.operators.dedup import dedup_first
    from databeats_spark.operators.joins import asof_join

    t = load_tables(spark, sf_dir, ["events"])
    clicks = t.events.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    purchases = t.events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    # one purchase per (user, instant): exact-tie picks are otherwise
    # engine-arbitrary on both sides (same rule as the backward query)
    purchases = dedup_first(purchases, ["user_id", "ts"], [F.col("value").desc()])
    out = asof_join(
        clicks, purchases, on="ts", by=["user_id"], value_cols=["value"],
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("value").alias("next_purchase_value"),
    ).orderBy("event_id")


_ASOF_NEXT_PURCHASE_SQL = """
WITH clicks AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
), purchases AS (
  SELECT user_id, ts, value FROM (
    SELECT user_id, ts, value,
           row_number() OVER (PARTITION BY user_id, ts ORDER BY value DESC) AS rn
    FROM events WHERE event_type = 'purchase'
  ) WHERE rn = 1
)
SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
       p.value AS next_purchase_value
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts <= p.ts
ORDER BY c.event_id
"""


# --- Q: key_skew_profile — join-key skew diagnosis --------------------
# The query an engineer runs BEFORE deciding to salt a join: the top-20
# heaviest join keys with per-key share and cumulative share of all
# rows. Per-key counts are one hash aggregate; the head is a
# TakeOrderedAndProject and only those 20 rows pass through the rank /
# cumulative window (bounded by construction, zipf_slope's pattern);
# the row total rides attach_global_scalar on the checkpointed counts.

SKEW_TOP_K = 20


def _key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from databeats_spark.operators.scale import attach_global_scalar

    t = load_tables(spark, sf_dir, ["orders"])
    counts = t.orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_rows"))
    counts = attach_global_scalar(counts, F.sum("n_rows").cast("bigint").alias("n_total"))
    head = counts.orderBy(F.desc("n_rows"), "o_custkey").limit(SKEW_TOP_K)
    w = Window.orderBy(F.desc("n_rows"), "o_custkey")
    return (
        head.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .withColumn(
            "cum_rows",
            F.sum("n_rows").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        .select(
            "rank",
            "o_custkey",
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.round(F.col("n_rows") / F.col("n_total"), 6).alias("share"),
            F.round(F.col("cum_rows") / F.col("n_total"), 6).alias("cum_share"),
        )
        .orderBy("rank")
    )


_KEY_SKEW_PROFILE_SQL = f"""
WITH counts AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_rows FROM orders GROUP BY o_custkey
), tot AS (
  SELECT CAST(sum(n_rows) AS BIGINT) AS n_total FROM counts
), head AS (
  SELECT o_custkey, n_rows FROM counts ORDER BY n_rows DESC, o_custkey LIMIT {SKEW_TOP_K}
)
SELECT CAST(row_number() OVER w AS BIGINT) AS rank,
       o_custkey, n_rows,
       round(n_rows * 1.0 / t.n_total, 6) AS share,
       round(sum(n_rows) OVER (ORDER BY n_rows DESC, o_custkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1.0 / t.n_total, 6) AS cum_share
FROM head CROSS JOIN tot t
WINDOW w AS (ORDER BY n_rows DESC, o_custkey)
ORDER BY rank
"""


# --- Q: ri_violations — referential-integrity audit -------------------
# Cross-table dq_violations: orphaned lineitems (no parent order),
# orphaned orders (no parent customer), duplicate customer keys. Each
# check is one anti-join count or one duplicate-group aggregate on the
# KEY columns only; the three counts union into rows. Zero counts are
# the healthy (and asserted) answer — the audit's value is running
# cheaply enough to gate every load.

def _ri_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    orphan_li = t.lineitem.select("l_orderkey").join(
        t.orders.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "left_anti"
    )
    orphan_o = t.orders.select("o_custkey").join(
        t.customer.select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "left_anti"
    )
    dup_cust = (
        t.customer.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    count = lambda df, name: df.agg(  # noqa: E731
        F.lit(name).alias("check_name"), F.count(F.lit(1)).cast("bigint").alias("n_violations")
    )
    return (
        count(orphan_li, "lineitem_orphans")
        .unionByName(count(orphan_o, "order_orphans"))
        .unionByName(count(dup_cust, "duplicate_customer_keys"))
        .orderBy("check_name")
    )


_RI_VIOLATIONS_SQL = """
SELECT class AS check_name, n_violations FROM (
  SELECT 'lineitem_orphans' AS class, CAST(count(*) AS BIGINT) AS n_violations
  FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
  UNION ALL
  SELECT 'order_orphans', CAST(count(*) AS BIGINT)
  FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
  UNION ALL
  SELECT 'duplicate_customer_keys', CAST(count(*) AS BIGINT)
  FROM (SELECT c_custkey FROM customer GROUP BY c_custkey HAVING count(*) > 1)
)
ORDER BY check_name
"""


# --- Q: debounced_events — chain-debounce rapid-fire repeats ----------
# Telemetry debounce: within each (user, event_type) stream, a burst
# of events closer than the threshold collapses to its FIRST event.
# Gaps-and-islands identity: an island starts exactly where the raw
# gap exceeds the threshold, and chain-debounce keeps exactly the
# island heads — so one key-partitioned lag window IS the whole
# operator (no iterative "distance to last kept" state needed).

DEBOUNCE_US = 43_200_000_000  # 12 h (the synthetic feed has no sub-second bursts; 12 h makes the gate bite on ~20% of rows)


def _debounced_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    ev = t.events.select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    return (
        ev.withColumn("keep", F.lag("ts_us").over(w).isNull() | (gap > DEBOUNCE_US))
        .filter(F.col("keep"))
        .select("event_id", "user_id", "event_type", "ts_us")
        .orderBy("event_id")
    )


_DEBOUNCED_EVENTS_SQL = f"""
SELECT event_id, user_id, event_type, ts_us
FROM (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
           ORDER BY epoch_us(ts), event_id) AS prev_us
  FROM events
)
WHERE prev_us IS NULL OR ts_us - prev_us > {DEBOUNCE_US}
ORDER BY event_id
"""


SPECS = [
    QuerySpec("snapshot_user_diff", "CDC snapshot compare of the latest-value-per-user dimension", _snapshot_user_diff, _SNAPSHOT_USER_DIFF_SQL, tags=("join", "cdc")),
    QuerySpec("scd2_band_history", "SCD type-2 build: validity intervals of each user's spend band from the purchase stream", _scd2_band_history, _SCD2_BAND_HISTORY_SQL, tags=("window", "cdc")),
    QuerySpec("cdc_snapshot_merge", "incremental MERGE apply: base+delta full-outer upsert with tombstones, oracle = the direct T2 state (the incremental-view proof)", _cdc_snapshot_merge, _CDC_SNAPSHOT_MERGE_SQL, tags=("join", "cdc")),
    QuerySpec("user_erasure_audit", "GDPR erasure blast radius: rows per table via key-cascade semi joins", _user_erasure_audit, _USER_ERASURE_AUDIT_SQL, tags=("join", "compliance")),
    QuerySpec("k_anonymity_audit", "quasi-identifier re-identification risk: rows in groups smaller than k", _k_anonymity_audit, _K_ANONYMITY_AUDIT_SQL, tags=("agg", "compliance")),
    QuerySpec("l_diversity_audit", "sensitive-attribute homogeneity: QI groups spanning fewer than l distinct values", _l_diversity_audit, _L_DIVERSITY_AUDIT_SQL, tags=("agg", "join", "compliance")),
    QuerySpec("t_closeness_audit", "sensitive-distribution skew: QI groups with EMD above t vs the global mix", _t_closeness_audit, _T_CLOSENESS_AUDIT_SQL, tags=("agg", "join", "compliance")),
    QuerySpec("dp_noisy_histogram", "derandomized Laplace release: seeded inverse-CDF noise over the cell histogram", _dp_noisy_histogram, _DP_NOISY_HISTOGRAM_SQL, tags=("agg", "compliance")),
    QuerySpec("rolling_7d_active_users", "sliding-window distinct users via bounded cover-day explode", _rolling_7d_active_users, _ROLLING_7D_ACTIVE_USERS_SQL, tags=("window", "timeseries")),
    QuerySpec("event_cooccurrence_lift", "market-basket lift between event types at user level", _event_cooccurrence_lift, _EVENT_COOCCURRENCE_LIFT_SQL, tags=("agg", "events")),
    QuerySpec("asof_next_purchase", "forward as-of join (direction mirror; DuckDB forward ASOF oracle)", _asof_next_purchase, _ASOF_NEXT_PURCHASE_SQL, tags=("join", "asof")),
    QuerySpec("key_skew_profile", "join-key skew diagnosis: top-20 heaviest keys + cumulative share", _key_skew_profile, _KEY_SKEW_PROFILE_SQL, tags=("agg", "scale")),
    QuerySpec("ri_violations", "referential-integrity audit: orphan/duplicate-key counts per check", _ri_violations, _RI_VIOLATIONS_SQL, tags=("join", "quality")),
    QuerySpec("debounced_events", "chain-debounce rapid-fire repeats via island heads (lag window)", _debounced_events, _DEBOUNCED_EVENTS_SQL, tags=("events", "window")),
]
