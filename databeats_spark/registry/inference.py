"""Statistical-inference tier: survival analysis and resampling
uncertainty — the two readouts the experimentation/audit tiers were
still missing (point estimates and rank tests exist; survival curves
and confidence intervals did not).

- ``kaplan_meier_retention`` — the Kaplan-Meier product-limit estimate
  of "time to repeat purchase": each customer contributes one duration
  (first→second order, in weeks), right-censored at the corpus cutoff
  when no second order exists. The curve S(t) = Π (1 - dᵢ/nᵢ) is a
  PER-TIME ordered product — computed as ONE ordered F.aggregate fold
  over the calendar-bounded week table (the Holt-fold posture: the
  distinct-week list is bounded by the order calendar, ~350 weeks at
  ANY corpus scale, so the fold input is a catalog-sized array while
  the duration extraction stays fully distributed). The DuckDB oracle
  replays the identical recurrence as a recursive CTE — same
  multiplication sequence, bit-equal doubles (the holt_linear_forecast
  parity lesson: every seed cast explicit).
- ``poisson_bootstrap_ci`` — the scalable bootstrap (Poisson(1)
  weights per doc×replicate, Chamandy et al./Google posture): ONE
  corpus pass, no resampling shuffle — replicate weights are derived
  inline from md5(doc_id:replicate) uniforms through a hard-coded
  inverse-CDF ladder (identical double literals on both engines), the
  32 replicate means are exact-BIGINT ratio aggregates, and the CI is
  RANK-BASED (2nd/31st of 32 ordered replicate means — order
  statistics, no interpolation arithmetic to drift). Every stage is
  oracle-matched; nothing here is approximate-by-engine, only
  by-method (finite replicates), which the pytest pins against a
  literal hashlib replica.

Scale shape: both queries shuffle only catalog-sized relations
(weeks×1, sources×replicates); the corpus passes are map-side.

Reference parity: the reference's analytics stop at point aggregates
(dag.py A1–A7); this extends the decision-readout north star the
experimentation tier (CUPED/DiD/SRM) serves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from databeats_spark.registry import QuerySpec
from databeats_spark.sources.tables import load_tables

# --- Q: kaplan_meier_retention ---------------------------------------

_KM_ROW_T = (
    "array<struct<week:bigint,n_risk:bigint,n_events:bigint,"
    "n_censored:bigint,survival:double>>"
)


def _kaplan_meier_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    first_two = (
        t.orders.select("o_custkey", "o_orderdate", "o_orderkey")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
    )
    per_cust = first_two.groupBy("o_custkey").agg(
        F.max(F.when(F.col("rn") == 1, F.col("o_orderdate"))).alias("d1"),
        F.max(F.when(F.col("rn") == 2, F.col("o_orderdate"))).alias("d2"),
    )
    # corpus cutoff: scalar over the raw scan — naive 1-row crossJoin
    # (keyless aggregate, lint-provable; no shuffled subtree upstream)
    cutoff = t.orders.agg(F.max("o_orderdate").alias("cutoff"))
    durs = (
        per_cust.crossJoin(F.broadcast(cutoff))
        .select(
            F.when(F.col("d2").isNotNull(), F.datediff("d2", "d1"))
            .otherwise(F.datediff("cutoff", "d1"))
            .alias("days"),
            F.col("d2").isNotNull().cast("bigint").alias("event"),
        )
        .select(
            F.expr("CAST(days DIV 7 AS BIGINT)").alias("week"),
            "event",
        )
    )
    grp = durs.groupBy("week").agg(
        F.sum("event").cast("bigint").alias("d"),
        F.sum(F.lit(1) - F.col("event")).cast("bigint").alias("c"),
    )
    # calendar-bounded: ≤ ~350 distinct weeks at any SF — one keyless
    # aggregate collects the ordered curve input
    km = grp.agg(
        F.sort_array(F.collect_list(F.struct("week", "d", "c"))).alias("rows"),
        F.sum(F.col("d") + F.col("c")).cast("bigint").alias("total"),
    )
    init = F.struct(
        F.lit(1.0).alias("surv"),
        F.col("total").alias("risk"),
        F.expr(f"CAST(array() AS {_KM_ROW_T})").alias("out"),
    )

    def step(acc, x):
        # surv' appears twice (acc field + emitted row) — identical
        # expression, tiny array: the no-CSE cost is ~350 extra flops
        surv_next = acc["surv"] * (
            F.lit(1.0) - x["d"].cast("double") / acc["risk"].cast("double")
        )
        row = F.struct(
            x["week"].alias("week"),
            acc["risk"].alias("n_risk"),
            x["d"].alias("n_events"),
            x["c"].alias("n_censored"),
            surv_next.alias("survival"),
        )
        return F.struct(
            surv_next.alias("surv"),
            (acc["risk"] - x["d"] - x["c"]).alias("risk"),
            F.concat(acc["out"], F.array(row)).alias("out"),
        )

    folded = km.select(F.aggregate("rows", init, step).alias("f"))
    return (
        folded.select(F.explode("f.out").alias("r"))
        .select(
            F.col("r.week").alias("week"),
            F.col("r.n_risk").alias("n_risk"),
            F.col("r.n_events").alias("n_events"),
            F.col("r.n_censored").alias("n_censored"),
            F.round("r.survival", 6).alias("survival"),
        )
        .orderBy("week")
    )


_KM_SQL = """
WITH RECURSIVE o2 AS (
  SELECT o_custkey, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
), pc AS (
  SELECT o_custkey,
         max(CASE WHEN rn = 1 THEN o_orderdate END) AS d1,
         max(CASE WHEN rn = 2 THEN o_orderdate END) AS d2
  FROM o2 WHERE rn <= 2 GROUP BY o_custkey
), cut AS (SELECT max(o_orderdate) AS cutoff FROM orders),
durs AS (
  SELECT CAST((CASE WHEN d2 IS NOT NULL THEN date_diff('day', d1, d2)
                    ELSE date_diff('day', d1, cutoff) END) // 7 AS BIGINT) AS week,
         CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END AS event
  FROM pc CROSS JOIN cut
), grp AS (
  SELECT week, CAST(sum(event) AS BIGINT) AS d,
         CAST(sum(1 - event) AS BIGINT) AS c
  FROM durs GROUP BY week
), idx AS (
  SELECT week, d, c, row_number() OVER (ORDER BY week) AS i FROM grp
), tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS n FROM grp),
rec AS (
  SELECT 0 AS i, CAST(1.0 AS DOUBLE) AS surv, n AS risk,
         CAST(NULL AS BIGINT) AS week, CAST(NULL AS BIGINT) AS d,
         CAST(NULL AS BIGINT) AS c, CAST(NULL AS BIGINT) AS n_risk
  FROM tot
  UNION ALL
  SELECT k.i, rec.surv * (1.0 - CAST(k.d AS DOUBLE) / CAST(rec.risk AS DOUBLE)),
         rec.risk - k.d - k.c, k.week, k.d, k.c, rec.risk
  FROM rec JOIN idx k ON k.i = rec.i + 1
)
SELECT week, n_risk, d AS n_events, c AS n_censored,
       round(surv, 6) AS survival
FROM rec WHERE i >= 1
ORDER BY week
"""


# --- Q: poisson_bootstrap_ci ------------------------------------------

R_BOOT = 32  # replicates
BOOT_LO_RANK = 2  # 2nd of 32 ordered replicate means
BOOT_HI_RANK = 31  # 31st of 32 — a rank-based ~94% central interval
# P(Poisson(1) <= k) to full double precision — IDENTICAL literals on
# both engines; weights beyond 7 are astronomically rare and capped.
_POIS_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238463",
    "0.9963401531726563",
    "0.9994058151824183",
    "0.999916758850712",
    "0.9999897508033253",
)
_U_DENOM = "4503599627370496.0"  # 2^52: 13 md5 hex digits -> [0, 1)


def _poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    docs = t.documents.select("doc_id", "source", "n_chars")
    reps = docs.withColumn(
        "r", F.explode(F.sequence(F.lit(0), F.lit(R_BOOT - 1)))
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("doc_id").cast("string"),
                        F.col("r").cast("string"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        )
        .cast("bigint")
        .cast("double")
        / F.lit(float(_U_DENOM))
    )
    w_expr = F.when(u < float(_POIS_CDF[0]), 0)
    for k in range(1, len(_POIS_CDF)):
        w_expr = w_expr.when(u < float(_POIS_CDF[k]), k)
    w_expr = w_expr.otherwise(len(_POIS_CDF)).cast("bigint")

    rep_means = (
        reps.withColumn("w", w_expr)
        .groupBy("source", "r")
        .agg(
            F.sum(F.col("w") * F.col("n_chars")).cast("bigint").alias("sum_wx"),
            F.sum("w").cast("bigint").alias("sum_w"),
        )
        .withColumn(
            "mean_r",
            F.col("sum_wx").cast("double") / F.col("sum_w").cast("double"),
        )
    )
    rw = Window.partitionBy("source").orderBy("mean_r", "r")
    ci = (
        rep_means.withColumn("rn", F.row_number().over(rw))
        .groupBy("source")
        .agg(
            F.max(F.when(F.col("rn") == BOOT_LO_RANK, F.col("mean_r"))).alias("lo"),
            F.max(F.when(F.col("rn") == BOOT_HI_RANK, F.col("mean_r"))).alias("hi"),
        )
    )
    point = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )
    return (
        point.join(F.broadcast(ci), "source")
        .select(
            "source",
            "n_docs",
            F.round(
                F.col("sum_chars").cast("double") / F.col("n_docs").cast("double"), 6
            ).alias("mean_chars"),
            F.round("lo", 6).alias("ci_lo"),
            F.round("hi", 6).alias("ci_hi"),
        )
        .orderBy("source")
    )


def _poisson_bootstrap_sql() -> str:
    when_chain = " ".join(
        f"WHEN u < {c} THEN {k}" for k, c in enumerate(_POIS_CDF)
    )
    return f"""
WITH reps AS (
  SELECT d.doc_id, d.source, d.n_chars, r.r
  FROM documents d CROSS JOIN (SELECT unnest(range({R_BOOT})) AS r) r
), uni AS (
  SELECT source, r, n_chars,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(r AS VARCHAR)), 1, 13)) AS BIGINT) AS DOUBLE)
           / {_U_DENOM} AS u
  FROM reps
), weighted AS (
  SELECT source, r, n_chars,
         CAST(CASE {when_chain} ELSE {len(_POIS_CDF)} END AS BIGINT) AS w
  FROM uni
), rep_means AS (
  SELECT source, r,
         CAST(CAST(sum(w * n_chars) AS BIGINT) AS DOUBLE)
           / CAST(CAST(sum(w) AS BIGINT) AS DOUBLE) AS mean_r
  FROM weighted GROUP BY source, r
), ranked AS (
  SELECT source, mean_r,
         row_number() OVER (PARTITION BY source ORDER BY mean_r, r) AS rn
  FROM rep_means
), ci AS (
  SELECT source,
         max(CASE WHEN rn = {BOOT_LO_RANK} THEN mean_r END) AS lo,
         max(CASE WHEN rn = {BOOT_HI_RANK} THEN mean_r END) AS hi
  FROM ranked GROUP BY source
), point AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS sum_chars
  FROM documents GROUP BY source
)
SELECT p.source, p.n_docs,
       round(CAST(p.sum_chars AS DOUBLE) / CAST(p.n_docs AS DOUBLE), 6) AS mean_chars,
       round(ci.lo, 6) AS ci_lo,
       round(ci.hi, 6) AS ci_hi
FROM point p JOIN ci USING (source)
ORDER BY source
"""


# --- Q: conformal_token_interval ---------------------------------------
# Split-conformal prediction intervals (Vovk; Lei et al. 2018) for a
# per-source token-count predictor — distribution-free uncertainty for
# ANY scorer, the eval-tier rung the bootstrap (sampling uncertainty of
# a MEAN) doesn't cover (per-PREDICTION uncertainty). Deterministic
# md5 calibration/test split; predictor = the calibration half's
# tokens-per-char ratio (one exact-BIGINT ratio per source); qhat = the
# ceil((n+1)(1−α))-th smallest calibration residual — a RANK-BASED
# order statistic (integer k, total-order tie-break), so nothing
# interpolates; the test half's empirical coverage is an exact count
# ratio. The conformal guarantee is MARGINAL (≥ 1−α in expectation
# over splits) — per-source coverage swings at small calibration sets,
# so the pytest pins the POOLED coverage plus a literal Python replica.

CONF_ALPHA_NUM = 1  # α = 1/10 → 90% target coverage
CONF_ALPHA_DEN = 10
CONF_SPLIT_HEX = "8000"  # md5 head < this → calibration half


def _conformal_token_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from databeats_spark.functions.text import token_count

    t = load_tables(spark, sf_dir, ["documents"])
    docs = t.documents.select(
        "doc_id",
        "source",
        "n_chars",
        token_count("text").cast("bigint").alias("n_tok"),
        (
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
            < CONF_SPLIT_HEX
        ).alias("is_cal"),
    )
    cal = docs.filter(F.col("is_cal"))
    test = docs.filter(~F.col("is_cal"))
    ratios = cal.groupBy("source").agg(
        F.sum("n_tok").cast("bigint").alias("st"),
        F.sum("n_chars").cast("bigint").alias("sc"),
        F.count(F.lit(1)).cast("bigint").alias("n_cal"),
    )
    resid = F.abs(
        F.col("n_tok").cast("double")
        - F.col("n_chars").cast("double")
        * (F.col("st").cast("double") / F.col("sc").cast("double"))
    )
    k_rank = F.expr(
        f"CAST((((n_cal + 1) * ({CONF_ALPHA_DEN} - {CONF_ALPHA_NUM}))"
        f" + ({CONF_ALPHA_DEN} - 1)) DIV {CONF_ALPHA_DEN} AS BIGINT)"
    )
    cal_res = (
        cal.join(F.broadcast(ratios), "source")
        .withColumn("resid", resid)
        .withColumn("k_rank", k_rank)
    )
    rw = Window.partitionBy("source").orderBy("resid", "doc_id")
    qhats = (
        cal_res.withColumn("rn", F.row_number().over(rw))
        .groupBy("source")
        .agg(
            F.max("n_cal").alias("n_cal"),
            F.max("k_rank").alias("k_rank"),
            F.max(
                F.when(F.col("rn") == F.col("k_rank"), F.col("resid"))
            ).alias("qhat"),
        )
    )
    cov = (
        test.join(F.broadcast(ratios.select("source", "st", "sc")), "source")
        .withColumn("resid", resid)
        .join(F.broadcast(qhats.select("source", "qhat")), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum((F.col("resid") <= F.col("qhat")).cast("bigint"))
            .cast("bigint")
            .alias("n_covered"),
        )
    )
    return (
        qhats.join(cov, "source")
        .select(
            "source",
            "n_cal",
            "n_test",
            "k_rank",
            F.round("qhat", 6).alias("qhat"),
            F.round(
                F.col("n_covered").cast("double") / F.col("n_test").cast("double"), 6
            ).alias("coverage"),
        )
        .orderBy("source")
    )


_CONFORMAL_SQL = f"""
WITH docs AS (
  SELECT doc_id, source, n_chars,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{CONF_SPLIT_HEX}' AS is_cal
  FROM documents
), ratios AS (
  SELECT source, CAST(sum(n_tok) AS BIGINT) AS st,
         CAST(sum(n_chars) AS BIGINT) AS sc,
         CAST(count(*) AS BIGINT) AS n_cal
  FROM docs WHERE is_cal GROUP BY source
), cal_res AS (
  SELECT d.source, d.doc_id, r.n_cal,
         CAST((((r.n_cal + 1) * ({CONF_ALPHA_DEN} - {CONF_ALPHA_NUM}))
               + ({CONF_ALPHA_DEN} - 1)) // {CONF_ALPHA_DEN} AS BIGINT) AS k_rank,
         abs(CAST(d.n_tok AS DOUBLE) - CAST(d.n_chars AS DOUBLE)
             * (CAST(r.st AS DOUBLE) / CAST(r.sc AS DOUBLE))) AS resid
  FROM docs d JOIN ratios r USING (source) WHERE d.is_cal
), qhats AS (
  SELECT source, max(n_cal) AS n_cal, max(k_rank) AS k_rank,
         max(CASE WHEN rn = k_rank THEN resid END) AS qhat
  FROM (
    SELECT source, n_cal, k_rank, resid,
           row_number() OVER (PARTITION BY source ORDER BY resid, doc_id) AS rn
    FROM cal_res
  ) GROUP BY source
), cov AS (
  SELECT d.source, CAST(count(*) AS BIGINT) AS n_test,
         CAST(sum(CASE WHEN abs(CAST(d.n_tok AS DOUBLE) - CAST(d.n_chars AS DOUBLE)
                    * (CAST(r.st AS DOUBLE) / CAST(r.sc AS DOUBLE))) <= q.qhat
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
  FROM docs d
  JOIN ratios r USING (source)
  JOIN qhats q USING (source)
  WHERE NOT d.is_cal
  GROUP BY d.source
)
SELECT q.source, q.n_cal, c.n_test, q.k_rank,
       round(q.qhat, 6) AS qhat,
       round(CAST(c.n_covered AS DOUBLE) / CAST(c.n_test AS DOUBLE), 6) AS coverage
FROM qhats q JOIN cov c USING (source)
ORDER BY source
"""


# --- Q: jackknife_ratio_ci --------------------------------------------
# Ratio-metric uncertainty the way large experimentation platforms
# compute it (Deng et al., KDD 2013 delta method; Efron's delete-one
# jackknife): revenue-per-order per priority tier, with DAYS as the
# resampling/cluster unit — the unit that stays exchangeable when
# orders within a day are correlated. Two readouts side by side:
#   jackknife:  θ̂(i) = (SX − xᵢ)/(SN − nᵢ),
#               se² = (d−1)/d · Σ(θ̂(i) − mean θ̂(i))²
#   delta:      se² = d/(d−1) · Σ(xᵢ − θ̂·nᵢ)² / SN²
# Exactness discipline: day sums are DECIMAL(18,2) (bit-exact on both
# engines regardless of partition order), every θ̂(i) is ONE exact-
# decimal-to-double division, and the deviation sums are computed
# two-pass (deviations around an attached mean, never ΣX² − n·m̄² —
# the cancellation there would eat the round-6 margin). The day-cell
# aggregate is checkpointed once and every per-priority re-attach
# broadcasts (≤5-row catalog-keyed aggregates, hint-policy-clean).

def _jackknife_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    cells = (
        t.orders.select(
            "o_orderpriority",
            F.to_date("o_orderdate").alias("day"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
        .groupBy("o_orderpriority", "day")
        .agg(
            F.sum("price").alias("x"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .localCheckpoint(eager=False)
    )
    # d > 1 guard (ADVICE r10): a single-day priority makes theta_i
    # divide by (sn - n) = 0 and the se terms by (d - 1) = 0 — Spark
    # (non-ANSI) yields NULL where DuckDB yields IEEE inf, the exact
    # divergence class the eb_shrunk_source_rates CASE guards exist
    # for. d >= 2 also bounds every (sn - n) >= 1, so one filter
    # covers both divisions. Data-dependent at every test SF (orders
    # span many days), but guarded on BOTH engines regardless.
    totals = cells.groupBy("o_orderpriority").agg(
        F.sum("x").alias("sx"),
        F.sum("n").cast("bigint").alias("sn"),
        F.count(F.lit(1)).cast("bigint").alias("d"),
    ).filter(F.col("d") > 1)
    theta = F.col("sx").cast("double") / F.col("sn").cast("double")
    pseudo = cells.join(F.broadcast(totals), "o_orderpriority").select(
        "o_orderpriority",
        "sx",
        "sn",
        "d",
        theta.alias("theta"),
        (
            (F.col("sx") - F.col("x")).cast("double")
            / (F.col("sn") - F.col("n")).cast("double")
        ).alias("theta_i"),
        (F.col("x").cast("double") - theta * F.col("n").cast("double")).alias(
            "resid"
        ),
    )
    jmeans = pseudo.groupBy("o_orderpriority").agg(
        F.avg("theta_i").alias("jmean")
    )
    stats = (
        pseudo.join(F.broadcast(jmeans), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.max("sn").alias("n_orders"),
            F.max("d").alias("n_days"),
            F.max("theta").alias("theta"),
            F.sum(
                (F.col("theta_i") - F.col("jmean"))
                * (F.col("theta_i") - F.col("jmean"))
            ).alias("sum_dev2"),
            F.sum(F.col("resid") * F.col("resid")).alias("sum_r2"),
        )
    )
    dd = F.col("n_days").cast("double")
    snd = F.col("n_orders").cast("double")
    jk_se = F.sqrt((dd - 1.0) / dd * F.col("sum_dev2"))
    delta_se = F.sqrt(dd / (dd - 1.0) * F.col("sum_r2")) / snd
    return stats.select(
        "o_orderpriority",
        "n_days",
        "n_orders",
        F.round("theta", 6).alias("rev_per_order"),
        F.round(jk_se, 6).alias("jk_se"),
        F.round(delta_se, 6).alias("delta_se"),
        F.round(F.col("theta") - 1.96 * jk_se, 6).alias("ci_lo"),
        F.round(F.col("theta") + 1.96 * jk_se, 6).alias("ci_hi"),
    ).orderBy("o_orderpriority")


_JACKKNIFE_RATIO_CI_SQL = """
WITH cells AS (
  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS x,
         CAST(count(*) AS BIGINT) AS n
  FROM orders
  GROUP BY o_orderpriority, CAST(o_orderdate AS DATE)
),
totals AS (
  SELECT o_orderpriority, sum(x) AS sx,
         CAST(sum(n) AS BIGINT) AS sn,
         CAST(count(*) AS BIGINT) AS d
  FROM cells GROUP BY o_orderpriority
  HAVING count(*) > 1
),
pseudo AS (
  SELECT c.o_orderpriority, t.sx, t.sn, t.d,
         CAST(t.sx AS DOUBLE) / CAST(t.sn AS DOUBLE) AS theta,
         CAST(t.sx - c.x AS DOUBLE) / CAST(t.sn - c.n AS DOUBLE) AS theta_i,
         CAST(c.x AS DOUBLE)
           - (CAST(t.sx AS DOUBLE) / CAST(t.sn AS DOUBLE))
             * CAST(c.n AS DOUBLE) AS resid
  FROM cells c JOIN totals t USING (o_orderpriority)
),
jmeans AS (
  SELECT o_orderpriority, avg(theta_i) AS jmean
  FROM pseudo GROUP BY o_orderpriority
),
stats AS (
  SELECT p.o_orderpriority,
         max(p.sn) AS n_orders,
         max(p.d) AS n_days,
         max(p.theta) AS theta,
         sum((p.theta_i - j.jmean) * (p.theta_i - j.jmean)) AS sum_dev2,
         sum(p.resid * p.resid) AS sum_r2
  FROM pseudo p JOIN jmeans j USING (o_orderpriority)
  GROUP BY p.o_orderpriority
)
SELECT o_orderpriority, n_days, n_orders,
       round(theta, 6) AS rev_per_order,
       round(sqrt((CAST(n_days AS DOUBLE) - 1.0) / CAST(n_days AS DOUBLE)
                  * sum_dev2), 6) AS jk_se,
       round(sqrt(CAST(n_days AS DOUBLE) / (CAST(n_days AS DOUBLE) - 1.0)
                  * sum_r2) / CAST(n_orders AS DOUBLE), 6) AS delta_se,
       round(theta - 1.96 * sqrt((CAST(n_days AS DOUBLE) - 1.0)
                  / CAST(n_days AS DOUBLE) * sum_dev2), 6) AS ci_lo,
       round(theta + 1.96 * sqrt((CAST(n_days AS DOUBLE) - 1.0)
                  / CAST(n_days AS DOUBLE) * sum_dev2), 6) AS ci_hi
FROM stats
ORDER BY o_orderpriority
"""


# --- Q: wilson_return_ranking -------------------------------------------
# "How not to sort by average rating" (E. Miller), Wilson 1927: rank
# parts by the LOWER bound of the 95% Wilson score interval on their
# return rate, not the raw rate — a 3/3 returner must not outrank a
# 28/40 one. The bound is a closed form of two BIGINTs (returns n_ret,
# trials n) and the literal z = 1.96, written with the identical
# association order on both engines; sqrt/division are IEEE-identical,
# round-6 absorbs ln-free arithmetic entirely. One part-keyed hash
# aggregate (map-side combined), head via TakeOrderedAndProject on the
# rounded bound — no window, no join.

WILSON_MIN_N = 20
WILSON_TOP = 50


def _wilson_return_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem"])
    agg = (
        t.lineitem.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum((F.col("l_returnflag") == "R").cast("bigint"))
            .cast("bigint")
            .alias("n_ret"),
        )
        .filter(F.col("n") >= WILSON_MIN_N)
    )
    nd = F.col("n").cast("double")
    p = F.col("n_ret").cast("double") / nd
    z2 = F.lit(1.96) * F.lit(1.96)
    lb = (
        p
        + z2 / (2.0 * nd)
        - F.lit(1.96)
        * F.sqrt(p * (1.0 - p) / nd + z2 / (4.0 * nd * nd))
    ) / (1.0 + z2 / nd)
    return (
        agg.select(
            "l_partkey",
            "n",
            "n_ret",
            F.round(p, 6).alias("raw_rate"),
            F.round(lb, 6).alias("wilson_lb"),
        )
        .orderBy(F.desc("wilson_lb"), "l_partkey")
        .limit(WILSON_TOP)
    )


_WILSON_RETURN_RANKING_SQL = f"""
WITH agg AS (
  SELECT l_partkey,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_ret
  FROM lineitem GROUP BY l_partkey
  HAVING count(*) >= {WILSON_MIN_N}
)
SELECT l_partkey, n, n_ret,
       round(CAST(n_ret AS DOUBLE) / CAST(n AS DOUBLE), 6) AS raw_rate,
       round((CAST(n_ret AS DOUBLE) / CAST(n AS DOUBLE)
              + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE))
              - 1.96 * sqrt((CAST(n_ret AS DOUBLE) / CAST(n AS DOUBLE))
                            * (1.0 - CAST(n_ret AS DOUBLE) / CAST(n AS DOUBLE))
                            / CAST(n AS DOUBLE)
                            + (1.96 * 1.96)
                              / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
             / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)), 6) AS wilson_lb
FROM agg
ORDER BY wilson_lb DESC, l_partkey
LIMIT {WILSON_TOP}
"""


# --- Q: eb_shrunk_source_rates -----------------------------------------
# Empirical-Bayes shrinkage of per-source short-document rates (the
# Efron-Morris estimator with the DerSimonian-Laird moment estimate of
# the between-source variance τ²) — the corpus-audit answer to "is
# src7 really dirtier, or just small?". With pooled within-variance
# c = p̄(1−p̄) and w_s ∝ n_s the DL algebra collapses to BIGINT-driven
# closed forms:
#   τ² = max(0, (Σ nₛ(yₛ−p̄)² − (k−1)·c) / (N − Σnₛ²/N)),
#   Bₛ = c / (c + nₛ·τ²),   shrunkₛ = p̄·Bₛ + yₛ·(1−Bₛ).
# Degenerate corpora (p̄ ∈ {0,1}, or a single source) take the CASE
# fallback — identical on both engines, so no div-by-zero NULL/inf
# divergence (the ADVICE r9 lesson). One source-keyed aggregate
# (≤ EB_SRC_K rows — the source catalog), scalars via the checkpoint-
# once posture; every broadcast side is a keyless or catalog-keyed
# aggregate.

EB_CHAR_THRESH = 300  # interior short-doc rate at every test SF


def _eb_shrunk_source_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    src = (
        t.documents.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum((F.col("n_chars") < EB_CHAR_THRESH).cast("bigint"))
            .cast("bigint")
            .alias("n_short"),
        )
        .localCheckpoint(eager=False)
    )
    tot = src.agg(
        F.sum("n_docs").cast("bigint").alias("nn"),
        F.sum("n_short").cast("bigint").alias("ns"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.col("n_docs") * F.col("n_docs")).cast("bigint").alias("sum_n2"),
    )
    y = F.col("n_docs").cast("double")
    aug = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_short",
        "nn",
        "k",
        "sum_n2",
        (F.col("n_short").cast("double") / y).alias("y_s"),
        (F.col("ns").cast("double") / F.col("nn").cast("double")).alias("pbar"),
    )
    c = F.col("pbar") * (1.0 - F.col("pbar"))
    q = aug.agg(
        F.sum(
            F.col("n_docs").cast("double")
            * (F.col("y_s") - F.col("pbar"))
            * (F.col("y_s") - F.col("pbar"))
        ).alias("s1"),
        F.max("k").alias("k_"),
        F.max("nn").alias("nn_"),
        F.max("sum_n2").alias("sum_n2_"),
        F.max("pbar").alias("pbar_"),
    ).select(
        F.when(
            (F.col("k_") > 1)
            & (F.col("pbar_") > 0.0)
            & (F.col("pbar_") < 1.0),
            F.greatest(
                F.lit(0.0),
                (
                    F.col("s1")
                    - (F.col("k_") - 1).cast("double")
                    * (F.col("pbar_") * (1.0 - F.col("pbar_")))
                )
                / (
                    F.col("nn_").cast("double")
                    - F.col("sum_n2_").cast("double")
                    / F.col("nn_").cast("double")
                ),
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("tau2")
    )
    b = F.when(
        (F.col("pbar") > 0.0) & (F.col("pbar") < 1.0),
        c / (c + F.col("n_docs").cast("double") * F.col("tau2")),
    ).otherwise(F.lit(1.0))
    return (
        aug.crossJoin(F.broadcast(q))
        .select(
            "source",
            "n_docs",
            "n_short",
            F.round("y_s", 6).alias("raw_rate"),
            F.round("tau2", 6).alias("tau2"),
            F.round(b, 6).alias("shrink_b"),
            F.round(
                F.col("pbar") * b + F.col("y_s") * (1.0 - b), 6
            ).alias("shrunk_rate"),
        )
        .orderBy("source")
    )


_EB_SHRUNK_SOURCE_RATES_SQL = f"""
WITH src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN n_chars < {EB_CHAR_THRESH} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_short
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS nn,
         CAST(sum(n_short) AS BIGINT) AS ns,
         CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n_docs * n_docs) AS BIGINT) AS sum_n2
  FROM src
),
aug AS (
  SELECT s.source, s.n_docs, s.n_short, t.nn, t.k, t.sum_n2,
         CAST(s.n_short AS DOUBLE) / CAST(s.n_docs AS DOUBLE) AS y_s,
         CAST(t.ns AS DOUBLE) / CAST(t.nn AS DOUBLE) AS pbar
  FROM src s CROSS JOIN tot t
),
q AS (
  SELECT CASE WHEN max(k) > 1 AND max(pbar) > 0.0 AND max(pbar) < 1.0
          THEN greatest(0.0,
            (sum(CAST(n_docs AS DOUBLE) * (y_s - pbar) * (y_s - pbar))
             - CAST(max(k) - 1 AS DOUBLE) * (max(pbar) * (1.0 - max(pbar))))
            / (CAST(max(nn) AS DOUBLE)
               - CAST(max(sum_n2) AS DOUBLE) / CAST(max(nn) AS DOUBLE)))
          ELSE 0.0 END AS tau2
  FROM aug
)
SELECT source, n_docs, n_short,
       round(y_s, 6) AS raw_rate,
       round(tau2, 6) AS tau2,
       round(CASE WHEN pbar > 0.0 AND pbar < 1.0
         THEN (pbar * (1.0 - pbar))
              / ((pbar * (1.0 - pbar)) + CAST(n_docs AS DOUBLE) * tau2)
         ELSE 1.0 END, 6) AS shrink_b,
       round(pbar * (CASE WHEN pbar > 0.0 AND pbar < 1.0
           THEN (pbar * (1.0 - pbar))
                / ((pbar * (1.0 - pbar)) + CAST(n_docs AS DOUBLE) * tau2)
           ELSE 1.0 END)
         + y_s * (1.0 - (CASE WHEN pbar > 0.0 AND pbar < 1.0
           THEN (pbar * (1.0 - pbar))
                / ((pbar * (1.0 - pbar)) + CAST(n_docs AS DOUBLE) * tau2)
           ELSE 1.0 END)), 6) AS shrunk_rate
FROM aug CROSS JOIN q
ORDER BY source
"""


# --- Q: bh_fdr_discoveries — multiple-testing control (r11) -------------
# The missing layer over the per-group tests this tier accumulates:
# run one two-proportion z-test per part brand (brand return rate vs
# the rest of the corpus) and control the FALSE DISCOVERY RATE across
# all of them with Benjamini-Hochberg (1995) step-up — the correction
# every experimentation/quality platform applies before acting on "3
# of 25 segments moved". p-values come from the Zelen-Severo 26.2.17
# normal-tail polynomial written as IDENTICAL double literals in fixed
# Horner association on both engines (the hard-coded-ladder recipe the
# Poisson-bootstrap weights established) — bit-equal doubles, so the
# step-up comparisons (on UNROUNDED p) cannot diverge. Counts are
# exact BIGINTs; the global totals re-attach through
# attach_global_scalar (shuffled-subtree scalar rule); the rank/count
# windows read a LIMIT-bounded brand relation (~25 rows at any SF —
# the semantic no-op bound the plan lint requires).

BH_ALPHA = 0.05
BH_MAX_TESTS = 128  # semantic no-op: the brand catalog is ~25 rows

# Zelen & Severo 26.2.17 constants (shared literal text on both engines)
_ZS = ("0.2316419", "0.319381530", "-0.356563782", "1.781477937",
       "-1.821255978", "1.330274429", "0.3989422804014327")


def _bh_fdr_discoveries(spark: SparkSession, sf_dir: str) -> DataFrame:
    from databeats_spark.operators.scale import attach_global_scalar

    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    agg = (
        t.lineitem.join(
            t.part.select("p_partkey", "p_brand"),
            t.lineitem.l_partkey == t.part.p_partkey,
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum((F.col("l_returnflag") == "R").cast("bigint"))
            .cast("bigint")
            .alias("r"),
        )
    )
    with_tot = attach_global_scalar(
        agg,
        F.sum("n").cast("bigint").alias("tot_n"),
        F.sum("r").cast("bigint").alias("tot_r"),
    ).limit(BH_MAX_TESTS)

    nb = F.col("n").cast("double")
    nr = (F.col("tot_n") - F.col("n")).cast("double")
    p_b = F.col("r").cast("double") / nb
    p_r = (F.col("tot_r") - F.col("r")).cast("double") / nr
    p_pool = F.col("tot_r").cast("double") / F.col("tot_n").cast("double")
    # degenerate-variance guard on exact INTEGER conditions (the
    # NULL-vs-inf class): a brand that IS the whole corpus, or a
    # corpus with zero/all returns, has no defined z — score it 0
    # (p = 1, never discovered), the mann_whitney zero-variance posture
    z = F.when(
        (F.col("tot_n") == F.col("n"))
        | (F.col("tot_r") == 0)
        | (F.col("tot_r") == F.col("tot_n")),
        F.lit(0.0),
    ).otherwise(
        (p_b - p_r)
        / F.sqrt(p_pool * (1.0 - p_pool) * (1.0 / nb + 1.0 / nr))
    )
    az = F.abs(z)
    # p = 2 * phi(|z|) * Horner(t), t = 1/(1 + c0|z|) — identical
    # literals + association on both engines (bit-equal doubles)
    tt = 1.0 / (1.0 + float(_ZS[0]) * az)
    # poly WITHOUT the trailing *t so the final product associates as
    # ((2*phi) * poly) * t on BOTH engines (left-assoc parity — double
    # multiplication is not associative and the step-up compares
    # UNROUNDED p)
    horner = (
        (
            (float(_ZS[5]) * tt + float(_ZS[4])) * tt + float(_ZS[3])
        ) * tt + float(_ZS[2])
    ) * tt + float(_ZS[1])
    pval = 2.0 * (float(_ZS[6]) * F.exp(-az * az / 2.0)) * horner * tt

    scored = with_tot.select(
        "p_brand", "n", "r", z.alias("z"), pval.alias("p")
    )
    wr = Window.orderBy("p", "p_brand")
    wm = Window.partitionBy()
    ranked = scored.select(
        "p_brand",
        "n",
        "r",
        "z",
        "p",
        F.row_number().over(wr).cast("bigint").alias("rank"),
        F.count(F.lit(1)).over(wm).cast("bigint").alias("m"),
    )
    # step-up: discovered iff rank <= max{i : p_i * m <= i * alpha}
    passed = F.when(
        F.col("p") * F.col("m").cast("double")
        <= F.col("rank").cast("double") * BH_ALPHA,
        F.col("rank"),
    ).otherwise(F.lit(0))
    kstar = F.max(passed).over(wm).alias("k_star")
    return (
        ranked.select(
            "p_brand",
            "n",
            "r",
            F.round(F.col("r").cast("double") / F.col("n").cast("double"), 6).alias("return_rate"),
            F.round("z", 6).alias("z"),
            F.round("p", 6).alias("p_value"),
            "rank",
            "m",
            kstar,
        )
        .select(
            "p_brand",
            "n",
            "r",
            "return_rate",
            "z",
            "p_value",
            "rank",
            "m",
            (F.col("rank") <= F.col("k_star")).alias("discovered"),
        )
        .orderBy("rank")
    )


_BH_FDR_SQL = f"""
WITH agg AS (
  SELECT p_brand,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS r
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS tot_n, CAST(sum(r) AS BIGINT) AS tot_r FROM agg
),
scored AS (
  SELECT p_brand, n, r,
         CASE WHEN tot_n = n OR tot_r = 0 OR tot_r = tot_n THEN 0.0
              ELSE (CAST(r AS DOUBLE) / CAST(n AS DOUBLE)
                    - CAST(tot_r - r AS DOUBLE) / CAST(tot_n - n AS DOUBLE))
                   / sqrt((CAST(tot_r AS DOUBLE) / CAST(tot_n AS DOUBLE))
                          * (1.0 - CAST(tot_r AS DOUBLE) / CAST(tot_n AS DOUBLE))
                          * (1.0 / CAST(n AS DOUBLE) + 1.0 / CAST(tot_n - n AS DOUBLE)))
         END AS z
  FROM agg CROSS JOIN tot
),
pv AS (
  SELECT p_brand, n, r, z,
         2.0 * ({_ZS[6]} * exp(-abs(z) * abs(z) / 2.0))
             * (((({_ZS[5]} * (1.0 / (1.0 + {_ZS[0]} * abs(z))) + {_ZS[4]})
                  * (1.0 / (1.0 + {_ZS[0]} * abs(z))) + {_ZS[3]})
                  * (1.0 / (1.0 + {_ZS[0]} * abs(z))) + {_ZS[2]})
                  * (1.0 / (1.0 + {_ZS[0]} * abs(z))) + {_ZS[1]})
             * (1.0 / (1.0 + {_ZS[0]} * abs(z))) AS p
  FROM scored
),
ranked AS (
  SELECT p_brand, n, r, z, p,
         CAST(row_number() OVER (ORDER BY p, p_brand) AS BIGINT) AS rank,
         CAST(count(*) OVER () AS BIGINT) AS m
  FROM pv
),
kstar AS (
  SELECT p_brand, n, r, z, p, rank, m,
         max(CASE WHEN p * CAST(m AS DOUBLE)
                       <= CAST(rank AS DOUBLE) * {BH_ALPHA!r}
                  THEN rank ELSE 0 END) OVER () AS k_star
  FROM ranked
)
SELECT p_brand, n, r,
       round(CAST(r AS DOUBLE) / CAST(n AS DOUBLE), 6) AS return_rate,
       round(z, 6) AS z,
       round(p, 6) AS p_value,
       rank, m,
       rank <= k_star AS discovered
FROM kstar
ORDER BY rank
"""


# --- Q: permutation_null_effect — exact-arithmetic permutation test ------
# The resampling complement of the Poisson bootstrap: instead of
# resampling the ESTIMATE, re-randomize the LABELS under H0 and ask
# where the observed arm difference falls in its own null distribution
# (Fisher 1935, the standard heavy-tail-robust readout when normal
# approximations are suspect). PERM_K deterministic pseudo-permutations
# come from md5(user_id:k) high-hex bits (the deterministic_sample
# auditability argument — same membership on any engine/partitioning);
# k=0 carries the TRUE labels. Spark plan: ONE pass — per-user exact
# DECIMAL outcomes explode by the (K+1)-element replicate spine and
# hash-aggregate to (K+1)x2 rows with map-side partial combine (the
# Poisson-bootstrap movement shape: replicate fan-out collapses before
# it shuffles). Every per-replicate mean is one decimal->double
# division; the null comparison runs on UNROUNDED bit-equal doubles.

PERM_K = 99
_PERM_HEX = "8"  # md5 first hex < '8' => arm 1 (~half, deterministic)


def _permutation_null_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    per_user = t.events.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("y")
    )
    k = F.explode(F.sequence(F.lit(0), F.lit(PERM_K))).alias("k")
    fan = per_user.select("user_id", "y", k)
    arm = F.when(
        F.col("k") == 0, (F.col("user_id") % 2).cast("bigint")
    ).otherwise(
        (
            F.substring(
                F.md5(F.concat_ws(":", F.col("user_id"), F.col("k"))), 1, 1
            )
            < _PERM_HEX
        ).cast("bigint")
    )
    cells = (
        fan.select("k", arm.alias("arm"), "y")
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("arm") == 1, F.col("y"))).alias("sy1"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n1"),
            F.sum(F.when(F.col("arm") == 0, F.col("y"))).alias("sy0"),
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n0"),
        )
    )
    diff = (
        F.col("sy1").cast("double") / F.col("n1").cast("double")
        - F.col("sy0").cast("double") / F.col("n0").cast("double")
    )
    # empty-arm guard (the NULL-vs-inf divergence class, ADVICE r10):
    # a permutation that lands every user in one arm has no defined
    # diff — drop it on BOTH engines (data-dependent only on corpora
    # of a handful of users, but guarded regardless)
    diffs = cells.filter((F.col("n1") > 0) & (F.col("n0") > 0)).select(
        "k", diff.alias("diff")
    )
    obs = diffs.filter(F.col("k") == 0).limit(1).select(
        F.col("diff").alias("diff_obs")
    )
    # semantic no-op bound: the null distribution is exactly PERM_K
    # rows by construction — put the bound in the plan so the
    # broadcast-NLJ stream side is provably bounded (plan-lint posture)
    nulls = diffs.filter(F.col("k") > 0).limit(PERM_K)
    return (
        nulls.crossJoin(F.broadcast(obs))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_perms"),
            F.sum(
                (F.abs(F.col("diff")) >= F.abs(F.col("diff_obs")))
                .cast("bigint")
            )
            .cast("bigint")
            .alias("n_ge"),
            F.max("diff_obs").alias("d_obs"),
        )
        .select(
            "n_perms",
            "n_ge",
            F.round("d_obs", 6).alias("diff_obs"),
            F.round(
                (F.col("n_ge") + 1).cast("double")
                / (F.col("n_perms") + 1).cast("double"),
                6,
            ).alias("p_perm"),
        )
    )


_PERMUTATION_NULL_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS y
  FROM events GROUP BY user_id
),
fan AS (
  SELECT user_id, y, k
  FROM per_user CROSS JOIN (SELECT unnest(range(0, {PERM_K + 1})) AS k)
),
cells AS (
  SELECT k,
         CASE WHEN k = 0 THEN CAST(user_id % 2 AS BIGINT)
              ELSE CAST(substr(md5(CAST(user_id AS VARCHAR) || ':' || CAST(k AS VARCHAR)), 1, 1)
                        < '{_PERM_HEX}' AS BIGINT) END AS arm,
         y
  FROM fan
),
diffs AS (
  SELECT k,
         CAST(sum(CASE WHEN arm = 1 THEN y END) AS DOUBLE)
           / CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         - CAST(sum(CASE WHEN arm = 0 THEN y END) AS DOUBLE)
           / CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS diff
  FROM cells GROUP BY k
  HAVING sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) > 0
     AND sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) > 0
),
obs AS (SELECT diff AS diff_obs FROM diffs WHERE k = 0 LIMIT 1)
SELECT CAST(count(*) AS BIGINT) AS n_perms,
       CAST(sum(CASE WHEN abs(diff) >= abs(diff_obs) THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
       round(max(diff_obs), 6) AS diff_obs,
       round((sum(CASE WHEN abs(diff) >= abs(diff_obs) THEN 1 ELSE 0 END) + 1) * 1.0
             / (count(*) + 1), 6) AS p_perm
FROM diffs CROSS JOIN obs
WHERE k > 0
"""


SPECS = [
    QuerySpec(
        "bh_fdr_discoveries",
        "Benjamini-Hochberg FDR step-up over per-brand return-rate z-tests (shared normal-tail polynomial literals)",
        _bh_fdr_discoveries,
        _BH_FDR_SQL,
        tags=("stats", "audit"),
    ),
    QuerySpec(
        "permutation_null_effect",
        "deterministic md5 permutation test: observed arm diff vs its one-pass label-permutation null distribution",
        _permutation_null_effect,
        _PERMUTATION_NULL_SQL,
        tags=("stats", "audit"),
    ),
    QuerySpec(
        "jackknife_ratio_ci",
        "ratio-metric CI per priority: delete-one-day jackknife beside the cluster delta method, exact DECIMAL day moments",
        _jackknife_ratio_ci,
        _JACKKNIFE_RATIO_CI_SQL,
        tags=("stats", "eval"),
    ),
    QuerySpec(
        "wilson_return_ranking",
        "parts ranked by the Wilson 95% lower bound on their return rate (uncertainty-aware ranking, not raw rates)",
        _wilson_return_ranking,
        _WILSON_RETURN_RANKING_SQL,
        tags=("stats", "agg"),
    ),
    QuerySpec(
        "eb_shrunk_source_rates",
        "Efron-Morris/DerSimonian-Laird empirical-Bayes shrinkage of per-source short-doc rates (closed-form tau2)",
        _eb_shrunk_source_rates,
        _EB_SHRUNK_SOURCE_RATES_SQL,
        tags=("stats", "audit"),
    ),
    QuerySpec(
        "conformal_token_interval",
        "split-conformal prediction interval per source: rank-based qhat off a deterministic calibration split, exact-count test coverage",
        _conformal_token_interval,
        _CONFORMAL_SQL,
        tags=("stats", "audit", "ml"),
    ),
    QuerySpec(
        "kaplan_meier_retention",
        "Kaplan-Meier time-to-repeat-purchase curve: distributed duration extraction, one calendar-bounded ordered fold (recursive-CTE oracle)",
        _kaplan_meier_retention,
        _KM_SQL,
        tags=("lifecycle", "stats"),
    ),
    QuerySpec(
        "poisson_bootstrap_ci",
        "scalable bootstrap: deterministic md5 Poisson(1) weights, 32 one-pass replicate means, rank-based CI per source",
        _poisson_bootstrap_ci,
        _poisson_bootstrap_sql,
        tags=("stats", "audit"),
    ),
]
