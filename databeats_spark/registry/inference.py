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


SPECS = [
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
