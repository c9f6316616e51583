"""Market-basket association rules — the classic co-occurrence mining
workload over order baskets (Agrawal-Srikant A-Priori at the 2-itemset
tier), sibling to event_cooccurrence_lift's event-stream version but
keyed on catalog items bought together.

Scale shape: baskets are BOUNDED (a TPC-H order holds ≤7 lineitems),
so the within-basket pair explosion is O(orders · basket²) — linear in
the data, never n². The pair table then collapses to a catalog-bounded
relation (≤ brands² rows) in one hash aggregate; supports are a
25-row broadcast back; the basket count is a scalar over the raw scan
(naive 1-row crossJoin per the derived-scalar rule). The same plan at
100 TB: one basket-keyed shuffle + catalog-sized joins.

Parity: support/confidence/lift inputs are all exact BIGINT counts;
each ratio is ONE division (lift spelled (supp_ab·N)/(supp_a·supp_b)
— integer products first, one double division), round(…, 6). The
support threshold is the integer comparison 100·supp_ab >= N, so no
float decides membership.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databeats_spark.registry import QuerySpec
from databeats_spark.sources.tables import load_tables

BASKET_MIN_SUPPORT_PCT = 1  # pair must appear in >= 1% of baskets


def _basket_lift_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    items = t.lineitem.join(
        t.part, F.col("l_partkey") == F.col("p_partkey")
    ).select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
    # ONE basket-keyed shuffle (collect_set subsumes the distinct), then
    # the ≤basket² pair expansion happens MAP-SIDE off the sorted array
    # — no self-join, so neither join side re-executes the item scan
    # and the plan keeps the same shape at every SF (the original
    # items⋈items form flipped broadcast→sort-merge between SFs)
    # baskets has TWO consumers (pair explosion + per-brand supports):
    # one lazy localCheckpoint pins it — exchange reuse shares the
    # items shuffle but still re-ran the collect_set finalization and
    # the array build once per consumer
    baskets = items.groupBy("ok").agg(
        F.sort_array(F.collect_set("brand")).alias("bs")
    ).localCheckpoint(eager=False)
    bs = F.col("bs")
    pair_structs = F.flatten(
        F.transform(
            bs,
            lambda x, i: F.transform(
                F.slice(bs, i + F.lit(2), F.size(bs)),
                lambda y: F.struct(x.alias("brand_a"), y.alias("brand_b")),
            ),
        )
    )
    pair_supp = (
        baskets.select(F.explode(pair_structs).alias("p"))
        .groupBy("p.brand_a", "p.brand_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("supp_ab"))
    )
    supports = baskets.select(F.explode("bs").alias("brand")).groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("supp")
    )
    # basket universe: scalar over the raw lineitem scan — naive 1-row
    # crossJoin (keyless aggregate; nothing shuffled upstream of it)
    n_baskets = t.lineitem.agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("n_baskets")
    )
    rules = (
        pair_supp.crossJoin(F.broadcast(n_baskets))
        .filter(F.col("supp_ab") * 100 >= F.col("n_baskets") * BASKET_MIN_SUPPORT_PCT)
        .join(
            F.broadcast(supports.select(F.col("brand").alias("brand_a"), F.col("supp").alias("supp_a"))),
            "brand_a",
        )
        .join(
            F.broadcast(supports.select(F.col("brand").alias("brand_b"), F.col("supp").alias("supp_b"))),
            "brand_b",
        )
    )
    lift = (F.col("supp_ab") * F.col("n_baskets")).cast("double") / (
        F.col("supp_a") * F.col("supp_b")
    ).cast("double")
    return rules.select(
        "brand_a",
        "brand_b",
        "supp_ab",
        "supp_a",
        "supp_b",
        F.round(F.col("supp_ab").cast("double") / F.col("n_baskets").cast("double"), 6).alias("support"),
        F.round(F.col("supp_ab").cast("double") / F.col("supp_a").cast("double"), 6).alias("conf_a_to_b"),
        F.round(F.col("supp_ab").cast("double") / F.col("supp_b").cast("double"), 6).alias("conf_b_to_a"),
        F.round(lift, 6).alias("lift"),
    ).orderBy(F.desc("lift"), "brand_a", "brand_b")


_BASKET_LIFT_SQL = f"""
WITH items AS (
  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), pair_supp AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b,
         CAST(count(*) AS BIGINT) AS supp_ab
  FROM items a JOIN items b ON a.ok = b.ok AND a.brand < b.brand
  GROUP BY 1, 2
), supports AS (
  SELECT brand, CAST(count(*) AS BIGINT) AS supp FROM items GROUP BY brand
), nb AS (
  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_baskets FROM lineitem
)
SELECT p.brand_a, p.brand_b, p.supp_ab, sa.supp AS supp_a, sb.supp AS supp_b,
       round(CAST(p.supp_ab AS DOUBLE) / CAST(nb.n_baskets AS DOUBLE), 6) AS support,
       round(CAST(p.supp_ab AS DOUBLE) / CAST(sa.supp AS DOUBLE), 6) AS conf_a_to_b,
       round(CAST(p.supp_ab AS DOUBLE) / CAST(sb.supp AS DOUBLE), 6) AS conf_b_to_a,
       round(CAST(p.supp_ab * nb.n_baskets AS DOUBLE)
             / CAST(sa.supp * sb.supp AS DOUBLE), 6) AS lift
FROM pair_supp p
CROSS JOIN nb
JOIN supports sa ON sa.brand = p.brand_a
JOIN supports sb ON sb.brand = p.brand_b
WHERE p.supp_ab * 100 >= nb.n_baskets * {BASKET_MIN_SUPPORT_PCT}
ORDER BY lift DESC, brand_a, brand_b
"""


SPECS = [
    QuerySpec(
        "basket_lift_rules",
        "market-basket 2-itemset rules: bounded-basket pair explosion, catalog-bounded aggregate, exact-count support/confidence/lift",
        _basket_lift_rules,
        _BASKET_LIFT_SQL,
        tags=("relational", "mining"),
    ),
]
