"""Record linkage / entity resolution over structured rows — the
classic warehouse workload beside the text-dedup tier: the SAME
block → pairwise-score → threshold → connected-components shape, but
keyed on typed attributes and scored with string distance instead of
shingle overlap.

Deterministic (Fellegi-Sunter's deterministic tier): candidate pairs
come from equality blocking on (nation, market segment) — the move
that keeps pairwise scoring O(Σ block²) instead of O(n²) — and a pair
matches when the name edit distance is within ER_NAME_DIST_MAX.
``levenshtein`` has identical semantics on Spark and DuckDB, so every
stage (blocking, scoring, the recursive closure, survivorship) is
oracle-matched — nothing in this tier is left SQL-uncertified.

Scale notes: the registry rows run on the bounded verifier slice
(c_custkey < ER_CUST_LIMIT, the near_dup_pairs posture) because
equality blocks grow linearly with the table and pairwise scoring
re-quadratizes inside them; the production move at 100 TB is a finer
blocking key (sorted-neighborhood window or an LSH block over name
q-grams — the machinery operators/dedup.py already provides), and the
downstream component/survivor stages are unchanged. Components reuse
operators/graph.py::alternating_components (O(log n) star rounds).

Reference parity: the reference dedups structured rows only via exact
drop_duplicates (dag.py A2/A3); this extends the same north star the
dedup/graph tiers serve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databeats_spark.registry import QuerySpec
from databeats_spark.sources.tables import load_tables

ER_CUST_LIMIT = 3000  # bounded verifier slice (near_dup_pairs posture)
ER_NAME_DIST_MAX = 2  # deterministic match rule: edit distance <= 2


def _blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer"])
    return t.customer.filter(F.col("c_custkey") < ER_CUST_LIMIT).select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("acctbal"),
    )


def _match_pairs(cust: DataFrame) -> DataFrame:
    a = cust.select(
        F.col("id").alias("id_a"), F.col("name").alias("name_a"),
        "nation", "segment",
    )
    b = cust.select(
        F.col("id").alias("id_b"), F.col("name").alias("name_b"),
        F.col("nation").alias("nation_b"), F.col("segment").alias("segment_b"),
    )
    return (
        a.join(
            b,
            (F.col("nation") == F.col("nation_b"))
            & (F.col("segment") == F.col("segment_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        # score only inside the block join's output — the distance
        # predicate prunes in the same stage, never score-then-collect
        .withColumn("name_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("name_dist") <= ER_NAME_DIST_MAX)
        .select("id_a", "id_b", F.col("name_dist").cast("bigint").alias("name_dist"))
    )


def _entity_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _match_pairs(_blocked(spark, sf_dir)).orderBy("id_a", "id_b")


_PAIRS_SQL_CTES = f"""c AS (
  SELECT c_custkey AS id, c_name AS name, c_nationkey AS nation,
         c_mktsegment AS segment, c_acctbal AS acctbal
  FROM customer WHERE c_custkey < {ER_CUST_LIMIT}
), pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(levenshtein(a.name, b.name) AS BIGINT) AS name_dist
  FROM c a JOIN c b
    ON a.nation = b.nation AND a.segment = b.segment AND a.id < b.id
  WHERE levenshtein(a.name, b.name) <= {ER_NAME_DIST_MAX}
)"""

_ENTITY_MATCH_PAIRS_SQL = f"""
WITH {_PAIRS_SQL_CTES}
SELECT id_a, id_b, name_dist FROM pairs
ORDER BY id_a, id_b
"""


def _entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from databeats_spark.operators.graph import alternating_components

    cust = _blocked(spark, sf_dir)
    pairs = _match_pairs(cust)
    comps = alternating_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    # survivorship: the max-acctbal member (tie: min id) represents the
    # entity — the keep-best rule every MDM pipeline applies
    members = cust.join(comps, cust["id"] == comps["node"]).select(
        F.col("component").alias("entity_id"), "id", "acctbal"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("entity_id").orderBy(F.desc("acctbal"), "id")
    return (
        members.withColumn("__rn", F.row_number().over(w))
        .groupBy("entity_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.max(F.when(F.col("__rn") == 1, F.col("id"))).alias("survivor_id"),
            F.sum(F.col("acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_acctbal"),
        )
        .orderBy("entity_id")
    )


_ENTITY_CLUSTERS_SQL = f"""
WITH RECURSIVE {_PAIRS_SQL_CTES},
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(node, label) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.node
),
comp AS (
  SELECT node, min(label) AS entity_id FROM reach GROUP BY node
),
members AS (
  SELECT comp.entity_id, c.id, c.acctbal,
         row_number() OVER (
           PARTITION BY comp.entity_id ORDER BY c.acctbal DESC, c.id
         ) AS rn
  FROM comp JOIN c ON c.id = comp.node
)
SELECT entity_id,
       CAST(count(*) AS BIGINT) AS n_members,
       max(CASE WHEN rn = 1 THEN id END) AS survivor_id,
       CAST(sum(CAST(acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM members
GROUP BY entity_id
ORDER BY entity_id
"""


# --- Q: sorted_neighborhood_pairs — the linear-cost candidate path ----
# The scale posture the blocked tier's docstring promises: sorted-
# neighborhood candidate generation (Hernandez & Stolfo, SIGMOD'95).
# Sort within a coarse partition (nation) by the match key and compare
# each row only with its previous SNM_WINDOW neighbors — O(n·w)
# candidates instead of O(Σ block²), expressible as w lag() columns
# over ONE key-partitioned window (no self-join at all; the sort is
# per-partition, never global). The trade vs equality blocking is
# documented, not hidden: neighbors can cross segments (catches
# cross-segment duplicates blocking misses) while far-apart same-
# segment near-names fall outside the window. Candidate-set semantics
# are pinned exactly in tests/test_linkage.py against a pandas replay.

SNM_WINDOW = 5


def _sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cust = _blocked(spark, sf_dir)
    w = Window.partitionBy("nation").orderBy("name", "id")
    lagged = cust.select(
        "id",
        "name",
        "nation",
        F.array(
            *[
                F.struct(
                    F.lag("id", i).over(w).alias("nid"),
                    F.lag("name", i).over(w).alias("nname"),
                )
                for i in range(1, SNM_WINDOW + 1)
            ]
        ).alias("nbrs"),
    )
    cand = lagged.select(
        "id", "name", F.explode("nbrs").alias("nb")
    ).filter(F.col("nb.nid").isNotNull())
    return (
        cand.withColumn("name_dist", F.levenshtein("name", F.col("nb.nname")))
        .filter(F.col("name_dist") <= ER_NAME_DIST_MAX)
        .select(
            F.least("id", F.col("nb.nid")).alias("id_a"),
            F.greatest("id", F.col("nb.nid")).alias("id_b"),
            F.col("name_dist").cast("bigint").alias("name_dist"),
        )
        .orderBy("id_a", "id_b")
    )


def _snm_sql() -> str:
    lag_cols = ", ".join(
        f"lag(id, {i}) OVER w AS nid{i}, lag(name, {i}) OVER w AS nname{i}"
        for i in range(1, SNM_WINDOW + 1)
    )
    unions = "\n  UNION ALL\n".join(
        f"  SELECT id, name, nid{i} AS nid, nname{i} AS nname FROM lagged"
        for i in range(1, SNM_WINDOW + 1)
    )
    return f"""
WITH c AS (
  SELECT c_custkey AS id, c_name AS name, c_nationkey AS nation
  FROM customer WHERE c_custkey < {ER_CUST_LIMIT}
), lagged AS (
  SELECT id, name, {lag_cols}
  FROM c
  WINDOW w AS (PARTITION BY nation ORDER BY name, id)
), cand AS (
{unions}
)
SELECT least(id, nid) AS id_a, greatest(id, nid) AS id_b,
       CAST(levenshtein(name, nname) AS BIGINT) AS name_dist
FROM cand
WHERE nid IS NOT NULL AND levenshtein(name, nname) <= {ER_NAME_DIST_MAX}
ORDER BY id_a, id_b
"""


# --- Q: entity_kcore — dense-duplicate-neighborhood extraction --------
# K-core peeling over the entity-match graph: iteratively drop nodes
# with fewer than K surviving match edges. The survivors are the DENSE
# duplicate neighborhoods — where pairwise match evidence corroborates
# itself — vs the bare pairs that dominate the raw edge list (the
# precision lens the component partition can't give: CC merges through
# single weak edges, the k-core demands K independent ones).
# Exactness posture = the HITS recipe: a FIXED number of unrolled peel
# rounds (no fixpoint test inside the plan), every round pure integer
# degree counting — both engines run the identical R rounds, so parity
# is exact BIGINT, nothing to absorb. R is sized so the peel reaches
# its fixpoint at test scale (pinned in tests/test_linkage.py: round
# R-1 == round R); each round joins the STATIC edge table against the
# previous alive set.
# Scale posture (r9, VERDICT r8 item 4): the unrolled rounds reference
# the edge table ~2R times and the blocked-levenshtein scoring subtree
# is NOT deduped by exchange reuse — measured at sf0.01, the lazy plan
# carried 254 exchanges / 508 parquet scans with ZERO ReusedExchange
# nodes and executed 24 MB of broadcasts. So the edge table is
# ``localCheckpoint``ed ONCE before the peel (the pagerank posture:
# materialize the static input, derive every round from it). The alive
# set still appears on both endpoints each round, but it is a
# round-dependent filter over the ONE checkpointed relation — stat
# digits double per round, bounded at R=6, not the multiplying-
# relations trap in CLAUDE.md's iterative-op note.

KCORE_K = 2
KCORE_ROUNDS = 6


def _entity_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _match_pairs(_blocked(spark, sf_dir))
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    # one eager materialization of the edge generator (see note above);
    # bounded: the pair table is blocking-capped, not corpus-sized
    edges = edges.localCheckpoint()
    alive = edges.select(F.col("src").alias("node")).distinct()
    deg = None
    for _ in range(KCORE_ROUNDS):
        e_alive = (
            edges.join(alive.select(F.col("node").alias("src")), "src")
            .join(alive.select(F.col("node").alias("dst")), "dst")
        )
        deg = e_alive.groupBy("src").agg(
            F.count(F.lit(1)).cast("bigint").alias("degree")
        )
        alive = deg.filter(F.col("degree") >= KCORE_K).select(
            F.col("src").alias("node")
        )
    return (
        deg.filter(F.col("degree") >= KCORE_K)
        .select(F.col("src").alias("node"), "degree")
        .orderBy("node")
    )


def _entity_kcore_sql() -> str:
    rounds = []
    prev = "a0"
    for i in range(1, KCORE_ROUNDS + 1):
        rounds.append(
            f"""a{i} AS (
  SELECT e.src AS node, CAST(count(*) AS BIGINT) AS degree
  FROM edges e
  JOIN {prev} x ON e.src = x.node
  JOIN {prev} y ON e.dst = y.node
  GROUP BY e.src HAVING count(*) >= {KCORE_K}
)"""
        )
        prev = f"a{i}"
    return f"""
WITH {_PAIRS_SQL_CTES},
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
a0 AS (SELECT DISTINCT src AS node FROM edges),
{','.join(rounds)}
SELECT node, degree FROM a{KCORE_ROUNDS}
ORDER BY node
"""


SPECS = [
    QuerySpec(
        "entity_kcore",
        "dense duplicate neighborhoods: K-core peeling of the match graph, fixed unrolled integer-exact rounds (HITS posture)",
        _entity_kcore,
        _entity_kcore_sql,
        tags=("linkage", "graph", "dedup"),
    ),
    QuerySpec(
        "sorted_neighborhood_pairs",
        "linear-cost linkage candidates: w lag columns over one key-partitioned sort (SNM, Hernandez-Stolfo)",
        _sorted_neighborhood_pairs,
        _snm_sql,
        tags=("linkage", "dedup", "window"),
    ),
    QuerySpec(
        "entity_match_pairs",
        "record linkage: blocked pairwise scoring, levenshtein <= 2 within (nation, segment)",
        _entity_match_pairs,
        _ENTITY_MATCH_PAIRS_SQL,
        tags=("linkage", "dedup"),
    ),
    QuerySpec(
        "entity_clusters",
        "entity resolution end-to-end: blocked pairs -> star-alternation components -> keep-best survivor",
        _entity_clusters,
        _ENTITY_CLUSTERS_SQL,
        tags=("linkage", "dedup", "graph"),
    ),
]
