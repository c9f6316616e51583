"""Connected components over an edge list — the dedup-cluster closer.

Pairwise near-duplicate detection (MinHash/SimHash/Jaccard — see
functions/similarity.py) emits EDGES; what a training-data pipeline
actually needs is the PARTITION of documents into duplicate clusters,
so it can keep one canonical doc per cluster. That closure is
transitive: A~B and B~C put A,C in one cluster even when A,C were
never compared. The reference has no graph surface at all (its dedup
is exact drop_duplicates, SURVEY §2.5 A2/A3) — this is north-star
scope.

Algorithm: iterative min-label propagation on DataFrames. Every node
starts labeled with itself; each round every node takes the min label
over itself and its neighbors; fixpoint = components. Rounds needed =
graph diameter, which for near-dup clusters is tiny (duplicates of one
document all overlap each other). Each round is one shuffle-join on
the edge list — no driver-side graph, so it scales with the cluster.
``localCheckpoint`` truncates lineage so plans don't grow per round.

Scale note (100 TB): for adversarial graphs with large diameter
(long chains), swap the propagation loop for the large-star/small-star
alternation of Kiveris et al., "Connected Components in MapReduce and
Beyond" (SOCC'14) — O(log n) rounds on power-law graphs. The operator
signature stays the same; near-dup workloads don't need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the
    smallest node id reachable from it.

    Returns a DataFrame (node, component). Nodes are whatever appears
    in either endpoint column; isolated nodes (no edges) are by
    definition absent — union them in upstream if every input row must
    be labeled.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    labels = labels.localCheckpoint()
    for _ in range(max_iter):
        neighbor_labels = sym.join(
            labels, sym["b"] == labels["node"], "inner"
        ).select(F.col("a").alias("node"), "label")
        new_labels = (
            neighbor_labels.union(labels)
            .groupBy("node")
            .agg(F.min("label").alias("new_label"))
        )
        changed = (
            new_labels.join(labels, "node")
            .filter(F.col("new_label") < F.col("label"))
            .count()
        )
        labels = new_labels.withColumnRenamed("new_label", "label").localCheckpoint()
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("label").alias("component"))


def dedup_keep_canonical(
    df: DataFrame,
    components: DataFrame,
    key: str,
) -> DataFrame:
    """Collapse each near-dup cluster to its canonical (min-id) row:
    the final step of fuzzy dedup. Rows whose key is not in
    ``components`` are singletons and are kept as-is.

    The join is a plain equi-join: components covers only non-isolated
    nodes, which may still be huge in a duplicate-heavy corpus — AQE
    broadcasts it when it turns out small, and a shuffle join is the
    correct plan when it doesn't."""
    comp = components.withColumnRenamed("node", key)
    joined = df.join(comp, key, "left")
    return joined.filter(
        F.col("component").isNull() | (F.col(key) == F.col("component"))
    ).drop("component")
