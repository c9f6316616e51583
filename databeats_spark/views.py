"""The SQL dashboard surface: every registry query as a named view.

The reference's interactive layer is Gradio callbacks doing client-
side pandas over SELECT * scans (reference app.py:11-33, 56-119). The
Spark-native equivalent is a catalog of views: base tables plus one
``v_<query>`` temp view per registry entry, so any SQL client (or
``spark.sql``) can compose dashboards over governed definitions —
filters/projections written against a view still push down into the
underlying parquet scan, because a temp view is just a named logical
plan, not a materialization.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from databeats_spark.registry import registry
from databeats_spark.sources.tables import register_views

# builds that execute Spark jobs at CONSTRUCTION time (iterative
# propagation, KMeans training, corpus-count scalars) — excluded by
# default so opening the dashboard stays instant; pass them in
# ``names`` explicitly to pay their cost.
EAGER_QUERIES = frozenset(
    {
        "dedup_components",
        "ivf_cosine_topk",
        "tf_idf_terms",
        "semdedup_near_dups",  # KMeans fit at build
        "pagerank_docs",  # per-round checkpoints at build
        "curation_funnel",  # full pipeline run at build
        "bpe_merges",  # merge-loop driver rounds at build
        "bpe_segmentation",  # merge-loop driver rounds at build
        "pagerank_docs_exact",  # 10 checkpointed rounds at build
        "curation_funnel_exact",  # full pipeline run at build
    }
)


def create_dashboard_views(
    spark: SparkSession,
    sf_dir: str | None = None,
    names: tuple[str, ...] | None = None,
) -> list[str]:
    """Register base tables + ``v_<query>`` views; returns view names.

    Default: every lazy registry query (a temp view is just a named
    plan — zero jobs run until someone SELECTs from it). ``names``
    overrides the selection, including the eager entries."""
    register_views(spark, sf_dir)
    created = []
    for spec in registry():
        if (names is None and spec.name in EAGER_QUERIES) or (
            names is not None and spec.name not in names
        ):
            continue
        spec.build(spark, sf_dir).createOrReplaceTempView(f"v_{spec.name}")
        created.append(f"v_{spec.name}")
    return created
