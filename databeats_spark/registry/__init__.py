"""Query registry — the driver-facing inventory of implemented operators.

Each :class:`QuerySpec` pairs a Spark DataFrame builder with the
equivalent ANSI-SQL oracle string (run by DuckDB over the same parquet)
so the two can never drift apart. Specs without an oracle are
non-SQL-expressible (LSH/approximate ops) and get a rows-only check.

Oracle-parity rules used throughout (see tests/test_differential.py):
- money/value aggregation happens in DECIMAL(18,2) on BOTH engines —
  exact arithmetic, so results are bit-identical regardless of
  summation order (float sums are engine- and partition-order-
  dependent);
- every count / row_number is cast to BIGINT on both sides (DuckDB
  sum(BIGINT) is HUGEINT, Spark row_number is INT — both normalized);
- every ranking has a total-order tie-break;
- ratio-valued doubles are rounded to 6 decimals on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    doc: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    bench: bool = False
    tags: tuple[str, ...] = ()


# The driver's CORRECTNESS gate checks ``registry()[:50]`` only, so the
# front-50 is curated each round by scripts/rotation_report.py: every
# query that has never earned a CLEAN driver row (errors/mismatches
# re-enter until green; oracle-carrying before rows-only) ahead of the
# bench headliners, with already-verified queries last (their green
# rows from prior rounds stay on record). Round-4 window = the 14
# round-3 queries that landed after the r3 window froze (never
# driver-verified: 12 oracle-carrying + curation_funnel/bpe_merges
# rows-only), then the bench headliners, then the oldest-verified
# overflow. Queries added during round 4 are appended to the FRONT of
# this tuple as they land (they are the only ones with no driver row),
# displacing the tail overflow.
# Regenerate with ``python scripts/rotation_report.py``.
_WINDOW = (
    # r6 rotation (rotation_report, zero backlog since r5): queries
    # whose builder changed THIS round first (fresh regression risk no
    # history covers), then the bench headliners so BENCH and
    # CORRECTNESS cover the same queries, then the STALEST green rows
    # (r1-vintage, 5 rounds old) for re-verification. PREPEND new r6
    # queries here as they land.
    # — new in r6:
    "quality_decile_mix",  # r6: per-source quality decile histogram (never verified)
    "epoch_shard_layout",  # r6: seeded epoch permutation + shards (never verified)
    "hard_negatives",  # r6: contrastive negative mining (never verified)
    "retrieval_label_precision",  # r6: precision@k retrieval eval (never verified)
    "corpus_summary_cube",  # r6: dataset-card grouping lattice (never verified)
    "fluency_buckets",  # r6: CCNet-style fluency terciles (never verified)
    "length_percentiles_by_source",  # r6: exact rank-math quantiles (never verified)
    "temperature_mix_allocation",  # r6: n^0.7 mix weights (never verified)
    "ngram_novelty",  # r6: crawl-order novelty profile (never verified)
    "substring_dup_spans",  # r6: variable-length substring dedup (never verified)
    "substring_scrub_stats",  # r6: variable-span scrub accounting (never verified)
    # — changed in r6:
    "token_budget_allocation",  # r6: loud catalog-bound guard (assert_true filter)
    "source_pareto",  # r6: loud catalog-bound guard (assert_true filter)
    "pagerank_docs",  # r6: affine rank view rewrite (rows-only)
    "length_drift_ks",  # r6: ECDF histogram behind explicit domain limit + guard
    # — bench headliners (frozen 14):
    "top_terms", "rolling_7d_spend", "minhash_near_dups",
    "cosine_topk", "pricing_summary", "filter_project",
    "top_customers", "revenue_by_nation", "weekly_chart_streak",
    "sessionization", "asof_purchase_value", "dedup_exact_docs",
    "text_stats", "near_dup_pairs",
    # — stalest green rows (last verified r1, oldest re-verification debt):
    "label_centroid_distance",
    "top_orders_per_customer", "customer_order_stats",
    "customers_without_orders", "customers_with_big_orders",
    "union_dedup", "promo_revenue_ratio", "late_shipment_orders",
    "modal_priority", "nation_customer_stats", "segment_class",
    "rollup_quantity", "running_spend", "first_lineitems_per_order",
    "latest_order_per_customer", "dedup_first_order",
    "nation_market_share", "blocking_suppliers", "latest_event_per_user",
    "time_features", "json_props", "session_windows",
    "approx_price_quantiles", "range_attribution",
    "daily_from_hourly_rollup", "user_value_ranks",
    "user_funnel_summary",
    # (weekly_resample, hourly_event_stats, event_type_pivot,
    # deterministic_sample, stratified_sample, doc_fingerprints,
    # lang_id, dedup_components, posexplode_tokens were displaced past
    # slot 50 by the early-r6 additions, and the five late-r6 prepends
    # (quality_decile_mix … fluency_buckets) pushed session_windows,
    # approx_price_quantiles, range_attribution, daily_from_hourly_rollup,
    # user_value_ranks, user_funnel_summary past slot 50 as well — all
    # of these are the oldest re-verification debt for the r7 window)
)


def _collect() -> list[QuerySpec]:
    """Collect specs with the curated driver-verification window first."""
    from databeats_spark.registry import (
        audits, corpus, curation, decision, documents, events, extended, frames,
        lifecycle, mining, modern, relational, shapes, signals, vectors,
    )

    all_specs: list[QuerySpec] = []
    for mod in (extended, frames, vectors, relational, events, documents, shapes,
                curation, modern, decision, mining, signals, corpus, lifecycle,
                audits):
        all_specs.extend(mod.SPECS)
    names = [s.name for s in all_specs]
    assert len(names) == len(set(names)), f"duplicate query names: {names}"
    by_name = {s.name: s for s in all_specs}
    missing = [n for n in _WINDOW if n not in by_name]
    assert not missing, f"window names not in registry: {missing}"
    front = [by_name[n] for n in _WINDOW]
    in_front = set(_WINDOW)
    return front + [s for s in all_specs if s.name not in in_front]


_REGISTRY: list[QuerySpec] | None = None


def registry() -> list[QuerySpec]:
    global _REGISTRY
    if _REGISTRY is None:
        _REGISTRY = _collect()
    return _REGISTRY


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.build for s in registry()}


def oracle_sql() -> dict[str, str]:
    return {s.name: s.oracle for s in registry() if s.oracle is not None}


def bench_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.build for s in registry() if s.bench}
