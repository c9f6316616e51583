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
    # r5 rotation (rotation_report, zero backlog): bench headliners
    # first so BENCH and CORRECTNESS cover the same queries, then the
    # oldest-verified for re-verification. PREPEND new r5 queries here
    # as they land.
    # r5 audit batch (never driver-verified — front of the window):
    "dup_rate_by_source",
    "token_budget_allocation", "near_dup_threshold_sweep",
    "source_pareto",  # r5: catalog window restructured behind explicit limit
    "embedding_near_dups",  # r5: verifier slice restructured behind explicit limit
    "split_leakage_pairs", "lexical_diversity", "dup_cluster_sizes",
    "canonical_best_docs",
    "revenue_share",  # r5: rebuilt on attach_global_scalar (provable scalar side)
    "top_terms", "rolling_7d_spend", "minhash_near_dups",
    "cosine_topk", "pricing_summary", "filter_project",
    "top_customers", "revenue_by_nation", "weekly_chart_streak",
    "sessionization", "asof_purchase_value", "dedup_exact_docs",
    "text_stats", "near_dup_pairs",
    "json_key_stats", "bitmap_distinct_orders", "hll_distinct_users",
    "key_skew_profile", "ri_violations", "debounced_events",
    "stratified_split_counts", "class_weights",
    "snapshot_user_diff", "user_erasure_audit", "rolling_7d_active_users",
    "event_cooccurrence_lift", "asof_next_purchase",
    "lang_mix_flags", "oov_rate", "interleave_layout", "exposure_cap",
    "span_dedup_docs", "prefix_dup_groups", "badword_doc_flags",
    "idf_doc_score", "cross_source_dups", "dup_graph_degree",
    "dup_triangles", "lateral_top_orders", "multiset_order_overlap",
    "embedding_quantization",
    "doc_chunks", "unigram_doc_logprob", "doc_entropy", "zipf_slope",
    "top_terms_per_source", "peak_concurrency",
    "interpolated_daily_spend", "top_prices_with_ties",
    "try_cast_group_all",
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
