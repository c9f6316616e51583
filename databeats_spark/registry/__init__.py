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
# query that has never earned a driver row (oracle-carrying first, then
# rows-only) ahead of the bench headliners, with already-verified
# queries last (their green rows from prior rounds stay on record).
# Round-2 window = the 44 queries with no CORRECTNESS_r01 row + 6 of
# this round's new shapes queries (also never verified). The bench
# headliners displaced by those six (pricing_summary, filter_project,
# top_customers, revenue_by_nation, weekly_chart_streak, cosine_topk)
# keep their green CORRECTNESS_r01 rows on record. Queries added
# mid-round land after the window and rotate in next round.
# Regenerate with ``python scripts/rotation_report.py``.
_WINDOW = (
    "part_name_features", "math_scalar_features", "calendar_features",
    "sql_api_revenue", "sql_lateral_topk", "supplier_part_stats",
    "repeat_customers", "priority_flags", "open_only_customers",
    "price_quantiles", "order_gaps", "above_average_customers",
    "top_terms", "embedding_near_dups", "value_histogram",
    "lineitem_profile", "regex_extract_ids", "null_safe_compare",
    "rolling_7d_spend", "sliding_event_stats", "order_priority_paths",
    "cube_quantity", "customer_deciles", "order_status_mix",
    "exact_moment_stats", "fuzzy_part_names", "large_volume_orders",
    "order_nav", "unpivot_part_metrics", "revenue_share",
    "spend_percentiles", "embedding_stats", "canonical_docs",
    "repetition_stats", "pii_scrub", "benchmark_decontam",
    "shared_shingle_stats", "token_budget_pack", "mix_rebalance",
    "approx_distinct_parts", "lsh_cosine_topk", "ivf_cosine_topk",
    "minhash_near_dups", "simhash_near_dups", "min_cost_supplier",
    "important_parts", "order_count_histogram", "top_supplier_revenue",
    "small_qty_revenue", "idle_high_balance",
)


def _collect() -> list[QuerySpec]:
    """Collect specs with the curated driver-verification window first."""
    from databeats_spark.registry import (
        curation, decision, documents, events, extended, frames, mining, modern,
        relational, shapes, vectors,
    )

    all_specs: list[QuerySpec] = []
    for mod in (extended, frames, vectors, relational, events, documents, shapes,
                curation, modern, decision, mining):
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
