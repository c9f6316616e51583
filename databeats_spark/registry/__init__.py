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
    # r7 rotation (rotation_report, zero never-verified backlog): the 15
    # queries displaced past slot 50 by r6's additions first (the oldest
    # re-verification debt, per VERDICT r6 item 1), then the bench
    # headliners so BENCH and CORRECTNESS cover the same queries, then
    # the stalest remaining green rows. PREPEND new/changed r7 queries
    # here as they land — they displace the tail (most-recently
    # re-verified), never the debt block.
    # — new in r7:
    "minhash_near_dups_exact",  # r7: md5-family LSH oracle twin (never verified)
    "simhash_near_dups_exact",  # r7: md5-bit SimHash oracle twin (never verified)
    "ivf_cosine_topk_exact",  # r7: fixed-centroid IVF probe twin (never verified)
    "lsh_cosine_topk_exact",  # r7: plane-literal LSH oracle twin (never verified)
    "semdedup_near_dups_exact",  # r7: fixed-centroid SemDeDup twin (never verified)
    "bpe_segmentation",  # r7: BPE apply-path histogram (never verified)
    "bpe_merges",  # r7: promoted rows-only -> exact unrolled-CTE oracle
    "curation_funnel_exact",  # r7: whole-funnel oracle twin (never verified)
    "pagerank_docs_exact",  # r7: oracle promotion of the graph tier (never verified)
    "substring_dup_spans_hashed",  # r7: fixed-width-anchor scale twin (never verified)
    # — r6 window debt (displaced past slot 50, oldest driver rows):
    "weekly_resample", "hourly_event_stats", "event_type_pivot",
    "deterministic_sample", "stratified_sample", "doc_fingerprints",
    "lang_id", "dedup_components", "posexplode_tokens",
    "session_windows", "approx_price_quantiles", "range_attribution",
    "daily_from_hourly_rollup", "user_value_ranks",
    "user_funnel_summary",
    # — bench headliners (frozen 14):
    "top_terms", "rolling_7d_spend", "minhash_near_dups",
    "cosine_topk", "pricing_summary", "filter_project",
    "top_customers", "revenue_by_nation", "weekly_chart_streak",
    "sessionization", "asof_purchase_value", "dedup_exact_docs",
    "text_stats", "near_dup_pairs",
    # — stalest remaining green rows (rotation_report order):
    "multimodal_bytes", "tf_idf_terms", "bpe_token_stats",
    "sql_api_revenue", "sql_lateral_topk", "supplier_part_stats",
    "repeat_customers", "priority_flags", "open_only_customers",
    "price_quantiles", "order_gaps",
    # (exact_moment_stats, order_status_mix, customer_deciles,
    # cube_quantity, order_priority_paths, null_safe_compare,
    # lineitem_profile, regex_extract_ids, above_average_customers and
    # approx_distinct_parts rotated out for the r7 prepends —
    # re-verified most recently of the tail)
)

# The driver gate only sees the first _GATE_WIDTH entries; anything past
# that silently gets no driver coverage (the r6 window quietly grew to
# 56 and left 6 entries unchecked — ADVICE r6). _collect() trims to the
# gate width and a test pins len(_WINDOW) == _GATE_WIDTH so overflow is
# a loud failure, not a comment.
_GATE_WIDTH = 50


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
    assert len(_WINDOW) == _GATE_WIDTH, (
        f"_WINDOW has {len(_WINDOW)} entries but the driver gate checks "
        f"registry()[:{_GATE_WIDTH}] — when prepending, drop an equal "
        f"number from the already-reverified tail"
    )
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
