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

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


class QuerySpec:
    """A registry entry: Spark builder + DuckDB oracle.

    ``oracle`` may be passed as a string OR a zero-arg callable returning
    the string; callables are resolved (and cached) on first access, so
    heavy oracle-text construction (numpy plane literals, unrolled
    10-round CTE chains) is paid only when the differential harness
    actually needs the SQL — not on every registry import (ADVICE r7).
    Consumers keep reading ``spec.oracle`` as ``str | None``.
    """

    __slots__ = ("name", "doc", "build", "_oracle", "bench", "tags")

    def __init__(
        self,
        name: str,
        doc: str,
        build: Callable[[SparkSession, str], DataFrame],
        oracle: str | Callable[[], str] | None = None,
        bench: bool = False,
        tags: tuple[str, ...] = (),
    ) -> None:
        self.name = name
        self.doc = doc
        self.build = build
        self._oracle = oracle
        self.bench = bench
        self.tags = tuple(tags)

    @property
    def oracle(self) -> str | None:
        if callable(self._oracle):
            self._oracle = self._oracle()
        return self._oracle

    @property
    def has_oracle(self) -> bool:
        """Oracle presence without forcing a lazy oracle to build."""
        return self._oracle is not None

    def __repr__(self) -> str:  # keep dataclass-era debuggability
        return f"QuerySpec(name={self.name!r}, bench={self.bench}, tags={self.tags})"


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
    # r13 FINAL rotation (optimization phase): the r13 checklist
    # (OPTIMIZATION_r13.md items 1-10) rewrote the builders or
    # transitively-called operators of 19 queries; the changed-query
    # class outranks everything but never-verified slots (their green
    # history predates the change, so it covers nothing), displacing
    # the 4 proactive age-3 twin re-certs and 12 of the r5/r6 tail
    # from the build-phase window. The twins sit at certificate age 3
    # (not yet breaching TWIN_MAX_AGE) and the report mechanically
    # forces them in r14; the displaced tail entries stay r5/r6-green
    # and return with the r14 free slots. Mirrors
    # scripts/rotation_report.py --json recommended_front_50 exactly.
    # — new in r13 (never driver-verified, ledger-mandatory slots):
    "dedup_sensitivity_delta",  # r13 capstone: the curve's CDC form
    "lsh_parameter_audit",  # banding-knob S-curve planner
    # — r13-CHANGED re-certs (CHANGED_QUERIES, registry order):
    "dedup_sensitivity_curve",
    "dup_cluster_sizes",
    "canonical_best_docs",
    "pagerank_docs",
    "takedown_blast_radius",
    "minhash_near_dups",
    "semdedup_near_dups",
    "canonical_docs",
    "dedup_components",
    "curation_funnel_exact",
    "hits_copurchase",
    "curation_funnel",
    "heaps_exponent_by_source",
    "dsir_importance_weights",
    "source_kmv_overlap",
    "source_kmv_sketch",
    "contamination_scorecard",
    "robust_spend_stats",
    "entity_clusters",
    "basket_lift_rules",
    # — r5 bucket (oldest oracle-greens), report order:
    "near_dup_threshold_sweep",
    "split_leakage_pairs",
    "lexical_diversity",
    "dup_rate_by_source",
    # — r6 bucket (the remaining tail), report order:
    "hard_negatives",
    "retrieval_label_precision",
    "label_centroid_distance",
    "top_orders_per_customer",
    "customer_order_stats",
    "customers_without_orders",
    "customers_with_big_orders",
    "union_dedup",
    "promo_revenue_ratio",
    "late_shipment_orders",
    "modal_priority",
    "nation_customer_stats",
    "segment_class",
    "rollup_quantity",
    "running_spend",
    "first_lineitems_per_order",
    "latest_order_per_customer",
    "dedup_first_order",
    "nation_market_share",
    "blocking_suppliers",
    "latest_event_per_user",
    "time_features",
    "json_props",
    "quality_decile_mix",
)

# Queries whose BUILDER or ORACLE changed this round (reset to () at
# round start, add entries as changes land): the rotation report
# forces these into its recommended front-50 and
# tests/test_rotation_ledger.py fails when one sits outside the live
# window — the "changed query re-certifies" precedent (markov/lang_id
# in r10, jackknife in r11), mechanical instead of CLAUDE.md prose the
# report "cannot see".
# r13: the curve's water-filling block moved into the shared
# _water_fill_keyed helper (value-identical, but the builder changed —
# the changed-query class forces its re-cert slot); the delta shares
# the helper but is already window-mandatory as a new query.
# r13 optimization phase: every query whose builder or transitively-
# called operator was rewritten by the OPTIMIZATION_r13.md checklist
# (items 1-10) — all locally hash/rows-verified in vanilla sessions,
# but their green history predates the change so it covers nothing.
# Operator fan-out: minhash_near_duplicates -> minhash_near_dups,
# pagerank_docs; semantic_near_duplicates -> semdedup_near_dups;
# connected_components/alternating_components -> curation_funnel(+
# exact), dedup_components, dup_cluster_sizes, canonical_best_docs,
# entity_clusters, canonical_docs, takedown_blast_radius. The
# unchanged exact twins (minhash/semdedup/pagerank _exact) are
# self-contained md5/fixed-centroid pipelines and keep their r12
# certificates.
CHANGED_QUERIES: tuple[str, ...] = (
    "dedup_sensitivity_curve",
    "hits_copurchase",
    "dsir_importance_weights",
    "robust_spend_stats",
    "heaps_exponent_by_source",
    "basket_lift_rules",
    "semdedup_near_dups",
    "minhash_near_dups",
    "pagerank_docs",
    "curation_funnel",
    "curation_funnel_exact",
    "dedup_components",
    "dup_cluster_sizes",
    "canonical_best_docs",
    "entity_clusters",
    "canonical_docs",
    "takedown_blast_radius",
    "source_kmv_sketch",
    "source_kmv_overlap",
    "contamination_scorecard",
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
        attribution, audits, basket, corpus, curation, decision, documents,
        events, extended, frames, inference, lifecycle, linkage, mining,
        modern, relational, retrieval, shapes, signals, vectors,
    )

    all_specs: list[QuerySpec] = []
    for mod in (extended, frames, vectors, relational, events, documents, shapes,
                curation, modern, decision, mining, signals, corpus, lifecycle,
                audits, linkage, retrieval, inference, basket, attribution):
        all_specs.extend(mod.SPECS)
    # Explicit raises, not asserts: these guard the driver gate's
    # coverage and must survive ``python -O`` (ADVICE r7).
    names = [s.name for s in all_specs]
    if len(names) != len(set(names)):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise AssertionError(f"duplicate query names: {dupes}")
    if len(_WINDOW) != _GATE_WIDTH:
        raise AssertionError(
            f"_WINDOW has {len(_WINDOW)} entries but the driver gate checks "
            f"registry()[:{_GATE_WIDTH}] — when prepending, drop an equal "
            f"number from the already-reverified tail"
        )
    by_name = {s.name: s for s in all_specs}
    missing = [n for n in _WINDOW if n not in by_name]
    if missing:
        raise AssertionError(f"window names not in registry: {missing}")
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
    return {s.name: s.oracle for s in registry() if s.has_oracle}


def bench_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.build for s in registry() if s.bench}


def certifying_twins() -> dict[str, str]:
    """rows-only approximate tier -> its ``*_exact`` certifying twin.

    The production approximate tiers (MinHash/SimHash/SemDeDup/LSH/IVF/
    HLL/KLL/pHash/blockmean/PageRank/curation funnel) can never be
    hash-certified against DuckDB — the approximation IS the
    difference — so each carries an exact twin running the SAME
    pipeline arithmetic with an engine-shared deterministic substitute
    (CLAUDE.md oracle-twin recipe). The twin's hash-green is the tier's
    correctness certificate, which means the twin's driver-verification
    AGE is the tier's certificate age: the rotation report treats a
    stale twin like a stale bench headliner (VERDICT r11 item 3), so a
    certified tier can never carry a silently old certificate.
    Mechanically derived (tier has no oracle, ``<tier>_exact`` exists);
    tests/test_rotation_ledger.py pins that EVERY rows-only registry
    query has a twin here and every twin is oracle-carrying.
    """
    specs = {s.name: s for s in registry()}
    return {
        n: n + "_exact"
        for n, s in specs.items()
        if not s.has_oracle and n + "_exact" in specs
    }
