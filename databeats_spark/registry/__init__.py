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
    # r10 rotation (rotation_report recommendation under the r10
    # policy, VERDICT r9 item 1): this is a RE-CERTIFICATION round —
    # the never-verified backlog is zero and all 14 bench headliners
    # are r9-green, so the window burns down verification staleness:
    # new/changed r10 queries first (they carry fresh regression risk),
    # then the stalest greens oldest-first (all last driver-green in
    # r2/r3 — the Spark-runtime era whose TIMESTAMP_NTZ change broke
    # two queries once). PREPEND new/changed queries as they land,
    # dropping an equal number from the tail.
    # — new/changed in r10:
    "source_lang_mi",  # r10: contingency MI/chi2/Cramer's V audit
    "lpa_communities",  # r10: synchronous LPA vs unrolled-CTE oracle
    "cvm_two_sample",  # r10: integrated ECDF-distance test
    "sprt_evalue_monitor",  # r10: anytime-valid SPRT e-process
    "brier_decomposition",  # r10: Murphy REL/RES/UNC split
    "lang_id_calibration",  # r10: re-cert after the _lang_scored refactor
    "dsir_importance_weights",  # r10: DSIR target-domain resampling scores
    "good_turing_mass",  # r10: unseen-vocabulary mass per source
    "daily_count_overdispersion",  # r10: NB dispersion of daily loads
    "wilson_return_ranking",  # r10: Wilson-LB uncertainty-aware ranking
    "adamic_adar_links",  # r10: degree-capped co-purchase link prediction
    "jackknife_ratio_ci",  # r10: delete-one-day + delta ratio-metric CI
    "eb_shrunk_source_rates",  # r10: Efron-Morris/DL shrinkage audit
    "stupid_backoff_logprob",  # r10: held-out bigram LM (Stupid Backoff)
    "term_burstiness",  # r10: Church-Gale dispersion signal
    "source_kmv_sketch",  # r10: sketch-only bench posture (VERDICT item 2)
    "blockmean_near_dups_exact",  # r10: two-scale oracle twin (VERDICT item 4)
    "markov_removal_attribution",  # r10: nullif zero-guards (ADVICE r9)
    # — stalest green rows, oldest-first (rotation_report order; the 17
    #   CLAUDE.md r10 re-entries lead because they were displaced
    #   longest ago):
    "large_volume_orders",
    "order_nav",
    "unpivot_part_metrics",
    "spend_percentiles",
    "embedding_stats",
    "lsh_cosine_topk",
    "ivf_cosine_topk",
    "simhash_near_dups",
    "canonical_docs",
    "repetition_stats",
    "pii_scrub",
    "benchmark_decontam",
    "shared_shingle_stats",
    "token_budget_pack",
    "mix_rebalance",
    "min_cost_supplier",
    "important_parts",
    "order_count_histogram",
    "top_supplier_revenue",
    "small_qty_revenue",
    "idle_high_balance",
    "part_name_features",
    "math_scalar_features",
    "calendar_features",
    "value_histogram",
    "sliding_event_stats",
    "semdedup_near_dups",
    "rare_trigram_stats",
    "length_band_outliers",
    "per_source_quota",
    "recursive_week_spine",
    "variant_props_stats",
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
