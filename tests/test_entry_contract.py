"""Driver-contract robustness pins (the r2 regression class): the
grading driver builds a VANILLA SparkSession and calls the
__spark_entry__ surface — these probes run against the shared test
session but exercise the same call patterns driver_sim does.

- entry() must be re-runnable in one session (the driver smoke-checks
  it, then runs queries; nothing may depend on first-call state);
- sf_dir with a trailing slash must behave identically;
- a bad sf_dir must raise the standard PATH_NOT_FOUND analysis error,
  not something swallowed or misleading.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod  # noqa: E402

from tests.conftest import SF_CORRECT  # noqa: E402


def test_entry_is_rerunnable(spark):
    first = entrymod.entry(spark)
    n1 = first.count()
    n2 = entrymod.entry(spark).count()
    assert n1 == n2 and n1 > 0
    assert [f.name for f in first.schema.fields]  # stable, named schema


def test_trailing_slash_sf_dir(spark):
    q = entrymod.queries()["pricing_summary"]
    assert q(spark, SF_CORRECT).count() == q(spark, SF_CORRECT + "/").count()


def test_bad_sf_dir_raises_path_not_found(spark):
    from pyspark.errors import AnalysisException

    q = entrymod.queries()["pricing_summary"]
    with pytest.raises(AnalysisException, match="PATH_NOT_FOUND"):
        q(spark, "/root/testdata/sf_does_not_exist").count()


def test_every_window_query_has_matching_oracle_key(spark):
    """The driver zips queries() with oracle_sql(): every oracle key
    must name a real query, and the front-50 must exist."""
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 50


def test_bench_compact_line_fits_driver_stdout_tail():
    """VERDICT r8 item 1: the driver keeps only the last 2,000 chars of
    bench stdout; round 8 shipped no benchmark because the single rich
    JSON line outgrew that window. bench.py now prints a compact
    summary line LAST — pin its WORST-CASE serialized length under the
    budget so growth (a 15th headline query, a renamed key) is a loud
    test failure, not a silently unparseable BENCH_r{N}.json."""
    import json

    import bench

    worst_float = 99999.9999  # 4-decimal rounding caps every value's width
    frozen_14 = [
        "pricing_summary", "filter_project", "top_customers",
        "revenue_by_nation", "weekly_chart_streak", "sessionization",
        "asof_purchase_value", "dedup_exact_docs", "text_stats",
        "near_dup_pairs", "cosine_topk", "minhash_near_dups", "top_terms",
        "rolling_7d_spend",
    ]
    rich = {
        "metric": "headline_queries_total_runtime",
        "value": worst_float,
        "unit": "sec",
        "queries": {n: worst_float for n in frozen_14},
        "queries_cpu_seconds": {n: worst_float for n in frozen_14},
        "cpu_seconds_total": worst_float,
        "mining_queries_total_runtime": worst_float,
        "mining_queries": {f"mining_query_{i}": worst_float for i in range(40)},
        "mining_cpu_seconds_total": worst_float,
        "pagerank_rounds": [worst_float] * 60,
        "audit_core_total_runtime": worst_float,
        "audit_core_queries": {f"audit_core_{i}": worst_float for i in range(20)},
        "audit_core_queries_cpu_seconds": {f"audit_core_{i}": worst_float for i in range(20)},
        "audit_core_cpu_seconds_total": worst_float,
        "audit_rotating_total_runtime": worst_float,
        "audit_rotating_queries": {f"audit_rot_{i}": worst_float for i in range(20)},
        "audit_rotating_queries_cpu_seconds": {f"audit_rot_{i}": worst_float for i in range(20)},
        "audit_rotating_cpu_seconds_total": worst_float,
        "audit_queries_total_runtime": worst_float,
        "audit_queries": {f"audit_query_{i}": worst_float for i in range(80)},
        "audit_cpu_seconds_total": worst_float,
        "env": {
            s: {"steal_pct": 100.0, "load1_start": 99.99, "load1_end": 99.99}
            for s in ("headline", "mining", "audit_core", "audit_rotating", "overall")
        },
        "env_steal_pct": 100.0,
        "env_load1_max": 99.99,
        "sf": 0.1,
    }
    compact = bench.compact_summary(rich)
    line = json.dumps(compact)
    assert len(line) < bench.COMPACT_LINE_BUDGET, (
        f"compact bench line is {len(line)} chars; driver keeps "
        f"{bench.DRIVER_STDOUT_TAIL} — trim _COMPACT_KEYS"
    )
    # the compact line must carry the frozen headline set (the driver's
    # round-over-round comparison) and the steal-immune cpu totals
    assert set(compact["queries"]) == set(frozen_14)
    assert "cpu_seconds_total" in compact and "sf" in compact
    # growth in mining/audit per-query detail must NOT leak into the line
    assert "mining_queries" not in compact and "audit_queries" not in compact
    assert "audit_core_queries" not in compact
    assert "audit_rotating_queries" not in compact


def test_audit_core_is_frozen():
    """VERDICT r9 item 3: AUDIT_CORE is the bench comparability
    contract — 12 queries, frozen. New tiers go in the rotating pool.
    source_kmv_overlap is in NEITHER set (its exact-verifier half is
    correctness work the sf0.01 oracle certifies; the bench times
    source_kmv_sketch — VERDICT r9 item 2). Every name in both sets
    must be a live registry query, and the rotating slice must be
    deterministic and within the pool."""
    import bench
    from databeats_spark.registry import registry

    assert bench.AUDIT_CORE == (
        "near_dup_threshold_sweep", "split_leakage_pairs",
        "dup_cluster_sizes", "token_budget_allocation",
        "corpus_summary_cube", "bpe_fertility_by_lang", "hits_copurchase",
        "source_kmv_sketch", "markov_removal_attribution",
        "robust_spend_stats", "basket_lift_rules", "bm25_topk",
    )
    names = {s.name for s in registry()}
    assert set(bench.AUDIT_CORE) <= names
    assert set(bench.AUDIT_ROTATING_POOL) <= names
    assert not set(bench.AUDIT_CORE) & set(bench.AUDIT_ROTATING_POOL)
    assert "source_kmv_overlap" not in bench.AUDIT_CORE
    assert "source_kmv_overlap" not in bench.AUDIT_ROTATING_POOL
    sel = bench.rotating_audit()
    assert sel == bench.rotating_audit()  # deterministic
    assert len(sel) == bench.AUDIT_ROTATE_N == 8
    assert set(sel) <= set(bench.AUDIT_ROTATING_POOL)


def test_rotating_pool_fully_covered_every_three_rounds():
    """The rotation must actually track every tier: ANY window of
    ceil(len(pool)/N) consecutive rounds covers the whole pool. The
    slice is (round*N) % len(pool) with wraparound, i.e. N*k
    consecutive positions mod len(pool) — contiguous, so k rounds
    cover min(N*k, len(pool)) distinct members. Pin it by simulation
    so a future pool/N change that breaks coverage fails loudly."""
    import math

    import bench

    pool = sorted(bench.AUDIT_ROTATING_POOL)
    n = bench.AUDIT_ROTATE_N
    k = math.ceil(len(pool) / n)
    for rnd in range(40):
        covered = set()
        for r in range(rnd, rnd + k):
            start = (r * n) % len(pool)
            covered |= {pool[(start + i) % len(pool)] for i in range(n)}
        assert covered == set(pool), (
            f"rounds {rnd}..{rnd + k - 1} miss {set(pool) - covered}"
        )
