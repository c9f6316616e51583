"""Physical-plan regression tests — the 100 TB posture checks.

Correctness tests prove WHAT is computed; these prove HOW. If a code
change silently drops predicate pushdown, column pruning, or a
broadcast join, the query still passes its oracle test but becomes a
full-scan/shuffle disaster at scale — these assertions catch that.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from databeats_spark.registry import queries
from tests.conftest import SF_CORRECT


def formatted_plan(spark, name: str) -> str:
    df = queries()[name](spark, SF_CORRECT)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filters_reach_parquet_scan(spark):
    plan = formatted_plan(spark, "filter_project")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed, "no PushedFilters in scan"
    line = pushed[0]
    assert "GreaterThan(l_discount" in line
    assert "GreaterThanOrEqual(l_shipdate" in line
    assert "GreaterThanOrEqual(l_quantity" in line


def test_columns_pruned_at_scan(spark):
    plan = formatted_plan(spark, "filter_project")
    schema_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert schema_lines
    # 6 columns read (5 projected + l_discount for the filter), not all 11
    line = schema_lines[0]
    assert line.count(":") >= 6
    for dropped in ("l_returnflag", "l_linestatus", "l_tax", "l_suppkey"):
        assert dropped not in line, f"{dropped} not pruned from scan"


def test_star_join_broadcasts_dimensions(spark):
    plan = formatted_plan(spark, "revenue_by_nation")
    # nation/region/customer must broadcast; no dimension may sort-merge
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_aggregate_is_partial_then_final(spark):
    plan = formatted_plan(spark, "pricing_summary")
    # map-side combine: at least 2 HashAggregate nodes around the exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_exact_dedup_is_single_shuffle(spark):
    plan = formatted_plan(spark, "dedup_exact_docs")
    # one hash aggregate pair + the output sort; no join, no window
    assert "Join" not in plan
    assert "Window" not in plan


def test_topk_per_group_has_no_global_sort_before_window(spark):
    plan = formatted_plan(spark, "top_orders_per_customer")
    # the window sorts within partitions; the only global Sort allowed
    # is the final presentation ORDER BY
    assert plan.count("WindowGroupLimit") >= 1 or plan.count("Window") >= 1


def test_rows_limited_queries_use_limit_pushdown(spark):
    plan = formatted_plan(spark, "top_customers")
    assert "TakeOrderedAndProject" in plan, "global top-k should be TakeOrderedAndProject, not Sort+Limit"


def test_decontam_broadcasts_eval_shingles(spark):
    plan = formatted_plan(spark, "benchmark_decontam")
    # the eval shingle set is benchmark-sized: it must broadcast so the
    # exploded corpus side never shuffles through the join
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # per-doc overlap count partial-aggregates map-side after the join
    assert plan.count("HashAggregate") >= 2


def test_shared_shingle_df_join_is_not_hinted_broadcast(spark):
    # the shingle document-frequency table scales WITH the corpus, so
    # the code must NOT carry a broadcast() hint (shipping the whole
    # corpus's shingle vocabulary to every executor at 100 TB). At
    # sf0.01 AQE broadcasts it by stats — fine; prove no hard-coded
    # hint by disabling auto-broadcast and checking the plan degrades
    # to a shuffle join.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = formatted_plan(spark, "shared_shingle_stats")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan


def test_per_source_quota_uses_window_group_limit(spark):
    # the per-source rank filter must compile to WindowGroupLimit so
    # each input partition ships at most K rows per source into the
    # window shuffle — without it, a billion-document source sorts in
    # full inside one task
    plan = formatted_plan(spark, "per_source_quota")
    assert "WindowGroupLimit" in plan, plan


def test_rare_trigram_dfreq_broadcasts(spark):
    # the trigram document-frequency table is bounded by charset^3, so
    # it must broadcast; the exploded corpus side never shuffles
    # through the join
    plan = formatted_plan(spark, "rare_trigram_stats")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_length_band_windows_run_on_histogram(spark):
    # the per-language window must consume the compact (lang, n_chars)
    # histogram: a HashAggregate sits below the Window node, so the
    # window input is distinct lengths, never the document table
    plan = formatted_plan(spark, "length_band_outliers")
    assert "Window" in plan
    win_pos = plan.index("Window")
    assert "HashAggregate" in plan[win_pos:], plan


def test_q5_join_chain_broadcasts_bounded_dims_only(spark):
    """Broadcast-hint policy (r9, VERDICT r8 item 5): F.broadcast is
    reserved for provably bounded catalogs (nation/region/literal
    tables/≤1-row scalars); SF-scaling tables (customer/part/supplier)
    get NO hint — the size-based planner/AQE broadcasts them at test SF
    and correctly sort-merges them at 100 TB, where a hint Catalyst
    cannot demote would OOM the build side. Here orders⋈customer is the
    one join of two SF-scaling relations — SMJ is its correct scale
    posture; everything catalog-shaped must still broadcast."""
    plan = formatted_plan(spark, "local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 4
    # formatted output lists each node twice (tree + details): 2 hits
    # = the single permitted orders⋈customer SMJ
    assert plan.count("SortMergeJoin") <= 2


def test_q3_pushes_date_filters_and_takes_top10(spark):
    plan = formatted_plan(spark, "shipping_priority")
    assert "TakeOrderedAndProject" in plan  # top-10, no full sort
    # both date predicates reach the parquet readers
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "GreaterThan(l_shipdate" in plan
    assert "LessThan(o_orderdate" in plan


def test_q19_disjunction_is_one_scan(spark):
    plan = formatted_plan(spark, "bracket_revenue")
    # the OR-of-ANDs must NOT union three scans of lineitem; formatted
    # output lists each scan twice (tree + details), so 2 scans = 4 hits
    assert plan.count("Scan parquet") <= 4  # lineitem + part, once each
    assert "Union" not in plan


def test_incremental_dups_single_shingle_source(spark):
    plan = formatted_plan(spark, "incremental_corpus_dups")
    # old/new sides are filters over ONE shingle explode, and the
    # boundary predicate keeps old x old / new x new out of the join
    assert "Union" not in plan


def test_weighted_sample_is_global_topk_not_full_sort(spark):
    plan = formatted_plan(spark, "weighted_sample")
    assert "TakeOrderedAndProject" in plan  # k smallest keys, no global sort


def test_span_dedup_window_is_key_partitioned(spark):
    # the first-occurrence-keep window must partition by the span value
    # (key-partitioned shuffle); a global-sort window over the exploded
    # span stream would serialize the corpus through one task
    plan = formatted_plan(spark, "span_dedup_docs")
    assert "hashpartitioning(span" in plan, plan


def test_substring_dedup_window_is_anchor_partitioned(spark):
    # the suffix-sort window must partition by the anchor n-gram (two
    # occurrences of any >=8-token duplicate share an anchor), and the
    # result cut must be a global top-k, not a full sort
    plan = formatted_plan(spark, "substring_dup_spans")
    assert "hashpartitioning(anchor" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_oov_vocab_is_topk_and_broadcast(spark):
    # the top-2000 vocabulary cut must be TakeOrderedAndProject
    # (map-side partial top-K, no full sort) and re-attach as a
    # broadcast — the exploded corpus side never shuffles through it
    plan = formatted_plan(spark, "oov_rate")
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_rolling_distinct_explodes_before_aggregate(spark):
    # the sliding-distinct shape: Generate (the bounded cover-day
    # explode) feeds hash aggregates — no window frame over the event
    # axis exists anywhere in the plan
    plan = formatted_plan(spark, "rolling_7d_active_users")
    assert "Generate" in plan, plan
    assert "Window" not in plan.replace("WindowGroupLimit", ""), plan
