#!/usr/bin/env python
"""Regenerate SHUFFLE.md: deterministic data-movement metrics for the
single-plan bench queries — the steal-proof round-over-round regression
signal (bytes moved are a property of plan + data; wall-clock is not) —
measured at BOTH test scales, with the byte-growth ratio per query: the
scale curve in deterministic form (10x data moving ~10x bytes is
linear; superlinear byte growth exposes a re-quadratizing stage no
matter how noisy the clock is).

    python scripts/shuffle_audit.py

Three measurement layers per query (r7 VERDICT item 3; third added
r13):

- PLAN layer (``execution_metrics``): exchange/scan SQLMetrics folded
  from the final adaptive plan — uncompressed dataSize, per-exchange
  attribution. Blind spot: AQE's empty-relation propagation can erase
  already-executed exchanges from the FINAL plan (empty result at one
  SF), under-reporting them as 0 B.
- CHECKPOINT layer (``capture_checkpoint_sources``, r13): a
  localCheckpoint truncates lineage, so the final plan misses every
  exchange upstream of it. The capture records each pre-checkpoint
  DataFrame during build+execute and folds its executedPlan's
  SQLMetrics into the PLAN columns — disjoint segments, summed
  exactly. This closed the former under-reporting on every
  prefix-sum/attach_global_scalar query (hits_copurchase 32 B ->
  real MBs); the PLAN columns are now those queries' movement signal
  too.
- STAGE layer (``stage_delta``): shuffle-write bytes + executor CPU
  summed over every stage the run actually executed, from the
  AppStatusStore — records EVERY stage that ran regardless of what the
  final plan looks like, closing the AQE-empty blind spot. Bytes here
  are post-compression (smaller than dataSize), so the two columns are
  complementary, not comparable.

Iterative queries (pagerank_docs, curation_funnel, dedup_components)
run driver-coordinated rounds in separate query executions whose
exchanges the final plan doesn't carry — since r7 they are measured
through their operators' ``metrics_sink`` hook (one row per checkpoint
action, folded by ``plans/instrument.py::executed_metrics``) and
published in their own per-step section.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the frozen headline set minus nothing (all single-plan), plus the
# single-plan mining/audit heavies
QUERIES = [
    "pricing_summary", "filter_project", "top_customers", "revenue_by_nation",
    "weekly_chart_streak", "sessionization", "asof_purchase_value",
    "dedup_exact_docs", "text_stats", "near_dup_pairs", "cosine_topk",
    "minhash_near_dups", "top_terms", "rolling_7d_spend",
    "bigram_pmi", "incremental_corpus_dups", "sequence_packing",
    "span_dedup_docs", "oov_rate", "substring_dup_spans",
    "substring_dup_spans_hashed", "substring_dup_spans_packed",
    "substring_scrub_stats", "ngram_novelty",
    "near_dup_threshold_sweep", "split_leakage_pairs", "lexical_diversity",
    "token_budget_allocation", "temperature_mix_allocation",
    "fluency_buckets", "corpus_summary_cube", "hard_negatives",
    "retrieval_label_precision", "cms_heavy_hitters",
    "substring_scrub_stats_hashed", "ngram_novelty_hashed",
    "dedup_upsample_weights", "normalized_dedup_delta",
    "bpe_fertility_by_lang", "zorder_locality_audit",
    "embedding_isotropy_audit",
    # r8 session-3 single-plan additions
    "hits_copurchase", "mann_whitney_effect",
    "holt_winters_forecast", "cusum_changepoint",
    # r8 session-4 single-plan additions
    "bm25_topk", "source_kmv_overlap", "poisson_bootstrap_ci",
    "kaplan_meier_retention", "basket_lift_rules",
    # r9: the r8 join-heavy registry-only queries the r8 verdict flagged
    # as outside the byte audit (VERDICT r8 item 4), plus the perceptual
    # tier (item 6)
    "entity_kcore", "entity_clusters", "entity_match_pairs",
    "js_source_drift", "chao1_vocab_richness", "conformal_token_interval",
    "rrf_hybrid_topk", "phash_near_dups", "blockmean_near_dups",
    # r9 additions: retrieval eval, attribution, drift/calibration and
    # experimentation readouts (robust_spend_stats / ks_two_sample run
    # prefix-sum checkpoints — under-reported in the plan columns
    # before the r13 checkpoint capture; now fully in-plan)
    "bm25_ranking_quality", "matryoshka_energy_audit", "psi_length_drift",
    "acf_daily_revenue", "markov_event_transitions",
    "cohort_retention_triangle", "robust_spend_stats",
    "lang_id_calibration", "markov_removal_attribution",
    "forecast_backtest_mase", "experiment_power_mde", "ks_two_sample",
    "vocab_contribution_by_source", "quantile_treatment_effect",
    "sequential_test_daily", "boilerplate_prefix_audit",
    # r10 addition: the sketch-only bench posture. The *_exact oracle
    # twins (phash/blockmean) are deliberately NOT in this audit: their
    # 20-bit signatures densify the banded background ON PURPOSE (the
    # verify filter must do real work at the correctness SF), which
    # makes candidate pairs grow quadratically with bucket occupancy —
    # a property of the twin's bit-width, not of the production path
    # (64-bit, sparse: see the 9.97x phash/blockmean rows). Measured
    # once in r10: blockmean_near_dups_exact moved 26.8x bytes at 10x
    # data, exactly the quadratic the twins accept at correctness SFs.
    "source_kmv_sketch",
    # r10 session-3 tiers: held-out bigram LM, term dispersion, ratio
    # CI (checkpointed day cells — in-plan since the r13 checkpoint
    # capture), EB source-rate shrinkage
    "stupid_backoff_logprob", "term_burstiness",
    "jackknife_ratio_ci", "eb_shrunk_source_rates",
    # degree-capped pair expansion: bytes ∝ Σ min(deg, AA_MAX_DEG=24)·deg
    # — bounded by the cap, the movement signal for the link-prediction
    # tier (the initial 64 never bound on testdata; see CLAUDE.md)
    "adamic_adar_links",
    # r10 session-3 batch 3: coverage/dispersion/uncertainty readouts +
    # the DSIR resampling scorer (bucket tables are ≤1024 rows by
    # construction — its movement is the feature-stream aggregate)
    "good_turing_mass", "daily_count_overdispersion",
    "dsir_importance_weights", "wilson_return_ranking",
    # r10 session-3 batch 4: CvM (prefix-sum checkpoints — in-plan
    # since the r13 checkpoint capture, like ks_two_sample), SPRT
    # e-process, Brier decomposition
    "cvm_two_sample", "sprt_evalue_monitor", "brier_decomposition",
    # fixed-round LPA: per-round exchanges are edges ⋈ labels — linear
    "lpa_communities", "source_lang_mi",
    # r11 additions: the per-source leak rollup (three shingle passes —
    # broadcast eval semijoin + bounded pair verify + shared-shingle DF
    # join, each the constituent query's audited shape), the BH z-test
    # fan (one brand-keyed aggregate, windows over a LIMIT-bounded
    # catalog relation), the one-pass permutation fan-out (replicate
    # explode collapses map-side — the Poisson-bootstrap movement
    # shape), and the per-source Heaps fit (two corpus aggregates +
    # key-partitioned cumulative windows)
    "contamination_scorecard", "bh_fdr_discoveries",
    "permutation_null_effect", "heaps_exponent_by_source",
    # r11 batch 2: closed-form isotonic (all movement is the one bin
    # aggregate — the minimax nest runs on <=10-row bounded relations),
    # the sketch-calibration audit (bounded verifier slice + md5
    # signature aggregate), and RAKE (positional explode -> per-source
    # token aggregate -> re-join -> WindowGroupLimit head)
    "isotonic_calibration", "minhash_estimate_audit", "rake_keyphrases",
    # r12 capstone: the pair-verifier machinery (bounded slice) fanned
    # across the 6-row literal threshold ladder, then per-threshold
    # water-filling windows over the catalog x ladder relation — its
    # movement is the shingle-pair aggregate, ladder fan-out is
    # broadcast-side only
    "dedup_sensitivity_curve",
    # r13 capstone: the curve's CDC form — candidate join requires a
    # new-side doc (old x old structurally excluded), baseline rides
    # the water-filling plan as a sentinel threshold partition; its
    # movement is the boundary shingle-pair aggregate
    "dedup_sensitivity_delta",
]


def iterative_runs(spark, sf_dir: str) -> dict[str, list[dict]]:
    """Per-step movement rows for the iterative ops, via their
    metrics_sink hooks. Each op runs once per SF; the sink rows cover
    every checkpoint action (edge materialization, label/contribution
    rounds, funnel stages). pagerank/CC append a final_plan row for the
    post-iteration ranking plan; the funnel's LAST stage is itself an
    eager checkpoint already in the sink, so its totals cover
    checkpoint actions completely and no final_plan row exists."""
    from databeats_spark.plans.curation import curate_corpus
    from databeats_spark.plans.instrument import (
        execution_metrics, stage_delta, stage_snapshot,
    )
    from databeats_spark.registry.documents import _dedup_components
    from databeats_spark.registry.mining import _pagerank_docs

    out: dict[str, list[dict]] = {}

    snap = stage_snapshot(spark)
    sink: list[dict] = []
    final = _pagerank_docs(spark, sf_dir, metrics_sink=sink)
    sink.append({"step": "final_plan", **execution_metrics(final)})
    sink.append({"step": "stage_totals", **stage_delta(spark, snap)})
    out["pagerank_docs"] = sink

    snap = stage_snapshot(spark)
    sink = []
    final = _dedup_components(spark, sf_dir, metrics_sink=sink)
    sink.append({"step": "final_plan", **execution_metrics(final)})
    sink.append({"step": "stage_totals", **stage_delta(spark, snap)})
    out["dedup_components"] = sink

    snap = stage_snapshot(spark)
    sink = []
    curate_corpus(spark, sf_dir, observe_counts={}, metrics_sink=sink)
    sink.append({"step": "stage_totals", **stage_delta(spark, snap)})
    out["curation_funnel"] = sink
    return out


def fmt_bytes(n: int) -> str:
    for unit in ("B", "KB", "MB", "GB"):
        if n < 1024 or unit == "GB":
            return f"{n:.1f} {unit}" if unit != "B" else f"{n} B"
        n /= 1024.0
    return f"{n} B"


SF_DIRS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    from bench import shuffle_partitions_for
    from databeats_spark.plans.instrument import (
        capture_checkpoint_sources, executed_metrics, execution_metrics,
        stage_delta, stage_snapshot,
    )
    from databeats_spark.registry import queries
    from databeats_spark.session import get_spark

    spark = get_spark(
        app_name="databeats_shuffle_audit",
        shuffle_partitions=shuffle_partitions_for(SF_DIRS[0]),
    )
    reg = queries()
    by_sf: dict[str, dict[str, dict]] = {}
    iter_by_sf: dict[str, dict[str, list[dict]]] = {}
    for sf_dir in SF_DIRS:
        rows = by_sf[sf_dir] = {}
        for name in QUERIES:
            snap = stage_snapshot(spark)
            # capture brackets build AND execute: checkpoints truncate
            # lineage, so the final plan's walk misses every exchange
            # upstream of a localCheckpoint (hits_copurchase read 32 B
            # while its rounds moved 44.6 MB — VERDICT r12 item 5).
            # Each captured pre-checkpoint df's own executedPlan holds
            # those exchanges' populated SQLMetrics after the run;
            # segments are disjoint (each plan ends at the next
            # checkpoint down), so summing is exact, not double-count.
            with capture_checkpoint_sources() as sources:
                m = execution_metrics(reg[name](spark, sf_dir))
            for src in sources:
                sm = executed_metrics(src)
                for k in sm:
                    m[k] += sm[k]
            m.update(stage_delta(spark, snap))
            rows[name] = m
            print(json.dumps({"sf_dir": sf_dir, "query": name, **m}))
        iter_by_sf[sf_dir] = iterative_runs(spark, sf_dir)
        for name, steps in iter_by_sf[sf_dir].items():
            for s in steps:
                print(json.dumps({"sf_dir": sf_dir, "query": name, **s}))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "SHUFFLE.md"), "w") as f:
        f.write(
            "# SHUFFLE — deterministic data-movement audit\n\n"
            "Generated by `scripts/shuffle_audit.py`.\n"
            "Bytes moved are a property of the plan and the data — they\n"
            "reproduce exactly run over run, so these tables (not\n"
            "wall-clock, which README's variance note shows swinging ±25%\n"
            "with external VM steal) are the round-over-round regression\n"
            "signal: a broadcast join regressing to sort-merge, a lost\n"
            "pushdown, or a partial aggregation regressing to full-row\n"
            "shuffle shows up as an order-of-magnitude byte jump — and the\n"
            "cross-scale byte ratio is the scale curve in deterministic\n"
            "form (10x data moving ~10x bytes is linear; superlinear byte\n"
            "growth exposes a re-quadratizing stage regardless of clock\n"
            "noise; far-below-10x means the mover is a bounded candidate /\n"
            "catalog / top-k set, not the corpus).\n\n"
            "Columns come from two layers: plan-walk SQLMetrics (shuffle/\n"
            "broadcast dataSize — uncompressed, per-exchange) and, since\n"
            "r8, stage-store totals for the same run (`exec write` =\n"
            "post-compression shuffle bytes actually written by every\n"
            "stage that RAN, `cpu_s` = executor CPU seconds — both\n"
            "steal-immune). The stage layer closes the former sf0.1\n"
            "caveat: queries whose bounded verifier slice is empty at\n"
            "sf0.1 (near_dup_pairs, split_leakage_pairs, dedup_components)\n"
            "read 0 B in the PLAN columns there because AQE's\n"
            "empty-relation propagation erases already-executed exchanges\n"
            "from the final plan — their `exec write` column now shows the\n"
            "true executed movement (the shingle/join work runs either\n"
            "way; AQE discovers emptiness bottom-up).\n"
            "The spill column sums disk spill over sort/aggregate/join/\n"
            "window operators — 0 B everywhere is the partition-sizing\n"
            "proof (every partition fits its task's memory share);\n"
            "test_shuffle_budget.py pins it at the correctness SF.\n\n"
            "Since r13 the PLAN columns also see past localCheckpoints\n"
            "(the former hits_copurchase blind spot: its final plan read\n"
            "32 B because attach_global_scalar's checkpoint truncates\n"
            "lineage): the audit captures every pre-checkpoint DataFrame\n"
            "during build+execute and folds its executedPlan's SQLMetrics\n"
            "into the row — disjoint plan segments, summed exactly\n"
            "(plans/instrument.py::capture_checkpoint_sources).\n\n"
            "Iterative queries (pagerank/CC/funnel) are measured per\n"
            "checkpoint action via their metrics_sink hooks and tabled in\n"
            "their own section — their exchanges run in separate query\n"
            "executions the final plan never carries\n"
            "(databeats_spark/plans/instrument.py). The funnel's last\n"
            "stage is itself an eager checkpoint, so its rows cover the\n"
            "op completely; pagerank/CC carry an explicit final_plan row\n"
            "for the post-iteration ranking plan.\n"
            "\n"
            "The *_exact oracle twins (phash/blockmean) are excluded from\n"
            "this audit: their 20-bit signatures densify the banded background\n"
            "on purpose (the verify filter must do real work at the correctness\n"
            "SF), so their candidate pairs grow quadratically with bucket\n"
            "occupancy — a bit-width property of the twin, not the production\n"
            "64-bit path (whose rows above scale ~10x). Measured once in r10:\n"
            "blockmean_near_dups_exact moved 26.8x bytes at 10x data.\n"
        )
        for sf_dir in SF_DIRS:
            f.write(
                f"\n## {sf_dir}\n\n"
                "| query | shuffles | shuffle bytes | shuffle records "
                "| broadcasts | broadcast bytes | scan rows | scan bytes "
                "| spill | exec write | cpu_s |\n"
                "|---|---|---|---|---|---|---|---|---|---|---|\n"
            )
            for name, m in by_sf[sf_dir].items():
                f.write(
                    f"| {name} | {m['n_shuffles']} | {fmt_bytes(m['shuffle_bytes'])} "
                    f"| {m['shuffle_records']} | {m['n_broadcasts']} "
                    f"| {fmt_bytes(m['broadcast_bytes'])} | {m['scan_rows']} "
                    f"| {fmt_bytes(m['scan_bytes'])} | {fmt_bytes(m.get('spill_bytes', 0))} "
                    f"| {fmt_bytes(m['stage_shuffle_write_bytes'])} "
                    f"| {m['cpu_seconds']:.2f} |\n"
                )
        for sf_dir in SF_DIRS:
            f.write(
                f"\n## Iterative ops (per checkpoint action) — {sf_dir}\n\n"
                "| op | step | shuffles | shuffle bytes | shuffle records "
                "| broadcasts | broadcast bytes |\n"
                "|---|---|---|---|---|---|---|\n"
            )
            for name, steps in iter_by_sf[sf_dir].items():
                for s in steps:
                    if s["step"] == "stage_totals":
                        continue  # written after the plan-layer total
                    f.write(
                        f"| {name} | {s['step']} | {s['n_shuffles']} "
                        f"| {fmt_bytes(s['shuffle_bytes'])} | {s['shuffle_records']} "
                        f"| {s['n_broadcasts']} | {fmt_bytes(s['broadcast_bytes'])} |\n"
                    )
                total = sum(s.get("shuffle_bytes", 0) for s in steps)
                f.write(f"| {name} | **total** | — | **{fmt_bytes(total)}** | — | — | — |\n")
                st = next(s for s in steps if s["step"] == "stage_totals")
                f.write(
                    f"| {name} | **stage layer** | — "
                    f"| **{fmt_bytes(st['stage_shuffle_write_bytes'])} exec write** "
                    f"| {st['stage_shuffle_write_records']} "
                    f"| — | cpu {st['cpu_seconds']:.2f} s |\n"
                )
        f.write(
            "\n## Shuffle-byte growth for 10x data (deterministic scale curve)\n\n"
            "Plan-layer dataSize ratio, falling back to the stage-layer\n"
            "executed-write ratio (marked `*`) when the plan layer reads\n"
            "0 B at either SF (the AQE-empty cases above).\n\n"
            "| query | sf0.01 | sf0.1 | byte ratio |\n|---|---|---|---|\n"
        )
        small, large = by_sf[SF_DIRS[0]], by_sf[SF_DIRS[1]]
        for name in QUERIES:
            a, b = small[name]["shuffle_bytes"], large[name]["shuffle_bytes"]
            if a and b:
                ratio = f"{b / a:.2f}x"
            else:
                sa = small[name]["stage_shuffle_write_bytes"]
                sb = large[name]["stage_shuffle_write_bytes"]
                a, b = sa, sb
                ratio = f"{sb / sa:.2f}x\\*" if sa else "—"
            f.write(f"| {name} | {fmt_bytes(a)} | {fmt_bytes(b)} | {ratio} |\n")
        small_it, large_it = iter_by_sf[SF_DIRS[0]], iter_by_sf[SF_DIRS[1]]
        for name in small_it:
            a = sum(s.get("shuffle_bytes", 0) for s in small_it[name])
            b = sum(s.get("shuffle_bytes", 0) for s in large_it[name])
            if a and b:
                ratio = f"{b / a:.2f}x"
            else:
                sa = next(s for s in small_it[name] if s["step"] == "stage_totals")
                sb = next(s for s in large_it[name] if s["step"] == "stage_totals")
                a = sa["stage_shuffle_write_bytes"]
                b = sb["stage_shuffle_write_bytes"]
                ratio = f"{b / a:.2f}x\\*" if a else "—"
            f.write(f"| {name} (all rounds) | {fmt_bytes(a)} | {fmt_bytes(b)} | {ratio} |\n")
    print("SHUFFLE.md written")


if __name__ == "__main__":
    main()
