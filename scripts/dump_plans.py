#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans of the flagship
queries with the scale-relevant features annotated. Run after any
planner-visible change: python scripts/dump_plans.py"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLAGSHIPS = {
    "filter_project": "predicate pushdown + column pruning at the parquet scan",
    "pricing_summary": "partial→final hash aggregation (map-side combine)",
    "revenue_by_nation": "star join: every dimension broadcast, zero sort-merge",
    "weekly_chart_streak": "window composition: per-week top-k + gaps-and-islands streak",
    "asof_purchase_value": "as-of join as union + running-last window (single keyed shuffle)",
    "top_customers": "global top-k as TakeOrderedAndProject (no full sort)",
    "minhash_near_dups": "LSH banding: signature agg → bucket self-join → array-intersect verify",
    "benchmark_decontam": "eval shingle set broadcast: corpus side never shuffles through the join",
    "token_budget_pack": "distributed prefix sum: range partition → subtotal offsets → partitioned window",
    "customer_deciles": "distributed ntile: prefix-sum row_number + integer closed-form bucketing",
    "min_cost_supplier": "Q2 correlated-MIN rewritten as one window rank over the part key",
    "rare_trigram_stats": "trigram DF table broadcast (bounded by charset³); corpus side never shuffles",
    "per_source_quota": "WindowGroupLimit: map-side partial top-K per source before the shuffle",
    "length_band_outliers": "per-language window over the compact (lang, n_chars) histogram",
    "local_supplier_volume": "Q5 six-way join: every dim broadcast, lineitem->orders is the only big shuffle",
    "shipping_priority": "Q3: smallest-side filters first, customer broadcast, one fact shuffle + top-10 TakeOrdered",
    "bigram_pmi": "corpus totals via checkpointed scalar attach; vocab broadcast to the bigram side",
    "incremental_corpus_dups": "old x new candidates only: the shingle join never forms old-old/new-new pairs",
    "span_dedup_docs": "C4 span dedup: first-keep window PARTITIONED BY the span value (key-partitioned, no global sort)",
    "oov_rate": "vocab head via TakeOrderedAndProject, broadcast re-attach; one explode + hash agg on the corpus side",
    "rolling_7d_active_users": "sliding distinct: bounded cover-day explode (blowup = window length) + per-day hash agg",
    "token_budget_allocation": "water-filling: BIGINT capped-prefix test; windows over the limit-bounded source catalog; scalars via checkpointed attach",
}


# Hand-maintained measured-evidence section (preserved across plan
# regeneration because this script rewrites PLANS.md wholesale).
# Refresh the numbers with scripts/scale_curve.py and
# scripts/curate.py --stage-times.
SCALE_EVIDENCE = """\
## Measured scale evidence (round 5)

Scale curve for the heavy mining queries — `scripts/scale_curve.py`,
one session, full JIT pass at sf0.001 first, then a single timed run
per query per scale factor (bench.py mining methodology). Data grows
10x between sf0.01 and sf0.1; two samples on different loads:

| query | sf0.01 s | sf0.1 s | runtime ratio (10x data) |
|---|---|---|---|
| minhash_near_dups | 1.45 / 1.25 / 1.57 | 2.44 / 1.93 / 2.84 | 1.69 / 1.55 / 1.81 |
| semdedup_near_dups | 2.46 / 2.30 / 2.25 | 12.56 / 3.16 / 25.39* | 5.11 / 1.37 / 11.31* |
| pagerank_docs | 2.86 / 2.66 / 3.25 | 5.05 / 3.57 / 4.73 | 1.77 / 1.34 / 1.46 |
| curation_funnel | 8.33 / 7.20 / 8.84 | 12.64 / 10.44 / 12.03 | 1.52 / 1.45 / 1.36 |
| lexical_diversity (r5) | 0.68 | 0.85 | 1.25 |
| token_budget_allocation (r5) | 0.84 | 0.75 | 0.89 |

Every ratio is far below the 10x data ratio: at these scale factors
the runtimes are dominated by the FIXED round/iteration structure
(LSH band join rounds, CC rounds bounded by cluster diameter, KMeans
iterations, per-stage actions) while the per-row work parallelizes —
exactly the profile the bounded-candidate designs predict. Nothing
re-quadratizes; the pair budget is constant per cluster by
construction, n_lists = n//400.

*The semdedup sf0.1 spikes (12.56, 25.39) are external host steal,
not a plan property: the third sample's run landed on a day README's
variance note documents (host load ~10 with zero local processes),
and four consecutive sf0.1 runs of the identical query in one session
immediately after measured 6.43 / 3.54 / 2.86 / 4.39 s — steady state
~3-4 s (the first run pays whole-stage-codegen for the larger plan).
With the r5 random-init maxIter-4 bucketing fit, steady state is
BELOW the 5.05 s the r4 driver recorded. The two r5 audit additions
scale essentially flat: both are one scan + catalog-bounded windows.

## curation_funnel stage breakdown (sf0.1)

`scripts/curate.py --stage-times` (eager per-stage materialization —
the lazy flow would attribute near_dup's CC rounds, which run at plan
build time, to a later action). Cold = fresh session; warm = second
pass in the same session (JVM/codegen warmed; README variance note):

| stage | cold s | warm s |
|---|---|---|
| raw (scan+spread) | 4.01 | — |
| quality | 1.04 | 0.18 |
| exact_dedup | 3.03 | 0.40 |
| near_dup | 14.14 | 7.43 |
| decontam | 1.41 | 1.23 |
| rebalance | 0.45 | 0.33 |
| budget | 1.14 | 0.64 |

near_dup dominates (56% cold / 72% warm). Its internal split (warm):
MinHash+LSH pair generation 1.9 s, connected components 1.3 s over
157 pairs, keep-canonical 0.2 s — the CC cost is pure fixed
round-overhead (~3 rounds x join+agg+checkpoint actions), not data
volume. This is a documented floor, not a scale risk: the round count
is bounded by near-dup cluster diameter (constant in practice), so at
100 TB the same ~15 actions orchestrate arbitrarily wide stages while
per-round work scales out — consistent with the funnel's measured
1.45x runtime for 10x data above.
"""


def main() -> None:
    from databeats_spark.registry import queries
    from databeats_spark.session import get_spark

    spark = get_spark("dump_plans", shuffle_partitions=8)
    q = queries()
    out = [
        "# PLANS — physical plans of the flagship queries",
        "",
        "Generated by `scripts/dump_plans.py` at sf0.01 (plan shapes are",
        "scale-independent; AQE may further coalesce at runtime). The",
        "scale-critical properties asserted in tests/test_plans.py are",
        "annotated per query.",
        "",
        SCALE_EVIDENCE,
    ]
    for name, note in FLAGSHIPS.items():
        df = q[name](spark, "/root/testdata/sf0.01")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out += [f"## {name}", "", f"*{note}*", "", "```", buf.getvalue().rstrip(), "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")
    spark.stop()


if __name__ == "__main__":
    main()
