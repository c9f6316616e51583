"""Registry-wide physical-plan lint — the automated 100 TB posture
sweep. test_plans.py pins the flagship plans in detail; this walks
EVERY registry query's plan and rejects the three classic scale
killers unless the query is on the justified allowlist:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin``: only legitimate
  when the build side is a 1-row scalar aggregate or a bounded small
  relation (broadcast query set, week grid) — each allowlisted name
  documents its bounded side;
- ``BatchEvalPython``: a row-at-a-time Python UDF in ANY plan is a
  bug, full stop (Arrow paths — ArrowEvalPython / MapInPandas /
  FlatMapGroupsInPandas — remain allowed);
- unpartitioned windows (``windowspecdefinition`` with no partition
  keys): single-task funnels unless they run over an
  already-tiny derived relation (per-partition subtotals).
"""

from __future__ import annotations

import contextlib
import io
import re

from databeats_spark.registry import registry
from tests.conftest import SF_SMOKE

# BNLJ/cartesian allowlist: name -> the bounded build side
BOUNDED_JOIN_OK = {
    "above_average_customers": "1-row scalar AVG subquery broadcast",
    "cosine_topk": "broadcast query-vector set (bounded by n_queries, not corpus)",
    "ivf_cosine_topk": "broadcast probe-list ids + 1-row centroid stats",
    "embedding_near_dups": "1-row dim/threshold scalar broadcast",
    "weekly_resample": "bounded week x user grid (weeks are a calendar, not data, axis)",
    "mix_rebalance": "1-row min(source count) scalar broadcast",
    "customer_deciles": "1-row total-count scalar for the ntile closed form",
    "important_parts": "1-row total/count scalar over the checkpointed per-part agg",
    "idle_high_balance": "1-row positive-balance avg scalar broadcast",
    "rare_trigram_stats": "1-row corpus doc-count scalar broadcast",
    "bigram_pmi": "1-row corpus-total scalars (n1/n2) over checkpointed aggregates",
    "source_pareto": "1-row corpus token-total scalar broadcast",
    "pagerank_docs": "1-row flowing-rank-sum scalar broadcast per power iteration",
    "length_drift_ks": "1-row slice-total scalars over the checkpointed histogram",
    "length_drift_psi": "1-row slice-total scalars over the checkpointed histogram",
    "unigram_doc_logprob": "1-row corpus-token-total scalar over the checkpointed vocab agg",
    "idf_doc_score": "1-row corpus doc-count scalar broadcast (raw-scan scalar stays naive)",
    "dup_triangles": "1-row graph summary scalars (n_nodes/n_edges/n_triangles over the bounded verifier slice)",
    "interleave_layout": "1-row n_sources scalar over the bounded source catalog",
    "event_cooccurrence_lift": "1-row distinct-user-count scalar broadcast (raw-scan scalar stays naive)",
    "key_skew_profile": "1-row row-total scalar over the checkpointed per-key counts",
    "class_weights": "1-row total/class-count scalars over the checkpointed label counts",
}

# unpartitioned-window allowlist: name -> the tiny relation it sorts
UNPARTITIONED_WINDOW_OK = {
    "token_budget_pack": "prefix over per-partition subtotals (#partitions rows)",
    "customer_deciles": "prefix over per-partition subtotals (#partitions rows)",
    "vocab_growth": "prefix over per-partition subtotals (#partitions rows)",
    "sequence_packing": "prefix over per-partition subtotals (#partitions rows)",
    "length_drift_ks": "ECDF window over the bounded (n_chars) histogram — a length domain, not a data axis",
    "source_pareto": "cumulative share over the per-source aggregate (#sources rows — a catalog, not a data axis)",
    "zipf_slope": "rank window over the TakeOrderedAndProject'd top-1000 head, bounded by construction",
    "peak_concurrency": "prefix over per-partition subtotals (#partitions rows)",
    "interleave_layout": "source-index window over the bounded source catalog (~#sources rows — a catalog, not a data axis)",
    "key_skew_profile": "rank/cumulative window over the TakeOrderedAndProject'd top-20 head, bounded by construction",
}

_WINDOW_RE = re.compile(r"windowspecdefinition\(([^)]*?)specifiedwindowframe")


def _violations(plan: str) -> list[str]:
    v = []
    if "CartesianProduct" in plan:
        v.append("cartesian")
    if "BroadcastNestedLoopJoin" in plan:
        v.append("bnlj")
    if "BatchEvalPython" in plan:
        v.append("row-at-a-time-python")
    for m in _WINDOW_RE.finditer(plan):
        first = m.group(1).split(",")[0]
        if " ASC" in first or " DESC" in first:
            v.append("unpartitioned-window")
            break
    return v


def test_every_registry_plan_is_scale_clean(spark):
    offenders: dict[str, list[str]] = {}
    for spec in registry():
        df = spec.build(spark, SF_SMOKE)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        v = _violations(buf.getvalue())
        if "row-at-a-time-python" in v:
            offenders[spec.name] = v
            continue
        if ("cartesian" in v or "bnlj" in v) and spec.name not in BOUNDED_JOIN_OK:
            offenders.setdefault(spec.name, []).append("unjustified bounded join")
        if "unpartitioned-window" in v and spec.name not in UNPARTITIONED_WINDOW_OK:
            offenders.setdefault(spec.name, []).append("unjustified global window")
    assert not offenders, f"scale-lint violations: {offenders}"


def test_allowlists_stay_minimal(spark):
    """The allowlists must not rot: every allowlisted name still exists
    AND still needs its exemption (drop the entry when the plan
    improves, so the lint stays strict)."""
    names = {s.name for s in registry()}
    stale = (set(BOUNDED_JOIN_OK) | set(UNPARTITIONED_WINDOW_OK)) - names
    assert not stale, f"allowlisted queries no longer in registry: {stale}"
