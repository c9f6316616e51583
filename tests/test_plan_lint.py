"""Registry-wide physical-plan lint — the automated 100 TB posture
sweep. test_plans.py pins the flagship plans in detail; this walks
EVERY registry query's plan and rejects the three classic scale
killers unless the query is on the justified allowlist:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin``: auto-accepted
  when the build side is PROVABLY at most one row — a grouping-keyless
  aggregate, or a join of such (checked structurally on the plan tree,
  not trusted from a comment). Everything else needs an allowlist
  entry documenting its bounded-but-unprovable side (a broadcast query
  set, a calendar grid);
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
import json

from databeats_spark.registry import registry
from tests.conftest import SF_SMOKE

# BNLJ/cartesian allowlist: name -> the bounded-but-not-provably-1-row
# build side. Scalar attaches (keyless aggregates) no longer need
# entries — the lint PROVES those from the plan tree.
BOUNDED_JOIN_OK: dict[str, str] = {}
# EMPTY since r8 — every BNLJ/cartesian side in all registry plans is
# now structurally proven by _provably_bounded. (cosine_topk,
# ivf_cosine_topk and embedding_near_dups left this list in r5 via
# semantic-no-op .limit()s / centroid-literal local relations;
# weekly_resample left in r8 by cross-joining the 1-row span aggregate
# onto the users BEFORE exploding the week spine.) Keep it empty: for
# a bounded-by-construction relation, put the bound in the plan
# (keyless agg, LIMIT, or literal local relation), never a new entry.

# ≤1-row-preserving plan nodes the scalar-side proof may walk through
_AGG_NODES = ("HashAggregateExec", "SortAggregateExec", "ObjectHashAggregateExec")
_UNARY_ROW_SAFE = (
    "ProjectExec", "FilterExec", "BroadcastExchangeExec", "ShuffleExchangeExec",
    "AQEShuffleReadExec", "WholeStageCodegenExec", "InputAdapter",
    "ColumnarToRowExec", "RowToColumnarExec", "SortExec", "CoalesceExec",
    "GlobalLimitExec", "LocalLimitExec", "TakeOrderedAndProjectExec",
)
_JOIN_NODES = (
    "BroadcastNestedLoopJoinExec", "CartesianProductExec", "BroadcastHashJoinExec",
    "SortMergeJoinExec", "ShuffledHashJoinExec",
)


def _build_tree(nodes: list[dict], i: int = 0) -> tuple[dict, int]:
    """Rebuild the plan tree from TreeNode.toJSON's pre-order flat list."""
    node = dict(nodes[i])
    kids = []
    j = i + 1
    for _ in range(node.get("num-children", 0)):
        child, j = _build_tree(nodes, j)
        kids.append(child)
    node["kids"] = kids
    return node, j


def _cls(node: dict) -> str:
    return node["class"].rsplit(".", 1)[-1]


def _provably_scalar(node: dict) -> bool:
    """True when the subtree provably yields at most ONE row: a
    grouping-keyless aggregate, a join of two such, or either behind
    row-count-preserving unary nodes."""
    while True:
        c = _cls(node)
        if c in _AGG_NODES:
            return node.get("groupingExpressions", []) == []
        if c in _JOIN_NODES and len(node["kids"]) == 2:
            return _provably_scalar(node["kids"][0]) and _provably_scalar(node["kids"][1])
        if c in _UNARY_ROW_SAFE and len(node["kids"]) == 1:
            node = node["kids"][0]
            continue
        return False


_LIMIT_NODES = ("GlobalLimitExec", "LocalLimitExec", "TakeOrderedAndProjectExec")
_WINDOW_NODES = ("WindowExec", "WindowGroupLimitExec")

# The reserved per-partition-subtotal column. _subtotal_bounded keys on
# this name; test_pid_column_is_reserved proves (at source level) that
# the package only ever binds it to spark_partition_id() — together the
# two make "aggregate keyed by __pid" a proof of ≤ #partitions rows.
_PID_NAME = "__pid"


def _subtotal_bounded(node: dict) -> bool:
    """True when the subtree is an aggregate keyed EXACTLY by the
    reserved per-partition id column: its output has at most one row
    per input partition — a cluster-config axis, not a data axis, so
    an unpartitioned window over it is bounded by construction (the
    two-phase prefix-scan shape of
    operators/scale.py::partitioned_running_total)."""
    while True:
        c = _cls(node)
        if c in _AGG_NODES:
            keys = node.get("groupingExpressions", [])
            return (
                len(keys) == 1
                and len(keys[0]) == 1
                and keys[0][0].get("name") == _PID_NAME
            )
        if c in _UNARY_ROW_SAFE and len(node["kids"]) == 1:
            node = node["kids"][0]
            continue
        return False


def _behind_limit(node: dict) -> bool:
    """True when every row reaching this subtree's output passed an
    explicit LIMIT — the window input is bounded by construction."""
    while True:
        c = _cls(node)
        if c in _LIMIT_NODES:
            return True
        if (c in _UNARY_ROW_SAFE or c in _WINDOW_NODES) and len(node["kids"]) == 1:
            node = node["kids"][0]
            continue
        return False


def _provably_bounded(node: dict) -> bool:
    """True when the subtree's row count is provably bounded by
    CONSTRUCTION, independent of data volume: behind an explicit
    LIMIT, a literal local relation (a broadcast constant table such
    as KMeans centroids), or provably ≤1 row. This is the structural
    form of every historical join-allowlist justification ('bounded by
    n_queries', 'centroid literals') — a bound the plan enforces
    instead of a comment asserting it."""
    if _provably_scalar(node) or _behind_limit(node):
        return True
    while True:
        c = _cls(node)
        # NOTE: RDDScan/ExistingRDD (localCheckpoint output) is NOT
        # bounded — checkpointed relations carry arbitrary data volume
        if c in ("LocalTableScanExec", "EmptyRelationExec"):
            return True
        if c in _UNARY_ROW_SAFE and len(node["kids"]) == 1:
            node = node["kids"][0]
            continue
        return False


def _plan_tree(df) -> dict:
    nodes = json.loads(df._jdf.queryExecution().sparkPlan().toJSON())
    root, _ = _build_tree(nodes)
    return root


def _tree_violations(df) -> list[str]:
    """Unprovable scale killers from the physical-plan tree: BNLJ or
    cartesian whose bounded side cannot be proven ≤1 row, and
    unpartitioned window operators not behind an explicit limit —
    each requires an allowlist entry naming its bounded relation."""
    bad, stack = [], [_plan_tree(df)]
    while stack:
        n = stack.pop()
        c = _cls(n)
        if c == "BroadcastNestedLoopJoinExec":
            build = n["kids"][1] if "BuildRight" in str(n.get("buildSide", "")) else n["kids"][0]
            if not _provably_bounded(build):
                bad.append("bnlj")
        elif c == "CartesianProductExec":
            if not any(_provably_bounded(k) for k in n["kids"]):
                bad.append("cartesian")
        elif c in _WINDOW_NODES and n.get("partitionSpec", []) == []:
            if not (_behind_limit(n["kids"][0]) or _subtotal_bounded(n["kids"][0])):
                bad.append("unpartitioned-window")
        stack.extend(n["kids"])
    return bad

# unpartitioned-window allowlist: name -> the tiny relation it sorts.
# Windows behind an explicit limit (TakeOrderedAndProject/GlobalLimit)
# or over a __pid-keyed subtotal aggregate are auto-proved bounded and
# need no entry. EMPTY since r6: the four partitioned_running_total
# consumers (token_budget_pack, vocab_growth, sequence_packing,
# peak_concurrency) are proved by _subtotal_bounded, and
# length_drift_ks's histogram sits behind an explicit .limit() on the
# length domain (the r5 idiom, as source_pareto/interleave_layout).
UNPARTITIONED_WINDOW_OK: dict[str, str] = {}

def test_every_registry_plan_is_scale_clean(spark):
    offenders: dict[str, list[str]] = {}
    for spec in registry():
        df = spec.build(spark, SF_SMOKE)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        if "BatchEvalPython" in buf.getvalue():
            offenders[spec.name] = ["row-at-a-time-python"]
            continue
        v = _tree_violations(df)
        if ("bnlj" in v or "cartesian" in v) and spec.name not in BOUNDED_JOIN_OK:
            offenders.setdefault(spec.name, []).append("unproven unbounded join")
        if "unpartitioned-window" in v and spec.name not in UNPARTITIONED_WINDOW_OK:
            offenders.setdefault(spec.name, []).append("unjustified global window")
    assert not offenders, f"scale-lint violations: {offenders}"


def test_pid_column_is_reserved():
    """The _subtotal_bounded proof keys on the ``__pid`` column name,
    so that name must stay PRIVATE to the one sanctioned definition
    site (operators/scale.py, bound to spark_partition_id()). Any
    other module minting a ``__pid`` could smuggle an unbounded
    relation past the lint."""
    import pathlib

    pkg = pathlib.Path(__file__).resolve().parent.parent / "databeats_spark"
    offenders = [
        str(p.relative_to(pkg))
        for p in sorted(pkg.rglob("*.py"))
        if "__pid" in p.read_text() and p.name != "scale.py"
    ]
    assert not offenders, f"__pid minted outside operators/scale.py: {offenders}"
    scale = (pkg / "operators" / "scale.py").read_text()
    # the single binding site must be spark_partition_id()
    assert 'withColumn("__pid", F.spark_partition_id())' in scale
    assert scale.count('"__pid"') == scale.count("__pid"), (
        "__pid used as a bare identifier in scale.py — keep it a quoted "
        "column name so this audit stays a simple string scan"
    )


def test_allowlists_stay_minimal(spark):
    """The allowlists must not rot: every allowlisted name still exists
    AND (for the join list) still needs its exemption — an entry whose
    plan no longer contains an unprovable join must be deleted so the
    lint stays strict."""
    by_name = {s.name: s for s in registry()}
    stale = (set(BOUNDED_JOIN_OK) | set(UNPARTITIONED_WINDOW_OK)) - set(by_name)
    assert not stale, f"allowlisted queries no longer in registry: {stale}"
    no_longer_needed = []
    for name, kinds in (
        (BOUNDED_JOIN_OK, ("bnlj", "cartesian")),
        (UNPARTITIONED_WINDOW_OK, ("unpartitioned-window",)),
    ):
        for q in name:
            v = _tree_violations(by_name[q].build(spark, SF_SMOKE))
            if not any(k in v for k in kinds):
                no_longer_needed.append(q)
    assert not no_longer_needed, (
        f"allowlist entries whose plans are now clean (delete them): {no_longer_needed}"
    )
