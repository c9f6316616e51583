"""Deterministic execution metrics — the steal-proof bench companion.

Wall-clock on a shared VM is noisy (README "Bench variance note"), but
the BYTES a plan moves are a property of the plan and the data: shuffle
exchange dataSize, broadcast sizes, and scan row/byte counts reproduce
exactly run over run. ``execution_metrics`` executes a DataFrame's own
physical plan and folds the SQLMetrics of every exchange/scan in the
final adaptive plan into one dict — the regression signal that survives
any amount of external CPU steal, and the direct evidence for the
100 TB posture claims (a broadcast star join shows megabytes of
broadcast and ZERO fact-side shuffle; a regression to sort-merge-join
shows up as a 100x shuffle-byte jump long before anyone trusts a
timing).

Scope: single-plan queries. Iterative operators (PageRank rounds, CC
label rounds, funnel stages) execute driver-coordinated sub-jobs at
build time whose exchanges live in OTHER query executions — only the
final plan's metrics are visible here, so the audit script keeps those
out of its table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_STAGE_SUFFIX = "QueryStageExec"


def _walk(node):
    """Pre-order walk of the EXECUTED adaptive plan: dives into query
    stages and reused exchanges, yielding each distinct plan node."""
    name = node.getClass().getSimpleName()
    yield name, node
    if name == "AdaptiveSparkPlanExec":
        yield from _walk(node.executedPlan())
        return
    if name.endswith(_STAGE_SUFFIX):
        yield from _walk(node.plan())
        return
    if name == "ReusedExchangeExec":
        yield from _walk(node.child())
        return
    kids = node.children()
    for i in range(kids.size()):
        yield from _walk(kids.apply(i))


def _metric_values(node) -> dict[str, int]:
    m = node.metrics()
    it = m.keys().iterator()
    out: dict[str, int] = {}
    while it.hasNext():
        k = it.next()
        out[k] = int(m.apply(k).value())
    return out


def execution_metrics(df: DataFrame) -> dict[str, int]:
    """Execute ``df``'s physical plan (full pipeline, nothing collected
    to Python) and return the deterministic volume metrics:

    - ``shuffle_bytes`` / ``shuffle_records``: sum over shuffle
      exchanges of dataSize / records written (each exchange counted
      once — reused exchanges share their child's node id);
    - ``n_shuffles`` / ``n_broadcasts``: exchange counts in the final
      adaptive plan;
    - ``broadcast_bytes``: sum of broadcast exchange dataSize;
    - ``scan_rows`` / ``scan_bytes``: file-scan output rows and the
      size of the files read (post partition/file pruning).
    """
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan()
    plan.execute().count()  # run the plan's own RDD — metrics populate
    seen: set[int] = set()
    out = {
        "shuffle_bytes": 0, "shuffle_records": 0, "n_shuffles": 0,
        "broadcast_bytes": 0, "n_broadcasts": 0,
        "scan_rows": 0, "scan_bytes": 0,
    }
    for name, node in _walk(plan):
        if name not in ("ShuffleExchangeExec", "BroadcastExchangeExec", "FileSourceScanExec"):
            continue
        nid = int(node.id())
        if nid in seen:
            continue
        seen.add(nid)
        vals = _metric_values(node)
        if name == "ShuffleExchangeExec":
            out["shuffle_bytes"] += vals.get("dataSize", 0)
            out["shuffle_records"] += vals.get("shuffleRecordsWritten", 0)
            out["n_shuffles"] += 1
        elif name == "BroadcastExchangeExec":
            out["broadcast_bytes"] += vals.get("dataSize", 0)
            out["n_broadcasts"] += 1
        else:
            out["scan_rows"] += vals.get("numOutputRows", 0)
            out["scan_bytes"] += vals.get("filesSize", 0)
    return out
