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

Two entry points:

- :func:`execution_metrics` — single-plan queries: execute the df's own
  physical plan, then fold its exchange/scan SQLMetrics.
- :func:`executed_metrics` — iterative operators (PageRank rounds, CC
  label rounds, funnel stages): their driver-coordinated sub-jobs run
  in OTHER query executions the final plan never carries, so each
  round's operator threads a ``metrics_sink`` list and calls this on
  the round's ALREADY-EXECUTED DataFrame (the eager localCheckpoint is
  the action) — folding without re-running. Summing sink entries gives
  the op's total movement; per-entry rows expose compounding.
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
      size of the files read (post partition/file pruning);
    - ``spill_bytes``: disk spill summed over sort/aggregate/join/
      window operators — nonzero means a partition outgrew its task's
      memory share (the partition-sizing failure mode at scale).
    """
    plan = df._jdf.queryExecution().executedPlan()
    plan.execute().count()  # run the plan's own RDD — metrics populate
    return _fold_plan_metrics(plan)


def executed_metrics(df: DataFrame) -> dict[str, int]:
    """Fold the volume metrics of a plan that ALREADY ran — for
    iterative operators whose round action is the eager
    ``localCheckpoint`` itself. Call it on the df the checkpoint was
    taken FROM (its queryExecution is the one the checkpoint executed);
    calling it on a never-actioned df reports zeros, not an error."""
    return _fold_plan_metrics(df._jdf.queryExecution().executedPlan())


def record_metrics(sink: list | None, step: str, df: DataFrame) -> None:
    """Append ``{"step": step, **executed_metrics(df)}`` to ``sink``
    when a sink is provided — the one-liner the iterative operators
    gate their instrumentation on (None = zero overhead)."""
    if sink is not None:
        sink.append({"step": step, **executed_metrics(df)})


# operators that spill to disk under memory pressure (their SQLMetrics
# carry a "spillSize" entry) — the executor-memory-fit signal: nonzero
# spill means a partition outgrew its task's memory share, the thing
# spark.sql.shuffle.partitions / maxPartitionBytes sizing must prevent
# at the target SF.
_SPILLABLE = (
    "SortExec", "HashAggregateExec", "ObjectHashAggregateExec",
    "SortMergeJoinExec", "ShuffledHashJoinExec", "WindowExec",
    "WindowGroupLimitExec",
)


def _fold_plan_metrics(plan) -> dict[str, int]:
    seen: set[int] = set()
    out = {
        "shuffle_bytes": 0, "shuffle_records": 0, "n_shuffles": 0,
        "broadcast_bytes": 0, "n_broadcasts": 0,
        "scan_rows": 0, "scan_bytes": 0, "spill_bytes": 0,
    }
    for name, node in _walk(plan):
        if name not in ("ShuffleExchangeExec", "BroadcastExchangeExec", "FileSourceScanExec") and name not in _SPILLABLE:
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
        elif name == "FileSourceScanExec":
            out["scan_rows"] += vals.get("numOutputRows", 0)
            out["scan_bytes"] += vals.get("filesSize", 0)
        else:
            out["spill_bytes"] += vals.get("spillSize", 0)
    return out
