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

Three entry points:

- :func:`execution_metrics` — single-plan queries: execute the df's own
  physical plan, then fold its exchange/scan SQLMetrics.
- :func:`executed_metrics` — iterative operators (PageRank rounds, CC
  label rounds, funnel stages): their driver-coordinated sub-jobs run
  in OTHER query executions the final plan never carries, so each
  round's operator threads a ``metrics_sink`` list and calls this on
  the round's ALREADY-EXECUTED DataFrame (the eager localCheckpoint is
  the action) — folding without re-running. Summing sink entries gives
  the op's total movement; per-entry rows expose compounding.
- :func:`stage_snapshot` / :func:`stage_delta` — STAGE-level totals
  from the AppStatusStore, bracketing a query run (r7 VERDICT items
  2+3). Two blind spots of plan-walking die here at once:
  (a) ``executorCpuTime`` is CPU time, not wall — external VM steal
      inflates wall-clock but not CPU, so per-query ``cpu_seconds``
      deltas are the steal-immune timing companion bench.py emits;
  (b) every stage that RAN is recorded in the store even when AQE's
      empty-relation propagation replaces the subtree in the final
      plan — so stage-level shuffle-write deltas report the true
      executed movement for queries whose final plan reads 0 B
      (SHUFFLE.md's former sf0.1 caveat rows).
  Deltas are only attributable when queries run serially on the
  session (bench.py / shuffle_audit.py do). Stage-store eviction
  (spark.ui.retainedStages) would corrupt long-session deltas;
  :func:`get_spark` raises the retention well above any bench run.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

_STAGE_SUFFIX = "QueryStageExec"

# --- checkpoint-source capture (VERDICT r12 item 5) ------------------
# A localCheckpoint truncates lineage: the final plan carries a
# LogicalRDD where the checkpointed subtree used to be, so a plain
# plan-walk of the final plan misses every exchange that EXECUTED
# upstream of the checkpoint (hits_copurchase read 32 B of shuffle
# while its rounds moved 44.6 MB). While a capture is active,
# DataFrame.localCheckpoint is wrapped to record each PRE-checkpoint
# DataFrame; after the final plan runs, those dataframes' own
# executedPlans hold the upstream exchanges' populated SQLMetrics —
# fold them with :func:`executed_metrics`, no re-run. Inactive (the
# default) nothing is patched, so production query paths pay nothing.


@contextmanager
def capture_checkpoint_sources():
    """Collect every DataFrame that gets localCheckpoint'd while
    active. Wrap BOTH the query build and its execution (lazy
    checkpoints are created at build time but run with the final
    action), then fold each captured source with
    :func:`executed_metrics` and sum into the final plan's metrics —
    the segments are disjoint by construction (the final plan sees
    only the post-checkpoint LogicalRDD, and each source's plan ends
    at the NEXT checkpoint down its own lineage). Audit-only (single
    threaded); not re-entrant-safe across threads."""
    # patch the RUNTIME class: in PySpark 4 pyspark.sql.DataFrame is
    # the dispatching facade and the classic subclass overrides
    # localCheckpoint, so patching the base would never intercept
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _RuntimeDF
    except ImportError:  # older PySpark: one concrete class
        _RuntimeDF = DataFrame

    # A Spark Connect session's DataFrames are a THIRD class the patch
    # above never touches — the capture would silently stay empty and
    # the audit would report the pre-capture blind numbers as if the
    # fix ran (r13 review). Fail loud instead; the audit is a local
    # classic-session tool by design.
    try:
        from pyspark.sql import SparkSession as _SS

        active = _SS.getActiveSession()
    except Exception:
        active = None
    if active is not None and type(active).__module__.startswith(
        "pyspark.sql.connect"
    ):
        raise RuntimeError(
            "capture_checkpoint_sources only intercepts classic-session "
            "DataFrames; the active session is Spark Connect, whose "
            "localCheckpoint this patch cannot see — run the audit on a "
            "local classic session"
        )

    captured: list[DataFrame] = []
    original = _RuntimeDF.localCheckpoint

    def recording(self, *args, **kwargs):
        captured.append(self)
        return original(self, *args, **kwargs)

    _RuntimeDF.localCheckpoint = recording
    try:
        yield captured
    finally:
        _RuntimeDF.localCheckpoint = original


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


def stage_snapshot(spark: SparkSession) -> dict[str, int]:
    """Sum task metrics over every stage the AppStatusStore retains.

    Drains the listener bus first so all completed-stage events are
    folded in (the status listener is asynchronous; without the drain a
    snapshot taken right after an action can miss its final stages).
    Returns monotonically-growing totals — meaningful only as deltas
    via :func:`stage_delta` around a serially-run query.

    RETENTION CAVEAT: both totals are ABSOLUTE counts over what the
    store currently retains. ``get_spark`` pins
    ``spark.ui.retainedJobs``/``retainedStages`` to 100000 so a bench
    sweep never evicts a 'before' snapshot's entries; against a
    session this engine did not build (defaults: 1000 stages / 1000
    jobs) a long sweep can rotate 'before' jobs/stages out mid-run and
    silently corrupt the delta (ADVICE r12). Keep deltas short or pin
    retention before snapshotting.
    """
    sc = spark.sparkContext
    sc._jsc.sc().listenerBus().waitUntilEmpty()
    jvm = sc._jvm
    stages = sc._jsc.sc().statusStore().stageList(
        jvm.java.util.ArrayList(),          # all statuses
        False, False,                       # no task details / summaries
        sc._gateway.new_array(jvm.double, 0),
        jvm.java.util.ArrayList(),          # all task statuses
    )
    out = {
        "cpu_ns": 0,            # executorCpuTime: CPU, steal-immune
        "run_ms": 0,            # executorRunTime: wall across tasks
        "stage_shuffle_write_bytes": 0,   # post-compression, executed
        "stage_shuffle_write_records": 0,
        "stage_spill_bytes": 0,
        "n_stages": 0,
        "n_tasks": 0,
    }
    it = stages.iterator()
    while it.hasNext():
        s = it.next()
        out["cpu_ns"] += s.executorCpuTime()
        out["run_ms"] += s.executorRunTime()
        out["stage_shuffle_write_bytes"] += s.shuffleWriteBytes()
        out["stage_shuffle_write_records"] += s.shuffleWriteRecords()
        out["stage_spill_bytes"] += s.diskBytesSpilled()
        out["n_stages"] += 1
        out["n_tasks"] += s.numCompleteTasks() + s.numFailedTasks()
    # jobs are the driver-side scheduling unit: each one is an action
    # round-trip (job submit, DAG build, stage wake-ups). At sf0.1 the
    # headline set is overhead-dominated (VERDICT r11: 16.5 s wall vs
    # 6.8 cpu-s over 32 cores), so JOB COUNT per query is the lever
    # wall-clock still responds to when bytes and cpu are flat.
    out["n_jobs"] = sc._jsc.sc().statusStore().jobsList(
        jvm.java.util.ArrayList()
    ).size()
    return out


def stage_delta(spark: SparkSession, before: dict[str, int]) -> dict[str, int | float]:
    """Snapshot again and return the per-query attribution:
    ``cpu_seconds`` (float, from executorCpuTime nanos) plus the raw
    stage-level byte/record/spill deltas.

    ``cpu_seconds`` counts JVM task-thread CPU ONLY — a stage feeding
    Python workers (mapInPandas / Arrow UDFs) blocks its JVM thread,
    which accrues to ``run_seconds`` (executorRunTime), not CPU. For
    Python-stage queries cite both: cpu_seconds for the JVM side,
    run_seconds (steal-affected but complete) for the Python side."""
    after = stage_snapshot(spark)
    d = {k: after[k] - before[k] for k in before}
    d["cpu_seconds"] = round(d.pop("cpu_ns") / 1e9, 4)
    d["run_seconds"] = round(d.pop("run_ms") / 1e3, 4)
    return d


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
