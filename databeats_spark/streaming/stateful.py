"""Custom stateful streaming operator — arbitrary per-key state with
``applyInPandasWithState`` (the escape hatch for streaming semantics
that windowed aggregations can't express; brief: "custom stateful
operators").

Demonstrated operator: lifetime per-user running totals that survive
across micro-batches and restarts (checkpointed state store). Each
batch updates only the keys it saw; emitted rows are the refreshed
totals (update semantics)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user lifetime totals with explicit keyed state."""
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- transformWithStateInPandas: the Spark 4 successor API ------------
# Same operator family, richer state model: named state variables
# (here a MapState keyed by event_type plus a ValueState grand total)
# instead of one monolithic state tuple, optional per-state TTL and
# timers. Kept alongside applyInPandasWithState so both custom-
# stateful surfaces stay exercised.
#
# RUNTIME REQUIREMENT: the transformWithState Python state server
# speaks protobuf; environments without the ``protobuf`` package (this
# image lacks it) fail at query start with STREAMING_PYTHON_RUNNER_
# INITIALIZATION_FAILURE. The operator is still importable/composable
# everywhere; its end-to-end test auto-skips where protobuf is absent
# (same guarded-dependency pattern as the SparkXGBRegressor branch).

def has_transform_with_state_runtime() -> bool:
    """True when the protobuf runtime the state server needs exists."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False

TYPED_OUTPUT_SCHEMA = "user_id long, event_type string, n_events long, user_total long"


class UserTypeCounts(StatefulProcessor):
    """Lifetime per-(user, event_type) counts with a per-user total.

    Emits one row per event_type seen in the micro-batch, carrying the
    refreshed lifetime count for that type and the user's grand total
    across all types (update semantics)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._by_type = handle.getMapState("by_type", "event_type string", "n long")
        self._total = handle.getValueState("total", "n long")

    def handleInputRows(self, key, rows, timerValues):  # noqa: N802 (API name)
        batch_counts: dict[str, int] = {}
        for pdf in rows:
            for etype, n in pdf.groupby("event_type").size().items():
                batch_counts[etype] = batch_counts.get(etype, 0) + int(n)
        total = (self._total.get()[0] if self._total.exists() else 0) + sum(
            batch_counts.values()
        )
        self._total.update((total,))
        out = []
        for etype, n in sorted(batch_counts.items()):
            lifetime = n + (
                self._by_type.getValue((etype,))[0]
                if self._by_type.containsKey((etype,))
                else 0
            )
            self._by_type.updateValue((etype,), (lifetime,))
            out.append((key[0], etype, lifetime, total))
        yield pd.DataFrame(
            out, columns=["user_id", "event_type", "n_events", "user_total"]
        )

    def close(self) -> None:
        pass


def running_user_type_counts(events: DataFrame) -> DataFrame:
    """Streaming per-(user, event_type) lifetime counts — the
    transformWithStateInPandas surface (named MapState + ValueState)."""
    return (
        events.select("user_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            UserTypeCounts(),
            outputStructType=TYPED_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
