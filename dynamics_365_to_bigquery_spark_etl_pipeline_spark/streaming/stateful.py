"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §7.1 Tier B: "custom stateful operators").

``running_user_totals`` keeps per-user state (event count, value sum,
last-seen event time) across micro-batches and emits one updated row
per user per batch — the building block for online feature stores /
monitoring counters that tumbling windows can't express (state lives
across windows, not within one).

Scale notes: state is partitioned by the group key and stored in the
streaming state store (RocksDB-backed on a real cluster) — per-key
state is O(1) here, so total state is O(#users) regardless of stream
length. Arrow batches in/out, no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, last_seen timestamp"
)
STATE_SCHEMA = "n long, total double, last_seen timestamp"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming DataFrame in -> per-user running totals out (update
    semantics: one row per user per micro-batch that touched it).

    NB: the state function is a CLOSURE, not a module-level function —
    cloudpickle then ships it by value, so Python workers don't need
    this package importable on their own sys.path (the driver may be
    launched from any cwd)."""

    def update_user(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total, last_seen = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = pdf["ts"].max()
            last_seen = batch_max if last_seen is None else max(last_seen, batch_max)
        state.update((n, total, last_seen))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "last_seen": [last_seen],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """``running_user_totals`` on Spark 4's ``transformWithStateInPandas``
    — the successor stateful API (SPARK-49560 "arbitrary stateful
    processing v2"): typed named state slots (value/list/map) on a
    handle instead of one opaque tuple, per-state TTL, timers, and
    initial-state bootstrap. Output is identical to the
    ``applyInPandasWithState`` twin (tested), so the two pin each other.

    Why carry both: applyInPandasWithState is the long-stable API;
    transformWithState is where new state features land (TTL eviction
    matters at 100 TB — per-user state otherwise grows with the user
    universe forever, and the v1 API can only expire state via manual
    timeout bookkeeping).

    ENVIRONMENT GATE: Spark's transformWithState state protocol runs
    over protobuf (``pyspark.sql.streaming.proto.StateMessage_pb2``),
    so the operator needs ``google.protobuf`` in BOTH the driver's and
    the executors' Python environments. The guard below probes only
    the DRIVER env (cheap and synchronous — it catches the
    whole-machine-missing case, like this container, with a clear
    message instead of the opaque "driver worker exited unexpectedly"
    mid-stream crash); a cluster whose executor images lack protobuf
    while the driver has it will still fail at stream start — keep
    driver and executor images in lockstep, as with any Python dep.
    The v1 twin above covers the semantics everywhere (their outputs
    are asserted equal where protobuf is available — the test skips
    itself otherwise).

    The processor CLASS is defined inside this function on purpose: a
    module-level class ships by reference and breaks Python workers
    launched from a non-repo cwd (same closure rule as every other
    worker-shipped function in this repo)."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment-specific
        raise ImportError(
            "transformWithStateInPandas requires google.protobuf (Spark's "
            "state-protocol dependency); install protobuf or use the "
            "applyInPandasWithState twin running_user_totals"
        ) from exc
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, total, last_seen = (
                self._state.get() if self._state.exists() else (0, 0.0, None)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                batch_max = pdf["ts"].max()
                last_seen = (
                    batch_max if last_seen is None else max(last_seen, batch_max)
                )
            self._state.update((n, total, last_seen))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "last_seen": [last_seen],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        _RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
