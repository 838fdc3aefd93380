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
