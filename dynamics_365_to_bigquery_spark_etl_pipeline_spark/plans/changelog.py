"""Dynamics-style CDC changelog derived from the ``events`` fixture.

FIXTURES.md's "Derived CDC fixture": reinterpret ``events`` as a
bc2adls-shaped changelog so the reference's core semantics (soft-delete
sentinel, latest-per-key, drift union — SURVEY.md §1.2) can be exercised
and oracle-checked on driver-provided data. The projection is
deterministic and mirrored 1:1 by ANSI SQL in plans/oracles.py.

Mapping (shared constants below — keep in sync with CHANGELOG_SQL):
- ``systemid``        = ``cast(user_id as string)`` (~15 keys per 1k
  events at every scale factor)
- delete sentinel     = ``event_type = 'error' AND event_id % DELETE_MOD = 0``
  (rare — ~2 of 15 keys at sf0.001, 4/150 at sf0.01, 33/1500 at sf0.1 —
  so most keys survive; a key with any sentinel row is dropped entirely,
  mirroring ``helper_functions.py:143-151``)
- ``systemmodifiedat``/``systemcreatedat`` = ``date_format(ts, canonical)``,
  NULL on sentinel rows (string per the coercion policy,
  ``helper_functions.py:40-52``)
- created/modified GUIDs = zero-GUID on sentinel rows else a fixed GUID
- payload columns     = ``event_type``, ``value``, ``props``; ``event_id``
  kept as the deterministic tie-breaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.cdc import ZERO_GUID
from ..operators.coerce import TEMPORAL_FMT

DELETE_MOD = 499
LIVE_GUID = "{11111111-1111-1111-1111-111111111111}"


def changelog_from_events(events: DataFrame) -> DataFrame:
    is_delete = (F.col("event_type") == "error") & (F.col("event_id") % DELETE_MOD == 0)
    ts_str = F.date_format("ts", TEMPORAL_FMT)
    return events.select(
        F.col("user_id").cast("string").alias("systemid"),
        F.when(is_delete, F.lit(None)).otherwise(ts_str).alias("systemcreatedat"),
        F.when(is_delete, F.lit(None)).otherwise(ts_str).alias("systemmodifiedat"),
        F.when(is_delete, F.lit(ZERO_GUID)).otherwise(F.lit(LIVE_GUID)).alias("systemcreatedby"),
        F.when(is_delete, F.lit(ZERO_GUID)).otherwise(F.lit(LIVE_GUID)).alias("systemmodifiedby"),
        "event_id",
        "event_type",
        "value",
        "props",
    )


# ANSI-SQL mirror of changelog_from_events for the DuckDB oracle.
CHANGELOG_SQL = f"""
SELECT
  CAST(user_id AS VARCHAR) AS systemid,
  CASE WHEN event_type = 'error' AND event_id % {DELETE_MOD} = 0 THEN NULL
       ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END AS systemcreatedat,
  CASE WHEN event_type = 'error' AND event_id % {DELETE_MOD} = 0 THEN NULL
       ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END AS systemmodifiedat,
  CASE WHEN event_type = 'error' AND event_id % {DELETE_MOD} = 0
       THEN '{ZERO_GUID}' ELSE '{LIVE_GUID}' END AS systemcreatedby,
  CASE WHEN event_type = 'error' AND event_id % {DELETE_MOD} = 0
       THEN '{ZERO_GUID}' ELSE '{LIVE_GUID}' END AS systemmodifiedby,
  event_id,
  event_type,
  value,
  props
FROM events
"""
