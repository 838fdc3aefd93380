"""CDC query family: the reference's core semantics as oracle-checked
queries over the derived changelog (SURVEY.md §2 F1-F3, A2, A4, P6-P8).

Every query here has a DuckDB-runnable ANSI mirror in ``ORACLES``;
the incremental-merge entry deliberately shares the full-load oracle —
that IS the reference's central invariant (incremental ≡ full-load,
SURVEY.md §5 item 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import cdc
from ..operators.coerce import drift_union
from .changelog import CHANGELOG_SQL, changelog_from_events

# Deterministic batch split for incremental tests (FIXTURES.md): batch 1
# is everything before the cutoff, batch 2 the rest.
SPLIT_TS = "2024-01-16 00:00:00"

OUT_COLS = [
    "systemid",
    "systemmodifiedat",
    "event_id",
    "event_type",
    "value",
    "props",
]

TIE = ("event_id",)


def _changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    return changelog_from_events(load_table(spark, sf_dir, "events"))


def cdc_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-load resolution: soft-delete anti-filter + latest-per-key."""
    return cdc.resolve_snapshot(_changelog(spark, sf_dir), tie_breakers=TIE).select(OUT_COLS)


def cdc_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window dedup alone (A2): newest version per key, deletes included."""
    return cdc.latest_version_per_key(_changelog(spark, sf_dir), tie_breakers=TIE).select(
        "systemid", "systemmodifiedat", "event_id", "event_type"
    )


def cdc_soft_delete_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-filter alone (F1): every surviving row version."""
    return cdc.filter_soft_deletes(_changelog(spark, sf_dir)).select(
        "systemid", "event_id", "event_type", "value"
    )


def cdc_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay: resolve(batch1) merged with batch2 == resolve(all).

    Shares ``cdc_snapshot``'s oracle — the incremental ≡ full-load
    invariant the reference asserts by having both paths (E2 vs E3).
    """
    log = _changelog(spark, sf_dir)
    batch1 = log.filter(F.col("systemmodifiedat") < SPLIT_TS)
    batch2 = log.filter(
        F.col("systemmodifiedat").isNull() | (F.col("systemmodifiedat") >= SPLIT_TS)
    )
    snapshot = cdc.resolve_snapshot(batch1, tie_breakers=TIE)
    return cdc.merge_cdc(snapshot, batch2, tie_breakers=TIE).select(OUT_COLS)


def cdc_schema_drift_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift union (P6-P8/A4): delta gains a column, snapshot keeps one
    the delta lost; align + unionByName, NULL-filled on each side."""
    log = _changelog(spark, sf_dir)
    snapshot = log.filter(F.col("systemmodifiedat") < SPLIT_TS).select(
        "systemid", "event_id", "value", "props"
    )
    delta = (
        log.filter(F.col("systemmodifiedat") >= SPLIT_TS)
        .select("systemid", "event_id", "value")
        .withColumn("value_x2", F.col("value") * 2)
    )
    return drift_union(delta, snapshot).select(
        "systemid", "event_id", "value", "value_x2", "props"
    )


QUERIES = {
    "cdc_snapshot": cdc_snapshot,
    "cdc_latest_per_key": cdc_latest_per_key,
    "cdc_soft_delete_filter": cdc_soft_delete_filter,
    "cdc_incremental_merge": cdc_incremental_merge,
    "cdc_schema_drift_union": cdc_schema_drift_union,
}

_RESOLVE_SQL = f"""
WITH changelog AS ({CHANGELOG_SQL}),
deleted AS (
  SELECT DISTINCT systemid FROM changelog
  WHERE systemcreatedat IS NULL AND systemmodifiedat IS NULL
    AND systemcreatedby = '{cdc.ZERO_GUID}' AND systemmodifiedby = '{cdc.ZERO_GUID}'
),
survivors AS (
  SELECT * FROM changelog WHERE systemid NOT IN (SELECT systemid FROM deleted)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY systemid
    ORDER BY systemmodifiedat DESC NULLS LAST, event_id DESC NULLS LAST
  ) AS rn
  FROM survivors
)
SELECT systemid, systemmodifiedat, event_id, event_type, value, props
FROM ranked WHERE rn = 1
"""

ORACLES = {
    "cdc_snapshot": _RESOLVE_SQL,
    "cdc_incremental_merge": _RESOLVE_SQL,
    "cdc_latest_per_key": f"""
WITH changelog AS ({CHANGELOG_SQL}),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY systemid
    ORDER BY systemmodifiedat DESC NULLS LAST, event_id DESC NULLS LAST
  ) AS rn
  FROM changelog
)
SELECT systemid, systemmodifiedat, event_id, event_type
FROM ranked WHERE rn = 1
""",
    "cdc_soft_delete_filter": f"""
WITH changelog AS ({CHANGELOG_SQL})
SELECT systemid, event_id, event_type, value
FROM changelog
WHERE systemid NOT IN (
  SELECT DISTINCT systemid FROM changelog
  WHERE systemcreatedat IS NULL AND systemmodifiedat IS NULL
    AND systemcreatedby = '{cdc.ZERO_GUID}' AND systemmodifiedby = '{cdc.ZERO_GUID}'
)
""",
    "cdc_schema_drift_union": f"""
WITH changelog AS ({CHANGELOG_SQL}),
snapshot AS (
  SELECT systemid, event_id, value, props FROM changelog
  WHERE systemmodifiedat < '{SPLIT_TS}'
),
delta AS (
  SELECT systemid, event_id, value, value * 2 AS value_x2 FROM changelog
  WHERE systemmodifiedat >= '{SPLIT_TS}'
)
SELECT systemid, event_id, value, value_x2, CAST(NULL AS VARCHAR) AS props FROM delta
UNION ALL
SELECT systemid, event_id, value, CAST(NULL AS DOUBLE) AS value_x2, props FROM snapshot
""",
}
