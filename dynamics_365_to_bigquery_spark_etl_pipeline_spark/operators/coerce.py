"""Type-coercion and schema-drift policies (SURVEY.md P6-P10).

The reference stringifies every date/timestamp column to
``yyyy-MM-dd HH:mm:ss`` (``helper_functions.py:25-52``) and hand-aligns
schemas before a positional ``unionAll`` (``incremental_etl_v1.py:119-145``).
Both are re-expressed as single-``select`` projections so the plan size
stays O(1) in column count, and the union becomes ``unionByName``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TEMPORAL_FMT = "yyyy-MM-dd HH:mm:ss"


def stringify_temporal(df: DataFrame) -> DataFrame:
    """Date/Timestamp columns -> canonical ``yyyy-MM-dd HH:mm:ss`` strings.

    One projection for all columns (the reference loops ``withColumn``,
    ``helper_functions.py:26-52``). Lexical order of the canonical format
    matches temporal order, so downstream ORDER BY semantics survive.
    """
    temporal = {
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.DateType, T.TimestampType, T.TimestampNTZType))
    }
    if not temporal:
        return df
    return df.select(
        [
            F.date_format(c, TEMPORAL_FMT).alias(c) if c in temporal else F.col(c)
            for c in df.columns
        ]
    )


def conform_to_types(df: DataFrame, target: dict[str, T.DataType]) -> DataFrame:
    """Cast any column present in ``target`` to the target type
    (``incremental_etl_v1.py:139-143``), as one projection."""
    return df.select(
        [F.col(c).cast(target[c]).alias(c) if c in target else F.col(c) for c in df.columns]
    )


def align_for_union(delta: DataFrame, snapshot: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Schema-drift alignment (``incremental_etl_v1.py:119-145``):

    - union of the two column sets, missing columns added as NULL,
    - canonical order = delta's columns first then snapshot-only columns,
    - delta columns cast to the snapshot's type where both exist.

    Returns the two aligned frames; union them with ``unionByName``.
    """
    snap_types = {f.name: f.dataType for f in snapshot.schema.fields}
    delta_cols, snap_cols = delta.columns, set(snapshot.columns)
    order = list(delta_cols) + [c for c in snapshot.columns if c not in set(delta_cols)]

    def project(df: DataFrame, own: set[str], cast_to_snapshot: bool) -> DataFrame:
        cols = []
        for c in order:
            if c not in own:
                typ = snap_types.get(c, T.StringType())
                cols.append(F.lit(None).cast(typ).alias(c))
            elif cast_to_snapshot and c in snap_types:
                cols.append(F.col(c).cast(snap_types[c]).alias(c))
            else:
                cols.append(F.col(c))
        return df.select(cols)

    return (
        project(delta, set(delta_cols), cast_to_snapshot=True),
        project(snapshot, snap_cols, cast_to_snapshot=False),
    )


def drift_union(delta: DataFrame, snapshot: DataFrame) -> DataFrame:
    left, right = align_for_union(delta, snapshot)
    return left.unionByName(right)
