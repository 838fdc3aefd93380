"""Time-series resampling: regularize an event stream onto a fixed
grid and gap-fill.

The reference's event data arrives as irregular CDC batches keyed by
creation time (``incremental_etl_v1.py:73-74``); downstream analytics
(and feature pipelines feeding models) want a REGULAR series per key —
one row per (key, bucket) even for buckets with no events, with carried-
forward values. This is the classic resample + forward-fill.

Shape: one groupBy for the per-bucket aggregate, one groupBy for the
per-key bounds, a partition-local ``sequence``-explode to build the
spine (rows generated where the key already lives — no extra shuffle
beyond the bounds agg), a co-partitioned left join, and ONE window pass
for the fill. The window is partitioned by key — never a
SinglePartition sort. At 100 TB the spine size is bounded by
(#keys x horizon/step), independent of event count, and the fill
window state is one value per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.portable import davg


_UNIT_STEP = {
    "minute": "1 minute",
    "hour": "1 hour",
    "day": "1 day",
    "week": "1 week",
    "month": "1 month",
}


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    unit: str = "hour",
) -> DataFrame:
    """Per ``key_col``, one row per ``unit`` bucket spanning
    [trunc(min ts), trunc(max ts)]; buckets with no events get
    ``n_events = 0`` and the most recent preceding bucket's average
    value (forward fill). Returns (key, bucket_start, n_events,
    avg_value_ffill).

    The spine step is DERIVED from the truncation unit (one ``unit``
    per bucket) rather than accepted separately: a free-form step that
    disagrees with the truncation (e.g. '2 hours' against hour-trunc)
    would make odd buckets unreachable by the join and silently drop
    their events.

    The first bucket of every key holds that key's earliest event, so
    the fill never reads an all-NULL prefix. The per-bucket average is
    an exact decimal-sum average (functions/portable.py) so the carried
    value is engine- and partitioning-deterministic.
    """
    if unit not in _UNIT_STEP:
        raise ValueError(
            f"unit={unit!r}: must be one of {sorted(_UNIT_STEP)} so the "
            "spine step matches the bucket truncation exactly"
        )
    trunc_unit, step = unit, _UNIT_STEP[unit]
    bucket = F.date_trunc(trunc_unit, F.col(ts_col))
    hourly = df.groupBy(
        F.col(key_col).alias("key"), bucket.alias("bucket_start")
    ).agg(
        F.count("*").alias("n_in_bucket"),
        davg(val_col).alias("avg_in_bucket"),
    )
    bounds = df.groupBy(F.col(key_col).alias("key")).agg(
        F.date_trunc(trunc_unit, F.min(ts_col)).alias("lo"),
        F.date_trunc(trunc_unit, F.max(ts_col)).alias("hi"),
    )
    spine = bounds.select(
        "key",
        F.explode(
            F.sequence("lo", "hi", F.expr(f"INTERVAL {step}"))
        ).alias("bucket_start"),
    )
    joined = spine.join(hourly, ["key", "bucket_start"], "left")
    fill_w = (
        Window.partitionBy("key")
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "key",
        "bucket_start",
        F.coalesce("n_in_bucket", F.lit(0)).alias("n_events"),
        F.last("avg_in_bucket", ignorenulls=True)
        .over(fill_w)
        .alias("avg_value_ffill"),
    )
