"""Incremental aggregate maintenance: increments must compose exactly —
any batching, any arrival order, same result as one full recompute."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import incr

SF_DIR = "/root/testdata/sf0.001"
KEYS = ["event_type"]


def _final(spark, batches):
    state = None
    for b in batches:
        state = incr.merge_group_stats(
            state, incr.partial_group_stats(b, KEYS, "value"), KEYS
        )
    return {
        r.event_type: (r.sum_value, r.n_rows, r.avg_value)
        for r in incr.finalize_group_stats(state).collect()
    }


def test_increments_compose_exactly_any_batching_any_order(spark):
    ev = load_table(spark, SF_DIR, "events")
    want = _final(spark, [ev])
    assert len(want) > 1

    for k in (2, 5):
        parts = [ev.filter(F.col("event_id") % k == i) for i in range(k)]
        assert _final(spark, parts) == want
        assert _final(spark, list(reversed(parts))) == want


def test_empty_delta_is_identity(spark):
    ev = load_table(spark, SF_DIR, "events")
    empty = ev.filter(F.lit(False))
    state = incr.partial_group_stats(ev, KEYS, "value")
    merged = incr.merge_group_stats(
        state, incr.partial_group_stats(empty, KEYS, "value"), KEYS
    )
    a = {tuple(r) for r in incr.finalize_group_stats(state).collect()}
    b = {tuple(r) for r in incr.finalize_group_stats(merged).collect()}
    assert a == b
