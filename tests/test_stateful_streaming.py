"""applyInPandasWithState: per-user running totals must survive across
micro-batches (state accumulates) and match the batch aggregate."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.stateful import (
    running_user_totals,
)

SF_DIR = "/root/testdata/sf0.001"


def test_running_totals_accumulate_across_batches(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    half1 = events.filter(F.col("event_id") % 2 == 0)
    half2 = events.filter(F.col("event_id") % 2 == 1)
    half1.write.parquet(src, mode="append")

    def drain(out_dir):
        # memory sink can't recover from a checkpoint — foreachBatch can.
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            running_user_totals(stream)
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda df, epoch: df.write.mode("append").parquet(out_dir)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    out1 = str(tmp_path / "out1")
    drain(out1)
    mid = {
        r.user_id: (r.n_events, round(r.total_value, 2))
        for r in spark.read.parquet(out1).collect()
    }
    want_mid = {
        r.user_id: (r.n, round(r.t, 2))
        for r in half1.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert mid == want_mid

    half2.write.parquet(src, mode="append")
    out2 = str(tmp_path / "out2")
    drain(out2)
    # second drain's output reflects state carried over from drain 1
    # plus the new batch.
    final = {
        r.user_id: (r.n_events, round(r.total_value, 2))
        for r in spark.read.parquet(out2).collect()
    }
    want_final = {
        r.user_id: (r.n, round(r.t, 2))
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert final == want_final


def test_transform_with_state_equals_v1_api(spark, tmp_path):
    """transformWithStateInPandas twin: same cross-batch accumulation
    semantics as the applyInPandasWithState operator and the batch
    GROUP BY ground truth. Skips where google.protobuf (Spark's
    transformWithState protocol dependency) is absent — the operator
    itself fail-fasts with a clear message there (also asserted)."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.stateful import (
        running_user_totals_tws,
    )

    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        events = load_table(spark, SF_DIR, "events")
        with pytest.raises(ImportError, match="protobuf"):
            running_user_totals_tws(
                spark.readStream.schema(events.schema).parquet(str(tmp_path))
            )
        pytest.skip("google.protobuf not installed in this environment")

    events = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    half1 = events.filter(F.col("event_id") % 2 == 0)
    half2 = events.filter(F.col("event_id") % 2 == 1)
    half1.write.parquet(src, mode="append")

    def drain(out_dir):
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            running_user_totals_tws(stream)
            .writeStream.outputMode("update")
            .foreachBatch(lambda df, epoch: df.write.mode("append").parquet(out_dir))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    out1 = str(tmp_path / "out1")
    drain(out1)
    mid = {
        r.user_id: (r.n_events, round(r.total_value, 2))
        for r in spark.read.parquet(out1).collect()
    }
    want_mid = {
        r.user_id: (r.n, round(r.t, 2))
        for r in half1.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert mid == want_mid

    half2.write.parquet(src, mode="append")
    out2 = str(tmp_path / "out2")
    drain(out2)
    final = {
        r.user_id: (r.n_events, round(r.total_value, 2))
        for r in spark.read.parquet(out2).collect()
    }
    want_final = {
        r.user_id: (r.n, round(r.t, 2))
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert final == want_final
