"""Structured Streaming tests: file-source CDC merge via foreachBatch
(availableNow drains synchronously), streaming ≡ batch equivalence, and
watermarked tumbling/session window aggregations on the events fixture.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import cdc
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.plans.changelog import (
    changelog_from_events,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.cdc_stream import (
    stream_cdc_merge,
    stream_session_counts,
    stream_tumbling_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def changelog(spark):
    return changelog_from_events(load_table(spark, SF_DIR, "events"))


def test_stream_cdc_merge_equals_batch(spark, tmp_path, changelog):
    """Drain the changelog through the streaming merge in two micro-
    batches; the final sink must equal the batch full-load snapshot."""
    source = tmp_path / "source"
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    # Split so delete sentinels are terminal for their key (the
    # incremental ≡ full-load invariant's precondition — a re-insert
    # after a delete diverges between the two paths BY DESIGN; see
    # tests/test_incremental_property.py). Sentinels have NULL
    # systemmodifiedat, so the second batch takes them all.
    split = "2024-01-16 00:00:00"
    b1 = changelog.filter(F.col("systemmodifiedat") < split)
    b2 = changelog.filter(
        F.col("systemmodifiedat").isNull() | (F.col("systemmodifiedat") >= split)
    )
    b1.write.parquet(str(source), mode="append")

    q = stream_cdc_merge(
        spark, str(source), changelog.schema, sink, ckpt, tie_breakers=("event_id",)
    )
    q.awaitTermination(120)

    b2.write.parquet(str(source), mode="append")
    q2 = stream_cdc_merge(
        spark, str(source), changelog.schema, sink, ckpt, tie_breakers=("event_id",)
    )
    q2.awaitTermination(120)

    got = {
        tuple(r)
        for r in spark.read.parquet(sink)
        .select("systemid", "event_id", "value")
        .collect()
    }
    want = {
        tuple(r)
        for r in cdc.resolve_snapshot(changelog, tie_breakers=("event_id",))
        .select("systemid", "event_id", "value")
        .collect()
    }
    assert got == want and len(got) > 0


def test_stream_cdc_merge_null_keys_equal_batch(spark, tmp_path, changelog):
    """NULL-key rows must not accumulate one-per-microbatch: the
    delta-only merge routes snapshot NULL-key rows into the re-resolved
    side, so draining NULL-key rows across several micro-batches leaves
    exactly one — same as the batch resolve."""
    source = tmp_path / "source"
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    split = "2024-01-16 00:00:00"
    nulled = changelog.withColumn(
        "systemid",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("systemid")
        ),
    )
    b1 = nulled.filter(F.col("systemmodifiedat") < split)
    b2 = nulled.filter(
        F.col("systemmodifiedat").isNull() | (F.col("systemmodifiedat") >= split)
    )
    assert b1.filter(F.col("systemid").isNull()).count() > 0
    assert b2.filter(F.col("systemid").isNull()).count() > 0

    for batch in (b1, b2):
        batch.write.parquet(str(source), mode="append")
        stream_cdc_merge(
            spark, str(source), nulled.schema, sink, ckpt, tie_breakers=("event_id",)
        ).awaitTermination(120)

    result = spark.read.parquet(sink)
    assert result.filter(F.col("systemid").isNull()).count() == 1
    got = {
        tuple(r)
        for r in result.select("systemid", "event_id", "value").collect()
    }
    want = {
        tuple(r)
        for r in cdc.resolve_snapshot(nulled, tie_breakers=("event_id",))
        .select("systemid", "event_id", "value")
        .collect()
    }
    assert got == want and len(got) > 0


def test_stream_sink_single_write_per_microbatch(spark, tmp_path, changelog):
    """Each micro-batch publishes exactly ONE new version through the
    pointer sink — no staging rewrite (the r2 double-write is gone):
    after two drains there are exactly 2 retained versions, the pointer
    resolves to the newest, and no __staging dir exists."""
    import os

    source = tmp_path / "source"
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    split = "2024-01-16 00:00:00"
    b1 = changelog.filter(F.col("systemmodifiedat") < split)
    b2 = changelog.filter(
        F.col("systemmodifiedat").isNull() | (F.col("systemmodifiedat") >= split)
    )

    b1.write.parquet(str(source), mode="append")
    stream_cdc_merge(
        spark, str(source), changelog.schema, sink, ckpt, tie_breakers=("event_id",)
    ).awaitTermination(120)
    assert os.path.islink(sink)
    assert sorted(os.listdir(sink + "__versions")) == ["v_000001"]

    b2.write.parquet(str(source), mode="append")
    stream_cdc_merge(
        spark, str(source), changelog.schema, sink, ckpt, tie_breakers=("event_id",)
    ).awaitTermination(120)
    assert sorted(os.listdir(sink + "__versions")) == ["v_000001", "v_000002"]
    assert os.path.realpath(sink) == os.path.realpath(
        os.path.join(sink + "__versions", "v_000002")
    )
    assert not os.path.exists(sink + "__staging")


def test_stream_cdc_merge_csv_leg_equals_batch(spark, tmp_path, changelog):
    """The reference's landing format is CSV (helper_functions.py:115):
    drain the changelog through stream_cdc_merge(fmt='csv') in two
    micro-batches and compare against the batch full-load snapshot.
    (props is a map column — not CSV-representable — so the CSV leg
    runs on the scalar projection.)"""
    flat = changelog.drop("props")
    source = tmp_path / "source"
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    split = "2024-01-16 00:00:00"
    b1 = flat.filter(F.col("systemmodifiedat") < split)
    b2 = flat.filter(
        F.col("systemmodifiedat").isNull() | (F.col("systemmodifiedat") >= split)
    )

    b1.write.options(header=True).csv(str(source), mode="append")
    stream_cdc_merge(
        spark, str(source), flat.schema, sink, ckpt,
        tie_breakers=("event_id",), fmt="csv",
    ).awaitTermination(120)
    b2.write.options(header=True).csv(str(source), mode="append")
    stream_cdc_merge(
        spark, str(source), flat.schema, sink, ckpt,
        tie_breakers=("event_id",), fmt="csv",
    ).awaitTermination(120)

    got = {
        tuple(r)
        for r in spark.read.parquet(sink)
        .select("systemid", "event_id", "value")
        .collect()
    }
    want = {
        tuple(r)
        for r in cdc.resolve_snapshot(flat, tie_breakers=("event_id",))
        .select("systemid", "event_id", "value")
        .collect()
    }
    assert got == want and len(got) > 0


def test_stream_tumbling_equals_batch(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "ev")
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = stream_tumbling_counts(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        tuple(r) for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    want = {
        tuple(r)
        for r in events.groupBy(
            F.window("ts", "1 hour").start.alias("hour_start"), "event_type"
        )
        .agg(F.count("*").alias("n_events"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_stream_dedup_drops_replayed_rows(spark, tmp_path):
    """Replaying the same events file twice through the watermarked
    streaming dedup yields each event exactly once."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.cdc_stream import (
        stream_dedup,
    )

    events = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    events.write.parquet(src, mode="append")
    events.write.parquet(src, mode="append")  # full duplicate replay

    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        stream_dedup(stream)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, e: df.write.mode("append").parquet(out))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out)
    assert got.count() == events.count()
    assert got.select("event_id").distinct().count() == events.count()


def test_stream_session_window_runs(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "ev")
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = stream_session_counts(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("session_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM session_out").collect()
    assert len(rows) > 0
    total = sum(r.n_events for r in rows)
    assert total == events.count()
    assert all(r.session_end > r.session_start for r in rows)


def test_stream_stream_join_equals_batch(spark, tmp_path):
    """Watermarked stream-stream self-join (click -> error within 30
    min per user) drained with availableNow equals the static join.
    Inner join + append mode emits rows as both sides' watermarks pass,
    so a full drain must produce exactly the batch result."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.cdc_stream import (
        stream_stream_join,
    )

    events = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "ev")
    events.write.parquet(src)

    def legs(df):
        return (
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "error"),
        )

    stream = spark.readStream.schema(events.schema).parquet(src)
    l, r = legs(stream)
    q = (
        stream_stream_join(l, r)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {tuple(r_) for r_ in spark.sql("SELECT * FROM ssj_out").collect()}
    bl, br = legs(events)
    want = {tuple(r_) for r_ in stream_stream_join(bl, br).collect()}
    assert got == want and len(got) > 0


def test_stream_restart_without_new_files_publishes_nothing(spark, tmp_path, changelog):
    """Exactly-once across restarts: the checkpoint's file-source
    offsets must stop a restarted query from reprocessing already-
    merged files — a third start with no new input publishes NO new
    sink version (reprocessing would re-merge and re-publish)."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark import sinks

    source = tmp_path / "source"
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    changelog.write.parquet(str(source), mode="append")

    q = stream_cdc_merge(
        spark, str(source), changelog.schema, sink, ckpt, tie_breakers=("event_id",)
    )
    q.awaitTermination(120)
    v_before = sinks.current_version_path(sink)
    assert v_before is not None

    q2 = stream_cdc_merge(
        spark, str(source), changelog.schema, sink, ckpt, tie_breakers=("event_id",)
    )
    q2.awaitTermination(120)
    assert sinks.current_version_path(sink) == v_before


def test_stream_stream_outer_join_semantics(spark, tmp_path):
    """Left-outer watermarked stream-stream join, drained with
    availableNow:

    1. the matched rows equal the batch inner join exactly;
    2. every null-extended row is a genuinely unmatched left event;
    3. every unmatched left event whose join bound the query's FINAL
       watermark provably passed HAS emitted its null row — while
       later unmatched events legitimately still sit in state (the
       end-of-stream caveat the operator documents; note the final
       watermark itself lags the last batch's max event time by one
       batch, so it is read from query progress, not computed from
       the data).
    """
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.cdc_stream import (
        stream_stream_join_outer,
    )

    events = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "ev")
    events.write.parquet(src)

    def legs(df):
        return (
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "error"),
        )

    stream = spark.readStream.schema(events.schema).parquet(src)
    l, r = legs(stream)
    q = (
        stream_stream_join_outer(l, r)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ssjo_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = [tuple(r_) for r_ in spark.sql("SELECT * FROM ssjo_out").collect()]
    got_matched = {t for t in got if t[3] is not None}
    got_null_left = {t[1] for t in got if t[3] is None}

    bl, br = legs(events)
    batch = stream_stream_join_outer(bl, br).collect()
    want_matched = {tuple(r_) for r_ in batch if r_.r_event_id is not None}
    want_null = {r_.l_event_id: r_.l_ts for r_ in batch if r_.r_event_id is None}

    assert got_matched == want_matched and len(got_matched) > 0

    # no spurious nulls: a null-extended emit must be batch-unmatched
    assert got_null_left <= set(want_null)

    # completeness below the final watermark horizon: a left row is
    # provably closed once l_ts + 30min (its join bound) is behind the
    # final committed watermark
    import datetime as dt

    wm = dt.datetime.fromisoformat(
        q.lastProgress["eventTime"]["watermark"].replace("Z", "")
    )
    horizon = wm - dt.timedelta(minutes=30)
    overdue = {eid for eid, lts in want_null.items() if lts < horizon}
    assert overdue and overdue <= got_null_left


def test_stream_static_enrichment_equals_batch(spark, tmp_path):
    """Stream-static join (the remaining §2.6 join shape): a streaming
    fact leg enriched by a STATIC broadcast dimension needs no
    watermark and no join state — each micro-batch joins against the
    static side directly. Drained result must equal the batch join, and
    the static side must plan as a broadcast, not a shuffle."""
    events = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "ev")
    events.write.parquet(src)

    # static dim: per-user segment derived once (stands in for the
    # reference's master-data lookup)
    dim = (
        events.groupBy("user_id")
        .agg(F.count("*").alias("n_total"))
        .withColumn("segment", (F.col("n_total") % 3).cast("int"))
        .select("user_id", "segment")
    )

    def enrich(df):
        return df.join(F.broadcast(dim), "user_id").select(
            "event_id", "user_id", "segment"
        )

    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        enrich(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sse_out")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not drain within 120 s"

    got = {tuple(r) for r in spark.sql("SELECT * FROM sse_out").collect()}
    want = {tuple(r) for r in enrich(events).collect()}
    assert got == want and len(got) == events.count()

    # assert the broadcast on the STREAMING execution itself (the last
    # micro-batch's executed plan), not merely on the batch twin
    stream_plan = q._jsq.explainInternal(False)
    assert "BroadcastHashJoin" in stream_plan
    assert "SortMergeJoin" not in stream_plan


def test_stream_cdc_merge_auto_compaction_bounds_files(spark, tmp_path, changelog):
    """compact_every folds sink bin-packing into the stream: after the
    drain the CURRENT version is one bin-packed file (vs one file per
    merge task without it), the data is identical, and the compaction
    rides the same atomic versioned commit (previous version intact)."""
    import os

    from dynamics_365_to_bigquery_spark_etl_pipeline_spark import sinks

    source = tmp_path / "source"
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    split = "2024-01-16 00:00:00"
    changelog.filter(F.col("systemmodifiedat") < split).repartition(6).write.parquet(
        str(source), mode="append"
    )
    q = stream_cdc_merge(
        spark,
        str(source),
        changelog.schema,
        sink,
        ckpt,
        tie_breakers=("event_id",),
        compact_every=1,
    )
    q.awaitTermination(120)

    cur = sinks.current_version_path(sink)
    n_files = sum(f.endswith(".parquet") for f in os.listdir(cur))
    assert n_files == 1  # tiny fixture bin-packs to a single file
    got = {
        tuple(r)
        for r in spark.read.parquet(cur).select("systemid", "event_id", "value").collect()
    }
    want = {
        tuple(r)
        for r in cdc.resolve_snapshot(
            changelog.filter(F.col("systemmodifiedat") < split),
            tie_breakers=("event_id",),
        )
        .select("systemid", "event_id", "value")
        .collect()
    }
    assert got == want and len(got) > 0
    # pre-compaction version retained (time travel) with identical data
    prev = spark.read.parquet(sinks.version_path(sink, -2))
    assert {
        tuple(r) for r in prev.select("systemid", "event_id", "value").collect()
    } == want
