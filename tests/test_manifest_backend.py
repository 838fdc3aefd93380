"""Object-store (manifest) pointer backend: the versioned sink's
commit must work with NO symlink and NO directory rename on the commit
path — a single atomic small-object PUT (``out__pointer.json``) is the
whole swap, the shape an S3-style store supports. Same protocol, same
functions, toggled by ``SPARK_GRAFT_SINK_POINTER=manifest``."""

from __future__ import annotations

import json
import os
import time

import pytest

from dynamics_365_to_bigquery_spark_etl_pipeline_spark import sinks
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.pipeline import EntityPipeline

from .test_pipeline import _delete_row, _live_row, _write_csv, zone  # noqa: F401


@pytest.fixture()
def manifest_backend(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SINK_POINTER", "manifest")
    yield


def _pipe(spark, zone, **kw):  # noqa: F811
    landing, sink, state = zone
    return EntityPipeline(
        spark, str(landing), str(sink), str(state), tie_breakers=("amount",), **kw
    )


def test_manifest_commit_no_symlink_no_dir_rename(
    spark, zone, manifest_backend  # noqa: F811
):
    """Full-load + incremental + time travel + retention under the
    manifest backend; the sink path must never be a symlink, and the
    pointer must be the JSON object."""
    landing, sink, state = zone
    t0 = time.time() - 100
    _write_csv(
        str(landing / "Sales Invoice" / "b1.csv"),
        [_live_row("a", "2024-01-01 10:00:00", 5),
         _live_row("b", "2024-01-01 11:00:00", 7)],
        t0,
    )
    pipe = _pipe(spark, zone)
    assert pipe.run()[0]["status"] == "ok"

    out = str(sink / "salesinvoice")
    assert not os.path.lexists(out)  # no symlink, no dir at the pointer path
    with open(out + sinks.POINTER_SUFFIX) as f:
        assert json.load(f)["current"].endswith("v_000001")
    got = {(r.systemid, r.amount) for r in pipe.read_snapshot("Sales Invoice").collect()}
    assert got == {("a", 5), ("b", 7)}

    # incremental: update a, delete b, insert c
    _write_csv(
        str(landing / "Sales Invoice" / "b2.csv"),
        [_live_row("a", "2024-01-02 09:00:00", 9),
         _delete_row("b"),
         _live_row("c", "2024-01-02 10:00:00", 2)],
        t0 + 50,
    )
    assert pipe.run()[0]["status"] == "ok"
    got = {(r.systemid, r.amount) for r in pipe.read_snapshot("Sales Invoice").collect()}
    assert got == {("a", 9), ("c", 2)}

    # time travel: previous version still readable
    prev = {
        (r.systemid, r.amount)
        for r in pipe.read_snapshot("Sales Invoice", version=-2).collect()
    }
    assert prev == {("a", 5), ("b", 7)}

    # third run -> retention keeps current + previous only
    _write_csv(
        str(landing / "Sales Invoice" / "b3.csv"),
        [_live_row("d", "2024-01-03 10:00:00", 1)],
        t0 + 80,
    )
    assert pipe.run()[0]["status"] == "ok"
    assert len(sinks.list_versions(out)) == 2


def test_manifest_crash_before_put_leaves_old_version_live(
    spark, zone, manifest_backend  # noqa: F811
):
    """A crash AFTER the version dir write but BEFORE the pointer PUT
    must leave the old pointer live and readable; the retry GCs the
    orphan and republishes."""
    landing, sink, state = zone
    t0 = time.time() - 100
    _write_csv(
        str(landing / "Sales Invoice" / "b1.csv"),
        [_live_row("a", "2024-01-01 10:00:00", 5)],
        t0,
    )
    pipe = _pipe(spark, zone)
    assert pipe.run()[0]["status"] == "ok"
    out = str(sink / "salesinvoice")
    v1 = sinks.current_version_path(out)

    _write_csv(
        str(landing / "Sales Invoice" / "b2.csv"),
        [_live_row("b", "2024-01-02 09:00:00", 7)],
        t0 + 50,
    )
    real_put = sinks._atomic_put
    def crash_put(path, payload):
        raise OSError("simulated PUT failure")
    sinks._atomic_put = crash_put
    try:
        res = pipe.run()
        assert res[0]["status"] == "error"
    finally:
        sinks._atomic_put = real_put

    # old pointer still live; orphan v2 dir invisible to readers
    assert sinks.current_version_path(out) == v1
    got = {(r.systemid, r.amount) for r in pipe.read_snapshot("Sales Invoice").collect()}
    assert got == {("a", 5)}

    # retry (watermark never advanced) converges
    assert pipe.run()[0]["status"] == "ok"
    got = {(r.systemid, r.amount) for r in pipe.read_snapshot("Sales Invoice").collect()}
    assert got == {("a", 5), ("b", 7)}


def test_manifest_rollup_maintenance(spark, zone, manifest_backend):  # noqa: F811
    """The rollup sink publishes/reads through the same backend: the
    incremental fold must find its prior state via the manifest."""
    from pyspark.sql import functions as F

    landing, sink, state = zone
    t0 = time.time() - 100
    pipe = _pipe(spark, zone, rollup={"keys": ["_company"], "value": "amount"})
    _write_csv(
        str(landing / "Sales Invoice" / "b1.csv"),
        [_live_row("a", "2024-01-01 10:00:00", 5),
         _live_row("b", "2024-01-01 11:00:00", 7)],
        t0,
    )
    assert pipe.run()[0]["status"] == "ok"
    _write_csv(
        str(landing / "Sales Invoice" / "b2.csv"),
        [_live_row("a", "2024-01-02 09:00:00", 9), _delete_row("b")],
        t0 + 50,
    )
    assert pipe.run()[0]["status"] == "ok"

    got = {
        (r._company, r.sum_value, r.n_rows)
        for r in pipe.read_rollup("Sales Invoice").collect()
    }
    snap = pipe.read_snapshot("Sales Invoice")
    want = {
        tuple(r)
        for r in snap.groupBy("_company")
        .agg(
            F.sum(F.col("amount").cast("decimal(25,2)")).cast("double").alias("s"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_manifest_streaming_merge(spark, tmp_path, manifest_backend):
    """The streaming CDC merge publishes each micro-batch through the
    same backend-agnostic commit — under the manifest backend the sink
    must accumulate correctly across epochs with no symlink ever
    created."""
    from pyspark.sql import functions as F

    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.plans.changelog import (
        changelog_from_events,
    )
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.cdc_stream import (
        stream_cdc_merge,
    )
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import cdc

    changelog = changelog_from_events(
        load_table(spark, "/root/testdata/sf0.001", "events")
    )
    source = str(tmp_path / "source")
    sink = str(tmp_path / "sink")
    split = "2024-01-16 00:00:00"
    b1 = changelog.filter(F.col("systemmodifiedat") < split)
    b2 = changelog.filter(
        F.col("systemmodifiedat").isNull() | (F.col("systemmodifiedat") >= split)
    )
    b1.write.parquet(source, mode="append")
    q = stream_cdc_merge(
        spark, source, changelog.schema, sink, str(tmp_path / "ckpt"),
        tie_breakers=("event_id",),
    )
    q.awaitTermination(120)
    b2.write.parquet(source, mode="append")
    q2 = stream_cdc_merge(
        spark, source, changelog.schema, sink, str(tmp_path / "ckpt"),
        tie_breakers=("event_id",),
    )
    q2.awaitTermination(120)

    assert not os.path.lexists(sink)  # no symlink/dir at the pointer path
    got = spark.read.parquet(sinks.current_version_path(sink))
    want = cdc.resolve_snapshot(changelog, tie_breakers=("event_id",))
    assert got.count() == want.count() > 0
    assert (
        got.select("systemid").subtract(want.select("systemid")).count() == 0
    )
