"""Bucketed incremental sink: result equivalence with the unbucketed
pipeline, untouched partitions physically NOT rewritten, and stale
partitions cleared when a bucket empties out (all keys deleted).
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.pipeline import EntityPipeline

LIVE = "{11111111-1111-1111-1111-111111111111}"
ZERO = "{00000000-0000-0000-0000-000000000000}"
HEADER = "SystemId,SystemCreatedAt,SystemModifiedAt,SystemCreatedBy,SystemModifiedBy,Amount\n"


def _write_csv(path, rows, mtime):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(HEADER)
        f.writelines(r + "\n" for r in rows)
    os.utime(path, (mtime, mtime))


def _live(key, ts, amount):
    return f"{key},{ts},{ts},{LIVE},{LIVE},{amount}"


def _delete(key):
    return f"{key},,,{ZERO},{ZERO},"


def _partition_mtimes(sink):
    out = {}
    for d in os.listdir(sink):
        if d.startswith("__bucket="):
            files = [
                os.path.join(sink, d, f)
                for f in os.listdir(os.path.join(sink, d))
                if f.endswith(".parquet")
            ]
            out[d] = max(os.path.getmtime(f) for f in files)
    return out


def test_bucketed_incremental_rewrites_only_touched_buckets(spark, tmp_path):
    landing, sink, state = str(tmp_path / "l"), str(tmp_path / "s"), str(tmp_path / "st")
    t0 = time.time() - 100
    keys = [f"k{i}" for i in range(40)]
    _write_csv(
        f"{landing}/Items/b1.csv",
        [_live(k, "2024-01-01 10:00:00", i) for i, k in enumerate(keys)],
        t0,
    )
    pipe = EntityPipeline(spark, landing, sink, state, bucket_partitions=8)
    assert pipe.run() == [{"entity": "Items", "status": "ok", "files": 1}]
    table = f"{sink}/items"
    before = _partition_mtimes(table)
    assert len(before) > 2  # keys spread across buckets

    full_before = {
        (r.systemid, r.amount)
        for r in spark.read.parquet(table).select("systemid", "amount").collect()
    }
    assert full_before == {(k, float(i)) for i, k in enumerate(keys)}

    # incremental touching ONE key
    time.sleep(1.1)
    _write_csv(
        f"{landing}/Items/b2.csv", [_live("k0", "2024-01-02 10:00:00", 999)], t0 + 50
    )
    assert pipe.run() == [{"entity": "Items", "status": "ok", "files": 1}]
    after = _partition_mtimes(table)

    rewritten = {p for p in after if after[p] != before.get(p)}
    assert len(rewritten) == 1, f"expected 1 rewritten bucket, got {rewritten}"

    got = {
        (r.systemid, r.amount)
        for r in spark.read.parquet(table).select("systemid", "amount").collect()
    }
    want = (full_before - {("k0", 0.0)}) | {("k0", 999.0)}
    assert got == want


def test_bucketed_crash_recovery_restores_moved_aside_bucket(spark, tmp_path):
    """Two-phase swap recovery: a crash after a bucket was moved aside
    but before its replacement landed must NOT lose the bucket — the
    retry restores it from staging before merging, so untouched keys
    hashed into it survive."""
    import shutil

    landing, sink, state = str(tmp_path / "l"), str(tmp_path / "s"), str(tmp_path / "st")
    t0 = time.time() - 100
    keys = [f"k{i}" for i in range(40)]
    _write_csv(
        f"{landing}/Items/b1.csv",
        [_live(k, "2024-01-01 10:00:00", i) for i, k in enumerate(keys)],
        t0,
    )
    pipe = EntityPipeline(spark, landing, sink, state, bucket_partitions=8)
    pipe.run()
    table = f"{sink}/items"

    # simulate the crashed state: a bucket moved aside, never replaced.
    # The victim MUST be the bucket the retry's delta (k0) hashes into —
    # that is the bucket the merge actually reads, so a recovery that
    # runs after the snapshot's eager file listing silently loses its
    # untouched keys (an arbitrary listdir victim only catches this
    # 1-in-8 of the time).
    k0_bucket = (
        spark.read.parquet(table)
        .filter(F.col("systemid") == "k0")
        .select("__bucket")
        .collect()[0][0]
    )
    victim = f"__bucket={k0_bucket}"
    aside = os.path.join(table + "__staging", "__replaced")
    os.makedirs(aside)
    shutil.move(os.path.join(table, victim), os.path.join(aside, victim))

    # retry (watermark was never committed for this delta in a real
    # crash; here any new delta triggers the recovery path first)
    _write_csv(f"{landing}/Items/b2.csv", [_live("k0", "2024-01-02 10:00:00", 999)], t0 + 50)
    assert pipe.run() == [{"entity": "Items", "status": "ok", "files": 1}]

    got = {
        (r.systemid, r.amount)
        for r in spark.read.parquet(table).select("systemid", "amount").collect()
    }
    want = {(k, float(i)) for i, k in enumerate(keys) if k != "k0"} | {("k0", 999.0)}
    assert got == want  # no keys lost from the aside bucket


def test_switch_pointer_sink_to_bucketed_layout(spark, tmp_path):
    """A sink published by the pointer layout can be re-materialized by
    a bucketed full load: the symlink (which rmtree can't remove) is
    unlinked and replaced by the bucketed directory."""
    landing, sink, state1, state2 = (
        str(tmp_path / "l"),
        str(tmp_path / "s"),
        str(tmp_path / "st1"),
        str(tmp_path / "st2"),
    )
    t0 = time.time() - 100
    _write_csv(f"{landing}/Items/b1.csv", [_live("a", "2024-01-01 10:00:00", 1)], t0)
    EntityPipeline(spark, landing, sink, state1).run()
    table = f"{sink}/items"
    assert os.path.islink(table)

    # fresh state => full load through the bucketed path, same sink
    pipe = EntityPipeline(spark, landing, sink, state2, bucket_partitions=4)
    assert pipe.run() == [{"entity": "Items", "status": "ok", "files": 1}]
    assert os.path.isdir(table) and not os.path.islink(table)
    assert not os.path.exists(table + "__versions")
    assert {(r.systemid, r.amount) for r in spark.read.parquet(table).select("systemid", "amount").collect()} == {("a", 1.0)}


def test_layout_switch_crash_mid_swap_is_recoverable(spark, tmp_path):
    """The pointer→bucketed switch renames the old pointer + versions
    aside BEFORE the new directory renames in (nothing is deleted until
    the new data is live). A crash in the sink-absent window must leave
    the old layout restorable — the retry recovers it, reads the old
    snapshot, and completes the switch."""
    import shutil

    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.pipeline import (
        LAYOUT_ASIDE_SUFFIX,
    )

    landing, sink, state1, state2 = (
        str(tmp_path / "l"),
        str(tmp_path / "s"),
        str(tmp_path / "st1"),
        str(tmp_path / "st2"),
    )
    t0 = time.time() - 100
    _write_csv(f"{landing}/Items/b1.csv", [_live("a", "2024-01-01 10:00:00", 1)], t0)
    EntityPipeline(spark, landing, sink, state1).run()
    table = f"{sink}/items"
    assert os.path.islink(table)

    # simulate the crash: pointer and versions moved aside, new dir
    # never renamed in — the sink path is absent
    aside = table + LAYOUT_ASIDE_SUFFIX
    os.makedirs(aside)
    os.replace(table, os.path.join(aside, "pointer"))
    os.replace(table + "__versions", os.path.join(aside, "versions"))
    assert not os.path.lexists(table)

    # retry with fresh state: recovery restores the pointer layout, the
    # bucketed full load then completes the switch
    pipe = EntityPipeline(spark, landing, sink, state2, bucket_partitions=4)
    assert pipe.run() == [{"entity": "Items", "status": "ok", "files": 1}]
    assert os.path.isdir(table) and not os.path.islink(table)
    assert not os.path.exists(aside)
    got = {
        (r.systemid, r.amount)
        for r in spark.read.parquet(table).select("systemid", "amount").collect()
    }
    assert got == {("a", 1.0)}


def test_bucketed_delete_clears_emptied_partition(spark, tmp_path):
    landing, sink, state = str(tmp_path / "l"), str(tmp_path / "s"), str(tmp_path / "st")
    t0 = time.time() - 100
    _write_csv(
        f"{landing}/Items/b1.csv",
        [_live("solo", "2024-01-01 10:00:00", 1), _live("other", "2024-01-01 10:00:00", 2)],
        t0,
    )
    pipe = EntityPipeline(spark, landing, sink, state, bucket_partitions=64)
    pipe.run()
    table = f"{sink}/items"
    assert {r.systemid for r in spark.read.parquet(table).collect()} == {"solo", "other"}

    _write_csv(f"{landing}/Items/b2.csv", [_delete("solo")], t0 + 50)
    assert pipe.run() == [{"entity": "Items", "status": "ok", "files": 1}]
    assert {r.systemid for r in spark.read.parquet(table).collect()} == {"other"}
