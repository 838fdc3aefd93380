"""Streaming vector ingest (r10): the stream-drained IVF store must be
probe-identical to batch appends of the same data, exactly-once under
checkpoint replay, surface the centroid-drift guard, and keep probe
fan-in bounded via in-stream compaction."""

from __future__ import annotations

import numpy as np
import pytest

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.ivf_store import (
    IvfLayoutStore,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.vector_ingest import (
    stream_ivf_append,
)

DIM = 8
N_BLOBS = 4


def _blob_vectors(rng, blob: int, n: int, start_id: int, spread: float = 0.05):
    centers = np.eye(DIM)[:N_BLOBS]
    return [
        (start_id + i, [float(x) for x in (centers[blob] + rng.normal(0, spread, DIM))])
        for i in range(n)
    ]


def _frame(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _centroids(spark):
    rows = [(i, [float(x) for x in np.eye(DIM)[i]]) for i in range(N_BLOBS)]
    return _frame(spark, rows)


def _probe_rows(store, queries):
    return sorted(tuple(r) for r in store.topk(queries, k=5, nprobe=2).collect())


def _drain(spark, source, store_path, ck, **kw):
    q = stream_ivf_append(
        spark,
        str(source),
        _frame(spark, []).schema,
        str(store_path),
        str(ck),
        **kw,
    )
    q.awaitTermination(120)
    return IvfLayoutStore(spark, str(store_path))


def test_stream_appends_equal_batch_appends(spark, tmp_path):
    """Drained stream probe == the same vectors appended in batch
    against the same pinned centroids."""
    rng = np.random.default_rng(41)
    base = [r for b in range(N_BLOBS) for r in _blob_vectors(rng, b, 15, b * 1000)]
    epochs = [
        _blob_vectors(rng, e % N_BLOBS, 8, 10_000 + e * 100) for e in range(3)
    ]

    streamed = IvfLayoutStore(spark, str(tmp_path / "streamed"))
    streamed.build(_frame(spark, base), _centroids(spark))
    source = tmp_path / "src"
    for rows in epochs:
        _frame(spark, rows).coalesce(1).write.parquet(str(source), mode="append")
    _drain(spark, source, tmp_path / "streamed", tmp_path / "ck")

    batch = IvfLayoutStore(spark, str(tmp_path / "batch"))
    batch.build(_frame(spark, base), _centroids(spark))
    for e, rows in enumerate(epochs):
        batch.append(_frame(spark, rows), f"d{e}")

    streamed = IvfLayoutStore(spark, str(tmp_path / "streamed"))
    assert streamed.drift()["n_vectors"] == batch.drift()["n_vectors"]
    queries = _frame(spark, base[::5])
    assert _probe_rows(streamed, queries) == _probe_rows(batch, queries)


def test_stream_requires_a_built_store(spark, tmp_path):
    with pytest.raises(RuntimeError, match="no build"):
        stream_ivf_append(
            spark,
            str(tmp_path / "src"),
            _frame(spark, []).schema,
            str(tmp_path / "store"),
            str(tmp_path / "ck"),
        )


def test_restart_replays_nothing(spark, tmp_path):
    """availableNow restart on the same checkpoint with no new files
    commits no new batches (query-id-namespaced epoch keys + the
    store's replay guard)."""
    rng = np.random.default_rng(43)
    store = IvfLayoutStore(spark, str(tmp_path / "s"))
    store.build(
        _frame(spark, [r for b in range(N_BLOBS) for r in _blob_vectors(rng, b, 10, b * 1000)]),
        _centroids(spark),
    )
    source = tmp_path / "src"
    _frame(spark, _blob_vectors(rng, 0, 6, 9000)).coalesce(1).write.parquet(
        str(source), mode="append"
    )
    _drain(spark, source, tmp_path / "s", tmp_path / "ck")
    hwm = IvfLayoutStore(spark, str(tmp_path / "s")).epoch_high_water()
    assert len(hwm) == 1  # the stream's epochs sit in the bounded ledger

    _drain(spark, source, tmp_path / "s", tmp_path / "ck")  # restart, no new files
    after = IvfLayoutStore(spark, str(tmp_path / "s")).epoch_high_water()
    assert after == hwm
    assert IvfLayoutStore(spark, str(tmp_path / "s")).drift()["n_vectors"] == 40 + 6


def test_drift_guard_trips_through_the_stream(spark, tmp_path):
    """A shifted epoch (mass far from every pinned centroid) trips
    needs_retrain via the stream, the flag is sticky, and on_drift saw
    every epoch's status."""
    rng = np.random.default_rng(47)
    store = IvfLayoutStore(spark, str(tmp_path / "s"), drift_threshold=0.10)
    store.build(
        _frame(spark, [r for b in range(N_BLOBS) for r in _blob_vectors(rng, b, 25, b * 1000)]),
        _centroids(spark),
    )
    source = tmp_path / "src"
    _frame(spark, _blob_vectors(rng, 1, 5, 9000)).coalesce(1).write.parquet(
        str(source), mode="append"
    )
    shifted = [
        (9500 + i, [float(x) for x in (-np.eye(DIM)[i % N_BLOBS] + rng.normal(0, 0.05, DIM))])
        for i in range(150)
    ]
    _frame(spark, shifted).coalesce(1).write.parquet(str(source), mode="append")

    # the build pinned drift_threshold=0.10 in the meta: a stream opened
    # at the default 0.05 now fails loudly instead of silently moving
    # the retrain line (r10 verdict #3) — exactly the bug class this
    # test used to carry
    with pytest.raises(ValueError, match="drift_threshold"):
        _drain(spark, source, tmp_path / "s", tmp_path / "ck0")

    seen = []
    _drain(
        spark, source, tmp_path / "s", tmp_path / "ck",
        drift_threshold=0.10, on_drift=seen.append,
    )
    assert len(seen) >= 1  # availableNow may batch both files into one epoch
    assert seen[-1]["needs_retrain"]
    assert IvfLayoutStore(
        spark, str(tmp_path / "s"), drift_threshold=0.10
    ).drift()["needs_retrain"]


def test_compact_every_bounds_fanin_probe_unchanged(spark, tmp_path):
    rng = np.random.default_rng(53)
    base = [r for b in range(N_BLOBS) for r in _blob_vectors(rng, b, 10, b * 1000)]
    store = IvfLayoutStore(spark, str(tmp_path / "s"))
    store.build(_frame(spark, base), _centroids(spark))
    source = tmp_path / "src"
    all_rows = list(base)
    for e in range(4):
        rows = _blob_vectors(rng, e % N_BLOBS, 6, 20_000 + e * 100)
        all_rows += rows
        _frame(spark, rows).coalesce(1).write.parquet(str(source), mode="append")

    _drain(
        spark, source, tmp_path / "s", tmp_path / "ck",
        compact_every=2, max_files_per_trigger=1,
    )
    store = IvfLayoutStore(spark, str(tmp_path / "s"))
    # fan-in bounded: compaction folded the per-epoch dirs
    assert len(store.committed_batches()) <= 2
    # cadence regression pin (review finding): 4 epochs at
    # compact_every=2 must fold TWICE (after k0,k1 and after k2,k3) —
    # the old committed_batches() count folded the full corpus EVERY
    # epoch once a generation existed (generation would be 4 here)
    assert store._read_meta()["generation"] == 2
    assert store.drift()["n_vectors"] == len(all_rows)

    # probe equals a from-scratch rebuild of the same corpus
    fresh = IvfLayoutStore(spark, str(tmp_path / "fresh"))
    fresh.build(_frame(spark, all_rows), _centroids(spark))
    queries = _frame(spark, base[::4])
    assert _probe_rows(store, queries) == _probe_rows(fresh, queries)
