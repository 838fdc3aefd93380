"""Incremental IVF layout store (r9 verdict #2): O(delta) appends must
be probe-equivalent to a full rebuild, crash/replay-safe like the LSH
dedup index, and the centroid-drift guard must actually trip when the
corpus distribution moves away from the frozen centroids."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import similarity as S
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.ivf_store import (
    IvfLayoutStore,
)

DIM = 8
N_BLOBS = 4


def _blob_vectors(rng, blob: int, n: int, start_id: int, spread: float = 0.05):
    """Vectors around one of N_BLOBS well-separated unit directions."""
    centers = np.eye(DIM)[:N_BLOBS]  # orthogonal blob centers
    rows = []
    for i in range(n):
        v = centers[blob] + rng.normal(0, spread, DIM)
        rows.append((start_id + i, [float(x) for x in v]))
    return rows


def _frame(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _centroids(spark):
    rows = [(i, [float(x) for x in np.eye(DIM)[i]]) for i in range(N_BLOBS)]
    return _frame(spark, rows)


def _probe_rows(store, queries, k=5, nprobe=2):
    return sorted(
        tuple(r) for r in store.topk(queries, k=k, nprobe=nprobe).collect()
    )


def test_append_probe_equals_full_rebuild_probe(spark, tmp_path):
    rng = np.random.default_rng(7)
    base = [r for b in range(N_BLOBS) for r in _blob_vectors(rng, b, 30, b * 1000)]
    delta1 = [r for b in range(N_BLOBS) for r in _blob_vectors(rng, b, 10, 5000 + b * 100)]
    delta2 = _blob_vectors(rng, 2, 15, 9000)
    cents = _centroids(spark)
    queries = _frame(spark, base[::17] + delta1[::7])

    inc = IvfLayoutStore(spark, str(tmp_path / "inc"))
    inc.build(_frame(spark, base), cents)
    inc.append(_frame(spark, delta1), "d1")
    inc.append(_frame(spark, delta2), "d2")

    full = IvfLayoutStore(spark, str(tmp_path / "full"))
    full.build(_frame(spark, base + delta1 + delta2), cents)

    got = _probe_rows(inc, queries)
    want = _probe_rows(full, queries)
    assert got == want and len(got) > 0


def test_replay_of_committed_batch_is_noop(spark, tmp_path):
    rng = np.random.default_rng(3)
    store = IvfLayoutStore(spark, str(tmp_path / "s"))
    store.build(_frame(spark, _blob_vectors(rng, 0, 20, 0)), _centroids(spark))
    delta = _frame(spark, _blob_vectors(rng, 1, 10, 100))
    store.append(delta, "d1")
    n_before = store.drift()["n_vectors"]
    store.append(delta, "d1")  # replayed: state must not double
    assert store.drift()["n_vectors"] == n_before
    assert store.committed_batches() == ["base", "d1"]


def test_crash_between_dir_write_and_meta_commit_is_invisible_then_retryable(
    spark, tmp_path, monkeypatch
):
    rng = np.random.default_rng(5)
    store = IvfLayoutStore(spark, str(tmp_path / "s"))
    base_rows = _blob_vectors(rng, 0, 20, 0)
    store.build(_frame(spark, base_rows), _centroids(spark))
    queries = _frame(spark, base_rows[::5])
    before = _probe_rows(store, queries)

    delta = _frame(spark, _blob_vectors(rng, 1, 10, 100))
    real_write = IvfLayoutStore._write_meta

    def crash(self, meta):
        if "d1" in meta.get("batches", []):
            raise RuntimeError("simulated crash before meta commit")
        real_write(self, meta)

    monkeypatch.setattr(IvfLayoutStore, "_write_meta", crash)
    with pytest.raises(RuntimeError, match="simulated crash"):
        store.append(delta, "d1")
    monkeypatch.setattr(IvfLayoutStore, "_write_meta", real_write)

    # the orphan dir exists but is invisible to reads
    assert os.path.isdir(store._batch_dir("d1"))
    assert store.committed_batches() == ["base"]
    assert _probe_rows(store, queries) == before

    # the retry rewrites the orphan and commits exactly once
    store.append(delta, "d1")
    assert store.committed_batches() == ["base", "d1"]
    assert store.drift()["n_vectors"] == 30


def test_drift_guard_trips_on_a_shifted_corpus(spark, tmp_path):
    """Batches drawn from the build distribution keep needs_retrain
    False; a batch far from every frozen centroid (negated directions)
    degrades the live mean past the threshold and trips the guard —
    and the flag is sticky in the meta."""
    rng = np.random.default_rng(11)
    store = IvfLayoutStore(spark, str(tmp_path / "s"), drift_threshold=0.10)
    base = [r for b in range(N_BLOBS) for r in _blob_vectors(rng, b, 25, b * 1000)]
    d = store.build(_frame(spark, base), _centroids(spark))
    assert not d["needs_retrain"] and d["degradation"] == 0.0

    in_dist = [r for b in range(N_BLOBS) for r in _blob_vectors(rng, b, 5, 5000 + b * 10)]
    d = store.append(_frame(spark, in_dist), "ok")
    assert not d["needs_retrain"]

    # shifted mass: vectors near -e_k are ~orthogonal-to-negative vs
    # every pinned centroid, cratering the batch's assignment sim
    shifted = [
        (9000 + i, [float(x) for x in (-np.eye(DIM)[i % N_BLOBS] + rng.normal(0, 0.05, DIM))])
        for i in range(120)
    ]
    d = store.append(_frame(spark, shifted), "shifted")
    assert d["degradation"] > 0.10
    assert d["needs_retrain"]
    assert store.drift()["needs_retrain"]  # sticky via meta

    # rebuild with retrained centroids clears the flag and restores sim
    all_vecs = _frame(spark, base + in_dist + shifted)
    seeds = all_vecs.limit(8)
    trained = S.refine_centroids(all_vecs, seeds)
    d = store.rebuild(trained)
    assert not d["needs_retrain"]
    assert d["n_vectors"] == len(base) + len(in_dist) + len(shifted)
    # replay guard survives the rebuild
    assert "shifted" in store.committed_ids()
    n = store.drift()["n_vectors"]
    store.append(_frame(spark, shifted), "shifted")
    assert store.drift()["n_vectors"] == n


def test_rebuild_crash_leaves_old_generation_readable(spark, tmp_path, monkeypatch):
    """rebuild is two-phase: new centroids + new layout staged beside
    the live state, one meta swap flips both. A crash before the swap
    must leave the old generation fully readable and the retry must
    land cleanly."""
    rng = np.random.default_rng(23)
    store = IvfLayoutStore(spark, str(tmp_path / "s"))
    base = [r for b in range(N_BLOBS) for r in _blob_vectors(rng, b, 20, b * 1000)]
    store.build(_frame(spark, base), _centroids(spark))
    store.append(_frame(spark, _blob_vectors(rng, 1, 10, 7000)), "d1")
    queries = _frame(spark, base[::7])
    before = _probe_rows(store, queries)

    real_write = IvfLayoutStore._write_meta

    def crash(self, meta):
        if meta.get("centroids_dir", "centroids") != "centroids":
            raise RuntimeError("simulated crash before rebuild meta swap")
        real_write(self, meta)

    all_vecs = _frame(spark, base + _blob_vectors(rng, 1, 10, 7000))
    trained = S.refine_centroids(all_vecs, all_vecs.limit(8))
    monkeypatch.setattr(IvfLayoutStore, "_write_meta", crash)
    with pytest.raises(RuntimeError, match="simulated crash"):
        store.rebuild(trained)
    monkeypatch.setattr(IvfLayoutStore, "_write_meta", real_write)

    # old generation intact: same probe answer, same live state
    assert store.committed_batches() == ["base", "d1"]
    assert _probe_rows(store, queries) == before

    # retry completes; one live generation, replay guard intact
    store.rebuild(trained)
    assert len(store.committed_batches()) == 1
    assert "d1" in store.committed_ids()
    assert store.drift()["n_vectors"] == len(base) + 10


def test_compact_folds_batches_probe_unchanged(spark, tmp_path):
    rng = np.random.default_rng(13)
    store = IvfLayoutStore(spark, str(tmp_path / "s"))
    base = [r for b in range(N_BLOBS) for r in _blob_vectors(rng, b, 20, b * 1000)]
    store.build(_frame(spark, base), _centroids(spark))
    for i in range(3):
        store.append(
            _frame(spark, _blob_vectors(rng, i % N_BLOBS, 8, 5000 + i * 100)),
            f"d{i}",
        )
    queries = _frame(spark, base[::9])
    before = _probe_rows(store, queries)
    before_drift = store.drift()

    assert store.compact() is True
    assert len(store.committed_batches()) == 1
    assert _probe_rows(store, queries) == before
    after_drift = store.drift()
    assert after_drift["n_vectors"] == before_drift["n_vectors"]
    assert after_drift["live_mean_sim"] == pytest.approx(
        before_drift["live_mean_sim"]
    )
    # replay guard survives compaction
    assert "d1" in store.committed_ids()
    store.append(_frame(spark, _blob_vectors(rng, 1, 8, 5100)), "d1")
    assert store.drift()["n_vectors"] == after_drift["n_vectors"]
    # nothing further to fold
    assert store.compact() is False


def test_recall_floor_holds_after_appends(spark, tmp_path):
    """The layout's recall contract must survive incremental growth:
    brute-force exact top-k over the drained corpus vs the store's
    nprobe=2 probe after three appends."""
    rng = np.random.default_rng(17)
    base = [r for b in range(N_BLOBS) for r in _blob_vectors(rng, b, 30, b * 1000, spread=0.15)]
    deltas = [
        [r for b in range(N_BLOBS) for r in _blob_vectors(rng, b, 10, 5000 + i * 1000 + b * 100, spread=0.15)]
        for i in range(3)
    ]
    store = IvfLayoutStore(spark, str(tmp_path / "s"))
    store.build(_frame(spark, base), _centroids(spark))
    for i, d in enumerate(deltas):
        store.append(_frame(spark, d), f"d{i}")

    all_rows = base + [r for d in deltas for r in d]
    corpus = _frame(spark, all_rows)
    queries = _frame(spark, all_rows[::23])
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.brute_force_topk(corpus, queries, k=5).collect()
    }
    approx = {
        (r[0], r[1]) for r in store.topk(queries, k=5, nprobe=2).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.95, f"recall after appends degraded to {recall:.3f}"


def test_guards(spark, tmp_path):
    store = IvfLayoutStore(spark, str(tmp_path / "s"))
    with pytest.raises(RuntimeError, match="no build"):
        store.append(_frame(spark, [(1, [1.0] * DIM)]), "d")
    with pytest.raises(RuntimeError, match="no build"):
        store.topk(_frame(spark, [(1, [1.0] * DIM)]))
    with pytest.raises(ValueError, match="drift_threshold"):
        IvfLayoutStore(spark, str(tmp_path / "x"), drift_threshold=0.0)
    store.build(_frame(spark, [(1, [1.0] * DIM), (2, [0.9] * DIM)]), _centroids(spark))
    with pytest.raises(ValueError, match="empty"):
        store.append(_frame(spark, []).limit(0), "d0")


def test_append_rejects_reserved_batch_ids(spark, tmp_path):
    """'base' and 'gen<N>' are the store's own dir namespace: an append
    named like the live generation would pass the replay guard and then
    rmtree the generation dir as a 'crashed earlier attempt', replacing
    the corpus with the delta (review finding). The guard makes the
    collision impossible instead of latent."""
    rng = np.random.default_rng(29)
    store = IvfLayoutStore(spark, str(tmp_path / "s"))
    base = [r for b in range(N_BLOBS) for r in _blob_vectors(rng, b, 10, b * 1000)]
    store.build(_frame(spark, base), _centroids(spark))
    store.append(_frame(spark, _blob_vectors(rng, 0, 5, 8000)), "d0")
    assert store.compact()  # live generation is now batch=gen1

    delta = _frame(spark, _blob_vectors(rng, 1, 5, 9000))
    for reserved in ["base", "gen1", "gen2"]:
        with pytest.raises(ValueError, match="reserved"):
            store.append(delta, reserved)
    # ids that would escape the batch= namespace via path separators
    # (e.g. resolve INTO the live generation dir) are rejected too
    for traversal in ["x/../batch=gen1", "2026/08/15", "a\\b", ""]:
        with pytest.raises(ValueError, match="must match"):
            store.append(delta, traversal)
    # the live generation survived the attempts, and its id is committed
    assert store.committed_batches() == ["gen1"]
    assert "gen1" in store.committed_ids()
    assert store.drift()["n_vectors"] == len(base) + 5


def test_drift_guard_sign_with_negative_build_mean(spark, tmp_path):
    """A corpus whose build-time mean similarity is NEGATIVE must still
    trip the guard when the live mean degrades further (the unsigned
    formula (build-mean)/build flips sign for build<0 and would mask it
    — review finding)."""
    rng = np.random.default_rng(31)
    store = IvfLayoutStore(spark, str(tmp_path / "s"), drift_threshold=0.10)
    # vectors along -(e_0+..+e_3): cosine with EVERY centroid is -1/2,
    # so even the argmax winner is negative; noise RAISES the winning
    # cosine (max over jittered values), so less noise = worse corpus
    anti = -np.eye(DIM)[:N_BLOBS].sum(axis=0)

    def _anti_rows(n, start_id, noise):
        return [
            (start_id + i, [float(x) for x in (anti + rng.normal(0, noise, DIM))])
            for i in range(n)
        ]

    d = store.build(_frame(spark, _anti_rows(80, 0, 0.15)), _centroids(spark))
    assert d["build_mean_sim"] < 0

    # tighter delta: winning cosine pinned near the -1/2 floor, live
    # mean falls BELOW the (negative) build mean
    d = store.append(_frame(spark, _anti_rows(200, 9000, 0.01)), "worse")
    assert d["live_mean_sim"] < d["build_mean_sim"]
    assert d["degradation"] > 0, "degradation must be positive when quality falls"


def test_identity_knobs_pinned_in_meta(spark, tmp_path):
    """r10 verdict #3: drift_threshold / id_col / vec_col are pinned at
    build(); a mismatched open fails loudly naming both values (the MG
    store's k-check, mirrored) — a stream opened at a different
    threshold would silently move the retrain line."""
    rng = np.random.default_rng(41)
    p = str(tmp_path / "s")
    store = IvfLayoutStore(spark, p, drift_threshold=0.10)
    store.build(_frame(spark, _blob_vectors(rng, 0, 10, 0)), _centroids(spark))

    with pytest.raises(ValueError, match="drift_threshold=0.1.*0.2"):
        IvfLayoutStore(spark, p, drift_threshold=0.20).committed_batches()
    with pytest.raises(ValueError, match="id_col='vec_id'.*'doc_id'"):
        IvfLayoutStore(spark, p, drift_threshold=0.10, id_col="doc_id").drift()
    with pytest.raises(ValueError, match="vec_col"):
        IvfLayoutStore(spark, p, drift_threshold=0.10, vec_col="emb").drift()

    # matching knobs open fine; a fresh build() re-pins new knobs
    assert IvfLayoutStore(spark, p, drift_threshold=0.10).drift()["n_vectors"] == 10
    store2 = IvfLayoutStore(spark, p, drift_threshold=0.20)
    store2.build(_frame(spark, _blob_vectors(rng, 1, 8, 100)), _centroids(spark))
    assert store2.drift()["n_vectors"] == 8


def test_pre_r11_meta_migrates_ledger_and_adopts_identity(spark, tmp_path):
    """A pre-r11 meta (epoch keys in the flat list, no identity keys)
    must keep its replay guard and adopt the opener's knobs; the next
    commit persists the bounded shape + identity."""
    import json

    rng = np.random.default_rng(43)
    p = str(tmp_path / "s")
    store = IvfLayoutStore(spark, p)
    store.build(_frame(spark, _blob_vectors(rng, 0, 10, 0)), _centroids(spark))
    store.append(_frame(spark, _blob_vectors(rng, 1, 5, 100)), "qid-epoch-0")

    # rewrite the meta to the pre-r11 shape by hand
    with open(store._meta_path()) as fh:
        meta = json.load(fh)
    meta["committed_ids"] = meta["committed_ids"] + ["qid-epoch-0"]
    del meta["epoch_hwm"]
    for k in ("drift_threshold", "id_col", "vec_col"):
        del meta[k]
    with open(store._meta_path(), "w") as fh:
        json.dump(meta, fh)

    store = IvfLayoutStore(spark, p)  # defaults adopted, no error
    assert store.is_committed("qid-epoch-0")
    n = store.drift()["n_vectors"]
    store.append(_frame(spark, _blob_vectors(rng, 1, 5, 100)), "qid-epoch-0")
    assert store.drift()["n_vectors"] == n  # replay stayed a no-op
    store.append(_frame(spark, _blob_vectors(rng, 2, 4, 200)), "qid-epoch-1")
    with open(store._meta_path()) as fh:
        meta = json.load(fh)
    assert meta["epoch_hwm"] == {"qid": 1}
    assert "qid-epoch-0" not in meta["committed_ids"]
    assert meta["drift_threshold"] == 0.05


def test_rebuild_and_topk_refuse_partial_store(spark, tmp_path):
    """r10 advice: compact() raised on meta-listed dirs missing from
    disk but rebuild() (and topk) silently skipped them — a rebuild
    from a partial corpus permanently drops committed vectors while the
    ledger still blocks re-ingest. All three now fail loudly."""
    import shutil

    rng = np.random.default_rng(53)
    store = IvfLayoutStore(spark, str(tmp_path / "s"))
    base = [r for b in range(N_BLOBS) for r in _blob_vectors(rng, b, 10, b * 1000)]
    store.build(_frame(spark, base), _centroids(spark))
    store.append(_frame(spark, _blob_vectors(rng, 1, 5, 9000)), "d1")
    shutil.rmtree(store._batch_dir("d1"))

    queries = _frame(spark, base[::9])
    with pytest.raises(RuntimeError, match="missing on disk.*probing"):
        store.topk(queries)
    with pytest.raises(RuntimeError, match="missing on disk.*rebuilding"):
        store.rebuild(_centroids(spark))
    with pytest.raises(RuntimeError, match="missing on disk.*compacting"):
        store.compact()


def test_append_bounds_repartition_to_n_centroids(spark, tmp_path, monkeypatch):
    """r15 (r14 verdict #4): the centroid count is persisted in the
    meta at build/rebuild, and an append's bound-files repartition
    lands in min(n_centroids, parallelism) partitions instead of the
    session default — the last store whose delta shuffle was unbounded.
    Legacy metas (no field) self-upgrade on their first append."""
    import json

    rng = np.random.default_rng(11)
    store = IvfLayoutStore(spark, str(tmp_path / "s"))
    store.build(_frame(spark, _blob_vectors(rng, 0, 20, 0)), _centroids(spark))
    assert store._read_meta()["n_centroids"] == N_BLOBS

    seen = []
    orig = IvfLayoutStore._write_bucket_sorted

    def spy(self, df, out, bucket_col, sort_cols=(), bound_files=False,
            n_partitions=None):
        seen.append((bound_files, n_partitions))
        return orig(self, df, out, bucket_col, sort_cols, bound_files,
                    n_partitions)

    monkeypatch.setattr(IvfLayoutStore, "_write_bucket_sorted", spy)
    store.append(_frame(spark, _blob_vectors(rng, 1, 10, 100)), "d1")
    want_n = min(N_BLOBS, spark.sparkContext.defaultParallelism)
    assert seen == [(True, want_n)]

    # legacy meta: drop the field on disk; the next append counts the
    # centroid frame once and re-persists it
    meta_path = store._meta_path()
    with open(meta_path) as fh:
        meta = json.load(fh)
    del meta["n_centroids"]
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)
    seen.clear()
    store.append(_frame(spark, _blob_vectors(rng, 2, 10, 200)), "d2")
    assert seen == [(True, want_n)]
    assert store._read_meta()["n_centroids"] == N_BLOBS

    # rebuild re-persists the (new) centroid count
    store.rebuild(_centroids(spark))
    assert store._read_meta()["n_centroids"] == N_BLOBS

    # one file per touched bucket in the appended dirs (the bound-files
    # contract the n_partitions bound must not break)
    root = store._batch_dir(store.committed_batches()[0])
    assert os.path.isdir(root)
