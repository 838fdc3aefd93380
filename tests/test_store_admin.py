"""store_admin CLI (r11): one command a cron job can drive beside a
live stream — status, compaction, drift-triggered retrain — with store
kind auto-detected and the write lock making maintenance-beside-ingest
safe."""

from __future__ import annotations

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from dynamics_365_to_bigquery_spark_etl_pipeline_spark import store_admin
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.dedup_index import (
    LshDedupIndex,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.ivf_store import (
    IvfLayoutStore,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.heavy_hitters import (
    MgSummaryStore,
)

from tests.test_dedup_index import JMIN, _corpus
from tests.test_ivf_store import DIM, N_BLOBS, _blob_vectors, _centroids, _frame


def _run(capsys, *argv) -> tuple[int, dict]:
    rc = store_admin.main(list(argv))
    return rc, json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_unknown_dir_errors(tmp_path, capsys):
    rc, out = _run(capsys, str(tmp_path))
    assert rc == 1
    assert out["status"] == "error"
    assert "no store meta" in out["error"]


def test_ivf_status_adopts_pinned_identity(spark, tmp_path, capsys):
    """The store was built with NON-default knobs; the admin must adopt
    them from the meta (constructing with defaults fails loudly by
    design — an admin flow should operate on what the build pinned,
    not guess)."""
    rng = np.random.default_rng(3)
    p = str(tmp_path / "s")
    store = IvfLayoutStore(spark, p, drift_threshold=0.22, vec_col="embedding")
    base = [r for b in range(N_BLOBS) for r in _blob_vectors(rng, b, 10, b * 100)]
    store.build(_frame(spark, base), _centroids(spark))
    store.append(_frame(spark, _blob_vectors(rng, 1, 5, 9000)), "d1")

    rc, out = _run(capsys, p)
    assert rc == 0 and out["status"] == "ok"
    assert out["kind"] == "ivf"
    assert out["drift_threshold"] == 0.22
    assert out["n_vectors"] == len(base) + 5
    assert out["appended_batches"] == 1
    assert not out["needs_retrain"]
    assert not out["lock"]["held"]
    assert out["bytes"] > 0


def test_ivf_compact_and_rebuild_if_drift(spark, tmp_path, capsys):
    rng = np.random.default_rng(5)
    p = str(tmp_path / "s")
    store = IvfLayoutStore(spark, p, drift_threshold=0.10)
    base = [r for b in range(N_BLOBS) for r in _blob_vectors(rng, b, 25, b * 1000)]
    store.build(_frame(spark, base), _centroids(spark))
    store.append(_frame(spark, _blob_vectors(rng, 0, 5, 5000)), "d1")
    store.append(_frame(spark, _blob_vectors(rng, 1, 5, 6000)), "d2")

    rc, out = _run(capsys, p, "--compact")
    assert rc == 0 and out["compacted"] is True
    assert out["batches"] == ["gen1"]

    # within threshold: rebuild-if-drift is a no-op
    rc, out = _run(capsys, p, "--rebuild-if-drift")
    assert rc == 0 and out["rebuilt"] is False
    assert out["generation"] == 1

    # trip the guard (shifted mass near -e_k), then the admin retrains
    shifted = [
        (
            9000 + i,
            [
                float(x)
                for x in (
                    -np.eye(DIM)[i % N_BLOBS] + rng.normal(0, 0.05, DIM)
                )
            ],
        )
        for i in range(120)
    ]
    store.append(_frame(spark, shifted), "shifted")
    assert store.drift()["needs_retrain"]

    rc, out = _run(capsys, p, "--rebuild-if-drift", "--kmeans-iters", "2")
    assert rc == 0 and out["rebuilt"] is True
    assert not out["needs_retrain"]
    assert out["n_vectors"] == len(base) + 10 + len(shifted)
    # the rebuilt store still answers probes over every committed vector
    q = _frame(spark, [base[0], shifted[0]])
    got = IvfLayoutStore.open(spark, p).topk(q, k=3, nprobe=N_BLOBS)
    assert got.count() == 6


def test_lsh_status_and_compact(spark, tmp_path, capsys):
    corpus = _corpus(spark)
    p = str(tmp_path / "idx")
    idx = LshDedupIndex(spark, p, jaccard_min=JMIN)
    idx.add_batch(corpus.filter(F.col("doc_id") % 2 == 0), "b1")
    idx.add_batch(corpus.filter(F.col("doc_id") % 2 == 1), "b2")

    rc, out = _run(capsys, p)
    assert rc == 0 and out["kind"] == "lsh"
    assert out["batches"] == ["b1", "b2"]

    rc, out = _run(capsys, p, "--compact")
    assert rc == 0 and out["compacted"] is True
    assert out["batches"] == ["gen1"]

    # --rebuild-if-drift is an IVF action: loud, not silent
    rc, out = _run(capsys, p, "--rebuild-if-drift")
    assert rc == 1 and "IVF action" in out["error"]


def test_mg_status_and_compact_refusal(tmp_path, capsys):
    p = str(tmp_path / "mg")
    store = MgSummaryStore(p, k=4)
    store.merge_epoch([("a", 7), ("b", 2)], 9, "q-epoch-0")

    rc, out = _run(capsys, p)
    assert rc == 0 and out["kind"] == "mg"
    assert out["k"] == 4 and out["total_weight"] == 9
    assert out["n_candidates"] == 2
    assert out["epoch_hwm"] == {"q": 0}

    rc, out = _run(capsys, p, "--compact")
    assert rc == 1 and "nothing to compact" in out["error"]


def test_lock_holder_is_reported(tmp_path, capsys):
    import os

    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.store_lock import (
        store_write_lock,
    )

    p = str(tmp_path / "mg")
    MgSummaryStore(p, k=2).merge_epoch([("a", 1)], 1, "b1")
    with store_write_lock(p):
        rc, out = _run(capsys, p)
    assert rc == 0
    assert out["lock"] == {
        "held": True,
        "holder_pid": os.getpid(),
        "holder_alive": True,
    }


def test_unreadable_lock_reads_held_not_absent(tmp_path, capsys):
    """r11 advice: a lock file that EXISTS but carries no parsable pid
    is the unstealable empty/corrupt lock every writer is blocking on —
    the status line must say held (holder unknown), not "no lock"."""
    import os

    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.store_lock import (
        LOCK_NAME,
    )

    p = str(tmp_path / "mg")
    MgSummaryStore(p, k=2).merge_epoch([("a", 1)], 1, "b1")
    lock = os.path.join(p, LOCK_NAME)
    with open(lock, "w") as fh:
        fh.write("not-a-pid")
    rc, out = _run(capsys, p)
    assert rc == 0
    assert out["lock"] == {
        "held": True,
        "holder_pid": None,
        "holder_alive": None,
    }
    # empty lock: same answer shape — present, holder unknowable
    with open(lock, "w"):
        pass
    rc, out = _run(capsys, p)
    assert out["lock"]["held"] is True
    assert out["lock"]["holder_pid"] is None
    os.unlink(lock)
    rc, out = _run(capsys, p)
    assert out["lock"] == {"held": False}


def test_bm25_status_and_compact(spark, tmp_path, capsys):
    """The BM25 retrieval index rides the same CLI: status from one
    meta snapshot (n_docs/s_tokens/fan-in/ledger sizes), --compact
    folds the batch dirs, --rebuild-if-drift is rejected (no centroids
    to drift) — and the identity knobs are ADOPTED from the meta."""
    from pyspark.sql import functions as F

    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import (
        load_table,
    )
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.bm25_index import (
        Bm25Index,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    p = str(tmp_path / "bm25")
    idx = Bm25Index(spark, p, n_buckets=4)  # non-default: adoption test
    for i in range(2):
        idx.append(docs.filter(F.col("doc_id") % 2 == i), f"b{i}")
    rc, out = _run(capsys, p)
    assert rc == 0
    assert out["kind"] == "bm25"
    assert out["n_docs"] == docs.count()
    assert out["appended_batches"] == 2 and len(out["batches"]) == 2
    rc, out = _run(capsys, p, "--compact")
    assert rc == 0 and out["compacted"] is True
    assert out["batches"] == ["gen1"] and out["appended_batches"] == 0
    assert out["n_docs"] == docs.count()  # additive stats survive
    rc, out = _run(capsys, p, "--rebuild-if-drift")
    assert rc == 1 and "IVF action" in out["error"]


def test_kmeans_iters_zero_is_loud(capsys):
    with pytest.raises(SystemExit):
        store_admin.build_parser().parse_args(
            ["/x", "--rebuild-if-drift", "--kmeans-iters", "0"]
        )


def test_compact_plus_rebuild_skips_the_double_fold(spark, tmp_path, capsys):
    """--compact --rebuild-if-drift on a drift-tripped store must not
    fold the full corpus twice: the rebuild IS a fold (r11 review)."""
    rng = np.random.default_rng(9)
    p = str(tmp_path / "s")
    store = IvfLayoutStore(spark, p, drift_threshold=0.10)
    base = [r for b in range(N_BLOBS) for r in _blob_vectors(rng, b, 20, b * 1000)]
    store.build(_frame(spark, base), _centroids(spark))
    shifted = [
        (
            9000 + i,
            [
                float(x)
                for x in (
                    -np.eye(DIM)[i % N_BLOBS] + rng.normal(0, 0.05, DIM)
                )
            ],
        )
        for i in range(100)
    ]
    store.append(_frame(spark, shifted), "shifted")
    assert store.drift()["needs_retrain"]

    rc, out = _run(capsys, p, "--compact", "--rebuild-if-drift")
    assert rc == 0 and out["rebuilt"] is True
    assert "compacted" not in out  # superseded by the rebuild's fold
    assert out["generation"] == 1  # ONE new generation, not two
    assert out["batches"] == ["gen1"]
    assert not out["needs_retrain"]


def test_ngram_status_and_compact(spark, tmp_path, capsys):
    """The n-gram count store rides the same CLI: status (n_windows /
    fan-in / ledger sizes from one snapshot), --compact sum-merges,
    --rebuild-if-drift rejected, identity adopted from the meta."""
    from pyspark.sql import functions as F

    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import (
        load_table,
    )
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.ngram_store import (
        NgramCountStore,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    p = str(tmp_path / "ng")
    store = NgramCountStore(spark, p, w=4, n_buckets=4)
    for i in range(2):
        store.append(docs.filter(F.col("doc_id") % 2 == i), f"b{i}")
    rc, out = _run(capsys, p)
    assert rc == 0 and out["kind"] == "ngram"
    assert out["n_windows"] == store.stats()["n_windows"] > 0
    assert out["appended_batches"] == 2
    rc, out = _run(capsys, p, "--compact")
    assert rc == 0 and out["compacted"] is True
    assert out["batches"] == ["gen1"]
    assert out["n_windows"] == store.stats()["n_windows"]
    rc, out = _run(capsys, p, "--rebuild-if-drift")
    assert rc == 1 and "IVF action" in out["error"]


def test_orphan_dirs_surface_in_status(spark, tmp_path, capsys):
    """r13 (r12 verdict #7 follow-through): a persistently undeletable
    orphan should be visible to a SCHEDULER, not only as a one-shot
    log warning — every store's status line carries the count of
    unreferenced batch=* dirs, and it returns to 0 once a sweep
    reclaims them."""
    import os as _os

    from pyspark.sql import functions as F

    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import (
        load_table,
    )
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.ngram_store import (
        NgramCountStore,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    p = str(tmp_path / "ng")
    store = NgramCountStore(spark, p, w=4, n_buckets=4)
    for i in range(2):
        store.append(docs.filter(F.col("doc_id") % 2 == i), f"b{i}")
    rc, out = _run(capsys, p)
    assert rc == 0 and out["orphan_dirs"] == 0
    _os.makedirs(_os.path.join(store._data_root(), "batch=crashed"))
    rc, out = _run(capsys, p)
    assert rc == 0 and out["orphan_dirs"] == 1
    # a compact's sweep reclaims it (it holds the write lock, listdirs,
    # and rmtrees everything the meta doesn't reference)
    rc, out = _run(capsys, p, "--compact")
    assert rc == 0 and out["compacted"] is True
    assert out["orphan_dirs"] == 0


def test_sweep_verb_reclaims_orphans_and_respects_lock(spark, tmp_path, capsys):
    """r14 (r13 verdict #7): --sweep reclaims the orphans the status
    line counts, under the write lock — removed is DISTINCT batch ids
    (one crashed compact = one orphan even across the LSH index's two
    roots), and a held lock makes the verb time out loudly instead of
    sweeping beside a writer."""
    import os as _os

    from pyspark.sql import functions as F

    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import (
        load_table,
    )
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import (
        store_lock,
    )
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.ngram_store import (
        NgramCountStore,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    # single-root store (ngram)
    p = str(tmp_path / "ng")
    store = NgramCountStore(spark, p, w=4, n_buckets=4)
    store.append(docs, "b0")
    _os.makedirs(_os.path.join(store._data_root(), "batch=crashed"))
    rc, out = _run(capsys, p, "--sweep")
    assert rc == 0 and out["swept"] == {"removed": 1, "failed": 0}
    assert out["orphan_dirs"] == 0
    # idempotent
    rc, out = _run(capsys, p, "--sweep")
    assert rc == 0 and out["swept"] == {"removed": 0, "failed": 0}

    # two-root store (LSH): one orphan id under BOTH roots -> removed=1
    corpus = _corpus(spark)
    lp = str(tmp_path / "lsh")
    idx = LshDedupIndex(spark, lp, jaccard_min=JMIN)
    idx.add_batch(corpus, "b1")
    for root in idx.STORE_SCHEMAS:
        _os.makedirs(_os.path.join(idx._store(root, "crashed")))
    rc, out = _run(capsys, lp, "--sweep")
    assert rc == 0 and out["swept"] == {"removed": 1, "failed": 0}
    assert out["orphan_dirs"] == 0
    for root in idx.STORE_SCHEMAS:
        assert not _os.path.isdir(_os.path.join(idx._store(root, "crashed")))

    # a held write lock refuses the sweep (timeout -> exit 1)
    _os.makedirs(_os.path.join(store._data_root(), "batch=crashed2"))
    with store_lock.store_write_lock(p):
        rc, out = _run(capsys, p, "--sweep", "--lock-timeout", "0.2")
        assert rc == 1 and "lock" in out["error"].lower()
    assert _os.path.isdir(_os.path.join(store._data_root(), "batch=crashed2"))

    # the MG store has nothing to sweep — loud, not silent
    mp = str(tmp_path / "mg")
    MgSummaryStore(mp, k=4).merge_epoch([("a", 7)], 7, "q-epoch-0")
    rc, out = _run(capsys, mp, "--sweep")
    assert rc == 1 and "sweep" in out["error"]
