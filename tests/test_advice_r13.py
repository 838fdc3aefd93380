"""r13 advice fixes, each pinned by a test:

1. The unified pipeline's stage set is enforced in BOTH directions via
   a persisted ``_stage_set.json`` marker — toggling the span stage
   OFF (which would silently lose an epoch's n-gram counts in the
   LSH-commit-to-ngram-append crash window) now fails loudly before
   the stream starts, not just toggling it ON.
2. ``store_admin`` reports LSH orphans as DISTINCT orphaned batch ids
   across the buckets/ and shingles/ roots — one crashed compact is
   one orphan, the same unit every other store kind reports.
3. ``_write_bucket_sorted(bound_files=True)`` repartitions to the
   store's bucket count, not the session default (200 mostly-empty
   shuffle partitions per streaming append) — pinned by the shuffle
   partitioning in the append plan.
4. ``NgramCountStore.probe_counts`` refuses a re-evaluatable probe
   frame (the documented silent-wrong mode) unless the caller opts
   out — covered in tests/test_ngram_store.py alongside the probe
   suite.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from dynamics_365_to_bigquery_spark_etl_pipeline_spark import store_admin
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.dedup_index import (
    LshDedupIndex,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.ngram_store import (
    NgramCountStore,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.ingest_pipeline import (
    STAGE_SET_MARKER,
    _check_stage_set_marker,
    stream_ingest_pipeline,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "text")


# -- 1: stage-set marker, both directions ------------------------------------


def test_stage_set_marker_unit_both_directions(tmp_path):
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    on = {"span": True, "bm25": False}
    off = {"span": False, "bm25": False}
    _check_stage_set_marker([out, ck], on)  # first start records it
    for d in (out, ck):
        with open(os.path.join(d, STAGE_SET_MARKER)) as fh:
            assert json.load(fh) == on
    _check_stage_set_marker([out, ck], on)  # same set restarts fine
    with pytest.raises(RuntimeError, match="stage set is fixed"):
        _check_stage_set_marker([out, ck], off)  # toggle OFF: loud
    with pytest.raises(RuntimeError, match="stage set is fixed"):
        _check_stage_set_marker([out, ck], {"span": True, "bm25": True})
    # the r14-review case: fresh out_dir, SAME checkpoint — the
    # checkpoint's surviving copy still refuses (the replay identity
    # is the checkpoint, not the artifact dir)
    with pytest.raises(RuntimeError, match="stage set is fixed"):
        _check_stage_set_marker([str(tmp_path / "out2"), ck], off)
    # and the refused start must not have adopted the new set anywhere
    assert not os.path.exists(
        os.path.join(str(tmp_path / "out2"), STAGE_SET_MARKER)
    )
    # a pre-marker dir pair adopts the current set (legacy upgrade)
    legacy = str(tmp_path / "legacy")
    os.makedirs(legacy)
    _check_stage_set_marker([legacy, str(tmp_path / "lck")], off)
    with pytest.raises(RuntimeError, match="stage set is fixed"):
        _check_stage_set_marker([legacy, str(tmp_path / "lck")], on)


def test_span_stage_toggle_off_fails_before_stream_start(spark, tmp_path):
    """The r13 advice scenario: a pipeline that ran WITH the span
    stage, restarted without it, must refuse at setup — a crash in the
    LSH-commit-to-ngram-append window would otherwise replay as a
    silent whole-epoch skip (the LSH guard is satisfied) and the
    epoch's n-gram counts would be lost with no error."""
    docs = _docs(spark)
    heldout = docs.filter(F.col("doc_id") % 13 == 0)
    train = docs.filter(F.col("doc_id") % 13 != 0)
    src = tmp_path / "src"
    train.coalesce(1).write.parquet(str(src))
    out, idx, ck = tmp_path / "out", tmp_path / "idx", tmp_path / "ck"
    q = stream_ingest_pipeline(
        spark, str(src), train.schema, heldout, str(out), str(idx),
        str(ck), span_store_path=str(tmp_path / "ng"),
    )
    assert q.awaitTermination(240)
    with pytest.raises(RuntimeError, match="stage set is fixed"):
        stream_ingest_pipeline(
            spark, str(src), train.schema, heldout, str(out), str(idx),
            str(ck),
        )


# -- 2: LSH orphan count unit -------------------------------------------------


def test_lsh_orphans_counted_as_distinct_batch_ids(spark, tmp_path, capsys):
    """One crashed compact orphans the SAME batch id under buckets/
    AND shingles/ — the status line must report 1 orphan, not 2, so a
    scheduler alerting on the count sees the same unit as every other
    store kind (r13 advice)."""
    from tests.test_dedup_index import JMIN, _corpus

    corpus = _corpus(spark)
    p = str(tmp_path / "idx")
    idx = LshDedupIndex(spark, p, jaccard_min=JMIN)
    idx.add_batch(corpus, "b1")
    for root in idx.STORE_SCHEMAS:
        os.makedirs(os.path.join(idx._store(root, "crashed")))
    rc = store_admin.main([p])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["orphan_dirs"] == 1


# -- 3: delta appends land in n_buckets shuffle partitions --------------------


def test_bounded_append_shuffles_to_n_buckets_partitions(spark, tmp_path):
    """The bound-files append's repartition must land in n_buckets
    partitions, not the session default — per-epoch overhead on the
    streaming hot path (r13 advice). Pinned by the written layout (one
    file per touched bucket) plus the shuffle partitioning of the
    chassis write expression."""
    store = NgramCountStore(spark, str(tmp_path / "ng"), w=3, n_buckets=4)
    store.append(_docs(spark), "b0")
    root = store._batch_dir("b0")
    buckets = [d for d in os.listdir(root) if d.startswith("gram_bucket=")]
    assert buckets, root
    for b in buckets:
        files = [
            f
            for f in os.listdir(os.path.join(root, b))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (b, files)
    # the repartition expression itself: n_buckets partitions, keyed on
    # the bucket column
    counts = store._bucketed(store.batch_counts(_docs(spark).select("text")))
    plan = (
        counts.repartition(store.n_buckets, "gram_bucket")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(gram_bucket" in plan and ", 4)" in plan


def test_sweep_stray_file_counts_failed_not_removed(spark, tmp_path):
    """r14 review pin: a stray FILE named batch=* fails the rmtree
    (failed=1) and must NOT also count as removed — removed means
    gone, the unit a scheduler reconciles against orphan_dirs."""
    store = NgramCountStore(spark, str(tmp_path / "ng"), w=3, n_buckets=2)
    store.append(_docs(spark), "b0")
    stray = os.path.join(store._data_root(), "batch=junkfile")
    with open(stray, "w") as fh:
        fh.write("not a dir")
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore")
        out = store.sweep()
    assert out == {"removed": 0, "failed": 1}
    assert os.path.isfile(stray)


def test_failed_setup_does_not_pin_stage_set(spark, tmp_path):
    """r14 review pin: a first start that fails construction-time
    validation (reserved column) must not write the stage-set marker —
    the user can fix the config and start the SAME out_dir with a
    different stage set."""
    import pyspark.sql.functions as _F

    docs = _docs(spark).withColumn("dup_pct", _F.lit(1.0))  # reserved
    heldout = docs.limit(2)
    src = tmp_path / "src"
    docs.coalesce(1).write.parquet(str(src))
    out = tmp_path / "out"
    with pytest.raises(ValueError, match="reserved"):
        stream_ingest_pipeline(
            spark, str(src), docs.schema, heldout, str(out),
            str(tmp_path / "idx"), str(tmp_path / "ck"),
            span_store_path=str(tmp_path / "ng"),
        )
    assert not os.path.exists(os.path.join(str(out), STAGE_SET_MARKER))
    # the same out_dir now starts WITHOUT the span stage
    clean_docs = _docs(spark)
    src2 = tmp_path / "src2"
    clean_docs.coalesce(1).write.parquet(str(src2))
    q = stream_ingest_pipeline(
        spark, str(src2), clean_docs.schema,
        clean_docs.limit(2).localCheckpoint(), str(out),
        str(tmp_path / "idx2"), str(tmp_path / "ck2"),
    )
    assert q.awaitTermination(240)
    with open(os.path.join(str(out), STAGE_SET_MARKER)) as fh:
        assert json.load(fh) == {"span": False, "bm25": False}
