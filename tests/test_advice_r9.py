"""Round-9 verdict/advice items, each test-pinned:

1. ``lazy_stage`` compiles the staged subplan against a CLONED session —
   a concurrent thread compiling a broadcast-eligible plan DURING a
   lazy_stage call keeps broadcast and AQE (the old implementation
   flipped shared session conf under a lock; the lock is gone);
2. the dedup-index ``compact()`` on a meta/disk-corrupt store (live
   batches listed, postings dirs missing) raises a descriptive error
   naming the missing dirs instead of an opaque IndexError;
3. the IVF retired-layout sweep is scoped per sf_dir: rebuilding sf_dir
   B's layout must not delete sf_dir A's just-retired dirs.
"""

from __future__ import annotations

import os
import shutil
import threading

import pytest
from pyspark.sql import functions as F

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import stage

SF_DIR = "/root/testdata/sf0.001"


def test_lazy_stage_leaves_concurrent_compiles_broadcastable(spark):
    """r8 verdict #6 / advice: the conf-flip window is GONE — lazy_stage
    sets AQE/broadcast off on a cloned session only. A second thread
    compiling a broadcast-eligible join exactly mid-lazy_stage (via the
    test seam) must still plan a BroadcastHashJoin, and the shared
    session conf must read unchanged throughout."""
    small = spark.range(10).withColumnRenamed("id", "k")
    big = spark.range(1000).selectExpr("id % 10 AS k", "id AS v")

    seen: dict = {}

    def compile_broadcast_join():
        plan = (
            big.join(small, "k")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        seen["plan"] = plan
        seen["aqe"] = spark.conf.get("spark.sql.adaptive.enabled")
        seen["bc"] = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")

    def mid_compile_hook():
        t = threading.Thread(target=compile_broadcast_join)
        t.start()
        t.join()

    stage._MID_COMPILE_HOOK = mid_compile_hook
    try:
        staged = stage.lazy_stage(big.groupBy("k").agg(F.sum("v").alias("s")))
    finally:
        stage._MID_COMPILE_HOOK = None

    assert "plan" in seen, "hook did not run — the seam is the test's premise"
    assert "BroadcastHashJoin" in seen["plan"], seen["plan"]
    assert seen["aqe"] == "true"
    assert seen["bc"] != "-1"
    # the staged plan itself still executes, bound to the ORIGINAL session
    assert staged.sparkSession is spark
    assert staged.count() == 10
    # and the staged compile really did exclude broadcast/AQE: its plan
    # is a checkpoint scan, not a live subtree
    assert "ExistingRDD" in staged._jdf.queryExecution().executedPlan().toString()


def test_lazy_stage_has_no_shared_lock():
    """The serialization lock existed only to guard the shared-conf flip;
    with the cloned-session compile there is nothing to serialize."""
    assert not hasattr(stage, "_STAGE_LOCK")


def test_compact_on_store_with_missing_dirs_raises_descriptive(spark, tmp_path):
    """r8 advice: meta lists >=2 live batches but the postings dirs were
    GC'd / partially restored — compact() must fail loudly naming the
    missing dirs, not IndexError at legs[0] (and must NOT swap the meta
    to an empty generation)."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.dedup_index import (
        LshDedupIndex,
    )

    idx = LshDedupIndex(spark, str(tmp_path / "idx"))
    docs = spark.createDataFrame(
        [(i, f"doc body number {i} " * 5) for i in range(8)], "doc_id long, text string"
    )
    for b in ("b1", "b2"):
        _pairs, commit = idx.prepare_batch(docs, b)
        commit()
    assert len(idx.committed_batches()) == 2
    # PARTIAL loss first (r9 review finding: an all-missing-only guard
    # would still fold b1 alone and permanently erase b2): one batch's
    # postings dir gone, meta intact
    shutil.rmtree(os.path.join(idx.path, "buckets", "batch=b2"))
    with pytest.raises(RuntimeError, match="corrupt.*missing"):
        idx.compact()
    # then the whole store gone
    shutil.rmtree(os.path.join(idx.path, "buckets"))
    with pytest.raises(RuntimeError, match="corrupt.*missing"):
        idx.compact()
    # meta untouched — the store stays in its (tolerated-by-reads) state
    assert idx.committed_batches() == ["b1", "b2"]


def test_retired_layout_sweep_scoped_per_sf_dir(spark, tmp_path):
    """r8 advice: the retired-dir sweep fired on ANY cache-miss build,
    so building sf_dir B's layout deleted sf_dir A's just-retired dirs —
    breaking A-DataFrames obtained before a SINGLE rewrite of A. Now A's
    retirees survive B's build and die only when A itself rebuilds."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.plans import (
        similarity_queries as SQ,
    )

    def make_fixture(name):
        d = tmp_path / name
        os.makedirs(d)
        shutil.copy(
            os.path.join(SF_DIR, "embeddings.parquet"),
            str(d / "embeddings.parquet"),
        )
        return str(d)

    def rewrite(sf):
        emb = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
        sub = emb.filter(F.col("vec_id") % 2 == 0).repartition(1)
        out = str(tmp_path / "rw")
        sub.write.mode("overwrite").parquet(out)
        tgt = os.path.join(sf, "embeddings.parquet")
        shutil.rmtree(tgt) if os.path.isdir(tgt) else os.remove(tgt)
        shutil.move(out, tgt)

    sf_a, sf_b = make_fixture("sfA"), make_fixture("sfB")
    SQ.q_sim_ivf_layout_topk(spark, sf_a).count()
    rewrite(sf_a)
    SQ.q_sim_ivf_layout_topk(spark, sf_a).count()  # retires A's first layout
    retired_a = list(SQ._RETIRED_LAYOUTS[sf_a])
    assert retired_a and all(os.path.exists(p) for p in retired_a)

    # building (and rebuilding) B must leave A's retirees on disk
    SQ.q_sim_ivf_layout_topk(spark, sf_b).count()
    rewrite(sf_b)
    SQ.q_sim_ivf_layout_topk(spark, sf_b).count()
    assert all(os.path.exists(p) for p in retired_a)
    assert SQ._RETIRED_LAYOUTS[sf_b]

    # only A's NEXT rebuild sweeps A's retirees
    rewrite(sf_a)
    SQ.q_sim_ivf_layout_topk(spark, sf_a).count()
    assert all(not os.path.exists(p) for p in retired_a)


def test_ivf_recall_floor_on_clustered_corpus(spark):
    """r8 verdict #4: the fixture recall of 1.0 is on clone-amplified
    uniform data where the nearest centroid always holds the true
    neighbors — it cannot show where the default ``nprobe`` loses. This
    pins a floor on a deliberately CLUSTERED corpus (paired Gaussian
    blobs with cross-blob near-neighbors, scripts/ivf_recall_curve.py):
    at the production default nprobe=4 recall@10 must hold >= 0.95,
    while nprobe=1 demonstrably loses (< 0.92 measured 0.84) — i.e. the
    corpus is genuinely adversarial AND the default survives it. Probe
    sets nest as nprobe grows, so the curve is monotone by construction;
    the full 1/2/4/8 sweep is recorded in SCALING.md."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "spark_graft_ivf_recall_curve",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "ivf_recall_curve.py",
        ),
    )
    rc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rc)

    X = rc.clustered_corpus(n_per_blob=60)  # 960 vectors, deterministic
    curve = rc.recall_curve(spark, X, n_queries=40, nprobes=(1, 4))
    assert curve[1] < 0.92, curve  # the corpus actually punishes underprobing
    assert curve[4] >= 0.95, curve  # the default's floor


def test_routed_group_labels_equal_member_level_components(spark):
    """r9: q_dedup_groups runs connected components on REP-level pairs
    and fans labels out through the member map — must equal components
    over the materialized member-level pair set, on the fixture AND on
    planted shapes covering all three label cases (rep in graph, clone
    group without rep edges, singleton member of an edge-less rep)."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import dedup as D
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.plans import (
        dedup_queries as DQ,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        member_pairs = DQ._minhash_pairs(spark, sf, fast=False).select(
            "id_a", "id_b"
        )
        want = {
            (r.id, r.group_id)
            for r in D.connected_components(member_pairs).collect()
        }
        rep_pairs, live = DQ._minhash_parts(spark, sf, fast=False)
        got = {
            (r.doc_id, r.group_id)
            for r in DQ._routed_group_labels(rep_pairs, live).collect()
        }
        assert got == want, sf

    # planted: reps 0 and 10 near-dup (rep edge); rep 20 a clone group
    # of 3 with no rep edge; rep 30 a singleton with no edge
    rep_pairs = spark.createDataFrame([(0, 10)], "id_a long, id_b long")
    live = spark.createDataFrame(
        [(0, 0), (0, 1), (10, 10), (20, 20), (20, 21), (20, 22), (30, 30)],
        "_rid long, doc_id long",
    )
    got = {
        (r.doc_id, r.group_id)
        for r in DQ._routed_group_labels(rep_pairs, live).collect()
    }
    assert got == {
        (0, 0), (1, 0), (10, 0),          # rep component 0-10, fanned out
        (20, 20), (21, 20), (22, 20),     # clone-only group
        # 30: singleton, no label row — not in any pair
    }
