"""Round-8 advice items, each test-pinned:

1. plan CONSTRUCTION of the checkpoint-staged dedup queries runs zero
   Spark jobs (localCheckpoint(eager=False) — schema inspection,
   explain, and registry enumeration must not execute the pipeline);
2. ``read_snapshot`` on a pre-r7 bucketed dir is a PURE read: a
   read-only store (schema-cache write fails) still gets the correct
   mergeSchema frame;
3. ``--compact-buckets 0`` is a loud parser error, not a silent no-op;
4. the IVF layout cache is invalidated when the fixture at a given
   sf_dir is regenerated in-process.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _jobs_started(spark) -> int:
    """Monotone count of jobs submitted to the DAG scheduler."""
    return spark._jsc.sc().dagScheduler().nextJobId()


def test_dedup_plan_construction_runs_no_pipeline_jobs(spark):
    """r7 advice: eager localCheckpoint at plan-construction time meant
    merely BUILDING the DataFrame executed full Spark pipelines (and
    pinned non-fault-tolerant blocks). ``lazy_stage`` (AQE + broadcast
    scoped off for the staged compile) makes construction metadata-only:

    - grid routed over in-memory input: ZERO jobs;
    - table-backed minhash/simhash: exactly the parquet footer-read job
      ``load_table`` itself costs (scan setup, not pipeline execution);
    - semantic routed: the centroid collect its kernel contract
      requires (the centroid matrix rides the closure) — bounded by the
      jobs of collecting the centroid frame alone, never the corpus
      pipeline."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.similarity import (
        grid_near_dup_pairs_deduped,
        semantic_dedup_pairs_deduped,
    )
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.plans.dedup_queries import (
        _minhash_pairs,
        q_dedup_simhash,
    )

    emb = (
        spark.range(16)
        .select(
            F.col("id").alias("vec_id"),
            F.array(*[F.rand(seed=i) for i in range(4)])
            .cast("array<float>")
            .alias("embedding"),
        )
        .localCheckpoint()  # materialize INPUTS before counting
    )
    cents = emb.limit(4).localCheckpoint()

    # baseline: what does scan setup alone cost?
    before = _jobs_started(spark)
    load_table(spark, SF_DIR, "documents").schema
    footer_jobs = _jobs_started(spark) - before
    before = _jobs_started(spark)
    cents.collect()
    collect_jobs = _jobs_started(spark) - before

    before = _jobs_started(spark)
    df = grid_near_dup_pairs_deduped(emb, threshold=0.999, k_dims=2, n_rows=16, dim=4)
    _ = df.schema
    assert _jobs_started(spark) - before == 0, "grid routed must build job-free"

    before = _jobs_started(spark)
    mh = _minhash_pairs(spark, SF_DIR, fast=True)
    _ = mh.schema
    assert _jobs_started(spark) - before <= footer_jobs

    before = _jobs_started(spark)
    sh_df = q_dedup_simhash(spark, SF_DIR)
    _ = sh_df.schema
    assert _jobs_started(spark) - before <= footer_jobs

    before = _jobs_started(spark)
    sem = semantic_dedup_pairs_deduped(emb, cents, threshold=0.999)
    _ = sem.schema
    assert _jobs_started(spark) - before <= collect_jobs

    # and the plans still execute correctly afterwards
    assert mh.count() > 0 and df.count() >= 0


def test_read_snapshot_pure_read_on_readonly_store(spark, tmp_path, monkeypatch):
    """The pre-r7 bucketed-dir bootstrap records the merged schema as a
    best-effort CACHE: when the store is read-only (write_table_schema
    raises), the reader must still get the mergeSchema frame with the
    drifted column visible — a read path must never REQUIRE a write."""
    import time

    from dynamics_365_to_bigquery_spark_etl_pipeline_spark import sinks
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.pipeline import (
        EntityPipeline,
    )

    from tests.test_schema_drift_sinks import _run_drift_history, _snapshot_map

    landing = str(tmp_path / "l")
    pipe = EntityPipeline(
        spark,
        landing,
        str(tmp_path / "s"),
        str(tmp_path / "st"),
        bucket_partitions=4,
    )
    _run_drift_history(pipe, landing, time.time() - 100)
    table = str(tmp_path / "s" / "items")
    os.remove(os.path.join(table, sinks.SCHEMA_NAME))  # pre-r7 state

    def refuse(*a, **k):
        raise OSError("read-only file system")

    monkeypatch.setattr(sinks, "write_table_schema", refuse)
    got = _snapshot_map(pipe.read_snapshot("Items"))
    assert got["k0"] == (999.0, "hello") and got["k1"] == (998.0, "world")
    assert not os.path.exists(os.path.join(table, sinks.SCHEMA_NAME))


def test_cli_compact_buckets_zero_rejected(capsys):
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.__main__ import main

    for bad in ("0", "-3"):
        with pytest.raises(SystemExit) as exc:
            main(["a", "b", "c", "--compact-buckets", bad])
        assert exc.value.code == 2
        assert "must be >= 1" in capsys.readouterr().err


def test_ivf_layout_cache_invalidated_on_fixture_rewrite(spark, tmp_path):
    """r7 advice: the layout cache was keyed by sf_dir alone, so a
    fixture regenerated in-process silently served results from the
    stale index. The key now carries a file-list fingerprint."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.plans import (
        similarity_queries as SQ,
    )

    sf = tmp_path / "sf"
    os.makedirs(sf)
    shutil.copy(
        os.path.join(SF_DIR, "embeddings.parquet"),
        str(sf / "embeddings.parquet"),
    )
    first = SQ.q_sim_ivf_layout_topk(spark, str(sf))
    neighbors_first = {(r.query_id, r.neighbor_id) for r in first.collect()}
    layouts_after_first = dict(SQ._LAYOUT_CACHE)

    # rerun against unchanged data: the cache must HIT (no new layout)
    SQ.q_sim_ivf_layout_topk(spark, str(sf)).count()
    assert dict(SQ._LAYOUT_CACHE) == layouts_after_first

    # regenerate the fixture in place (different mtime/size): rebuild
    emb = spark.read.parquet(str(sf / "embeddings.parquet"))
    sub = emb.filter(F.col("vec_id") % 2 == 0).repartition(1)
    tmp_out = str(tmp_path / "rewrite")
    sub.write.parquet(tmp_out)
    shutil.rmtree(str(sf / "embeddings.parquet"), ignore_errors=True)
    os.remove(str(sf / "embeddings.parquet")) if os.path.exists(
        str(sf / "embeddings.parquet")
    ) else None
    shutil.move(tmp_out, str(sf / "embeddings.parquet"))

    second = SQ.q_sim_ivf_layout_topk(spark, str(sf))
    neighbors_second = {(r.query_id, r.neighbor_id) for r in second.collect()}
    stale = [
        v for k, v in layouts_after_first.items() if k[0] == str(sf)
    ]
    live = [v for k, v in SQ._LAYOUT_CACHE.items() if k[0] == str(sf)]
    assert live and live != stale, "stale layout served after rewrite"
    # stale dirs are RETIRED (earlier DataFrames may still read them;
    # deleted at process exit or when THIS sf_dir rebuilds again — the
    # retirement list is scoped per sf_dir, r8 advice), never re-served
    for old in stale:
        assert old in SQ._RETIRED_LAYOUTS[str(sf)] and os.path.exists(old)
    assert neighbors_first and neighbors_second
    # odd vec_ids vanished from the corpus: the rebuilt index must not
    # return them, the stale one would have
    assert all(n % 2 == 0 for _q, n in neighbors_second)
    assert neighbors_second != neighbors_first


def test_ivf_layout_size_guard(spark, tmp_path, monkeypatch):
    """Past the configurable cap, the per-process /tmp layout build
    refuses loudly with a pointer at build_ivf_layout instead of
    silently copying a huge corpus into scratch space."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.plans import (
        similarity_queries as SQ,
    )

    monkeypatch.setenv("SPARK_GRAFT_IVF_LAYOUT_MAX_MB", "0")
    with pytest.raises(RuntimeError, match="build_ivf_layout"):
        SQ.q_sim_ivf_layout_topk(spark, SF_DIR)
