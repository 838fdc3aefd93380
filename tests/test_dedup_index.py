"""Incremental LSH dedup index: batch-accumulated pairs must equal the
full-corpus recompute, replays must be no-ops, and crashes between the
store write and the meta commit must not corrupt state."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import dedup as D
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.dedup_index import (
    LshDedupIndex,
)

SF_DIR = "/root/testdata/sf0.001"
JMIN = 0.5


def _corpus(spark):
    """Base docs + injected near-dups (same recipe as the dedup query
    family: every 10th doc duplicated verbatim with id+10000)."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    return docs.unionByName(dups)


def _full_pairs(spark, corpus):
    """Reference: one-shot LSH + exact-Jaccard over the whole corpus."""
    sh = corpus.select("doc_id", D.shingles(F.col("text")).alias("sh")).filter(
        F.size("sh") > 0
    )
    sig = sh.select("doc_id", D.minhash_signature(F.col("sh")).alias("sig"))
    banded = sig.select(
        "doc_id", F.posexplode(D.band_keys(F.col("sig"))).alias("band_id", "band_hash")
    )
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    return {
        (r.id_a, r.id_b)
        for r in cand.join(
            sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
        )
        .join(sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .filter(D.jaccard(F.col("sh_a"), F.col("sh_b")) >= JMIN)
        .collect()
    }


def _norm(pairs):
    return {(min(a, b), max(a, b)) for a, b in pairs}


def test_incremental_batches_equal_full_recompute(spark, tmp_path):
    corpus = _corpus(spark)
    b1 = corpus.filter(F.col("doc_id") % 2 == 0)
    b2 = corpus.filter(F.col("doc_id") % 2 == 1)

    idx = LshDedupIndex(spark, str(tmp_path / "idx"), jaccard_min=JMIN)
    got = {
        (r.id_a, r.id_b) for r in idx.add_batch(b1, "b1").collect()
    } | {(r.id_a, r.id_b) for r in idx.add_batch(b2, "b2").collect()}

    want = _full_pairs(spark, corpus)
    assert len(want) > 0
    assert _norm(got) == _norm(want)


def test_replayed_batch_is_noop(spark, tmp_path):
    corpus = _corpus(spark)
    idx = LshDedupIndex(spark, str(tmp_path / "idx"), jaccard_min=JMIN)
    first = idx.add_batch(corpus, "b1").collect()
    assert len(first) > 0
    n_bucket_dirs = len(os.listdir(str(tmp_path / "idx" / "buckets")))

    replay = idx.add_batch(corpus, "b1").collect()
    assert replay == []
    assert len(os.listdir(str(tmp_path / "idx" / "buckets"))) == n_bucket_dirs


def test_crash_before_commit_leaves_orphan_invisible(spark, tmp_path):
    corpus = _corpus(spark)
    b1 = corpus.filter(F.col("doc_id") % 2 == 0)
    b2 = corpus.filter(F.col("doc_id") % 2 == 1)

    idx = LshDedupIndex(spark, str(tmp_path / "idx"), jaccard_min=JMIN)
    idx.add_batch(b1, "b1").collect()

    # simulate: b2's store dirs written, crash before the meta commit
    commit = idx._commit
    idx._commit = lambda batch_id, n_buckets: None
    idx.add_batch(b2, "b2").collect()
    idx._commit = commit
    assert os.path.isdir(str(tmp_path / "idx" / "buckets" / "batch=b2"))
    assert idx.committed_batches() == ["b1"]

    # retry succeeds and the accumulated result is still exact
    got = {(r.id_a, r.id_b) for r in idx.add_batch(b2, "b2").collect()}
    b1_pairs = {
        (r.id_a, r.id_b)
        for r in LshDedupIndex(spark, str(tmp_path / "fresh"), jaccard_min=JMIN)
        .add_batch(b1, "x")
        .collect()
    }
    assert _norm(got | b1_pairs) == _norm(_full_pairs(spark, _corpus(spark)))


def test_compaction_preserves_probe_results_and_replay_guard(spark, tmp_path):
    """compact() merges the per-batch store dirs into one generation
    dir; probing a later batch must return identical pairs, a replayed
    PRE-compaction batch id must stay a no-op, and the live dir count
    must drop to one per store."""
    corpus = _corpus(spark)
    b1 = corpus.filter(F.col("doc_id") % 3 == 0)
    b2 = corpus.filter(F.col("doc_id") % 3 == 1)
    b3 = corpus.filter(F.col("doc_id") % 3 == 2)

    plain = LshDedupIndex(spark, str(tmp_path / "plain"), jaccard_min=JMIN)
    plain.add_batch(b1, "b1").collect()
    plain.add_batch(b2, "b2").collect()
    want = {(r.id_a, r.id_b) for r in plain.add_batch(b3, "b3").collect()}

    idx = LshDedupIndex(spark, str(tmp_path / "idx"), jaccard_min=JMIN)
    idx.add_batch(b1, "b1").collect()
    idx.add_batch(b2, "b2").collect()
    assert idx.compact() is True
    assert idx.committed_batches() == ["gen1"]
    assert sorted(os.listdir(str(tmp_path / "idx" / "buckets"))) == ["batch=gen1"]

    got = {(r.id_a, r.id_b) for r in idx.add_batch(b3, "b3").collect()}
    assert _norm(got) == _norm(want)

    # pre-compaction ids survive in the replay guard
    assert idx.add_batch(b1, "b1").collect() == []
    assert "b1" in idx.committed_ids()

    # nothing left to merge after a compact of a single live dir + b3
    assert idx.compact() is True
    assert idx.compact() is False


def test_crash_mid_compact_leaves_index_readable(spark, tmp_path):
    """A crash between writing the generation dirs and the meta swap
    must leave the old per-batch state fully readable, and the retry
    must converge to the same compacted state."""
    corpus = _corpus(spark)
    b1 = corpus.filter(F.col("doc_id") % 2 == 0)
    b2 = corpus.filter(F.col("doc_id") % 2 == 1)

    idx = LshDedupIndex(spark, str(tmp_path / "idx"), jaccard_min=JMIN)
    idx.add_batch(b1, "b1").collect()
    pre_batches = idx.committed_batches()

    # crash: gen dirs written, meta swap never happens
    write_meta = idx._write_meta
    idx._write_meta = lambda meta: (_ for _ in ()).throw(OSError("crash"))
    try:
        idx.add_batch(b2, "b2")  # build second live dir first
    except OSError:
        pass
    idx._write_meta = write_meta
    idx.add_batch(b2, "b2").collect()  # commit b2 for real

    idx._write_meta = lambda meta: (_ for _ in ()).throw(OSError("crash"))
    try:
        idx.compact()
        assert False, "expected simulated crash"
    except OSError:
        pass
    idx._write_meta = write_meta

    # old state still live and readable: probe result == fresh recompute
    assert sorted(idx.committed_batches()) == sorted(pre_batches + ["b2"])
    assert sum(leg.count() for leg in idx._postings_legs()) > 0

    # retry converges
    assert idx.compact() is True
    assert idx.committed_batches() == ["gen1"]
    got = {(r.id_a, r.id_b) for r in idx.add_batch(corpus.limit(0), "noop").collect()}
    assert got == set()


def test_streaming_dedup_index_accumulates_exact_pairs(spark, tmp_path):
    """Two micro-batches through the streaming leg (one file per
    trigger): the union of per-epoch pair outputs must equal the
    full-corpus recompute, and the index must hold one committed batch
    per epoch."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.cdc_stream import (
        stream_dedup_index,
    )

    corpus = _corpus(spark)
    src = str(tmp_path / "src")
    b1 = corpus.filter(F.col("doc_id") % 2 == 0)
    b2 = corpus.filter(F.col("doc_id") % 2 == 1)
    b1.coalesce(1).write.parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    q = stream_dedup_index(
        spark,
        src,
        corpus.schema,
        index_path=str(tmp_path / "idx"),
        pairs_dir=str(tmp_path / "pairs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        jaccard_min=JMIN,
    )
    q.awaitTermination(180)

    got = {
        (r.id_a, r.id_b)
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    assert _norm(got) == _norm(_full_pairs(spark, corpus))

    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.dedup_index import (
        LshDedupIndex,
    )

    idx = LshDedupIndex(spark, str(tmp_path / "idx"))
    assert len(idx.committed_batches()) == 2


def test_streaming_trigger_rate_parameter(spark, tmp_path):
    """r8: ``max_files_per_trigger`` sets the ingestion rate. Four
    source files at 2 files/trigger must drain in TWO epochs (two
    committed index batches, two pairs epochs) with the pair union
    still equal to the full recompute — the trigger size changes
    batching, never results."""
    import os as _os

    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.dedup_index import (
        LshDedupIndex,
    )
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.cdc_stream import (
        stream_dedup_index,
    )

    corpus = _corpus(spark)
    src = str(tmp_path / "src")
    for m in range(4):
        corpus.filter(F.col("doc_id") % 4 == m).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    q = stream_dedup_index(
        spark,
        src,
        corpus.schema,
        index_path=str(tmp_path / "idx"),
        pairs_dir=str(tmp_path / "pairs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        jaccard_min=JMIN,
        max_files_per_trigger=2,
    )
    q.awaitTermination(180)

    got = {
        (r.id_a, r.id_b)
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    assert _norm(got) == _norm(_full_pairs(spark, corpus))

    idx = LshDedupIndex(spark, str(tmp_path / "idx"))
    assert len(idx.committed_batches()) == 2  # 4 files / 2 per trigger
    epochs = [
        d
        for d in _os.listdir(str(tmp_path / "pairs"))
        if d.startswith("epoch=")
    ]
    assert len(epochs) == 2


def test_fresh_checkpoint_on_existing_index_does_not_skip_epochs(spark, tmp_path):
    """Epoch ids restart at 0 with a rebuilt checkpoint dir; because
    the index batch key is namespaced by the streaming query id, a NEW
    stream (new checkpoint + new pairs dir) probing an EXISTING index
    must still process its epoch 0 instead of skipping it as 'already
    committed'."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.cdc_stream import (
        stream_dedup_index,
    )

    corpus = _corpus(spark)
    b1 = corpus.filter(F.col("doc_id") % 2 == 0)
    # near-dups of b1 docs under fresh ids -> cross-stream pairs exist
    b2 = b1.select((F.col("doc_id") + 50000).alias("doc_id"), "text")

    src1, src2 = str(tmp_path / "src1"), str(tmp_path / "src2")
    b1.coalesce(1).write.parquet(src1)
    b2.coalesce(1).write.parquet(src2)

    idx_path = str(tmp_path / "idx")
    q1 = stream_dedup_index(
        spark, src1, corpus.schema, index_path=idx_path,
        pairs_dir=str(tmp_path / "pairs1"),
        checkpoint_dir=str(tmp_path / "ckpt1"), jaccard_min=JMIN,
    )
    q1.awaitTermination(180)

    q2 = stream_dedup_index(
        spark, src2, corpus.schema, index_path=idx_path,
        pairs_dir=str(tmp_path / "pairs2"),
        checkpoint_dir=str(tmp_path / "ckpt2"), jaccard_min=JMIN,
    )
    q2.awaitTermination(180)

    # the second stream's single epoch is epoch 0 again — it must have
    # produced the b2-vs-b1 pairs, not been skipped
    got = {
        (r.id_a, r.id_b)
        for r in spark.read.parquet(str(tmp_path / "pairs2")).collect()
    }
    assert len(got) > 0
    idx = LshDedupIndex(spark, idx_path)
    # two distinct checkpoints -> two query ids in the bounded epoch
    # ledger, each with high-water epoch 0
    assert sorted(idx.epoch_high_water().values()) == [0, 0]


def test_streaming_auto_compact_bounds_dirs_keeps_pairs_exact(spark, tmp_path):
    """compact_every folds maintenance into the stream: after draining
    two epochs with compact_every=1 the index holds ONE live generation
    dir per store, the replay guard still knows both epochs, and the
    accumulated pairs equal the full-corpus recompute."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.cdc_stream import (
        stream_dedup_index,
    )

    corpus = _corpus(spark)
    src = str(tmp_path / "src")
    corpus.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(src)
    corpus.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)

    q = stream_dedup_index(
        spark, src, corpus.schema,
        index_path=str(tmp_path / "idx"),
        pairs_dir=str(tmp_path / "pairs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        jaccard_min=JMIN,
        compact_every=1,
    )
    q.awaitTermination(180)

    idx = LshDedupIndex(spark, str(tmp_path / "idx"))
    assert len(idx.committed_batches()) == 1
    assert idx.committed_batches()[0].startswith("gen")
    # the replay guard still knows both epochs: one query id at
    # high-water 1 (the bounded ledger survives compaction)
    assert list(idx.epoch_high_water().values()) == [1]
    (qid,) = idx.epoch_high_water()
    assert idx.is_committed(f"{qid}-epoch-0") and idx.is_committed(
        f"{qid}-epoch-1"
    )
    assert not idx.is_committed(f"{qid}-epoch-2")
    assert len(os.listdir(str(tmp_path / "idx" / "buckets"))) == 1

    got = {
        (r.id_a, r.id_b)
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    assert _norm(got) == _norm(_full_pairs(spark, corpus))


def test_probe_is_colocated_no_exchange_on_postings_side(spark, tmp_path):
    """r8: the postings store is a BUCKETED table on the probe key, so
    the probe join's stored side must arrive pre-partitioned — exactly
    ONE Exchange in the probe plan (the delta side being shuffled into
    the store's bucketing), zero above the postings scan. Also proves
    the bucketing survives a fresh session: the catalog entry is
    dropped (a new SparkSession has an empty in-memory catalog) and the
    read path must re-register the DDL from the meta's bucket count."""
    corpus = _corpus(spark)
    b1 = corpus.filter(F.col("doc_id") % 2 == 0)
    b2 = corpus.filter(F.col("doc_id") % 2 == 1)

    idx = LshDedupIndex(spark, str(tmp_path / "idx"), jaccard_min=JMIN)
    idx.add_batch(b1, "b1").collect()
    idx.add_batch(b2, "b2").collect()
    assert idx.compact() is True

    # simulate a fresh session: the table entry is per-session cache
    idx2 = LshDedupIndex(spark, str(tmp_path / "idx"), jaccard_min=JMIN)
    idx2._drop_table("gen1")
    legs = idx2._postings_legs()
    assert len(legs) == 1

    delta = spark.createDataFrame(
        [("0:deadbeef", 10**6), ("1:cafe", 10**6 + 1)],
        "band_hash string, doc_id long",
    )
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        probe = delta.alias("n").join(legs[0].alias("o"), "band_hash")
        plan = probe._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
    assert plan.count("Exchange") == 1, plan
    # the postings scan reads its bucketing (no exchange above it): the
    # scan line itself says Bucketed, and the one exchange sits in the
    # delta subtree, which the tree printer emits BEFORE the stored-side
    # FileScan — so the Exchange's offset precedes the FileScan's
    assert "Bucketed: true" in plan, plan
    assert plan.index("Exchange") < plan.index("FileScan parquet"), plan

    # end-to-end: probing after the simulated fresh session still works
    b3 = corpus.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 50000).alias("doc_id"), "text"
    )
    got = {(r.id_a, r.id_b) for r in idx2.add_batch(b3, "b3").collect()}
    assert len(got) > 0


def test_table_names_unique_for_colliding_batch_ids(spark, tmp_path):
    """Review finding (r8): sanitization maps 'b.1' and 'b-1' to the
    same identifier — the raw-id digest in the table name must keep
    distinct batch ids on distinct catalog tables (aliasing would
    silently probe the wrong batch's postings and double/drop postings
    at compaction)."""
    idx = LshDedupIndex(spark, str(tmp_path / "idx"))
    assert idx._table_name("b.1") != idx._table_name("b-1")
    assert idx._table_name("2024-01-01") != idx._table_name("2024_01_01")
    # and invalid bucket counts fail loudly (the CLI's falsy-zero rule)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="batch_buckets"):
        LshDedupIndex(spark, str(tmp_path / "idx2"), batch_buckets=0)


def test_add_batch_rejects_reserved_and_traversal_ids(spark, tmp_path):
    """'gen<N>' is the index's compaction namespace and ids are dir
    names: an ingest named like the live generation — or carrying a
    path separator that resolves into it — would rmtree and replace the
    whole compacted corpus as a 'crashed earlier attempt' (review
    finding, shared with the IVF store)."""
    corpus = _corpus(spark)
    idx = LshDedupIndex(spark, str(tmp_path / "idx"), jaccard_min=JMIN)
    idx.add_batch(corpus.filter(F.col("doc_id") % 2 == 0), "b0")
    idx.add_batch(corpus.filter(F.col("doc_id") % 2 == 1), "b1")
    assert idx.compact()  # live store is now batch=gen1

    delta = corpus.limit(5)
    for reserved in ["gen1", "gen2"]:
        with pytest.raises(ValueError, match="reserved"):
            idx.add_batch(delta, reserved)
    for traversal in ["x/../batch=gen1", "2026/08/15", ""]:
        with pytest.raises(ValueError, match="must match"):
            idx.add_batch(delta, traversal)
    # the live generation survived the attempts
    assert idx.committed_batches() == ["gen1"]
    assert set(idx.committed_ids()) == {"b0", "b1"}


def test_stream_compact_cadence_counts_appended_not_live(spark, tmp_path):
    """Cadence regression pin (review finding): 4 epochs at
    compact_every=2 must fold TWICE — counting committed_batches()
    (which always includes the gen dir after the first fold) rewrote
    the FULL index every epoch (generation would reach 3 here)."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.cdc_stream import (
        stream_dedup_index,
    )

    corpus = _corpus(spark)
    src = str(tmp_path / "src")
    for e in range(4):
        corpus.filter(F.col("doc_id") % 4 == e).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    q = stream_dedup_index(
        spark, src, corpus.schema,
        index_path=str(tmp_path / "idx"),
        pairs_dir=str(tmp_path / "pairs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        jaccard_min=JMIN,
        compact_every=2,
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)

    idx = LshDedupIndex(spark, str(tmp_path / "idx"))
    assert idx._read_meta()["generation"] == 2
    assert list(idx.epoch_high_water().values()) == [3]  # 4 epochs, one query
    got = {
        (r.id_a, r.id_b)
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    assert _norm(got) == _norm(_full_pairs(spark, corpus))


def test_pre_r11_meta_migrates_epoch_ids_to_bounded_ledger(spark, tmp_path):
    """A pre-r11 index meta (epoch keys in the flat committed_ids list)
    must keep its replay guard through migration, and the next commit
    persists the bounded shape (r10 verdict #2)."""
    import json

    corpus = _corpus(spark)
    idx = LshDedupIndex(spark, str(tmp_path / "idx"), jaccard_min=JMIN)
    idx.add_batch(corpus.filter(F.col("doc_id") % 2 == 0), "q-epoch-0")

    # rewrite the meta to the pre-r11 shape by hand
    with open(idx._meta_path()) as fh:
        meta = json.load(fh)
    meta["committed_ids"] = ["q-epoch-0"]
    del meta["epoch_hwm"]
    with open(idx._meta_path(), "w") as fh:
        json.dump(meta, fh)

    idx = LshDedupIndex(spark, str(tmp_path / "idx"), jaccard_min=JMIN)
    assert idx.is_committed("q-epoch-0")
    # replay of the migrated epoch returns the empty frame, no re-ingest
    assert idx.add_batch(corpus.limit(5), "q-epoch-0").count() == 0
    assert idx.committed_batches() == ["q-epoch-0"]

    idx.add_batch(corpus.filter(F.col("doc_id") % 2 == 1), "q-epoch-1")
    with open(idx._meta_path()) as fh:
        meta = json.load(fh)
    assert meta["epoch_hwm"] == {"q": 1}
    assert meta["committed_ids"] == []


def test_replayed_commit_never_rewrites_committed_dirs(spark, tmp_path):
    """r11 review: the lock loser of two same-id ingests (both passed
    the unlocked replay check) must not reach the postings rewrite —
    pre-fix, commit() rmtree'd + re-wrote the winner's just-committed
    dirs before _commit's ledger no-op, a window where a concurrent
    reader sees a dropped catalog table. The replay re-check now runs
    FIRST inside the lock, so a replayed commit touches no files."""
    corpus = _corpus(spark)
    idx = LshDedupIndex(spark, str(tmp_path / "idx"), jaccard_min=JMIN)
    pairs, commit = idx.prepare_batch(corpus.filter(F.col("doc_id") % 2 == 0), "b1")
    pairs.count()
    commit()

    def snapshot():
        out = {}
        for name in ("buckets", "shingles"):
            root = idx._store(name, "b1")
            for dp, _d, fs in os.walk(root):
                for f in fs:
                    p = os.path.join(dp, f)
                    st = os.stat(p)
                    out[p] = (st.st_ino, st.st_mtime_ns, st.st_size)
        return out

    before = snapshot()
    assert before, "committed batch dirs should exist"
    # same closure again = the loser's replayed commit
    commit()
    assert snapshot() == before
    # and a fresh prepare with the same id replays at commit too
    pairs2, commit2 = idx.prepare_batch(corpus.limit(4), "b1")
    pairs2.count()
    commit2()
    assert snapshot() == before
