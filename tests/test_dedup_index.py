"""Incremental LSH dedup index: batch-accumulated pairs must equal the
full-corpus recompute, replays must be no-ops, and crashes between the
store write and the meta commit must not corrupt state."""

from __future__ import annotations

import os

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
    idx._commit = lambda batch_id: None
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
