"""Incremental BM25 retrieval index (r12): batch-built topk must be
BIT-IDENTICAL to the full-corpus q_text_bm25_topk plan (shared
tokenizer/score/fold + additive exact stats), replay must be a no-op,
crashes must be invisible-then-retryable, compaction probe-identical,
and the identity knobs pinned."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.bm25_index import (
    Bm25Index,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.plans.text_queries import (
    BM25_QUERIES,
    BM25_TOP,
    q_text_bm25_topk,
)

SF_DIR = "/root/testdata/sf0.001"
QUERIES = list(BM25_QUERIES)


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "text")


def _rows(df):
    return [
        (r.query_id, r.doc_id, repr(r.score), r.rank) for r in df.collect()
    ]


def _full_corpus_reference(spark):
    """q_text_bm25_topk IS the reference — same queries, same corpus,
    same k — so the store's equivalence bar is the driver-oracled
    plan itself."""
    return _rows(q_text_bm25_topk(spark, SF_DIR))


def test_batched_appends_equal_full_corpus_query(spark, tmp_path):
    docs = _docs(spark)
    idx = Bm25Index(spark, str(tmp_path / "bm25"))
    for i in range(3):
        idx.append(docs.filter(F.col("doc_id") % 3 == i), f"b{i}")
    got = _rows(idx.topk(QUERIES, k=BM25_TOP))
    assert got == _full_corpus_reference(spark)
    # additive stats equal the full aggregates exactly
    st = idx.stats()
    assert st["n_docs"] == docs.count()


def test_replay_is_a_noop(spark, tmp_path):
    docs = _docs(spark)
    idx = Bm25Index(spark, str(tmp_path / "bm25"))
    half = docs.filter(F.col("doc_id") % 2 == 0)
    idx.append(half, "b0")
    st = idx.stats()
    idx.append(half, "b0")  # replay: must not double n_docs/s_tokens
    assert idx.stats() == st
    # epoch-shaped ids ride the bounded high-water ledger
    idx.append(docs.filter(F.col("doc_id") % 2 == 1), "qid1-epoch-0")
    st2 = idx.stats()
    idx.append(docs.filter(F.col("doc_id") % 2 == 1), "qid1-epoch-0")
    assert idx.stats() == st2
    assert idx.epoch_high_water() == {"qid1": 0}


def test_crash_orphan_invisible_then_retryable(spark, tmp_path):
    """A dir written without its meta commit (crash window) must be
    invisible to queries and cleanly rewritten by the retry."""
    docs = _docs(spark)
    idx = Bm25Index(spark, str(tmp_path / "bm25"))
    idx.append(docs.filter(F.col("doc_id") % 2 == 0), "b0")
    before = _rows(idx.topk(QUERIES, k=5))
    # simulate the crash: write b1's dir bypassing the commit
    delta = docs.filter(F.col("doc_id") % 2 == 1)
    idx._postings(delta).write.partitionBy("tok_bucket").parquet(
        idx._batch_dir("b1")
    )
    assert _rows(idx.topk(QUERIES, k=5)) == before  # orphan invisible
    assert not idx.is_committed("b1")
    idx.append(delta, "b1")  # retry rewrites the orphan and commits
    assert idx.is_committed("b1")
    assert sorted(idx.committed_batches()) == ["b0", "b1"]
    full = Bm25Index(spark, str(tmp_path / "full"))
    full.append(docs, "all")
    assert _rows(idx.topk(QUERIES, k=5)) == _rows(full.topk(QUERIES, k=5))


def test_compact_is_probe_identical_and_bounds_fanin(spark, tmp_path):
    docs = _docs(spark)
    idx = Bm25Index(spark, str(tmp_path / "bm25"))
    for i in range(4):
        idx.append(docs.filter(F.col("doc_id") % 4 == i), f"b{i}")
    before = _rows(idx.topk(QUERIES, k=BM25_TOP))
    st = idx.stats()
    assert idx.compact() is True
    assert idx.committed_batches() == ["gen1"]
    assert _rows(idx.topk(QUERIES, k=BM25_TOP)) == before
    after = idx.stats()
    assert (after["n_docs"], after["s_tokens"]) == (
        st["n_docs"],
        st["s_tokens"],
    )
    # the replay guard survives the fold
    idx.append(docs.filter(F.col("doc_id") % 4 == 0), "b0")
    assert idx.stats()["n_docs"] == st["n_docs"]
    # nothing to merge twice
    assert idx.compact() is False


def test_zero_token_batch_counts_docs_without_a_dir(spark, tmp_path):
    """All-blank batches still move N (the full-corpus query's N is
    COUNT(documents), blanks included) but leave no unreadable empty
    parquet dir behind."""
    docs = _docs(spark)
    idx = Bm25Index(spark, str(tmp_path / "bm25"))
    idx.append(docs, "b0")
    blanks = spark.createDataFrame(
        [(900001, ""), (900002, None)], "doc_id long, text string"
    )
    st0 = idx.stats()
    idx.append(blanks, "blanks")
    st = idx.stats()
    assert st["n_docs"] == st0["n_docs"] + 2
    assert st["s_tokens"] == st0["s_tokens"]
    assert "blanks" not in idx.committed_batches()  # no dir to read
    assert idx.is_committed("blanks")
    # scores reflect the larger N: equivalent to a fresh store fed the
    # same corpus + blanks in one batch
    full = Bm25Index(spark, str(tmp_path / "full"))
    full.append(
        docs.unionByName(blanks), "all"
    )
    assert _rows(idx.topk(QUERIES, k=5)) == _rows(full.topk(QUERIES, k=5))


def test_meta_stats_equal_on_disk_postings(spark, tmp_path):
    """The additive meta stats and the written posting rows must agree
    — append derives BOTH from one eagerly-cut evaluation of the
    source (r12 review: a second source scan would let a
    nondeterministic input commit stats that disagree with the rows,
    silently breaking the bit-identity contract)."""
    docs = _docs(spark)
    idx = Bm25Index(spark, str(tmp_path / "bm25"))
    for i in range(2):
        idx.append(docs.filter(F.col("doc_id") % 2 == i), f"b{i}")
    st = idx.stats()
    ondisk = (
        idx._read_data([idx._batch_dir(b) for b in idx.committed_batches()])
        .agg(
            F.sum("tf").alias("s"),
            F.countDistinct("doc_id").alias("n"),
        )
        .collect()[0]
    )
    assert st["s_tokens"] == ondisk["s"]
    # fixture has no blank docs, so doc counts agree too
    assert st["n_docs"] == ondisk["n"] == docs.count()


def test_compact_sweeps_prior_crash_orphans(spark, tmp_path):
    """A compact that crashed between its meta swap and its GC loop
    leaves the whole pre-fold corpus as unreferenced dirs; the next
    compact() must reclaim them even when there is nothing new to fold
    (r12 review: sweeping only the current fold's live list leaked
    them forever)."""
    docs = _docs(spark)
    idx = Bm25Index(spark, str(tmp_path / "bm25"))
    idx.append(docs, "b0")
    # simulate the crash leftovers: unreferenced batch dirs on disk
    for orphan in ("zz1", "zz2"):
        idx._postings(docs.limit(5)).write.partitionBy(
            "tok_bucket"
        ).parquet(idx._batch_dir(orphan))
    before = _rows(idx.topk(QUERIES, k=5))
    assert idx.compact() is False  # single live dir: nothing to fold...
    root = os.path.join(str(tmp_path / "bm25"), "postings")
    assert sorted(os.listdir(root)) == ["batch=b0"]  # ...orphans swept
    assert _rows(idx.topk(QUERIES, k=5)) == before


def test_meta_stays_bounded_under_blank_epochs(spark, tmp_path):
    """Zero-token appends commit to the (bounded) ledger and move the
    additive totals but must NOT grow per-batch state — a stream of
    all-blank micro-batches would otherwise grow the meta O(#epochs)
    (r12 review; the r11 bounded-meta discipline)."""
    docs = _docs(spark)
    idx = Bm25Index(spark, str(tmp_path / "bm25"))
    idx.append(docs, "b0")
    blanks = spark.createDataFrame(
        [(990000, ""), (990001, None)], "doc_id long, text string"
    )
    for n in range(25):
        idx.append(
            blanks.withColumn("doc_id", F.col("doc_id") + 2 * n),
            f"qidx-epoch-{n}",
        )
    meta = idx._read_meta()
    assert set(meta["stats"]) == {"b0"}
    assert meta["epoch_hwm"] == {"qidx": 24}
    assert idx.stats()["n_docs"] == docs.count() + 50
    # and compaction prunes stats to the single generation entry
    # second live dir (ids shifted: store ids are globally unique)
    idx.append(docs.withColumn("doc_id", F.col("doc_id") + 10_000_000), "b1")
    idx.compact()
    meta = idx._read_meta()
    assert set(meta["stats"]) == {"gen1"}
    assert meta["stats"]["gen1"]["n_docs"] == idx.stats()["n_docs"]


def test_query_normalization_matches_corpus_tokenizer(spark, tmp_path):
    """Query strings tokenize through the same normalizer as the
    corpus — punctuation/case in a query must not change its terms
    (r12 review: a raw str.split fork would silently diverge)."""
    docs = _docs(spark)
    idx = Bm25Index(spark, str(tmp_path / "bm25"))
    idx.append(docs, "b0")
    plain = _rows(idx.topk([("qx", "spark shuffle join")], k=5))
    dirty = _rows(idx.topk([("qx", "  SPARK, shuffle!  JOIN ")], k=5))
    assert plain == dirty and plain


def test_identity_pinned_and_reserved_ids(spark, tmp_path):
    docs = _docs(spark)
    p = str(tmp_path / "bm25")
    idx = Bm25Index(spark, p, n_buckets=8)
    idx.append(docs, "b0")
    with pytest.raises(ValueError, match="identity"):
        Bm25Index(spark, p, n_buckets=4).stats()
    with pytest.raises(ValueError, match="identity"):
        Bm25Index(spark, p, text_col="body", n_buckets=8).stats()
    # open() adopts the pinned knobs
    assert Bm25Index.open(spark, p).n_buckets == 8
    for bad in ("gen1", "a/b", "../up", "=x"):
        with pytest.raises(ValueError):
            idx.append(docs, bad)
    with pytest.raises(ValueError, match="empty"):
        idx.append(docs.filter(F.lit(False)), "b9")


def test_missing_live_dir_fails_loudly(spark, tmp_path):
    docs = _docs(spark)
    idx = Bm25Index(spark, str(tmp_path / "bm25"))
    idx.append(docs.filter(F.col("doc_id") % 2 == 0), "b0")
    idx.append(docs.filter(F.col("doc_id") % 2 == 1), "b1")
    shutil.rmtree(idx._batch_dir("b1"))
    with pytest.raises(RuntimeError, match="missing"):
        idx.topk(QUERIES, k=5).collect()
    with pytest.raises(RuntimeError, match="missing"):
        idx.compact()


def test_query_scan_partition_prunes_to_term_buckets(spark, tmp_path):
    """The promise that makes the store a store: a query reads only its
    terms' tok_bucket partitions, not the whole postings set."""
    docs = _docs(spark)
    idx = Bm25Index(spark, str(tmp_path / "bm25"), n_buckets=16)
    idx.append(docs, "b0")
    all_buckets = {
        d
        for d in os.listdir(idx._batch_dir("b0"))
        if d.startswith("tok_bucket=")
    }
    assert len(all_buckets) > 4, "fixture vocabulary must span buckets"
    res = idx.topk([("q1", "spark")], k=5)
    plan = res._jdf.queryExecution().executedPlan().toString()
    # the bucket predicate must land in PartitionFilters (directory-
    # level pruning before any file IO) — the test_partition_pruning
    # discipline applied to the store's own layout
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "tok_bucket" in pf
    assert res.count() > 0
    # file-level proof: the pruned scan shaped exactly like topk's
    # reads files from ONE bucket dir for a single-term query
    bucket = int(
        idx._postings(
            spark.createDataFrame([(1, "spark")], "doc_id long, text string")
        ).collect()[0].tok_bucket
    )
    files = [
        r.f
        for r in idx._read_data([idx._batch_dir("b0")])
        .filter(
            F.col("tok_bucket").isin([bucket]) & F.col("tok").isin(["spark"])
        )
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    ]
    assert files and all(f"tok_bucket={bucket}" in f for f in files)


def test_append_writes_one_tok_sorted_file_per_bucket(spark, tmp_path):
    """r13 layout (the n-gram store's move applied here): one
    tok-sorted parquet file per tok_bucket dir per batch — bounded
    file counts on a streaming ingest, and tight tok row-group stats
    under the tok IN (vocab) filter topk pushes into the scan."""
    docs = _docs(spark)
    idx = Bm25Index(spark, str(tmp_path / "bm25"), n_buckets=8)
    idx.append(docs, "b0")
    root = idx._batch_dir("b0")
    bucket_dirs = [
        d for d in os.listdir(root) if d.startswith("tok_bucket=")
    ]
    assert bucket_dirs, "append must produce tok_bucket= partition dirs"
    for d in bucket_dirs:
        files = [
            f for f in os.listdir(os.path.join(root, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, f"{d}: {len(files)} files"
        toks = [
            r.tok
            for r in spark.read.parquet(os.path.join(root, d)).collect()
        ]
        assert toks == sorted(toks)
