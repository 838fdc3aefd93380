"""Unified streaming ingest pipeline (r12): quality gate +
decontamination + near-dup indexing in ONE foreachBatch. Its
correctness contract is EQUIVALENCE with the chained standalone legs
(quality kept/ -> decontaminate clean/ -> dedup index) over the same
corpus, plus the family's exactly-once replay guarantee."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.dedup_index import (
    LshDedupIndex,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.cdc_stream import (
    stream_dedup_index,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.decontaminate import (
    stream_decontaminate,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.ingest_pipeline import (
    stream_ingest_pipeline,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.quality_gate import (
    stream_quality_gate,
)

SF_DIR = "/root/testdata/sf0.001"
MIN_SCORE = 50
NGRAM_N = 4
JACC = 0.5


def _corpus(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    heldout = docs.filter(F.col("doc_id") % 13 == 0)
    train = docs.filter(F.col("doc_id") % 13 != 0)
    return heldout, train


def _write_source(train, src, n_files=3):
    for i in range(n_files):
        train.filter(F.col("doc_id") % n_files == i).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))


def _drain_unified(spark, src, schema, heldout, out, idx, ck, **kw):
    q = stream_ingest_pipeline(
        spark, str(src), schema, heldout, str(out), str(idx), str(ck),
        min_score=MIN_SCORE, n=NGRAM_N, jaccard_min=JACC, **kw,
    )
    assert q.awaitTermination(240)


def _ids(spark, path):
    if not os.path.isdir(str(path)):
        return set()
    return {r.doc_id for r in spark.read.parquet(str(path)).collect()}


def _pair_set(spark, path):
    if not os.path.isdir(str(path)):
        return set()
    return {
        frozenset((r.id_a, r.id_b))
        for r in spark.read.parquet(str(path)).collect()
    }


def test_unified_equals_chained_legs(spark, tmp_path):
    """The whole point: one stream must land exactly what the
    three-leg dir-to-dir chain lands — same rejected ids (with the
    same scores), same contaminated ids, same clean corpus, same
    near-dup pair set, same final index answers."""
    heldout, train = _corpus(spark)
    src = tmp_path / "src"
    _write_source(train, src)

    out_u = tmp_path / "uni_out"
    _drain_unified(
        spark, src, train.schema, heldout, out_u,
        tmp_path / "uni_idx", tmp_path / "uni_ck",
        max_files_per_trigger=1,
    )

    # the chained reference: quality -> decontaminate -> index
    out_q, out_d = tmp_path / "ch_q", tmp_path / "ch_d"
    q = stream_quality_gate(
        spark, str(src), train.schema, str(out_q),
        str(tmp_path / "ck_q"), min_score=MIN_SCORE,
        max_files_per_trigger=1,
    )
    assert q.awaitTermination(240)
    q = stream_decontaminate(
        spark, str(out_q / "kept"), train.schema, heldout, str(out_d),
        str(tmp_path / "ck_d"), n=NGRAM_N, max_files_per_trigger=1,
    )
    assert q.awaitTermination(240)
    pairs_d = tmp_path / "ch_pairs"
    q = stream_dedup_index(
        spark, str(out_d / "clean"), train.schema,
        str(tmp_path / "ch_idx"), str(pairs_d), str(tmp_path / "ck_i"),
        jaccard_min=JACC, max_files_per_trigger=1,
    )
    assert q.awaitTermination(240)

    # every stage's verdict set matches (pair orientation depends on
    # epoch batching, which legitimately differs between the runs —
    # compare unordered)
    rej_u = spark.read.parquet(str(out_u / "rejected"))
    rej_c = spark.read.parquet(str(out_q / "rejected"))
    assert {(r.doc_id, r.quality_score) for r in rej_u.collect()} == {
        (r.doc_id, r.quality_score) for r in rej_c.collect()
    }
    assert _ids(spark, out_u / "contaminated") == _ids(
        spark, out_d / "contaminated"
    )
    clean_u = _ids(spark, out_u / "clean")
    assert clean_u == _ids(spark, out_d / "clean")
    assert clean_u, "fixture must leave a non-empty clean corpus"
    assert _pair_set(spark, out_u / "pairs") == _pair_set(spark, pairs_d)
    # the three dirs partition the input: nothing lost, nothing doubled
    all_in = {r.doc_id for r in train.collect()}
    rej_ids = {r.doc_id for r in rej_u.collect()}
    cont_ids = _ids(spark, out_u / "contaminated")
    assert rej_ids | cont_ids | clean_u == all_in
    assert not (rej_ids & cont_ids or rej_ids & clean_u or cont_ids & clean_u)
    # and the two indexes answer a probe identically
    idx_u = LshDedupIndex(spark, str(tmp_path / "uni_idx"), jaccard_min=JACC)
    idx_c = LshDedupIndex(spark, str(tmp_path / "ch_idx"), jaccard_min=JACC)
    probe = train.limit(40)
    got_u = {
        frozenset((r.id_a, r.id_b))
        for r in idx_u.prepare_batch(probe, "probe-u")[0].collect()
    }
    got_c = {
        frozenset((r.id_a, r.id_b))
        for r in idx_c.prepare_batch(probe, "probe-c")[0].collect()
    }
    assert got_u == got_c


def test_replay_is_idempotent(spark, tmp_path):
    """Re-draining the same checkpoint with no new source files adds no
    epochs, no index batches, and leaves every output dir untouched."""
    heldout, train = _corpus(spark)
    src = tmp_path / "src"
    train.coalesce(1).write.parquet(str(src))
    out, idx_p, ck = tmp_path / "out", tmp_path / "idx", tmp_path / "ck"
    _drain_unified(spark, src, train.schema, heldout, out, idx_p, ck)
    idx = LshDedupIndex(spark, str(idx_p), jaccard_min=JACC)
    batches = sorted(idx.committed_batches())
    dirs = {
        side: sorted(os.listdir(out / side))
        for side in ("rejected", "contaminated", "clean", "pairs")
    }
    n_clean = spark.read.parquet(str(out / "clean")).count()
    _drain_unified(spark, src, train.schema, heldout, out, idx_p, ck)
    assert sorted(idx.committed_batches()) == batches
    for side, d in dirs.items():
        assert sorted(os.listdir(out / side)) == d, side
    assert spark.read.parquet(str(out / "clean")).count() == n_clean


def test_reserved_columns_fail_loudly(spark, tmp_path):
    heldout, _train = _corpus(spark)
    for bad_col in ("quality_score", "n_contaminated", "_th", "epoch"):
        bad = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
                T.StructField(bad_col, T.LongType()),
            ]
        )
        with pytest.raises(ValueError, match="reserved column"):
            stream_ingest_pipeline(
                spark, str(tmp_path / "src"), bad, heldout,
                str(tmp_path / "out"), str(tmp_path / "idx"),
                str(tmp_path / "ck"),
            )


def test_bm25_leg_makes_the_clean_corpus_queryable(spark, tmp_path):
    """With bm25_path set, each epoch's clean survivors are appended
    to an incremental BM25 index in the same trigger — and the drained
    index answers bit-identically to one batch-built over the clean
    corpus. Replay (re-drain, no new files) adds nothing to either
    store."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.bm25_index import (
        Bm25Index,
    )

    heldout, train = _corpus(spark)
    src = tmp_path / "src"
    _write_source(train, src)
    out, ck = tmp_path / "out", tmp_path / "ck"
    bm25_p = str(tmp_path / "bm25")
    _drain_unified(
        spark, src, train.schema, heldout, out,
        tmp_path / "idx", ck,
        max_files_per_trigger=1, bm25_path=bm25_p,
    )
    streamed = Bm25Index(spark, bm25_p)
    clean = spark.read.parquet(str(out / "clean")).select("doc_id", "text")
    assert streamed.stats()["n_docs"] == clean.count() > 0
    ref = Bm25Index(spark, str(tmp_path / "bm25_ref"))
    ref.append(clean, "all")
    qs = [("q1", "spark shuffle join"), ("q2", "window merge sort")]
    def rows(df):
        return [(r.query_id, r.doc_id, repr(r.score), r.rank)
                for r in df.collect()]
    assert rows(streamed.topk(qs, k=10)) == rows(ref.topk(qs, k=10))
    st = streamed.stats()
    _drain_unified(
        spark, src, train.schema, heldout, out,
        tmp_path / "idx", ck,
        max_files_per_trigger=1, bm25_path=bm25_p,
    )
    assert streamed.stats() == st  # replay: nothing doubles


def test_compaction_folds_into_the_stream(spark, tmp_path):
    """compact_every bounds index fan-in exactly like the standalone
    index leg: after a 3-epoch drain with compact_every=2 the live
    store is a single generation dir plus at most one uncompacted
    batch, and a probe still answers."""
    heldout, train = _corpus(spark)
    src = tmp_path / "src"
    _write_source(train, src)
    out, idx_p, ck = tmp_path / "out", tmp_path / "idx", tmp_path / "ck"
    _drain_unified(
        spark, src, train.schema, heldout, out, idx_p, ck,
        max_files_per_trigger=1, compact_every=2,
    )
    idx = LshDedupIndex(spark, str(idx_p), jaccard_min=JACC)
    live = idx.committed_batches()
    assert len(live) <= 2 and any(b.startswith("gen") for b in live)
    pairs, _commit = idx.prepare_batch(train.limit(20), "probe-after")
    pairs.collect()  # probe path stays readable across the fold


def test_span_stage_equals_chained_gate_single_epoch(spark, tmp_path):
    """span_store_path inserts the span-dedup gate between
    decontamination and the clean write. With the corpus in ONE epoch
    (at-ingest == batch semantics on both arms), the unified run must
    land exactly what the four-leg chain lands: same span stats, same
    flagged/kept split, same pair set, and count-identical n-gram
    stores."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.ngram_store import (
        NgramCountStore,
    )
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.span_gate import (
        stream_span_dedup_gate,
    )

    heldout, train = _corpus(spark)
    src = tmp_path / "src"
    train.coalesce(1).write.parquet(str(src))

    out_u = tmp_path / "uni_out"
    _drain_unified(
        spark, src, train.schema, heldout, out_u,
        tmp_path / "uni_idx", tmp_path / "uni_ck",
        span_store_path=str(tmp_path / "uni_ng"), span_max_dup_pct=0.0,
    )

    # chained reference: quality -> decontaminate -> span gate -> index
    out_q, out_d, out_s = tmp_path / "ch_q", tmp_path / "ch_d", tmp_path / "ch_s"
    q = stream_quality_gate(
        spark, str(src), train.schema, str(out_q),
        str(tmp_path / "ck_q"), min_score=MIN_SCORE,
    )
    assert q.awaitTermination(240)
    q = stream_decontaminate(
        spark, str(out_q / "kept"), train.schema, heldout, str(out_d),
        str(tmp_path / "ck_d"), n=NGRAM_N,
    )
    assert q.awaitTermination(240)
    q = stream_span_dedup_gate(
        spark, str(out_d / "clean"), train.schema, str(out_s),
        str(tmp_path / "ch_ng"), str(tmp_path / "ck_s"),
        max_dup_pct=0.0,
    )
    assert q.awaitTermination(240)
    pairs_d = tmp_path / "ch_pairs"
    q = stream_dedup_index(
        spark, str(out_s / "kept"), train.schema,
        str(tmp_path / "ch_idx"), str(pairs_d), str(tmp_path / "ck_i"),
        jaccard_min=JACC,
    )
    assert q.awaitTermination(240)

    def span_set(path):
        return {
            (r.doc_id, r.n_tokens, r.n_dup_tokens, repr(r.dup_pct))
            for r in spark.read.parquet(str(path)).collect()
        }

    assert span_set(out_u / "spans") == span_set(out_s / "spans")
    flagged_u = _ids(spark, out_u / "span_flagged")
    assert flagged_u == _ids(spark, out_s / "flagged")
    assert flagged_u, "fixture must flag at least one span-heavy doc"
    clean_u = _ids(spark, out_u / "clean")
    assert clean_u == _ids(spark, out_s / "kept") and clean_u
    assert _pair_set(spark, out_u / "pairs") == _pair_set(spark, pairs_d)
    # flagged docs never reach the index
    assert not flagged_u & clean_u
    # the two n-gram stores hold identical corpus counts
    ng_u = NgramCountStore.open(spark, str(tmp_path / "uni_ng"))
    ng_c = NgramCountStore.open(spark, str(tmp_path / "ch_ng"))
    cnt = lambda s: {(r.gram, r.c_past) for r in s.past_counts().collect()}
    assert cnt(ng_u) == cnt(ng_c) and cnt(ng_u)


def test_span_stage_cross_epoch_flags_and_replay(spark, tmp_path):
    """At-ingest semantics inside the pipeline: a doc repeating an
    earlier EPOCH's phrase is span-flagged on arrival (the first copy
    is not retro-flagged), the flagged doc is indexed by NEITHER store,
    and a checkpoint replay adds nothing anywhere — the n-gram append
    is the epoch guard."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.bm25_index import (
        Bm25Index,
    )
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.ngram_store import (
        NgramCountStore,
    )

    phrase = "alpha beta gamma delta epsilon"
    e1 = spark.createDataFrame(
        [(1, f"{phrase} one two three four five"),
         (2, "zig zag zip zap zoom six seven eight nine ten")],
        "doc_id long, text string",
    )
    e2 = spark.createDataFrame(
        [(3, f"{phrase} eleven twelve thirteen fourteen fifteen")],
        "doc_id long, text string",
    )
    heldout = spark.createDataFrame(
        [(99, "zzz qqq rrr sss ttt uuu vvv www")],
        "doc_id long, text string",
    )
    src = tmp_path / "src"
    e1.coalesce(1).write.mode("append").parquet(str(src))
    e2.coalesce(1).write.mode("append").parquet(str(src))

    def drain():
        q = stream_ingest_pipeline(
            spark, str(src), e1.schema, heldout, str(tmp_path / "out"),
            str(tmp_path / "idx"), str(tmp_path / "ck"),
            min_score=0, n=NGRAM_N, jaccard_min=JACC,
            max_files_per_trigger=1,
            bm25_path=str(tmp_path / "bm25"),
            span_store_path=str(tmp_path / "ng"), span_max_dup_pct=0.0,
        )
        assert q.awaitTermination(240)

    drain()
    out = tmp_path / "out"
    spans = {
        r.doc_id: r.n_dup_tokens
        for r in spark.read.parquet(str(out / "spans")).collect()
    }
    assert spans[3] == 5  # the repeated W-token phrase, on arrival
    assert spans[1] == 0 and spans[2] == 0  # first copy not retro-flagged
    assert _ids(spark, out / "span_flagged") == {3}
    assert _ids(spark, out / "clean") == {1, 2}
    # neither index ever saw the flagged doc
    assert Bm25Index(spark, str(tmp_path / "bm25")).stats()["n_docs"] == 2
    # the store holds ALL three docs' counts (flagged text still occurred)
    ng = NgramCountStore.open(spark, str(tmp_path / "ng"))
    ref = NgramCountStore(spark, str(tmp_path / "ng_ref"))
    ref.append(e1.unionByName(e2).select("text"), "all")
    cnt = lambda s: {(r.gram, r.c_past) for r in s.past_counts().collect()}
    assert cnt(ng) == cnt(ref)
    # replay: nothing doubles, no new epoch dirs
    st = ng.stats()
    dirs = {
        side: sorted(os.listdir(out / side))
        for side in ("spans", "span_flagged", "clean", "pairs")
    }
    drain()
    assert ng.stats() == st
    for side, d in dirs.items():
        assert sorted(os.listdir(out / side)) == d, side


def test_span_reserved_columns_only_when_enabled(spark, tmp_path):
    heldout, _train = _corpus(spark)
    sch = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("dup_pct", T.DoubleType()),
        ]
    )
    with pytest.raises(ValueError, match="reserved column"):
        stream_ingest_pipeline(
            spark, str(tmp_path / "src"), sch, heldout,
            str(tmp_path / "out"), str(tmp_path / "idx"),
            str(tmp_path / "ck"), span_store_path=str(tmp_path / "ng"),
        )


def test_span_guard_swap_between_commits_crash_window(spark, tmp_path):
    """The r13 ordering's actual crash window, exercised for real (r13
    review: a no-new-files re-drain runs zero micro-batches and pins
    nothing): simulate a crash AFTER the LSH commit of the last epoch
    but BEFORE the n-gram append by (a) surgically removing the n-gram
    store's record of that epoch and (b) deleting the checkpoint's
    commit marker so Spark re-delivers it. The replay must skip the
    LSH half (same pairs, no doubled postings), recompute identical
    span stats (the store state it reads is pre-epoch again), and
    complete the n-gram append."""
    import json
    import shutil as _shutil

    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.ngram_store import (
        NgramCountStore,
    )

    phrase = "alpha beta gamma delta epsilon"
    e1 = spark.createDataFrame(
        [(1, f"{phrase} one two three four five"),
         (2, "zig zag zip zap zoom six seven eight nine ten")],
        "doc_id long, text string",
    )
    e2 = spark.createDataFrame(
        [(3, f"{phrase} eleven twelve thirteen fourteen fifteen")],
        "doc_id long, text string",
    )
    heldout = spark.createDataFrame(
        [(99, "zzz qqq rrr sss ttt uuu vvv www")],
        "doc_id long, text string",
    )
    src, out, ck = tmp_path / "src", tmp_path / "out", tmp_path / "ck"
    e1.coalesce(1).write.mode("append").parquet(str(src))
    e2.coalesce(1).write.mode("append").parquet(str(src))

    def drain(ckpt):
        q = stream_ingest_pipeline(
            spark, str(src), e1.schema, heldout, str(out),
            str(tmp_path / "idx"), str(ckpt),
            min_score=0, n=NGRAM_N, jaccard_min=JACC,
            max_files_per_trigger=1,
            span_store_path=str(tmp_path / "ng"), span_max_dup_pct=0.0,
        )
        assert q.awaitTermination(240)

    drain(ck)
    with open(ck / "metadata") as fh:
        qid = json.load(fh)["id"]
    key = f"{qid}-epoch-1"
    ng = NgramCountStore.open(spark, str(tmp_path / "ng"))
    assert ng.is_committed(key)
    idx = LshDedupIndex(spark, str(tmp_path / "idx"), jaccard_min=JACC)
    lsh_batches = sorted(idx.committed_batches())
    pairs_before = _pair_set(spark, out / "pairs")
    spans_before = {
        r.doc_id: (r.n_tokens, r.n_dup_tokens, repr(r.dup_pct))
        for r in spark.read.parquet(str(out / "spans")).collect()
    }

    # (a) un-commit epoch 1 from the n-gram store (crash before append)
    meta_p = os.path.join(str(tmp_path / "ng"), "_ngram_meta.json")
    with open(meta_p) as fh:
        meta = json.load(fh)
    assert meta["epoch_hwm"][qid] == 1
    meta["epoch_hwm"][qid] = 0
    meta["n_windows"] -= meta["stats"].pop(key)["n_windows"]
    meta["batches"] = [b for b in meta["batches"] if b != key]
    with open(meta_p, "w") as fh:
        json.dump(meta, fh)
    _shutil.rmtree(ng._batch_dir(key))
    assert not NgramCountStore.open(
        spark, str(tmp_path / "ng")
    ).is_committed(key)
    # (b) make Spark re-deliver epoch 1: truncate the commit log —
    # BOTH the marker and its Hadoop CRC sidecar (a stale .crc makes
    # the commit rewrite fail as "Multiple streaming queries are
    # concurrently using <commits>", a misleading message that is
    # really ChecksumFileSystem tripping on the orphaned checksum)
    os.remove(ck / "commits" / "1")
    os.remove(ck / "commits" / ".1.crc")

    drain(ck)  # the replay
    ng2 = NgramCountStore.open(spark, str(tmp_path / "ng"))
    assert ng2.is_committed(key)  # append completed this time
    ref = NgramCountStore(spark, str(tmp_path / "ng_ref2"))
    ref.append(e1.unionByName(e2).select("text"), "all")
    cnt = lambda s: {(r.gram, r.c_past) for r in s.past_counts().collect()}
    assert cnt(ng2) == cnt(ref)
    # the LSH half was skipped: same batches, same pairs (a re-probe
    # against an index already holding the batch would have paired
    # every doc with its own stored copy)
    assert sorted(idx.committed_batches()) == lsh_batches
    assert _pair_set(spark, out / "pairs") == pairs_before
    # and the recomputed span stats are bit-identical
    spans_after = {
        r.doc_id: (r.n_tokens, r.n_dup_tokens, repr(r.dup_pct))
        for r in spark.read.parquet(str(out / "spans")).collect()
    }
    assert spans_after == spans_before


def test_span_stage_toggle_on_existing_checkpoint_fails_loudly(
    spark, tmp_path
):
    """The stage set is fixed per checkpoint: enabling span_store_path
    after epochs committed without it must fail the first non-blank
    epoch, not silently change replay semantics."""
    heldout, train = _corpus(spark)
    src = tmp_path / "src"
    train.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    out, idx_p, ck = tmp_path / "out", tmp_path / "idx", tmp_path / "ck"
    _drain_unified(spark, src, train.schema, heldout, out, idx_p, ck)
    train.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    with pytest.raises(Exception, match="stage set is fixed"):
        q = stream_ingest_pipeline(
            spark, str(src), train.schema, heldout, str(out), str(idx_p),
            str(ck), min_score=MIN_SCORE, n=NGRAM_N, jaccard_min=JACC,
            span_store_path=str(tmp_path / "ng_late"),
        )
        q.awaitTermination(240)
