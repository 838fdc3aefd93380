"""Incremental n-gram count store + streaming span-dedup gate (r12):
batched counts must equal a whole-corpus recount (additive by
arithmetic), the gate's single-epoch drain must match the
driver-oracled batch detector exactly, cross-epoch repeats must flag
the epoch they arrive, and the family's replay/compaction/identity
rules must hold on the shared chassis."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.ngram_store import (
    NgramCountStore,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.plans.text_queries import (
    DUP_SPAN_W,
    q_text_dup_spans,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.span_gate import (
    stream_span_dedup_gate,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "text")


def _counts(store):
    return {
        (r.gram, r.c_past) for r in store.past_counts().collect()
    }


def test_batched_counts_equal_whole_corpus(spark, tmp_path):
    docs = _docs(spark)
    inc = NgramCountStore(spark, str(tmp_path / "inc"), w=DUP_SPAN_W)
    for i in range(3):
        inc.append(docs.filter(F.col("doc_id") % 3 == i), f"b{i}")
    full = NgramCountStore(spark, str(tmp_path / "full"), w=DUP_SPAN_W)
    full.append(docs, "all")
    assert _counts(inc) == _counts(full)
    assert inc.stats()["n_windows"] == full.stats()["n_windows"] > 0
    # replay: a committed id adds nothing
    st = inc.stats()
    inc.append(docs.filter(F.col("doc_id") % 3 == 0), "b0")
    assert inc.stats() == st
    # compaction: sum-merge, probe-identical, fan-in bounded
    assert inc.compact() is True
    assert inc.committed_batches() == ["gen1"]
    assert _counts(inc) == _counts(full)
    assert inc.stats()["n_windows"] == st["n_windows"]


def test_identity_pinned_and_windowless_batches(spark, tmp_path):
    docs = _docs(spark)
    p = str(tmp_path / "s")
    store = NgramCountStore(spark, p, w=4, n_buckets=8)
    store.append(docs, "b0")
    with pytest.raises(ValueError, match="identity"):
        NgramCountStore(spark, p, w=5, n_buckets=8).stats()
    assert NgramCountStore.open(spark, p).w == 4
    # a batch of under-W docs commits to the ledger, moves nothing,
    # and leaves no unreadable dir
    shorts = spark.createDataFrame([("a b",), ("",)], "text string")
    st = store.stats()
    store.append(shorts, "shorts")
    assert store.is_committed("shorts")
    assert store.stats()["n_windows"] == st["n_windows"]
    assert "shorts" not in store.committed_batches()
    for bad in ("gen1", "a/b"):
        with pytest.raises(ValueError):
            store.append(docs, bad)


def _drain(spark, src, schema, out, store_p, ck, **kw):
    q = stream_span_dedup_gate(
        spark, str(src), schema, str(out), str(store_p), str(ck),
        w=DUP_SPAN_W, **kw,
    )
    assert q.awaitTermination(240)


def test_single_epoch_gate_equals_batch_detector(spark, tmp_path):
    """With the whole corpus in ONE epoch, at-ingest semantics and
    batch semantics coincide — the gate's spans output must row-match
    the driver-oracled q_text_dup_spans exactly (including the IEEE
    fraction)."""
    docs = _docs(spark)
    src = tmp_path / "src"
    docs.coalesce(1).write.parquet(str(src))
    _drain(
        spark, src, docs.schema, tmp_path / "out", tmp_path / "store",
        tmp_path / "ck",
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_dup_tokens, repr(r.dup_pct))
        for r in spark.read.parquet(
            str(tmp_path / "out" / "spans")
        ).collect()
    }
    want = {
        r.doc_id: (r.n_tokens, r.n_dup_tokens, repr(r.dup_pct))
        for r in q_text_dup_spans(spark, SF_DIR).collect()
    }
    assert got == want and got


def test_cross_epoch_repeats_flag_on_arrival(spark, tmp_path):
    """A doc arriving in epoch 2 that repeats an epoch-1 phrase is
    flagged; the epoch-1 original is NOT retro-flagged (at-ingest
    semantics, stated in the module docstring); a unique doc stays
    clean; max_dup_pct routes the documents themselves."""
    phrase = "alpha beta gamma delta epsilon"  # exactly W=5 tokens
    e1 = spark.createDataFrame(
        [(1, f"{phrase} one two three four five"),
         (2, "zig zag zip zap zoom six seven eight nine ten")],
        "doc_id long, text string",
    )
    e2 = spark.createDataFrame(
        [(3, f"{phrase} eleven twelve thirteen fourteen fifteen"),
         (4, "unique sixteen seventeen eighteen nineteen twenty only")],
        "doc_id long, text string",
    )
    src = tmp_path / "src"
    e1.coalesce(1).write.mode("append").parquet(str(src))
    e2.coalesce(1).write.mode("append").parquet(str(src))
    _drain(
        spark, src, e1.schema, tmp_path / "out", tmp_path / "store",
        tmp_path / "ck",
        max_dup_pct=0.0, max_files_per_trigger=1,
    )
    spans = {
        r.doc_id: r.n_dup_tokens
        for r in spark.read.parquet(
            str(tmp_path / "out" / "spans")
        ).collect()
    }
    assert spans[3] == DUP_SPAN_W  # the repeated phrase, exactly
    assert spans[1] == 0  # first copy: not retro-flagged (documented)
    assert spans[2] == 0 and spans[4] == 0
    kept = {
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "out" / "kept")).collect()
    }
    flagged = {
        r.doc_id
        for r in spark.read.parquet(
            str(tmp_path / "out" / "flagged")
        ).collect()
    }
    assert flagged == {3} and kept == {1, 2, 4}
    # the drained store holds the full two-epoch counts
    store = NgramCountStore.open(spark, str(tmp_path / "store"))
    batch = NgramCountStore(spark, str(tmp_path / "ref"), w=DUP_SPAN_W)
    batch.append(e1.unionByName(e2).select("text"), "all")
    assert _counts(store) == _counts(batch)
    # replay: re-drain with no new files adds nothing anywhere
    st = store.stats()
    dirs = sorted(os.listdir(tmp_path / "out" / "spans"))
    _drain(
        spark, src, e1.schema, tmp_path / "out", tmp_path / "store",
        tmp_path / "ck",
        max_dup_pct=0.0, max_files_per_trigger=1,
    )
    assert store.stats() == st
    assert sorted(os.listdir(tmp_path / "out" / "spans")) == dirs


def test_in_stream_compaction(spark, tmp_path):
    docs = _docs(spark)
    src = tmp_path / "src"
    for i in range(4):
        docs.filter(F.col("doc_id") % 4 == i).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    _drain(
        spark, src, docs.schema, tmp_path / "out", tmp_path / "store",
        tmp_path / "ck",
        max_files_per_trigger=1, compact_every=2,
    )
    store = NgramCountStore.open(spark, str(tmp_path / "store"))
    live = store.committed_batches()
    assert len(live) <= 2 and any(b.startswith("gen") for b in live)
    full = NgramCountStore(spark, str(tmp_path / "full"), w=DUP_SPAN_W)
    full.append(docs, "all")
    assert _counts(store) == _counts(full)


def test_probe_counts_matches_past_counts_multi_and_single_dir(
    spark, tmp_path
):
    """The pruned probe (r13) must answer EXACTLY like a past_counts
    join for every probe gram — across multiple live dirs (aggregation
    path) and after compaction (the single-dir fast path)."""
    docs = _docs(spark)
    store = NgramCountStore(
        spark, str(tmp_path / "s"), w=DUP_SPAN_W, n_buckets=32
    )
    for i in range(3):
        store.append(docs.filter(F.col("doc_id") % 3 == i), f"b{i}")
    probe = store.batch_counts(
        docs.orderBy("doc_id").limit(2).select("text")
    ).localCheckpoint()

    def lookup(counts_df):
        return {
            r.gram: r.c_past
            for r in probe.join(counts_df, "gram", "left").collect()
        }

    want = lookup(store.past_counts())
    assert lookup(store.probe_counts(probe)) == want and want
    assert store.compact() is True  # single pre-summed generation dir
    assert lookup(store.probe_counts(probe)) == want
    assert lookup(store.past_counts()) == want


def test_probe_counts_partition_prunes_and_single_dir_skips_agg(
    spark, tmp_path
):
    """(a) a small probe vocabulary lands its bucket predicate in
    PartitionFilters — directory-level pruning before any file IO (the
    BM25 topk discipline applied to the gate's probe); (b) with one
    live dir the probe plan carries NO aggregation exchange — the
    compact_every=1 low-latency mode's whole point."""
    docs = _docs(spark)
    store = NgramCountStore(
        spark, str(tmp_path / "s"), w=DUP_SPAN_W, n_buckets=32
    )
    store.append(docs.filter(F.col("doc_id") % 2 == 0), "b0")
    store.append(docs.filter(F.col("doc_id") % 2 == 1), "b1")
    one_gram = store.batch_counts(
        spark.createDataFrame(
            [("alpha beta gamma delta epsilon",)], "text string"
        )
    ).localCheckpoint()
    assert one_gram.count() == 1
    plan = (
        store.probe_counts(one_gram)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "gram_bucket" in pf
    assert "Aggregate" in plan  # two live dirs: the sum is still needed
    assert store.compact() is True
    plan1 = (
        store.probe_counts(one_gram)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Aggregate" not in plan1  # fast path: scan + project only
    assert "gram_bucket" in plan1.split("PartitionFilters: [", 1)[1]


def test_append_writes_one_sorted_file_per_bucket(spark, tmp_path):
    """r13 layout: one gram-sorted parquet file per gram_bucket dir —
    without the write-side repartition every shuffle task wrote a file
    into every bucket it touched (hundreds of tiny files per dir)."""
    docs = _docs(spark)
    store = NgramCountStore(
        spark, str(tmp_path / "s"), w=DUP_SPAN_W, n_buckets=8
    )
    store.append(docs, "b0")
    root = store._batch_dir("b0")
    bucket_dirs = [
        d for d in os.listdir(root) if d.startswith("gram_bucket=")
    ]
    assert bucket_dirs, "append must produce gram_bucket= partition dirs"
    for d in bucket_dirs:
        files = [
            f for f in os.listdir(os.path.join(root, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, f"{d}: {len(files)} files"
        rows = [
            r.gram
            for r in spark.read.parquet(os.path.join(root, d)).collect()
        ]
        assert rows == sorted(rows)


def test_gate_low_latency_mode_compact_every_1(spark, tmp_path):
    """compact_every=1 (the documented low-latency mode): every epoch
    probes ONE pre-summed generation dir, and the drained store still
    equals a whole-corpus recount."""
    docs = _docs(spark)
    src = tmp_path / "src"
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    _drain(
        spark, src, docs.schema, tmp_path / "out", tmp_path / "store",
        tmp_path / "ck",
        max_files_per_trigger=1, compact_every=1,
    )
    store = NgramCountStore.open(spark, str(tmp_path / "store"))
    live = store.committed_batches()
    assert len(live) == 1 and live[0].startswith("gen")
    full = NgramCountStore(spark, str(tmp_path / "full"), w=DUP_SPAN_W)
    full.append(docs, "all")
    assert _counts(store) == _counts(full)


def test_probe_inline_vocab_pushes_rowgroup_filter_and_stays_exact(
    spark, tmp_path
):
    """A small probe vocabulary is pushed as a gram IN (...) DATA
    filter (PushedFilters — row-group skipping over the gram-sorted
    files); disabling the inline path (bucket pruning only) answers
    identically, as does the whole-store past_counts join."""
    docs = _docs(spark)
    store = NgramCountStore(
        spark, str(tmp_path / "s"), w=DUP_SPAN_W, n_buckets=32
    )
    store.append(docs, "b0")
    probe = store.batch_counts(
        docs.orderBy("doc_id").limit(1).select("text")
    ).localCheckpoint()
    plan = (
        store.probe_counts(probe)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "In(gram" in pushed or "EqualTo(gram" in pushed

    def lookup(counts_df):
        return {
            r.gram: r.c_past
            for r in probe.join(counts_df, "gram", "left").collect()
        }

    want = lookup(store.past_counts())
    assert want and lookup(store.probe_counts(probe)) == want
    assert lookup(store.probe_counts(probe, max_inline_vocab=0)) == want


def test_probe_counts_property_random_corpora(spark, tmp_path):
    """Hypothesis pin for the r13 probe: for random tiny corpora,
    random bucket counts, random batch splits, and every inline-vocab
    budget regime, probe_counts joined against a random probe frame
    answers exactly like the unpruned past_counts join."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    WORDS = ["aa", "bb", "cc", "dd", "ee", "ff"]
    counter = [0]

    @st.composite
    def corpora(draw):
        n_docs = draw(st.integers(min_value=1, max_value=8))
        docs = [
            " ".join(
                draw(
                    st.lists(
                        st.sampled_from(WORDS), min_size=0, max_size=8
                    )
                )
            )
            for _ in range(n_docs)
        ]
        probe = [
            " ".join(
                draw(st.lists(st.sampled_from(WORDS), min_size=2, max_size=6))
            )
        ]
        return (
            docs,
            probe,
            draw(st.integers(min_value=1, max_value=2)),  # n batches
            draw(st.sampled_from([1, 2, 16])),  # n_buckets
            draw(st.sampled_from([0, 1, 512])),  # max_inline_vocab
        )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(corpora())
    def check(case):
        docs, probe_texts, n_batches, n_buckets, inline = case
        counter[0] += 1
        store = NgramCountStore(
            spark,
            str(tmp_path / f"s{counter[0]}"),
            w=2,
            n_buckets=n_buckets,
        )
        frame = spark.createDataFrame([(t,) for t in docs], "text string")
        appended = False
        for i in range(n_batches):
            part = spark.createDataFrame(
                [(t,) for j, t in enumerate(docs) if j % n_batches == i]
                or [("",)],
                "text string",
            )
            st_ = store.append(part, f"b{i}")
            appended = appended or st_["n_windows"] > 0
        probe = store.batch_counts(
            spark.createDataFrame([(t,) for t in probe_texts], "text string")
        ).localCheckpoint()

        def lookup(counts_df):
            return {
                r.gram: r.c_past
                for r in probe.join(counts_df, "gram", "left").collect()
            }

        want = lookup(store.past_counts())
        got = lookup(store.probe_counts(probe, max_inline_vocab=inline))
        assert got == want

    check()


def test_probe_counts_refuses_recomputable_frames(spark, tmp_path):
    """r14 (r13 verdict #5): the documented silent-wrong mode — a probe
    frame whose re-evaluation could grow new grams — is now a loud
    error before any pushdown is derived: file-scan leaves and
    nondeterministic expressions both refuse; the explicit
    unsafe_allow_recompute opt-out answers exactly for a source the
    caller knows is immutable."""
    docs = _docs(spark)
    store = NgramCountStore(spark, str(tmp_path / "s"), w=DUP_SPAN_W)
    store.append(docs, "b0")
    src = str(tmp_path / "probe_src")
    store.batch_counts(
        docs.orderBy("doc_id").limit(2).select("text")
    ).write.parquet(src)
    raw = spark.read.parquet(src)
    with pytest.raises(ValueError, match="re-evaluatable"):
        store.probe_counts(raw)
    nd = spark.range(3).select(
        F.concat(F.lit("g"), (F.rand() * 100).cast("int").cast("string"))
        .alias("gram")
    )
    with pytest.raises(ValueError, match="nondeterministic"):
        store.probe_counts(nd)

    def lookup(probe, counts_df):
        return {
            r.gram: r.c_past
            for r in probe.join(counts_df, "gram", "left").collect()
        }

    pinned = raw.localCheckpoint()
    want = lookup(pinned, store.past_counts())
    assert want
    # opt-out: the parquet dir really is immutable here, so the answer
    # is exact; the pinned path needs no flag
    assert lookup(pinned, store.probe_counts(raw, unsafe_allow_recompute=True)) == want
    assert lookup(pinned, store.probe_counts(pinned)) == want


def test_bulk_probe_bloom_tier_is_exact_and_falls_back(spark, tmp_path):
    """r14 (r13 verdict #2): a BULK probe vocabulary (over the inline
    budget) consults the per-bucket Bloom sidecars, drops the grams
    that are provably absent store-wide, and rides the inline pushdown
    with the survivors — answering EXACTLY like the unpruned
    past_counts join. A live dir without a sidecar (legacy store)
    disables the tier and the probe stays on its exact floor."""
    docs = _docs(spark)
    store = NgramCountStore(
        spark, str(tmp_path / "s"), w=DUP_SPAN_W, n_buckets=8
    )
    for i in range(2):
        store.append(docs.filter(F.col("doc_id") % 2 == i), f"b{i}")
    # sidecars landed beside both batch dirs
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import (
        bloom_sidecar as B,
    )

    for b in store.committed_batches():
        assert B.load_sidecar(store._batch_dir(b)) is not None
    # bulk probe: half store grams (must all survive — no false
    # negatives), half fresh grams (mostly bloom-dropped)
    probe = (
        store.batch_counts(docs.limit(6).select("text"))
        .unionByName(
            store.batch_counts(
                spark.createDataFrame(
                    [
                        (" ".join(f"zz{i}_{j}" for j in range(12)),)
                        for i in range(40)
                    ],
                    "text string",
                )
            )
        )
        .localCheckpoint()
    )

    def lookup(counts_df):
        return {
            r.gram: r.c_past
            for r in probe.join(counts_df, "gram", "left").collect()
        }

    want = lookup(store.past_counts())
    assert want
    # force the bulk tier (vocab over the inline budget)
    got = lookup(store.probe_counts(probe, max_inline_vocab=1))
    assert got == want
    # a legacy dir (no sidecar) disables the tier -> exact floor
    os.remove(
        os.path.join(store._batch_dir("b0"), B.SIDECAR_NAME)
    )
    assert lookup(store.probe_counts(probe, max_inline_vocab=1)) == want
    # compact rewrites the sidecar (the legacy upgrade path) and the
    # tier fires again, still exact
    assert store.compact() is True
    gen = store.committed_batches()[0]
    assert B.load_sidecar(store._batch_dir(gen)) is not None
    assert lookup(store.probe_counts(probe, max_inline_vocab=1)) == want
