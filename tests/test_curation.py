"""Semantics + scale-shape tests for the corpus-curation family
(decontamination, stratified sampling, blocklist, sequence packing).
Oracle parity for each query is covered by test_entry_contract; these
tests pin the properties the oracle comparison can't see."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import curation as C
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.plans import curation_queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_word_ngrams_values_and_short_doc(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, "   "), (4, "x  y\tz w")],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: r.grams
        for r in df.select(
            "doc_id", C.word_ngrams(F.col("text"), 3).alias("grams")
        ).collect()
    }
    assert got[1] == ["a b c", "b c d"]
    assert got[2] == []  # fewer than n tokens -> empty, not descending seq
    assert got[3] == []
    assert got[4] == ["x y z", "y z w"]  # any-whitespace tokenization


def test_decontaminate_joins_by_broadcast(spark):
    """The held-out n-gram set is small by construction; the train-side
    probe must be a broadcast hash join (no shuffle of the exploded
    train n-grams), and no all-pairs fallback."""
    df = Q.q_decontaminate_ngram(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert df.count() > 0


def test_stratified_sample_matches_hash_rule(spark):
    """Membership is exactly the salted-md5 permille rule — reproducible
    from outside Spark — and repeated runs return the identical set."""
    kept = {r.doc_id: r.lang for r in Q.q_sample_stratified(spark, SF_DIR).collect()}
    docs = Q.load_table(spark, SF_DIR, "documents").select("doc_id", "lang").collect()
    expected = {}
    for r in docs:
        u = int(hashlib.md5(f"strat:{r.doc_id}".encode()).hexdigest()[:15], 16) % 1000
        rate = Q.STRAT_RATES.get(r.lang, Q.STRAT_DEFAULT)
        if u < rate:
            expected[r.doc_id] = r.lang
    assert kept == expected
    again = {r.doc_id for r in Q.q_sample_stratified(spark, SF_DIR).collect()}
    assert again == set(kept)


def test_blocklist_counts_word_boundaries_only(spark):
    df = spark.createDataFrame(
        [(1, "Spark sparkles; merge MERGED slow."), (2, "clean text only")],
        ["doc_id", "text"],
    )
    pattern = r"\b(" + "|".join(Q.BLOCKLIST) + r")\b"
    hits = F.regexp_count(F.lower(F.col("text")), F.lit(pattern))
    got = {
        r.doc_id: (r.n, r.keep)
        for r in df.select(
            "doc_id", hits.alias("n"), (hits == 0).cast("int").alias("keep")
        ).collect()
    }
    # spark + merge + "slow." all match; "sparkles"/"MERGED" do not
    assert got == {1: (3, 0), 2: (0, 1)}


def test_pack_sequences_invariants(spark):
    rows = Q.q_pack_sequences(spark, SF_DIR).collect()
    assert rows
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for source, group in by_source.items():
        group.sort(key=lambda r: r.doc_id)
        # reconstruct the running offsets: packing is exactly
        # concat-in-doc_id-order then chop at SEQ_LEN
        start = 0
        for r in group:
            assert r.seq_id == start // Q.SEQ_LEN
            assert r.offset_in_seq == start % Q.SEQ_LEN
            end = start + max(r.n_tokens, 1) - 1
            assert r.spans_boundary == int(end // Q.SEQ_LEN > r.seq_id)
            start += r.n_tokens
        # first doc of every shard starts sequence 0 at offset 0
        assert group[0].seq_id == 0 and group[0].offset_in_seq == 0


def test_pack_sequences_window_is_sharded_not_global(spark):
    """The running sum must partition by source — a global ORDER BY
    window (SinglePartition exchange) is the 100 TB bottleneck this
    operator is specifically shaped to avoid."""
    df = Q.q_pack_sequences(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "hashpartitioning(source" in plan


def test_word_ngrams_matches_python_reference(spark):
    """200 seeded-random whitespace-mess strings, one Spark job: the
    column expression must agree with a plain-Python reference on every
    edge (leading/trailing/multi-whitespace, empty, short docs)."""
    import random
    import re

    rng = random.Random(42)
    alphabet = "ab c  d\te "
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 30)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r.doc_id: r.g
        for r in df.select(
            "doc_id", C.word_ngrams(F.col("text"), 2).alias("g")
        ).collect()
    }
    for i, t in enumerate(texts):
        toks = re.split(r"\s+", t.strip()) if t.strip() else []
        want = [" ".join(toks[j : j + 2]) for j in range(len(toks) - 1)]
        assert got[i] == want, (i, repr(t))


def test_adaptive_threshold_broadcasts_and_respects_quartile(spark):
    """Documents must NOT shuffle: the per-source threshold table joins
    back by broadcast. And per source, the kept fraction is >= 3/4 with
    every kept score >= the threshold (the 4*cum >= n rule)."""
    df = Q.q_quality_adaptive_threshold(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert rows
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
        assert r.quality_score >= r.q_thr
    totals = {
        r.source: r.n
        for r in Q.load_table(spark, SF_DIR, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for src, kept in by_src.items():
        assert len(kept) >= 0.75 * totals[src], (src, len(kept), totals[src])


def test_quota_sample_exact_counts_and_determinism(spark):
    """Exactly min(quota, stratum size) rows per source, identical
    membership across runs, and membership reproducible from the salted
    md5 rule outside Spark."""
    a = {(r.doc_id, r.source) for r in Q.q_sample_quota(spark, SF_DIR).collect()}
    b = {(r.doc_id, r.source) for r in Q.q_sample_quota(spark, SF_DIR).collect()}
    assert a == b
    sizes = {
        r.source: r.n
        for r in Q.load_table(spark, SF_DIR, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    per_src: dict = {}
    for _, src in a:
        per_src[src] = per_src.get(src, 0) + 1
    for src, n in sizes.items():
        assert per_src.get(src, 0) == min(Q.QUOTA_PER_SOURCE, n)
    # reproduce one source's winners outside Spark
    docs = [
        (r.doc_id, r.source)
        for r in Q.load_table(spark, SF_DIR, "documents").select("doc_id", "source").collect()
    ]
    src0 = docs[0][1]
    ranked = sorted(
        (hashlib.md5(f"{Q.QUOTA_SALT}{d}".encode()).hexdigest(), d)
        for d, s in docs
        if s == src0
    )
    want = {d for _, d in ranked[: Q.QUOTA_PER_SOURCE]}
    assert {d for d, s in a if s == src0} == want


def test_dup_span_detect_and_cut_agree(spark):
    """The detector and the cutter are two views of one covered-position
    set: per doc, kept + covered == total tokens, the cleaned text has
    exactly n_kept_tokens whitespace tokens, and a fully-duplicated doc
    (a clone) cuts to ''. The fixture is clone-heavy, so both sides of
    the split must be non-degenerate."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.plans import (
        text_queries as T,
    )

    det = {
        r.doc_id: (r.n_tokens, r.n_dup_tokens)
        for r in T.q_text_dup_spans(spark, SF_DIR).collect()
    }
    cut = {
        r.doc_id: (r.n_tokens, r.n_kept_tokens, r.clean_text)
        for r in T.q_text_cut_dup_spans(spark, SF_DIR).collect()
    }
    assert set(det) == set(cut) and det
    full_cut = partial = untouched = 0
    for doc_id, (n, dup) in det.items():
        n2, kept, text = cut[doc_id]
        assert n2 == n
        assert kept + dup == n, doc_id  # one partition of the positions
        assert len([t for t in text.split(" ") if t]) == kept, doc_id
        if dup == n and n > 0:
            full_cut += 1
            assert text == ""
        elif dup == 0:
            untouched += 1
        else:
            partial += 1
    # clone-heavy fixture: every outcome class must actually occur —
    # including untouched, or the dup==0 coalesce/left-join path of
    # both queries goes unexercised (r12 review: the counter existed
    # but was never asserted)
    assert full_cut > 0 and partial > 0 and untouched > 0


def test_interval_union_fold_matches_set_model(spark):
    """The shared fold (curation.interval_union_len) against a naive
    set-union model over 300 seeded-random sorted start arrays — ONE
    Spark job evaluates every case (hypothesis-per-example would pay a
    job each). Covers empties, singletons, dense overlaps, exact
    w-gaps (the min() boundary), and far-apart islands."""
    import random

    w = 5
    rng = random.Random(12012)
    cases = [[]]
    cases += [[rng.randrange(0, 40)] for _ in range(10)]
    for _ in range(289):
        n = rng.randrange(1, 30)
        span = rng.choice([8, 20, 60, 300])
        cases.append(sorted(rng.randrange(0, span) for _ in range(n)))
    df = spark.createDataFrame(
        [(i, ps) for i, ps in enumerate(cases)],
        "case_id long, ps array<long>",
    )
    got = {
        r.case_id: r.n
        for r in df.select(
            "case_id", C.interval_union_len(F.col("ps"), w).alias("n")
        ).collect()
    }
    for i, ps in enumerate(cases):
        covered = set()
        for p in ps:
            covered.update(range(p, p + w))
        assert got[i] == len(covered), (i, ps)
