"""Streaming heavy hitters (r9 verdict #6): the per-epoch MG merge must
(1) keep the W/(k+1) candidate-superset guarantee ACROSS epochs, (2)
reproduce the batch computation exactly on the drained corpus, (3) stay
exactly-once under epoch replay, and (4) carry the weighted
(representative, multiplicity) stream the r9 dedup routing produces."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.frequent import (
    heavy_hitters_exact,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.heavy_hitters import (
    MgSummaryStore,
    stream_heavy_hitters,
)

SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("w", T.LongType()),
    ]
)

K = 9  # guarantee line: anything above W/10 must be a candidate


def _skewed_rows(epoch: int, n_tail: int = 120):
    """Per-epoch skew: two persistent heavy terms + an epoch-local
    mid-weight term + a long unique tail. The heavy terms cross the
    W/(k+1) line only CUMULATIVELY — single-epoch summaries alone
    cannot certify them, which is what makes the cross-epoch merge
    bound the thing under test."""
    rows = [("hot_a", 1)] * 60 + [("hot_b", 1)] * 45
    rows += [(f"mid_{epoch}", 1)] * 12
    rows += [(f"tail_{epoch}_{i}", 1) for i in range(n_tail)]
    return rows


def _drain(spark, source, store_path, checkpoint, weight_col=None, k=K):
    q = stream_heavy_hitters(
        spark,
        str(source),
        SCHEMA,
        str(store_path),
        str(checkpoint),
        col="term",
        k=k,
        weight_col=weight_col,
    )
    q.awaitTermination(120)
    return MgSummaryStore(str(store_path), k)


def test_stream_heavy_hitters_equals_batch(spark, tmp_path):
    source, store_p, ck = tmp_path / "src", tmp_path / "store", tmp_path / "ck"
    all_rows = []
    for epoch in range(4):
        rows = _skewed_rows(epoch)
        all_rows += rows
        spark.createDataFrame(rows, SCHEMA).coalesce(2).write.parquet(
            str(source), mode="append"
        )
    store = _drain(spark, source, store_p, ck)

    corpus = spark.createDataFrame(all_rows, SCHEMA)
    total = len(all_rows)
    assert store.total_weight() == total

    exact_counts = {
        r["term"]: r["n"]
        for r in corpus.groupBy("term").agg(F.count("*").alias("n")).collect()
    }
    cands = store.candidates()

    # (1) superset guarantee across epochs: every item above W/(k+1)
    # is present, and each mg_count is a lower bound within W/(k+1)
    line = store.threshold()
    for term, n in exact_counts.items():
        if n > line:
            assert term in cands, f"{term} (n={n} > {line}) missing"
    for term, mg in cands.items():
        assert mg <= exact_counts[term]
        assert exact_counts[term] - mg <= line

    # (2) candidates -> exact second pass == the batch operator verbatim
    phi = 1.0 / (K + 1)
    batch = {
        (r["term"], r["n_occurrences"])
        for r in heavy_hitters_exact(corpus, "term", phi, k=K).collect()
    }
    cand_df = spark.createDataFrame([(t,) for t in cands], "term string")
    streamed = {
        (r["term"], r["n"])
        for r in corpus.join(F.broadcast(cand_df), "term")
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > total * phi)
        .collect()
    }
    assert streamed == batch
    assert {"hot_a", "hot_b"} == {t for t, _n in batch}


def test_epoch_replay_is_exactly_once(spark, tmp_path):
    source, store_p, ck = tmp_path / "src", tmp_path / "store", tmp_path / "ck"
    for epoch in range(2):
        spark.createDataFrame(_skewed_rows(epoch), SCHEMA).coalesce(1).write.parquet(
            str(source), mode="append"
        )
    store = _drain(spark, source, store_p, ck)
    w1, cands1, hwm1 = (
        store.total_weight(),
        store.candidates(),
        store.epoch_high_water(),
    )
    # epoch keys live in the BOUNDED ledger: one query id, not a flat
    # per-epoch list (r10 verdict #2)
    assert len(hwm1) == 1 and store.committed_ids() == []
    (qid,) = hwm1

    # restart against the SAME checkpoint: no new files -> no new epochs
    store = _drain(spark, source, store_p, ck)
    assert store.total_weight() == w1 and store.candidates() == cands1
    assert store.epoch_high_water() == hwm1

    # a replayed epoch key is a hard no-op even if fed fresh rows —
    # including epochs BELOW the high-water mark (monotonic semantics)
    for epoch in range(hwm1[qid] + 1):
        store.merge_epoch([("hot_a", 999)], 999, f"{qid}-epoch-{epoch}")
    assert store.total_weight() == w1 and store.candidates() == cands1

    # k mismatch on an existing store fails loudly, never merges wrong
    with pytest.raises(ValueError, match="was built with k="):
        MgSummaryStore(str(store_p), K + 3).candidates()


def test_weighted_stream_equals_expanded_stream(spark, tmp_path):
    """The r9 routing shape: (distinct item, multiplicity) rows through
    ``weight_col`` must land the same candidates/threshold state as the
    clone-expanded stream — clone factor never materialized."""
    weighted, expanded = [], []
    for epoch in range(3):
        ep = [("hot_a", 40), ("hot_b", 25), (f"mid_{epoch}", 9)] + [
            (f"tail_{epoch}_{i}", 1) for i in range(60)
        ]
        weighted.append(ep)
        expanded.append([(t, 1) for t, m in ep for _ in range(m)])

    src_w, st_w, ck_w = tmp_path / "sw", tmp_path / "tw", tmp_path / "cw"
    src_e, st_e, ck_e = tmp_path / "se", tmp_path / "te", tmp_path / "ce"
    for ep_w, ep_e in zip(weighted, expanded):
        spark.createDataFrame(ep_w, SCHEMA).coalesce(1).write.parquet(
            str(src_w), mode="append"
        )
        spark.createDataFrame(ep_e, SCHEMA).coalesce(1).write.parquet(
            str(src_e), mode="append"
        )
    sw = _drain(spark, src_w, st_w, ck_w, weight_col="w")
    se = _drain(spark, src_e, st_e, ck_e)

    assert sw.total_weight() == se.total_weight()
    line = sw.threshold()
    # both stores obey the same guarantee; the heavy terms sit above it
    # in BOTH (epoch partitioning differs, so the summaries need not be
    # identical — the CONTRACT is what must coincide)
    exact = {}
    for ep in weighted:
        for t, m in ep:
            exact[t] = exact.get(t, 0) + m
    for store in (sw, se):
        cands = store.candidates()
        for t, n in exact.items():
            if n > line:
                assert t in cands
        for t, mg in cands.items():
            assert exact[t] - mg <= line and mg <= exact[t]
