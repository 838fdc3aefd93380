#!/usr/bin/env python
"""Span-gate probe scaling (r12 verdict #1 / r13): the per-epoch probe
wall as the indexed corpus grows, old shape vs the r13 probe.

r12's gate joined the batch vocabulary against
``NgramCountStore.past_counts()`` — a scan of every live dir plus a
store-VOCABULARY-sized groupBy exchange, every micro-batch: the one
per-epoch cost in any leg that grew with the corpus instead of the
delta. r13 replaces it with ``probe_counts``: gram_bucket partition
pruning + (small vocabularies) a ``gram IN`` data filter that
row-group-skips over the now-gram-sorted bucket files, and a
single-live-dir fast path that drops the re-aggregation entirely
(``compact_every=1``, the documented low-latency mode).

Measured here at TWO store sizes (default 10k vs 100k synthetic docs —
mostly-unique vocabulary, so store vocab grows ~10x) for one fixed
arriving micro-batch each of two shapes:

- ``small`` (4 docs): the low-latency gate — inline-vocab pushdown
  fires; the honest target is wall growth FAR below the 10x data
  growth (row groups read are O(|vocab|), job overhead dominates)
- ``bulk`` (2000 docs): vocabulary exceeds both the inline budget and
  the bucket count. Through r13 this degraded to scan + join (the
  r13-measured 2.73x growth across the 10x store); r14 adds the
  Bloom-sidecar prefilter (r13 verdict #2) — the mostly-new bulk
  vocabulary shrinks to survivors (true dups + ~fpp) which ride the
  inline pushdown, so the honest target is now ≪ linear here too;
  only saturated blooms or duplicate-heavy batches pay the floor

Arms per (size, batch) cell, interleaved per ab_lib discipline:
``r12_agg_join`` (scan -> groupBy -> join, the shipped r12 shape) vs
``r13_probe`` (``probe_counts`` join). Both count the dup-gram frame —
the gate's actual downstream consumption — and assert equal counts.

Stores are built once per size (untimed): 8 appends + compact(), so
both arms probe the same single-generation layout the low-latency mode
runs against.

Usage: python scripts/scale_span_probe.py [small_docs] [big_docs] [reps]
(defaults 10000, 100000, 3)
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import ab_lib  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.ngram_store import (  # noqa: E402
    NgramCountStore,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.session import get_spark  # noqa: E402

W = 5
N_BUCKETS = 256  # sized to the small batch's vocabulary, per the docs
TOKENS_PER_DOC = 40
MIN_OCC = 2


def synth_docs(spark, n_docs: int, salt: str):
    """Mostly-unique corpus: every doc is 40 tokens 'w<salt>_<doc>_<j>'
    except a shared leading phrase on every 50th doc (so dup grams
    exist and the probe join has matches to return)."""
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 50 == 0,
            F.concat(
                F.lit("alpha beta gamma delta epsilon "),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(5), F.lit(TOKENS_PER_DOC - 1)),
                        lambda j: F.concat(
                            F.lit(f"w{salt}_"),
                            F.col("id").cast("string"),
                            F.lit("_"),
                            j.cast("string"),
                        ),
                    ),
                ),
            ),
        )
        .otherwise(
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(TOKENS_PER_DOC - 1)),
                    lambda j: F.concat(
                        F.lit(f"w{salt}_"),
                        F.col("id").cast("string"),
                        F.lit("_"),
                        j.cast("string"),
                    ),
                ),
            )
        )
        .alias("text"),
    )


def build_store(spark, work: str, n_docs: int, tag: str) -> NgramCountStore:
    store = NgramCountStore(
        spark, os.path.join(work, f"store_{tag}"), w=W, n_buckets=N_BUCKETS
    )
    docs = synth_docs(spark, n_docs, tag)
    for i in range(8):
        store.append(docs.filter(F.col("doc_id") % 8 == i), f"b{i}")
    store.compact()
    return store


def dup_count_r12(store, c_new) -> int:
    """The shipped r12 shape: full scan -> groupBy(gram) -> left join."""
    dirs = [store._batch_dir(b) for b in store.committed_batches()]
    past = (
        store._read_data(dirs)
        .groupBy("gram")
        .agg(F.sum("c").cast("long").alias("c_past"))
    )
    return _dup(c_new, past)


def dup_count_r13(store, c_new) -> int:
    return _dup(c_new, store.probe_counts(c_new))


def _dup(c_new, past) -> int:
    return (
        c_new.join(past, "gram", "left")
        .filter(
            F.col("c") + F.coalesce(F.col("c_past"), F.lit(0)) >= MIN_OCC
        )
        .count()
    )


def main() -> None:
    small_n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    big_n = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    spark = get_spark("scale-span-probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="scale_span_probe_")
    try:
        stores = {
            n: build_store(spark, work, n, tag)
            for n, tag in ((small_n, "s"), (big_n, "b"))
        }
        # fixed arriving batches, shared across store sizes: 2 docs
        # repeat the planted phrase (dups exist), the rest are fresh
        batches = {
            "small": synth_docs(spark, 4, "batchS"),
            "bulk": synth_docs(spark, 2000, "batchB"),
        }
        results = {}
        for bname, bdocs in batches.items():
            probe_src = bdocs.withColumn(
                "text",
                F.when(
                    F.col("doc_id") < 2,
                    F.concat(F.lit("alpha beta gamma delta epsilon "), F.col("text")),
                ).otherwise(F.col("text")),
            )
            for n, store in stores.items():
                c_new = store.batch_counts(
                    probe_src.select("text")
                ).localCheckpoint()
                arms = {
                    "r12_agg_join": lambda _c, s=store, c=c_new: dup_count_r12(s, c),
                    "r13_probe": lambda _c, s=store, c=c_new: dup_count_r13(s, c),
                }
                timings, last = ab_lib.warmup_interleaved(
                    arms, reps, log=None
                )
                assert last["r12_agg_join"] == last["r13_probe"], (
                    bname, n, last
                )
                results[(bname, n)] = {
                    a: statistics.median(t) for a, t in timings.items()
                }
                print(
                    f"{bname:5s} batch vs {n:>7d}-doc store: "
                    + "  ".join(
                        f"{a}={results[(bname, n)][a]:.3f}s"
                        for a in arms
                    )
                    + f"  (dup grams: {last['r13_probe']})",
                    flush=True,
                )
        growth = big_n / small_n
        print(f"\nstore growth {growth:.0f}x -> probe wall growth:")
        for bname in batches:
            for arm in ("r12_agg_join", "r13_probe"):
                g = (
                    results[(bname, big_n)][arm]
                    / results[(bname, small_n)][arm]
                )
                print(f"  {bname:5s} {arm}: {g:.2f}x")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
