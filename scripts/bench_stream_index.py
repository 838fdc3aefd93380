#!/usr/bin/env python
"""Streaming LSH-index maintenance under load (round-7 verdict #6).

``stream_dedup_index`` grows one store dir per committed micro-batch;
probe cost is O(live store dirs), so a long-running ingest without
maintenance sees per-epoch latency CLIMB. ``compact_every=N`` folds
``LshDedupIndex.compact()`` into the stream after every N committed
batches. This bench drains the same many-epoch document stream twice —
with and without auto-compaction — and reports per-epoch latency (from
the checkpoint's commit-log mtimes: epoch k's latency is
commit[k].mtime - commit[k-1].mtime, merge + index commit inclusive),
plus the live-store-dir count and a final cold probe.

Usage::

    python scripts/bench_stream_index.py [--sf-dir /root/testdata/sf0.1]
                                         [--batches 24] [--compact-every 8] [--max-files 1]

Prints one JSON line per leg.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.session import get_spark  # noqa: E402


def epoch_latencies(ckpt: str) -> list[float]:
    commits = os.path.join(ckpt, "commits")
    files = sorted(
        (int(f), os.path.getmtime(os.path.join(commits, f)))
        for f in os.listdir(commits)
        if f.isdigit()
    )
    return [round(b[1] - a[1], 2) for a, b in zip(files, files[1:])]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--compact-every", type=int, default=8)
    ap.add_argument(
        "--max-files",
        type=int,
        default=1,
        help="maxFilesPerTrigger: source files per micro-batch (r8 — "
        "trades epoch count against per-pair latency; fewer, bigger "
        "epochs need less compaction for the same fan-in bound)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.dedup_index import (
        LshDedupIndex,
    )
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.cdc_stream import (
        stream_dedup_index,
    )

    spark = get_spark("d365-spark-bench-stream-index")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="bench_stream_index_")
    try:
        docs = load_table(spark, args.sf_dir, "documents").select("doc_id", "text")
        n_docs = docs.count()
        source = os.path.join(work, "source")
        bcol = F.pmod(F.xxhash64("doc_id"), F.lit(args.batches))
        for b in range(args.batches):
            docs.filter(bcol == b).coalesce(1).write.mode("append").parquet(source)
        schema = docs.schema

        for leg, every in (("no_compaction", 0), ("auto_compaction", args.compact_every)):
            index = os.path.join(work, f"index_{leg}")
            pairs = os.path.join(work, f"pairs_{leg}")
            ckpt = os.path.join(work, f"ckpt_{leg}")
            t0 = time.perf_counter()
            q = stream_dedup_index(
                spark, source, schema, index, pairs, ckpt,
                jaccard_min=0.5, compact_every=every,
                max_files_per_trigger=args.max_files,
            )
            q.awaitTermination(3600)
            wall = time.perf_counter() - t0
            lat = epoch_latencies(ckpt)
            idx = LshDedupIndex(spark, index, jaccard_min=0.5)
            live_dirs = len(idx.committed_batches())
            # cold probe: one fresh batch against the finished index
            probe_docs = docs.limit(200).withColumn(
                "doc_id", F.col("doc_id") + F.lit(10_000_000)
            )
            t0 = time.perf_counter()
            p, _commit = idx.prepare_batch(probe_docs, "bench-probe")
            n_pairs = p.count()  # computed, never committed
            probe_sec = round(time.perf_counter() - t0, 2)
            print(
                json.dumps(
                    {
                        "metric": f"stream_dedup_index_{leg}",
                        "docs": n_docs,
                        "batches": args.batches,
                        "compact_every": every,
                        "max_files_per_trigger": args.max_files,
                        "wall_sec": round(wall, 2),
                        "docs_per_sec": round(n_docs / wall, 1),
                        "epoch_latency_first4": lat[:4],
                        "epoch_latency_last4": lat[-4:],
                        "live_store_dirs": live_dirs,
                        "cold_probe_sec": probe_sec,
                        "probe_pairs": n_pairs,
                        "sf_dir": args.sf_dir,
                    }
                )
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
