#!/usr/bin/env python
"""A/B: LSH dedup-index probe cost against many per-batch store dirs
vs the same state after ``compact()``.

The index appends one ``batch=<id>`` dir per ingest, so probe fan-in
and file counts grow O(#batches); compaction merges them into one
generation dir repartitioned on the probe join key. This measures the
actual probe-latency difference at a given batch count (plus file
counts), so the maintenance op's value is a number, not an argument.

Usage::

    python scripts/ab_index_compaction.py [--sf-dir /root/testdata/sf0.01]
                                          [--batches 24] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.session import get_spark  # noqa: E402


def count_files(path: str) -> int:
    return sum(
        1
        for dp, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.dedup_index import (
        LshDedupIndex,
    )

    spark = get_spark("ab-index-compaction")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="ab_idx_")
    try:
        docs = load_table(spark, args.sf_dir, "documents").select("doc_id", "text")
        idx = LshDedupIndex(spark, os.path.join(work, "idx"))
        for b in range(args.batches):
            batch = docs.filter(F.col("doc_id") % args.batches == b)
            idx.add_batch(batch, f"b{b}").write.format("noop").mode(
                "overwrite"
            ).save()

        probe = docs.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 900_000).alias("doc_id"), "text"
        )

        def probe_time() -> float:
            samples = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                pairs, _commit = idx.prepare_batch(probe, "probe-only")
                pairs.write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
            return statistics.median(samples)

        files_before = count_files(os.path.join(work, "idx", "buckets"))
        t_before = probe_time()
        assert idx.compact()
        files_after = count_files(os.path.join(work, "idx", "buckets"))
        t_after = probe_time()

        print(
            json.dumps(
                {
                    "batches": args.batches,
                    "bucket_files_before": files_before,
                    "bucket_files_after": files_after,
                    "probe_s_before": round(t_before, 2),
                    "probe_s_after": round(t_after, 2),
                    "speedup": round(t_before / t_after, 2),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
