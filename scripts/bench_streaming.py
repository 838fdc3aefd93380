#!/usr/bin/env python
"""Streaming throughput bench: rows/second through the micro-batch CDC
merge (``streaming.cdc_stream.stream_cdc_merge``) at the bench scale
factor.

The batch bench (bench.py) covers latency of one-shot plans; this
covers the CONTINUOUS path — every micro-batch pays a delta-only merge
against the published snapshot plus one version write + pointer swap,
so its steady-state rows/s is the number that regresses if merge write
amplification, snapshot re-reads, or commit overhead creep in.

Method: the sf events table is turned into the CDC changelog shape,
split into N equal micro-batch files, and drained with
``maxFilesPerTrigger=1`` + ``availableNow`` — N real merge cycles, each
against the sink state the previous batches built. Reported rows/s is
total changelog rows / wall time for the WHOLE drain (merge + commit
inclusive; Spark session startup excluded).

Usage::

    python scripts/bench_streaming.py [--sf-dir /root/testdata/sf0.1]
                                      [--batches 8]

Prints one JSON line:
    {"metric": "stream_cdc_merge_rows_per_sec", "value": ..., ...}
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--batches", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.plans.changelog import (
        changelog_from_events,
    )
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.cdc_stream import (
        stream_cdc_merge,
    )

    spark = get_spark("d365-spark-bench-streaming")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="bench_stream_")
    source = os.path.join(work, "source")
    sink = os.path.join(work, "sink")
    ckpt = os.path.join(work, "ckpt")
    try:
        changelog = changelog_from_events(load_table(spark, args.sf_dir, "events"))
        # N micro-batch files, split by KEY hash so each key's full
        # history (inserts, updates, its delete sentinel) lands in one
        # batch — batches touch disjoint keys, exactly the per-ingest
        # chunking a landing zone produces, and the final snapshot
        # equals the batch full-load. One file per trigger.
        bcol = F.pmod(F.xxhash64("systemid"), F.lit(args.batches))
        for b in range(args.batches):
            (
                changelog.filter(bcol == b)
                .coalesce(1)
                .write.mode("append")
                .parquet(source)
            )
        n_rows = changelog.count()
        src_schema = changelog.schema

        # drain: one stream_cdc_merge pass over all N files
        t0 = time.perf_counter()
        q = stream_cdc_merge(
            spark,
            source,
            src_schema,
            sink,
            ckpt,
            tie_breakers=("event_id",),
        )
        q.awaitTermination(1800)
        wall = time.perf_counter() - t0

        from dynamics_365_to_bigquery_spark_etl_pipeline_spark import sinks

        final_rows = spark.read.parquet(sinks.current_version_path(sink)).count()
        print(
            json.dumps(
                {
                    "metric": "stream_cdc_merge_rows_per_sec",
                    "value": round(n_rows / wall, 1),
                    "unit": "rows/sec",
                    "rows": n_rows,
                    "batches": args.batches,
                    "wall_sec": round(wall, 2),
                    "final_snapshot_rows": final_rows,
                    "sf_dir": args.sf_dir,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
