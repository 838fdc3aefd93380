#!/usr/bin/env python
"""Per-epoch cost breakdown of the unified ingest pipeline (r14, r13
verdict #6): WHICH stage carries the ~7-8 s/epoch fixed cost the
q_stream_ingest_4ep bench row clocks, measured per stage via the
pipeline's ``stage_timings`` observation hook (no behavior change —
the hook only reads the wall clock between the epoch's own steps).

Runs the same 4-epoch availableNow drain as the bench row, in TWO
configurations:

- ``base``: the bench row's exact 3-stage shape (quality ->
  decontaminate -> LSH)
- ``full``: all stages on (quality -> decontaminate -> span gate ->
  LSH + BM25) — where the r13/r14 additions (span verdict, n-gram
  append + Bloom sidecar, BM25 append) land in the breakdown

Prints a per-stage table (median seconds/epoch over the drain's
epochs, first epoch excluded as JVM warmup) for SCALING.md.

Usage: python scripts/profile_ingest_epoch.py [sf_dir] [reps]
(defaults /root/testdata/sf0.1, 1)
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import (  # noqa: E402
    load_table,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.session import (  # noqa: E402
    get_spark,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.ingest_pipeline import (  # noqa: E402
    stream_ingest_pipeline,
)


def drain(spark, docs, heldout, work: str, cfg: str) -> list:
    src = os.path.join(work, "src")
    for i in range(4):
        docs.filter(F.col("doc_id") % 4 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    timings: list = []
    kwargs = dict(
        min_score=50, n=4, jaccard_min=0.5, max_files_per_trigger=1,
        stage_timings=timings,
    )
    if cfg == "full":
        kwargs.update(
            span_store_path=os.path.join(work, "ng"),
            span_max_dup_pct=80.0,
            bm25_path=os.path.join(work, "bm25"),
        )
    q = stream_ingest_pipeline(
        spark, src, docs.schema, heldout,
        os.path.join(work, "out"), os.path.join(work, "idx"),
        os.path.join(work, "ck"), **kwargs,
    )
    assert q.awaitTermination(900), "drain did not finish"
    return timings


def report(cfg: str, timings: list) -> None:
    # first epoch is JVM/stream warmup — report it separately. Marks
    # are keyed by EPOCH ID, not list position: a stage can skip
    # epochs (bm25_append on an empty clean output, clean_write's
    # per-branch placement), and positional alignment would
    # misattribute the epoch0 column and poison medians (review pin).
    stages: dict[str, dict[int, float]] = {}
    order: list[str] = []
    for epoch_id, marks in timings:
        for stage, sec in marks:
            if stage not in stages:
                stages[stage] = {}
                order.append(stage)
            stages[stage][epoch_id] = sec
    print(f"\n[{cfg}] per-epoch stage walls (s): epoch0 | median(e1..)")
    total0 = totalm = 0.0
    for s in order:
        first = stages[s].get(0)
        rest = [sec for e, sec in stages[s].items() if e > 0]
        med = statistics.median(rest) if rest else None
        f_str = f"{first:7.3f}" if first is not None else "     --"
        m_str = f"{med:7.3f}" if med is not None else "     --"
        print(f"  {s:20s} {f_str} | {m_str}")
        total0 += first or 0.0
        totalm += med or 0.0
    print(f"  {'TOTAL':20s} {total0:7.3f} | {totalm:7.3f}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    spark = get_spark("profile-ingest-epoch")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    heldout = docs.filter(F.col("doc_id") % 13 == 0)
    train = docs.filter(F.col("doc_id") % 13 != 0)
    try:
        for cfg in ("base", "full"):
            for _ in range(reps):
                work = tempfile.mkdtemp(prefix=f"profile_ingest_{cfg}_")
                try:
                    report(cfg, drain(spark, train, heldout, work, cfg))
                finally:
                    shutil.rmtree(work, ignore_errors=True)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
