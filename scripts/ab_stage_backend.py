#!/usr/bin/env python
"""A/B: staging backends under one staged query (r9 verdict #1/#5).

The open r9 scale question: sf10 ``q_dedup_groups`` showed 464.6 vs
341.3 s across reps on a clean host, suspected checkpoint-block memory
pressure at 48g. This harness runs a staged query N reps under each
stage backend (``SPARK_GRAFT_STAGE_BACKEND`` is read at stage() call
time, so flipping the env between reps re-routes every staged pipeline
with zero plan edits):

- local       — localCheckpoint, MEMORY_AND_DISK blocks (r9 status quo)
- local_disk  — localCheckpoint, DISK_ONLY blocks (memory pressure
                removed, executor pinning kept)
- durable     — reliable checkpoint files on the (shared) checkpoint FS
                (memory pressure removed AND fault-tolerant)

If the rep variance tracks the block-storage arm, the memory-pressure
hypothesis stands; if it persists under durable/disk, the cause is
elsewhere (record either way in SCALING.md).

Usage: python scripts/ab_stage_backend.py [sf_dir] [query] [reps]
(defaults localdata/sf10, q_dedup_groups, 3)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import ab_lib  # noqa: E402

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "localdata", "sf10")
    qname = sys.argv[2] if len(sys.argv) > 2 else "q_dedup_groups"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import __spark_entry__ as entry_mod

    queries = {**entry_mod.queries(), **entry_mod.extra_queries()}
    fn = queries[qname]

    spark = get_spark("ab-stage-backend")
    spark.sparkContext.setLogLevel("ERROR")

    # Schedule via the shared harness (scripts/ab_lib.py, extracted
    # FROM this script's run-1/run-2 contrast — r10 verdict #5): one
    # untimed warm-up cycle (each backend warms its own code paths),
    # then the arms INTERLEAVED per cycle so monotonic host drift
    # (cache warming, thermal, co-tenant load) lands on every arm
    # equally instead of flattering whichever ran last (the first,
    # sequential version of this harness read exactly that confound:
    # every arm was faster than the arm before it).
    def run_backend(backend):
        def arm(_ctx):
            os.environ["SPARK_GRAFT_STAGE_BACKEND"] = backend
            try:
                return fn(spark, sf_dir).count()
            finally:
                os.environ.pop("SPARK_GRAFT_STAGE_BACKEND", None)

        return arm

    arms = ["local", "local_disk", "durable"]
    results, _rows = ab_lib.warmup_interleaved(
        {a: run_backend(a) for a in arms},
        reps,
        log=lambda m: print(f"{qname} {m}", flush=True),
    )

    print(f"\n{qname} @ {sf_dir} ({reps} reps):")
    for backend, walls in results.items():
        lo, hi = min(walls), max(walls)
        print(
            f"  {backend:<11} min={lo:7.1f}s max={hi:7.1f}s "
            f"spread={hi / lo:4.2f}x walls={[round(w, 1) for w in walls]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
