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
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

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

    # One untimed warm-up first (JVM code paths + parquet footers + page
    # cache) — pinned to the first arm's backend so an ambient
    # $SPARK_GRAFT_STAGE_BACKEND export can't make it eager or
    # backend-mismatched — then the arms run INTERLEAVED — cycle 0 runs local,
    # local_disk, durable; cycle 1 runs them again; ... — so monotonic
    # host drift (cache warming, thermal, co-tenant load) lands on every
    # arm equally instead of flattering whichever arm ran last (the
    # first, sequential version of this harness read exactly that
    # confound: every arm was faster than the arm before it).
    arms = ["local", "local_disk", "durable"]
    os.environ["SPARK_GRAFT_STAGE_BACKEND"] = arms[0]
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    print(f"warmup wall={time.perf_counter() - t0:.1f}s", flush=True)

    results: dict[str, list[float]] = {a: [] for a in arms}
    for rep in range(reps):
        for backend in arms:
            os.environ["SPARK_GRAFT_STAGE_BACKEND"] = backend
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            w = time.perf_counter() - t0
            results[backend].append(w)
            print(f"{qname} backend={backend} rep={rep} rows={n} wall={w:.1f}s",
                  flush=True)
    os.environ.pop("SPARK_GRAFT_STAGE_BACKEND", None)

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
