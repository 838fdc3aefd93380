#!/usr/bin/env python
"""Timing sweep: run EVERY registered + extra query at a scale point
and print the slowest ones. Not a benchmark (1 warm rep after a warm-up
rep, no medians) — a HOTSPOT FINDER: anything that stands an order of
magnitude above its family is a recompute/allocation bug candidate
(this sweep is how r7 caught q_dedup_simhash at 60 s and the minhash
self-join recompute).

Usage: python scripts/sweep_timings.py [sf_dir] [top_n]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 15

    import __spark_entry__ as E

    spark = get_spark("d365-spark-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(E.queries())
    qs.update(E.extra_queries())

    def _touch(batches):
        import numpy as np  # noqa: F401

        for pdf in batches:
            yield pdf

    spark.range(8).mapInPandas(_touch, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    out = []
    for name in sorted(qs):
        try:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            warm = time.perf_counter() - t0
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            out.append((round(time.perf_counter() - t0, 2), round(warm, 2), name))
        except Exception as exc:  # noqa: BLE001 - report, keep sweeping
            print(f"ERROR {name}: {str(exc).splitlines()[0][:120]}")
    out.sort(reverse=True)
    total = sum(t for t, _, _ in out)
    print(f"\n{len(out)} queries, total warm {total:.1f}s at {sf_dir}; slowest {top_n}:")
    for t, warm, name in out[:top_n]:
        print(f"  {t:7.2f}s (first {warm:6.2f}s)  {name}")
    spark.stop()


if __name__ == "__main__":
    main()
