#!/usr/bin/env python
"""A/B: the SimHash r8 ladder — unrouted vs routed, JVM vs Arrow
majority fold, md5 vs xxhash64 family (pairs identical across the md5
legs; blocks bit-identical across folds). Prints ONE JSON line; the
SCALING.md round-8 source.

    python scripts/ab_simhash_fold.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.plans.dedup_queries import (  # noqa: E402
    q_dedup_simhash,
    q_dedup_simhash_fast,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.session import get_spark  # noqa: E402


def fingerprint(df):
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.pmod(F.xxhash64("id_a", "id_b", "hamming"), F.lit(1_000_000_007))
        ).alias("h"),
    ).collect()[0]
    return int(row.n), int(row.h or 0)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("d365-spark-ab-simhash-fold")
    spark.sparkContext.setLogLevel("ERROR")

    legs = {
        # unrouted reference (staging already the r8 sigs-level cut)
        "jvm_raw": lambda: q_dedup_simhash(
            spark, sf_dir, jvm_fold=True, routed=False
        ),
        "arrow_raw": lambda: q_dedup_simhash(
            spark, sf_dir, jvm_fold=False, routed=False
        ),
        # production: JVM fold + exact-text-dedup routing
        "jvm_routed": lambda: q_dedup_simhash(spark, sf_dir),
        "arrow_routed": lambda: q_dedup_simhash(spark, sf_dir, jvm_fold=False),
        # different hash family: pairs legitimately differ near the
        # hamming margin (fixture agreement pinned in pytest), so the
        # fast leg is excluded from the identical_pairs check
        "fast_routed": lambda: q_dedup_simhash_fast(spark, sf_dir),
    }
    out = {"sf_dir": sf_dir, "reps": reps}
    for name, build in legs.items():
        fingerprint(build())  # warm-up
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            n, h = fingerprint(build())
            times.append(time.perf_counter() - t0)
        out[name] = {
            "median_s": round(statistics.median(times), 2),
            "min_s": round(min(times), 2),
            "max_s": round(max(times), 2),
            "pairs": n,
            "hashsum": h,
        }
    out["identical_pairs"] = (
        len(
            {
                (out[k]["pairs"], out[k]["hashsum"])
                for k in ("jvm_raw", "arrow_raw", "jvm_routed", "arrow_routed")
            }
        )
        == 1
    )
    out["speedup"] = round(
        out["jvm_raw"]["median_s"] / out["jvm_routed"]["median_s"], 2
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
