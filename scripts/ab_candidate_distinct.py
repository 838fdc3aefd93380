#!/usr/bin/env python
"""A/B benchmark: candidate dedup by `.distinct()` (pre-r8) vs
MIN-BAND/MIN-BLOCK EMISSION (r8) in the minhash and simhash pipelines.

The band/block self-join emits one row per COLLIDING band, so a pair
colliding k times used to land k rows in a full-candidate-multiset
exchange — and because each colliding band's rows live in a different
partition (the join is keyed on the band), distinct's map-side partial
combine never collapsed them. Min-band emission decides locally (from
the signatures/blocks both sides already carry) whether a row's band is
the pair's FIRST colliding band, so each pair exits the join exactly
once and the dedup exchange disappears.

Prints ONE JSON line with wall times and pair-set fingerprints per leg;
the committed source of the SCALING.md round-8 numbers.

    python scripts/ab_candidate_distinct.py [sf_dir] [reps]
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
    _minhash_pairs,
    q_dedup_simhash,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.session import get_spark  # noqa: E402


def fingerprint(df, cols):
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.pmod(F.xxhash64(*cols), F.lit(1_000_000_007))).alias("h"),
    ).collect()[0]
    return int(row.n), int(row.h or 0)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("d365-spark-ab-distinct")
    spark.sparkContext.setLogLevel("ERROR")

    legs = {
        "minhash_fast_distinct": (
            lambda: _minhash_pairs(spark, sf_dir, fast=True, minband=False),
            ["id_a", "id_b"],
        ),
        "minhash_fast_minband": (
            lambda: _minhash_pairs(spark, sf_dir, fast=True, minband=True),
            ["id_a", "id_b"],
        ),
        # routed=False pins the plan these legs were recorded on (the
        # later r8 routing default would dedup clones first and change
        # what the distinct-vs-min-block comparison measures)
        "simhash_distinct": (
            lambda: q_dedup_simhash(spark, sf_dir, minblock=False, routed=False),
            ["id_a", "id_b", "hamming"],
        ),
        "simhash_minblock": (
            lambda: q_dedup_simhash(spark, sf_dir, minblock=True, routed=False),
            ["id_a", "id_b", "hamming"],
        ),
    }
    out = {"sf_dir": sf_dir, "reps": reps}
    for name, (build, cols) in legs.items():
        fingerprint(build(), cols)  # warm-up
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            n, h = fingerprint(build(), cols)
            times.append(time.perf_counter() - t0)
        out[name] = {
            "median_s": round(statistics.median(times), 2),
            "min_s": round(min(times), 2),
            "max_s": round(max(times), 2),
            "pairs": n,
            "hashsum": h,
        }
    for fam in ("minhash_fast", "simhash"):
        a, b = out[f"{fam}_distinct"], out[
            f"{fam}_minband" if fam == "minhash_fast" else f"{fam}_minblock"
        ]
        out[f"{fam}_identical"] = (a["pairs"], a["hashsum"]) == (
            b["pairs"],
            b["hashsum"],
        )
        out[f"{fam}_speedup"] = round(a["median_s"] / b["median_s"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
