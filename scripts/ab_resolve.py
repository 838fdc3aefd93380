#!/usr/bin/env python
"""A/B benchmark: one-pass ``resolve_snapshot`` (sentinel flag folded
into the dedup window's shuffle) vs the composed form
(``filter_soft_deletes`` -> ``latest_version_per_key``: an extra scan to
build the deleted-key set + an anti-join before the window).

Runs both plans over the sf changelog median-of-N with a warm-up rep,
prints ONE JSON line, and is the committed source of the numbers quoted
in SCALING.md (replacing the earlier ad-hoc "~1.8x" claim).

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/ab_resolve.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import cdc
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.plans.changelog import (
    changelog_from_events,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.session import get_spark

TIE = ("event_id",)


def one_pass(df):
    return cdc.resolve_snapshot(df, tie_breakers=TIE)


def composed(df):
    return cdc.latest_version_per_key(
        cdc.filter_soft_deletes(df), tie_breakers=TIE
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5")))
    spark = get_spark("d365-spark-ab-resolve")
    spark.sparkContext.setLogLevel("ERROR")
    log = changelog_from_events(load_table(spark, sf_dir, "events"))

    # equivalence guard: the A/B is meaningless if the plans diverge
    n_one = one_pass(log).count()
    n_comp = composed(log).count()
    assert n_one == n_comp, f"plans disagree: {n_one} vs {n_comp}"

    results = {}
    for name, fn in [("one_pass", one_pass), ("composed", composed)]:
        samples = []
        for i in range(reps + 1):  # rep 0 is the warm-up, discarded
            t0 = time.perf_counter()
            fn(log).write.format("noop").mode("overwrite").save()
            if i > 0:
                samples.append(time.perf_counter() - t0)
        results[name] = {
            "median_sec": round(statistics.median(samples), 3),
            "min_sec": round(min(samples), 3),
            "max_sec": round(max(samples), 3),
        }
    ratio = results["composed"]["median_sec"] / results["one_pass"]["median_sec"]
    print(
        json.dumps(
            {
                "metric": "resolve_snapshot_ab",
                "sf_dir": sf_dir,
                "reps": reps,
                "rows": n_one,
                "composed_over_one_pass": round(ratio, 3),
                **results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
