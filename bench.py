#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced through full materialization with the noop sink
(count() alone can let Catalyst skip column evaluation).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.session import get_spark

HEADLINE = [
    "cdc_snapshot",
    "cdc_incremental_merge",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "q_topk_per_group",
    "q_window_running_lag",
    "q_events_tumbling",
    "q_events_sessionize",
    "q_text_token_stats",
    "q_sim_bruteforce_topk",
    "q_asof_join",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    import __spark_entry__ as entry_mod

    spark = get_spark("d365-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = {**entry_mod.queries(), **entry_mod.extra_queries()}

    # Warm the JVM/code paths once with the cheapest query so per-query
    # timings measure the plan, not session startup.
    queries["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in queries:
            continue
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
