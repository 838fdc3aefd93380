#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "spread": {name: [min, max]}, "reps": N,
"sf": ...}.

Variance-aware: each query runs $SPARK_GRAFT_BENCH_REPS times (default
3) and reports the per-query MEDIAN; "spread" carries min/max so noise
is visible in the artifact instead of masquerading as regression (a
single-rep bench once read a 34% environment blip as a real 34%
slowdown). The JVM warm-up query is NON-headline (q_rollup_sales) so no
timed query gets a warm-up advantage over the others.

Each query is forced through full materialization with the noop sink
(count() alone can let Catalyst skip column evaluation).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)

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
    # added r6: the exact-top-k scale path (partial-top-k BLAS matmul);
    # tracked per-round so regressions in the non-pair-join shape are
    # visible. Totals across rounds shift by its ~0.5 s accordingly.
    "q_sim_topk_matmul",
    # added r7: the dedup flagship in its PRODUCTION shape (xxhash64
    # minhash, banded postings equi-join, staged intermediates) — the
    # family had no per-round perf row; the md5 oracle twin costs the
    # same shape + 3.5 s of string hashing, so tracking the fast path
    # tracks the structure. Totals shift by its ~2.5 s; calib_compare
    # diffs per-query.
    "q_dedup_minhash_fast",
    # added r10 (r9 verdict #4): the two routed-family rows whose r9
    # routing wins (fuzzy d1 17.8 -> 1.4 s, decontaminate 33.7 -> 6.6 s
    # at sf1) were verified only by gitignored session sweeps — promoted
    # so a routing regression surfaces in the committed artifact. Totals
    # grow by their ~1.5 s at sf0.1; cross-round totals compare via
    # calib_compare's per-query rows, and SCALING.md notes the set grew.
    "q_fuzzy_join_d1",
    "q_decontaminate_ngram",
]


def self_normalize(parsed: dict, artifacts_dir: str) -> dict | None:
    """Calib-normalize THIS run against the previous round's committed
    ``BENCH_r{N}.json`` so the artifact carries its own adjudication
    (r8 verdict #1: a raw row on a transiently slow host once read a
    real 0.77x improvement as a 2.55x regression because nothing
    consumed the calib block the file itself carried).

    Reuses the arithmetic in ``scripts/calib_compare.py`` (loaded by
    path — scripts/ is not a package). Returns None when there is no
    prior artifact or either side lacks a calib block (pre-r6); returns
    an ``{"error": ...}`` stub instead of raising on malformed priors —
    the bench line must never die to its own bookkeeping."""
    try:
        mod = _calib_module()
        prev_path = mod.latest_round_artifact(artifacts_dir)
        return _normalize_against(parsed, prev_path, mod, key="prev_artifact")
    except Exception as exc:  # pragma: no cover - defensive
        return {"error": f"{type(exc).__name__}: {exc}"}


def nearest_host_normalize(parsed: dict, artifacts_dir: str) -> dict | None:
    """Second adjudication block (r9 verdict #3): normalize against the
    committed artifact whose host (JVM calib yardstick) was CLOSEST to
    this run's, not merely the latest. The latest artifact tracks
    progress but inherits its own host's noise — the r9 flag list vs the
    slow r8 host was retired by a MANUAL calib_compare run against r7
    (the nearest-host round); this emits that tiebreak into the artifact
    itself, so a flag in ``normalized_vs_prev`` that the nearest-host
    block clears is adjudicated noise, no by-hand step."""
    try:
        mod = _calib_module()
        cal = parsed.get("calib") or {}
        if not cal.get("jvm_range_sum_20m"):
            return None
        near_path = mod.nearest_host_artifact(
            artifacts_dir, cal["jvm_range_sum_20m"], parsed.get("sf")
        )
        return _normalize_against(parsed, near_path, mod, key="nearest_artifact")
    except Exception as exc:  # pragma: no cover - defensive
        return {"error": f"{type(exc).__name__}: {exc}"}


_CALIB_MOD = None


def _calib_module():
    # memoized: both normalize blocks need it; re-exec'ing the file (and
    # its git subprocess scans) twice per bench run is pure waste on the
    # "must never die to its own bookkeeping" path (review finding)
    global _CALIB_MOD
    if _CALIB_MOD is None:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "spark_graft_calib_compare",
            os.path.join(REPO_ROOT, "scripts", "calib_compare.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _CALIB_MOD = mod
    return _CALIB_MOD


def _normalize_against(
    parsed: dict, ref_path: str | None, mod, key: str
) -> dict | None:
    if ref_path is None:
        return None
    ref = mod.load(ref_path)
    if not ref.get("calib") or not parsed.get("calib"):
        return None
    if ref.get("sf") != parsed.get("sf"):
        # a bench run at a non-default SPARK_GRAFT_SF_DIR must not
        # divide its timings by another scale factor's — every row
        # would flag (review finding, r9)
        return None
    out = mod.compare(ref, parsed)
    return {
        key: os.path.basename(ref_path),
        "host_factor_jvm": out["host_factor_jvm"],
        "host_factor_python": out["host_factor_python"],
        # per-query raw ratio DIVIDED by the host factor of the
        # query's bound resource — >1.3 is a real regression, the
        # host excuse is retired by arithmetic
        "ratios": {r["query"]: r["norm_ratio"] for r in out["rows"]},
        "total_norm_ratio": out["total_norm_ratio"],
        "flagged": out["flagged"],
        # flags whose rep spreads also separate (see calib_compare):
        # the list a reader should actually chase
        "flagged_robust": out["flagged_robust"],
    }


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

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

    # Warm the JVM/code paths with a NON-headline query (scan + shuffle +
    # agg over orders) so per-query timings measure the plan, not session
    # startup — and no timed query double-dips as its own warm-up. Then
    # touch every table once so the FIRST timed query doesn't eat the
    # cold parquet-footer / page-cache cost the others never pay (the
    # pre-warm cdc_snapshot spread [0.68, 1.84] was exactly that).
    queries["q_rollup_sales"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import (
        TABLES,
        load_table,
    )

    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    # Python-worker warm-up: the first Arrow-batched UDF of a session
    # pays worker fork + numpy/pandas import (~8 s — q_sim_topk_matmul's
    # first rep read 9.2 s vs a 0.8 s median). One tiny mapInPandas
    # outside the timed section charges that cost to setup, where it
    # belongs; it is NOT a data warm-up for any headline query.
    import pandas as _pd
    from pyspark.sql import functions as _F  # noqa: F401

    def _touch(batches):
        import numpy as np  # noqa: F401

        for pdf in batches:
            yield pdf

    spark.range(8).mapInPandas(_touch, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    # Machine calibration: absolute timings drift between rounds because
    # the sandbox host changes (measured: a CPU-bound headline query at
    # 0.6 s one round, 1.6 s the next, zero code change). Two fixed
    # micro-workloads give the reader a host-speed yardstick to
    # normalize cross-round comparisons by: a pure-Python loop (single-
    # threaded BY CONSTRUCTION — a numpy matmul would silently use an
    # unpinned BLAS thread pool and scale with core count) and a JVM
    # codegen sum whose actual parallelism is recorded beside it.
    # Medians of 5, ~1 s total.
    calib_py = []
    for _ in range(5):
        t0 = time.perf_counter()
        acc = 0
        for i in range(2_000_000):
            acc += i * i
        calib_py.append(time.perf_counter() - t0)
    calib_jvm = []
    for _ in range(5):
        t0 = time.perf_counter()
        spark.range(20_000_000).selectExpr("sum(id * 2 + 7)").collect()
        calib_jvm.append(time.perf_counter() - t0)
    calib = {
        "python_loop_2m": round(statistics.median(calib_py), 4),
        "jvm_range_sum_20m": round(statistics.median(calib_jvm), 4),
        "jvm_parallelism": spark.sparkContext.defaultParallelism,
    }

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in HEADLINE:
        if name not in queries:
            continue
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)
        spread[name] = [round(min(samples), 3), round(max(samples), 3)]

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "reps": reps,
        "sf": sf,
        "calib": calib,
    }
    result["normalized_vs_prev"] = self_normalize(result, REPO_ROOT)
    result["normalized_vs_nearest_host"] = nearest_host_normalize(result, REPO_ROOT)
    # Leading newline: Spark's console progress / log lines end in '\r'
    # or partial fragments on the same tty; a tail-capture of merged
    # output must still see the JSON on a line of its own (r9 verdict
    # nit: a truncated DAGScheduler fragment rode the artifact's tail).
    sys.stderr.flush()
    sys.stdout.flush()
    print("\n" + json.dumps(result), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
