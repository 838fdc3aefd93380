#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
COMPACT JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "reps": N, "sf": ..., "calib": {...},
"detail": "BENCH_detail_r{N}.json", slim normalized blocks}.

The driver captures only a bounded tail of stdout, and r10's committed
artifact lost its raw medians when the single line outgrew that capture
(r10 verdict #1). So the final line is SLIM — medians, calib, and each
normalized block's verdict fields only — asserted under ~1800 chars by
``tests/test_bench_normalize.py``; the FULL document (per-query [min,
max] spreads, complete ratio maps) goes to a committed sidecar
``BENCH_detail_r{N}.json`` named in the line's ``detail`` key.
``calib_compare.load`` re-merges a sidecar's spreads when reading a
slim artifact, so cross-round robust flags keep working.

Variance-aware: each query runs $SPARK_GRAFT_BENCH_REPS times (default
3) and reports the per-query MEDIAN; the sidecar's "spread" carries
min/max so noise is visible in the artifact instead of masquerading as
regression (a single-rep bench once read a 34% environment blip as a
real 34% slowdown). The JVM warm-up query is NON-headline
(q_rollup_sales) so no timed query gets a warm-up advantage over the
others.

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
    # added r12: BM25 ranked retrieval — the round's new query family
    # (engine-exact Okapi; the incremental store's topk is
    # contract-bound bit-identical to this plan, so tracking the
    # full-corpus row tracks the shared scoring/fold structure too).
    # Totals grow by its ~1 s at sf0.1; SCALING.md notes the set grew.
    "q_text_bm25_topk",
]

# r11 (r10 verdict #4): the four foreachBatch legs had equivalence tests
# but no per-round perf row — a choreography regression (like the
# heavy-hitters double-scan r10's review caught) would never surface in
# a committed artifact. One fixed streaming workload, timed like any
# other row: drain the second half of the embeddings table into a
# pre-built IvfLayoutStore as 4 one-file micro-batches (per-epoch cost
# is dominated by the fixed assign + two-phase-commit choreography,
# which is exactly what regresses). Store build and source-file writes
# are untimed setup.
STREAM_ROW = "q_stream_ivf_append_4ep"

# r13 (r12 verdict #6): the unified ingest pipeline is the shape users
# actually run (quality + decontamination + LSH indexing in ONE
# foreachBatch) and its fixed-choreography win was r12's headline claim
# — but only the standalone IVF leg had a committed per-round row. One
# fixed workload, IDENTICAL to scripts/ab_ingest_pipeline.py's unified
# arm (so the committed row and the A/B doc read on one scale): drain
# the %13-heldout-split train corpus as 4 one-file micro-batches
# through stream_ingest_pipeline (min_score=50, n=4, jaccard_min=0.5).
# Per-epoch cost is dominated by the fixed trigger + gate + probe +
# two-phase-commit choreography — exactly what regresses; measured
# flat between quarter- and full-corpus inputs at sf0.1 (~30 s), so
# the row is a choreography clock, not a throughput row. Source writes
# and heldout derivation are untimed setup; 2 reps since r15 (r14
# verdict #7: a 1-rep spread is a point the robust-flag overlap check
# cannot adjudicate), and the row rides the "choreography" tag so the
# adjudication blocks compare it at its RAW ratio. Totals grew by its
# ~30 s at sf0.1 when it landed — SCALING.md notes the set grew;
# cross-round totals compare via calib_compare's per-query rows.
INGEST_ROW = "q_stream_ingest_4ep"


def bench_stream_ingest(spark, sf_dir: str, reps: int) -> list[float]:
    """Wall seconds per drain of the fixed 4-epoch unified ingest.

    The FIRST drain is an UNTIMED warm-up (the ab_lib discipline): the
    bench's global warm-up query never touches the streaming path, and
    a cold first drain pays stream/foreachBatch/Python-worker/store
    first-time costs that a same-tree A/B measured at 1.6-2.5x the
    warm drain (r15: standalone walls 34.0/25.8/21.4 s on this tree,
    50.2/20.5/18.3 s on the r14 tree) — without the warm-up, a 2-rep
    median is the midpoint of one cold and one warm drain and the
    committed value tracks JIT state, not the pipeline."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.ingest_pipeline import (
        stream_ingest_pipeline,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    heldout = docs.filter(F.col("doc_id") % 13 == 0)
    train = docs.filter(F.col("doc_id") % 13 != 0)
    n_train = train.count()
    samples = []
    for rep in range(reps + 1):
        work = tempfile.mkdtemp(prefix="bench_stream_ingest_")
        try:
            src = os.path.join(work, "src")
            for i in range(4):
                train.filter(F.col("doc_id") % 4 == i).coalesce(
                    1
                ).write.mode("append").parquet(src)
            t0 = time.perf_counter()
            q = stream_ingest_pipeline(
                spark, src, train.schema, heldout,
                os.path.join(work, "out"), os.path.join(work, "idx"),
                os.path.join(work, "ck"), min_score=50, n=4,
                jaccard_min=0.5, max_files_per_trigger=1,
            )
            if not q.awaitTermination(600):
                q.stop()
                raise RuntimeError(
                    "ingest bench did not drain within 600 s — too slow "
                    "for this host, not broken (no sample recorded)"
                )
            if rep > 0:  # rep 0 = untimed warm-up drain
                samples.append(time.perf_counter() - t0)
            out = os.path.join(work, "out")
            n_routed = sum(
                spark.read.parquet(os.path.join(out, d)).count()
                for d in ("clean", "rejected", "contaminated")
                if os.path.isdir(os.path.join(out, d))
            )
            if n_routed != n_train:
                raise RuntimeError(
                    f"ingest bench routed {n_routed}/{n_train} docs — the "
                    "pipeline choreography is broken, not slow"
                )
        finally:
            shutil.rmtree(work, ignore_errors=True)
    return samples


def bench_stream_ivf(spark, sf_dir: str, reps: int) -> list[float]:
    """Wall seconds per drain of the fixed 4-epoch IVF ingest.

    Like ``bench_stream_ingest``, the first drain is an UNTIMED
    warm-up (see the rationale there): this row runs FIRST among the
    streaming rows, so its cold rep 1 was the session's first
    streaming query and its 2-rep median mixed cold and warm drains
    (r15 committed spread before the fix: [3.36, 4.74])."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.ivf_store import (
        IvfLayoutStore,
    )
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.vector_ingest import (
        stream_ivf_append,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n_total = emb.count()
    base = emb.filter(F.col("vec_id") % 2 == 0)
    # raw first-16 seeds as pinned centroids: the row measures append
    # CHOREOGRAPHY (assign + dir write + locked meta commit per epoch),
    # not recall — training would only add untimed setup noise
    cents = emb.filter(F.col("vec_id") < 16)
    samples = []
    for rep in range(reps + 1):
        work = tempfile.mkdtemp(prefix="bench_stream_ivf_")
        try:
            store = IvfLayoutStore(spark, os.path.join(work, "store"))
            store.build(base, cents)
            src = os.path.join(work, "src")
            delta = emb.filter(F.col("vec_id") % 2 == 1)
            for i in range(4):
                delta.filter(F.col("vec_id") % 8 == 2 * i + 1).coalesce(
                    1
                ).write.mode("append").parquet(src)
            t0 = time.perf_counter()
            q = stream_ivf_append(
                spark, src, delta.schema, os.path.join(work, "store"),
                os.path.join(work, "ck"), max_files_per_trigger=1,
            )
            if not q.awaitTermination(600):
                # timed out with the query STILL RUNNING: recording
                # ~600 s as a sample would be a bogus data point, and
                # the n_vectors check below would misdiagnose a slow
                # drain as broken choreography while the finally-block
                # rmtree raced the live query (r11 review). Stop it,
                # then fail as what it is: slow.
                q.stop()
                raise RuntimeError(
                    "stream bench did not drain within 600 s — the "
                    "ingest is too slow for this host, not broken "
                    "(no sample recorded)"
                )
            if rep > 0:  # rep 0 = untimed warm-up drain
                samples.append(time.perf_counter() - t0)
            n_vecs = store.drift()["n_vectors"]
            if n_vecs != n_total:
                raise RuntimeError(
                    f"stream bench drained {n_vecs}/{n_total} vectors — "
                    "the ingest choreography is broken, not slow"
                )
        finally:
            shutil.rmtree(work, ignore_errors=True)
    return samples


def next_round_number(repo_dir: str) -> int:
    """1 + the highest COMMITTED ``BENCH_r{N}.json`` round. Committed,
    not on-disk: the round being PRODUCED drops its artifact into the
    working tree before the close-out commit, so an on-disk max would
    name the sidecar one round ahead for any bench re-run in that
    window — the sidecar then misses its conventional name and the
    round's robust flags silently degrade to median-only (r11 review).
    Delegates to ``calib_compare.round_artifacts`` — ONE committed-only
    filter instead of a second copy that can drift (r11 review #2) —
    but with its git-failure drop-max fallback DISABLED: that pop is a
    reference-selection safeguard, and for numbering it inverts the
    risk — ls-files failing before the in-flight artifact lands would
    name this round after the last committed one and overwrite that
    round's committed detail sidecar (r11 advice). Numbering from the
    undropped on-disk max can only err HIGH (degrading one run's
    robust flags to median-only), never clobber committed history."""
    arts = _calib_module().round_artifacts(
        repo_dir, drop_unverifiable_max=False
    )
    return (arts[-1][0] if arts else 0) + 1


# the sf the driver's per-round bench runs at (BASELINE.md cadence);
# the conventional sidecar name is reserved for runs at exactly this sf
OFFICIAL_SF = 0.1


def detail_sidecar_name(repo_dir: str, sf: float) -> str:
    """Where this run's full result document goes. The conventional
    ``BENCH_detail_r{N}.json`` is reserved for OFFICIAL_SF runs; any
    other sf gets an sf-suffixed name. Deterministic by sf — not
    first-writer-wins against an existing file — so an off-SF smoke run
    can neither clobber the official sidecar (a /verify contract check
    at sf0.01 destroyed the committed sf0.1 detail mid-round — r11) nor
    squat the conventional name before the official run lands (review
    of the first fix). Same-sf re-runs legitimately refresh it
    (``calib_compare.load``'s medians-match guard rejects a stale one);
    should the driver ever run at another sf, ``load`` still finds the
    suffixed sidecar through the artifact's ``detail`` field."""
    name = f"BENCH_detail_r{next_round_number(repo_dir)}"
    if sf != OFFICIAL_SF:
        name += f"_sf{sf}"
    return name + ".json"


def slim_final_line(result: dict, detail_name: str) -> str:
    """The one printed JSON line, shaped to survive the driver's
    bounded tail capture (r10 verdict #1): every headline median, the
    calib block, and each normalized block's VERDICT fields (reference
    artifact, jvm host factor, total ratio, flag lists, warnings) —
    the full ratio maps and rep spreads live in the sidecar named by
    ``detail``."""
    slim = {
        k: result[k]
        for k in ("metric", "value", "unit", "queries", "reps", "sf", "calib")
    }
    slim["detail"] = detail_name
    for key in ("normalized_vs_prev", "normalized_vs_nearest_host"):
        block = result.get(key)
        if isinstance(block, dict):
            block = {
                k2: v
                for k2, v in block.items()
                if k2 not in ("ratios", "host_factor_python")
            }
        slim[key] = block
    return json.dumps(slim, separators=(",", ":"))


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
    block = {
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
    if ref.get("queries") == parsed.get("queries"):
        # r10 advice: without git, round_artifacts falls back to every
        # on-disk artifact, and a mid-round re-run can pick up the
        # current round's own file — a ~1.0 comparison that adjudicates
        # nothing. Identical median maps are that degenerate case (two
        # real runs never tie every median to the ms); make it visible
        # instead of letting it read as "no regressions".
        block["warning"] = (
            "reference medians identical to this run — degenerate "
            "self-comparison (uncommitted current-round artifact?)"
        )
    return block


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

    # the streaming row (r10 verdict #4): capped at 2 reps — each rep
    # drains a fresh store, and the row tracks fixed per-epoch
    # choreography whose variance is small next to its cost; r15: one
    # untimed warm-up drain first, like the ingest row
    s_samples = bench_stream_ivf(spark, sf_dir, min(reps, 2))
    timings[STREAM_ROW] = round(statistics.median(s_samples), 3)
    spread[STREAM_ROW] = [
        round(min(s_samples), 3), round(max(s_samples), 3)
    ]

    # the unified-pipeline row (r12 verdict #6; r15: one untimed
    # warm-up drain + 2 timed reps so the committed spread is a real
    # interval of WARM drains the robust-flag overlap check can
    # adjudicate — r14 verdict #7; without the warm-up the 2-rep
    # median was the midpoint of one cold and one warm drain)
    i_samples = bench_stream_ingest(spark, sf_dir, min(reps, 2))
    timings[INGEST_ROW] = round(statistics.median(i_samples), 3)
    spread[INGEST_ROW] = [
        round(min(i_samples), 3), round(max(i_samples), 3)
    ]

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
        # structural tag consumed by calib_compare (r14 verdict #7):
        # these two clocks are choreography-bound and CPU-insensitive
        # (SCALING.md shows q_stream_ingest_4ep flat across a 3.8x
        # calib swing), so the adjudication blocks compare them at
        # their RAW ratio instead of dividing by a host CPU factor
        "choreography": [STREAM_ROW, INGEST_ROW],
    }
    result["normalized_vs_prev"] = self_normalize(result, REPO_ROOT)
    result["normalized_vs_nearest_host"] = nearest_host_normalize(result, REPO_ROOT)
    # full document -> the committed round sidecar; slim line -> stdout
    # (r10 verdict #1: the single line outgrew the driver's tail capture
    # and the committed artifact lost its medians)
    detail_name = detail_sidecar_name(REPO_ROOT, result["sf"])
    with open(os.path.join(REPO_ROOT, detail_name), "w") as fh:
        json.dump(result, fh, indent=1)
    # Leading newline: Spark's console progress / log lines end in '\r'
    # or partial fragments on the same tty; a tail-capture of merged
    # output must still see the JSON on a line of its own (r9 verdict
    # nit: a truncated DAGScheduler fragment rode the artifact's tail).
    sys.stderr.flush()
    sys.stdout.flush()
    print("\n" + slim_final_line(result, detail_name), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
