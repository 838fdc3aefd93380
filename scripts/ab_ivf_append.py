#!/usr/bin/env python
"""A/B: IVF layout append vs full rebuild (r9 verdict #2 done-criterion).

The incremental store's claim is O(|delta|) appends: indexing a new
batch must cost the delta's assignment + one batch-dir write, not a
re-assignment of the whole corpus. This harness measures, on the real
embeddings table:

- ``build``   — full layout build over the whole corpus (what a daily
                ingest pays WITHOUT the store: re-index everything)
- ``append``  — the store's O(delta) path for a 10% delta against the
                pinned build centroids
- ``probe``   — top-k latency over the appended store (fan-in across
                batch dirs must not degrade the probe)

Expectation: append wall ~= delta-fraction of build wall (plus constant
job overhead, which dominates at toy scale); record the measured ratio
in SCALING.md. Usage: python scripts/ab_ivf_append.py [sf_dir] [reps]
(defaults localdata/sf1, 3).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import ab_lib  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.session import get_spark  # noqa: E402
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import similarity as S  # noqa: E402
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.ivf_store import (  # noqa: E402
    IvfLayoutStore,
)

N_CENTROIDS = 64
DELTA_MOD = 10  # vec_id % 10 == 0 -> the 10% daily-ingest stand-in


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "localdata", "sf1")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = get_spark("ab-ivf-append")
    spark.sparkContext.setLogLevel("ERROR")

    emb = (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    base = emb.filter(F.col("vec_id") % DELTA_MOD != 0).localCheckpoint()
    delta = emb.filter(F.col("vec_id") % DELTA_MOD == 0).localCheckpoint()
    n_base, n_delta = base.count(), delta.count()
    print(f"corpus: base={n_base} delta={n_delta} ({sf_dir})", flush=True)

    # Same centroid recipe as the registered layout row: seed from the
    # corpus, one exact Lloyd refinement. Trained once, shared by both
    # arms — the A/B measures the INDEXING, not the training.
    seeds = base.orderBy("vec_id").limit(N_CENTROIDS).select(
        F.monotonically_increasing_id().alias("vec_id"), "embedding"
    )
    centroids = S.refine_centroids(base, seeds).localCheckpoint()
    queries = base.orderBy("vec_id").limit(200).localCheckpoint()

    root = tempfile.mkdtemp(prefix="ab_ivf_append_")

    # r10 verdict #5 retrofit: the arms now run through the shared
    # interleaved schedule (scripts/ab_lib.py) with one UNTIMED warm-up
    # cycle — the original loop already alternated build/append/probe
    # per rep but had no warm-up, so cycle 0 carried the cold parquet /
    # JVM cost on whichever arm ran first. Per-cycle setup (untimed):
    # wipe the previous cycle's dirs and pre-build the append arm's
    # base store, so each arm measures only its own work.
    def setup(rep):
        full_path = os.path.join(root, "full")
        inc_path = os.path.join(root, "inc")
        for p in (full_path, inc_path):
            shutil.rmtree(p, ignore_errors=True)
        inc = IvfLayoutStore(spark, inc_path)
        inc.build(base, centroids)
        return {"full_path": full_path, "inc": inc}

    def arm_full_build(ctx):
        IvfLayoutStore(spark, ctx["full_path"]).build(emb, centroids)

    def arm_append(ctx):
        ctx["inc"].append(delta, "daily")

    def arm_probe(ctx):
        return ctx["inc"].topk(queries, k=10, nprobe=4).count()

    try:
        timings, last = ab_lib.warmup_interleaved(
            {
                "full_build": arm_full_build,
                "append": arm_append,
                "probe": arm_probe,
            },
            reps,
            setup=setup,
        )
        builds, appends, probes = (
            timings["full_build"], timings["append"], timings["probe"]
        )
        print(f"probe_rows={last['probe']}", flush=True)
        print(ab_lib.summarize(timings), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    b, a, p = min(builds), min(appends), min(probes)
    print(
        f"\n@{sf_dir}: full_build={b:.1f}s append(10% delta)={a:.1f}s "
        f"ratio={b / a:.1f}x (delta fraction would predict {DELTA_MOD}.0x "
        f"minus constant job overhead) probe={p:.1f}s"
    )
    spark.stop()


if __name__ == "__main__":
    main()
