#!/usr/bin/env python
"""A/B: would an eager parquet delta pre-stage help the bucketed sink?
(r10 verdict #7 — find ``parquet_stage`` a production consumer and
MEASURE it. Measured answer: NO — recorded in SCALING.md and in a
pipeline.py comment at the candidate site; the pre-stage is not wired.)

``EntityPipeline.run_entity`` reads the delta as an INFERENCE CSV scan
(on purpose — drift carrying, see pipeline.py module docstring): a
double-pass parse per consumer. The bucketed+rollup path consumes the
prepared delta 3 times (touched-bucket collect, rollup maintenance,
bucketed merge write), so without a cut the CSV is parsed 6 times per
run — which made ``stage(prepared, backend="parquet")`` the natural
candidate: one parse, columnar delta-sized re-reads. This harness
measured the staged arm SLOWER at both probed delta sizes (0.89x at
53k delta rows, 0.93x at 267k): the parse is not the bottleneck, the
merge/write is, and the scratch write never amortizes.

Arms (shared ``scripts/ab_lib.py`` schedule — untimed warm-up cycle,
then interleaved):

- ``staged``   — run_entity with the CANDIDATE pre-stage injected
  (``prepare_entity_frame`` wrapped in ``parquet_stage``)
- ``unstaged`` — run_entity as shipped (no pre-stage)

Each cycle's setup builds TWO fresh pipelines over the same landing
CSVs (bucketed + rollup, one warm snapshot run so the timed run is the
multi-consumer incremental merge) and the timed run ingests a fresh
delta file. Sink equality (minus the by-design-nondeterministic audit
column) is asserted — the A/B measures the same result, faster or not.

Usage: python scripts/ab_delta_stage.py [reps] [rows_per_file] [files]
(defaults 3, 20000, 8)
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

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.session import get_spark  # noqa: E402
from dynamics_365_to_bigquery_spark_etl_pipeline_spark import pipeline as P  # noqa: E402


# same changelog shape as the pipeline test fixtures (tests/test_pipeline.py)
LIVE = "{11111111-1111-1111-1111-111111111111}"
HEADER = (
    "SystemId,SystemCreatedAt-2000000001,SystemModifiedAt-2000000002,"
    "SystemCreatedBy,SystemModifiedBy,Amount,$Company\n"
)
N_KEYS = 5000


def _write_csv(path: str, rows: range, mtime: float) -> None:
    with open(path, "w") as fh:
        fh.write(HEADER)
        for i in rows:
            ts = f"2024-01-{i % 28 + 1:02d} 10:{i % 60:02d}:{(i * 7) % 60:02d}"
            fh.write(
                f"K{i % N_KEYS},{ts},{ts},{LIVE},{LIVE},{i % 997}.25,acme\n"
            )
    os.utime(path, (mtime, mtime))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rows_per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    spark = get_spark("ab-delta-stage")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="ab_delta_stage_")
    real_prepare = P.prepare_entity_frame

    def setup(rep):
        pipes = {}
        for arm in ("staged", "unstaged"):
            base = os.path.join(root, f"c{rep}_{arm}")
            shutil.rmtree(base, ignore_errors=True)
            entity = os.path.join(base, "landing", "sales")
            os.makedirs(entity)
            # snapshot batch: n_files CSVs, merged in a warm-up run so
            # the TIMED run is the incremental multi-consumer merge
            for f in range(n_files):
                _write_csv(
                    os.path.join(entity, f"snap{f}.csv"),
                    range(f * rows_per_file, (f + 1) * rows_per_file),
                    mtime=1_000_000 + f,
                )
            pipe = P.EntityPipeline(
                spark,
                os.path.join(base, "landing"),
                os.path.join(base, "sink"),
                os.path.join(base, "state"),
                tie_breakers=("amount",),
                bucket_partitions=16,
                rollup={"keys": ["_company"], "value": "amount"},
            )
            pipe.run_entity("sales")  # untimed: builds the snapshot
            # the timed delta: one more batch touching every key range
            _write_csv(
                os.path.join(entity, "delta.csv"),
                range(0, n_files * rows_per_file, 3),
                mtime=2_000_000,
            )
            pipes[arm] = pipe
        return pipes

    def run(pipe):
        out = pipe.run_entity("sales")
        assert out["status"] == "ok", out
        return out

    def _with_candidate_stage(pipe):
        from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.stage import (
            parquet_stage,
        )

        P.prepare_entity_frame = lambda df: parquet_stage(real_prepare(df))
        try:
            return run(pipe)
        finally:
            P.prepare_entity_frame = real_prepare

    arms = {
        "staged": lambda ctx: _with_candidate_stage(ctx["staged"]),
        "unstaged": lambda ctx: run(ctx["unstaged"]),
    }

    try:
        timings, _ = ab_lib.warmup_interleaved(arms, reps, setup=setup)
        print(ab_lib.summarize(timings))
        s, u = min(timings["staged"]), min(timings["unstaged"])
        print(
            f"\nincremental bucketed+rollup run ({n_files}x{rows_per_file} "
            f"snapshot, {n_files * rows_per_file // 3}-row delta): "
            f"staged={s:.2f}s unstaged={u:.2f}s ({u / s:.2f}x)"
        )
        # result equality across arms, from the LAST cycle's sinks
        a = P.EntityPipeline(
            spark, os.path.join(root, f"c{reps - 1}_staged", "landing"),
            os.path.join(root, f"c{reps - 1}_staged", "sink"),
            os.path.join(root, f"c{reps - 1}_staged", "state"),
            bucket_partitions=16,
        ).read_snapshot("sales")
        b = P.EntityPipeline(
            spark, os.path.join(root, f"c{reps - 1}_unstaged", "landing"),
            os.path.join(root, f"c{reps - 1}_unstaged", "sink"),
            os.path.join(root, f"c{reps - 1}_unstaged", "state"),
            bucket_partitions=16,
        ).read_snapshot("sales")
        # the audit column is current_timestamp — nondeterministic by
        # design (excluded from every oracle hash); compare the data
        a, b = a.drop("extracted_at"), b.drop("extracted_at")
        assert a.count() == b.count() and a.exceptAll(b).isEmpty(), (
            "staged and unstaged sinks diverged"
        )
        print("sink equality: OK")
    finally:
        P.prepare_entity_frame = real_prepare
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
