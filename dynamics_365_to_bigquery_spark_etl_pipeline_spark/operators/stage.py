"""Plan staging: cut a multiply-consumed subplan ONCE, lazily.

Several query pipelines stage an intermediate frame that feeds 2-4
consumers (a banded-postings self-join, a dedup member map): without a
cut, each consumer re-executes the whole subtree — ReuseExchange does
not fire across these self-joins (different downstream keys/aliases),
measured as 2-16x recompute in round 7.

``localCheckpoint`` is the cut, but it has two construction-time traps
(r7 advice):

- ``eager=True`` (the default) runs the ENTIRE subtree as a blocking
  job the moment the query function is CALLED — schema inspection,
  ``explain``, registry enumeration all execute full pipelines;
- ``eager=False`` alone does not fix it under AQE: creating the
  checkpoint RDD forces the adaptive final plan, which MATERIALIZES the
  subplan's query stages (the expensive shuffles) at call time anyway.

``lazy_stage`` therefore compiles the checkpointed subplan with AQE and
broadcast joins disabled — but scoped to a CLONED session (r8 verdict
#6 / advice), never by flipping the shared session conf under a lock:
``cloneSession()`` copies the session state (conf, temp views, UDFs)
into an isolated ``SessionState`` sharing the same SparkContext, the two
confs are set on the clone only, and the analyzed plan is re-bound into
the clone via ``Dataset.ofRows`` for the checkpoint compile. An
unrelated thread compiling any plan against the original session during
that window keeps AQE and broadcast — there is no window on shared
state at all (two-thread test in tests/test_advice_r9.py). The
resulting ``LogicalRDD`` is re-bound to the ORIGINAL session, so every
consumer ABOVE the stage compiles with the caller's conf (AQE on).

Plan construction runs ZERO jobs (test-pinned in
tests/test_advice_r8.py); the stage materializes on the first action,
and later consumers reuse the stored blocks. The staged subtree runs
with static shuffle partitioning and no broadcast joins — acceptable
for the corpus-sized member maps these pipelines stage (they would
never broadcast at real scale), and the price of laziness under AQE.

Three backends, one dispatcher (r9 verdict #1):

- ``lazy_stage`` — blocks in the executors' block managers via
  ``localCheckpoint``. Fastest re-read, but executor-pinned (an
  executor loss at scale recomputes or fails the staged pipelines) and
  the default ``MEMORY_AND_DISK`` level competes with shuffle/exec
  memory. ``storage_level="DISK_ONLY"`` removes the memory pressure
  while keeping the pinning.
- ``durable_stage`` — the staged partitions go to the session's
  CHECKPOINT DIRECTORY on the shared filesystem (Spark's reliable
  checkpoint), so they survive executor loss and never occupy block-
  manager memory; same zero-construction-jobs laziness via the same
  clone-compile. The one extra cost, measured in the probe for this
  module: after the first action's job completes, ``doCheckpoint``
  re-runs the staged subtree's FINAL stage (shuffle outputs are reused,
  map stages do NOT re-execute — an accumulator-counted UDF in the map
  stage fired exactly once per row) to write the files. A scratch
  PARQUET stage cannot keep this laziness — a parquet write is an eager
  job by construction — which is why the durable-lazy backend rides
  Spark's checkpoint files instead; ``parquet_stage`` below is the
  eager scratch-parquet variant for callers that control timing.
- ``parquet_stage`` — EAGER: writes the subtree to a scratch parquet
  dir now and returns the read-back. Columnar re-reads (column pruning
  applies downstream, unlike checkpoint row files) and the cheapest
  storage; for pipeline code paths where construction == execution
  anyway.

``stage`` dispatches between them per call site: an explicit
``backend=`` wins, else ``$SPARK_GRAFT_STAGE_BACKEND`` (``local`` |
``local_disk`` | ``durable``, default ``local``; the eager ``parquet``
backend is explicit-arg-only — see ``stage``) — so the sf10 A/B
(SCALING.md, r9 verdict #5) flips every staged pipeline with one env
var and zero plan edits.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
from typing import Callable, Optional

from pyspark.sql import DataFrame

# Test seam: called between the clone's conf setup and the checkpoint
# compile, so a test can deterministically compile plans on OTHER
# threads "during" a lazy_stage call and assert they keep AQE/broadcast.
_MID_COMPILE_HOOK: Optional[Callable[[], None]] = None

BACKEND_ENV = "SPARK_GRAFT_STAGE_BACKEND"
SCRATCH_ENV = "SPARK_GRAFT_SCRATCH_DIR"

_SCRATCH_DIRS: list[str] = []  # session-scoped, swept at process exit
_GC_REGISTERED = False


def _register_scratch(path: str) -> None:
    global _GC_REGISTERED
    _SCRATCH_DIRS.append(path)
    if not _GC_REGISTERED:
        _GC_REGISTERED = True
        atexit.register(
            lambda: [shutil.rmtree(p, ignore_errors=True) for p in _SCRATCH_DIRS]
        )


def _clone_compile(df: DataFrame):
    """The shared lazy-compile trick: re-bind the ANALYZED plan into a
    cloned session with AQE and broadcast joins off — the two knobs that
    force jobs at checkpoint-RDD creation — without ever touching the
    caller's session conf (r8 verdict #6)."""
    spark = df.sparkSession
    jspark = spark._jsparkSession
    # Clone carries the caller's full runtime conf (shuffle partitions,
    # timezone, ANSI) so the staged subtree compiles exactly as it would
    # have in-session — minus the two knobs that force jobs at
    # checkpoint-RDD creation:
    jclone = jspark.cloneSession()
    jclone.conf().set("spark.sql.adaptive.enabled", "false")
    # broadcast exchanges submit their build job at execute() — i.e. at
    # checkpoint-RDD creation, which would materialize the build side at
    # plan-construction time.
    jclone.conf().set("spark.sql.autoBroadcastJoinThreshold", "-1")
    if _MID_COMPILE_HOOK is not None:
        _MID_COMPILE_HOOK()
    of_rows = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows
    # df.logicalPlan is ANALYZED (catalog lookups done under the original
    # session), so clone staleness w.r.t. later temp views cannot bite.
    return spark, jspark, of_rows, of_rows(jclone, df._jdf.logicalPlan())


def lazy_stage(df: DataFrame, storage_level: str | None = None) -> DataFrame:
    spark, jspark, of_rows, staged_clone = _clone_compile(df)
    if storage_level:
        jlevel = getattr(
            spark._jvm.org.apache.spark.storage.StorageLevel, storage_level
        )()
        staged = staged_clone.localCheckpoint(False, jlevel)
    else:
        staged = staged_clone.localCheckpoint(False)
    # Re-bind the checkpointed LogicalRDD to the ORIGINAL session: all
    # downstream composition/compile happens under the caller's conf.
    return DataFrame(of_rows(jspark, staged.logicalPlan()), spark)


def _ensure_checkpoint_dir(spark) -> None:
    """Reliable checkpoints need ``sc.setCheckpointDir`` once per
    context. Default to a session-scoped scratch dir (swept at process
    exit); production sets it — or ``$SPARK_GRAFT_SCRATCH_DIR`` — to a
    SHARED filesystem path (HDFS/S3), which is what makes the staged
    partitions survive executor loss on a real cluster."""
    sc = spark.sparkContext
    if sc._jsc.sc().checkpointDir().isEmpty():
        root = os.environ.get(SCRATCH_ENV) or tempfile.gettempdir()
        path = tempfile.mkdtemp(prefix="spark_graft_stage_ck_", dir=root)
        _register_scratch(path)
        sc.setCheckpointDir(path)


def durable_stage(df: DataFrame) -> DataFrame:
    """``lazy_stage`` with DURABLE storage (r9 verdict #1): the staged
    partitions are written to the checkpoint directory on the shared
    filesystem instead of executor-pinned block-manager blocks — an
    executor loss re-reads files instead of recomputing or failing the
    staged pipelines, and the stage adds zero block-manager memory
    pressure. Same laziness contract: ZERO jobs at plan construction
    (test-pinned), materialization on the first consumer action."""
    _ensure_checkpoint_dir(df.sparkSession)
    spark, jspark, of_rows, staged_clone = _clone_compile(df)
    staged = staged_clone.checkpoint(False)
    return DataFrame(of_rows(jspark, staged.logicalPlan()), spark)


def parquet_stage(df: DataFrame) -> DataFrame:
    """EAGER scratch-parquet stage: write the subtree once, return the
    columnar read-back. NOT construction-lazy — calling this runs the
    subtree's write job immediately — so it belongs in pipeline code
    where construction is execution (sinks, A/B harnesses), never in a
    registry query function (enumerating the registry would run full
    pipelines, the r7 trap ``lazy_stage`` exists to avoid). In exchange
    the re-reads are parquet: column pruning and predicate pushdown
    apply downstream, which checkpoint row files cannot offer.

    Each call writes a FULL scratch copy, swept only at process exit —
    long sessions staging large frames repeatedly should point
    ``$SPARK_GRAFT_SCRATCH_DIR`` at real disk (the default tmpdir is
    commonly tmpfs = RAM) and budget for N live copies. The durable
    backend's checkpoint files, by contrast, are GC'd mid-session with
    their RDDs (``spark.cleaner.referenceTracking.cleanCheckpoints`` is
    set by ``session.get_spark``)."""
    spark = df.sparkSession
    root = os.environ.get(SCRATCH_ENV) or tempfile.gettempdir()
    path = tempfile.mkdtemp(prefix="spark_graft_stage_pq_", dir=root)
    _register_scratch(path)
    out = os.path.join(path, "stage")
    df.write.parquet(out)
    return spark.read.schema(df.schema).parquet(out)


_BACKENDS = {
    "local": lazy_stage,
    # the A/B middle arm: executor-pinned like local, but blocks on
    # executor-local disk — isolates block-manager MEMORY pressure from
    # durability when chasing staged-pipeline variance (SCALING.md)
    "local_disk": lambda df: lazy_stage(df, storage_level="DISK_ONLY"),
    "durable": durable_stage,
    "parquet": parquet_stage,
}


def stage(df: DataFrame, backend: str | None = None) -> DataFrame:
    """Stage a multiply-consumed subplan through the selected backend:
    explicit ``backend=`` wins, else ``$SPARK_GRAFT_STAGE_BACKEND``
    (default ``local``). The env knob is read at CALL time so harness
    sweeps flip every staged pipeline without plan edits.

    The env knob only accepts the LAZY backends (``local`` |
    ``local_disk`` | ``durable``): ``stage()`` sits inside registry
    query FUNCTIONS, where an eager backend would run full pipeline
    write jobs at plan-construction time — schema inspection, explain,
    registry enumeration — the exact r7 trap ``lazy_stage`` exists to
    avoid (review finding). ``parquet`` remains available per call site
    via an explicit ``backend="parquet"`` in pipeline code that controls
    its own timing."""
    name = backend or os.environ.get(BACKEND_ENV) or "local"
    if backend is None and name == "parquet":
        raise ValueError(
            f"{BACKEND_ENV}=parquet is not allowed: the eager parquet "
            "stage would execute every staged registry subtree at plan-"
            "construction time; pass backend='parquet' explicitly at a "
            "call site that controls its own timing"
        )
    fn = _BACKENDS.get(name)
    if fn is None:
        raise ValueError(
            f"unknown stage backend {name!r} (valid: {sorted(_BACKENDS)})"
        )
    return fn(df)
