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

``lazy_stage`` compiles the checkpointed subplan with AQE disabled
(scoped to this one ``localCheckpoint`` call; the session conf is
restored immediately, so every consumer ABOVE the stage still gets
AQE): plan construction runs ZERO jobs (test-pinned in
tests/test_advice_r8.py), the stage materializes on the first action,
and later consumers reuse the stored blocks. The staged subtree runs
with static shuffle partitioning — acceptable for the intermediate
sizes these pipelines stage, and the price of laziness under AQE.

The blocks remain executor-pinned and non-fault-tolerant (the
localCheckpoint contract): at 100 TB the stage becomes scratch parquet,
as SCALING.md documents for each call site.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

# Serializes the conf-flip window: two concurrent lazy_stage calls with
# interleaved read-set-restore would capture each other's "false" as the
# value to restore and leave AQE/broadcast disabled session-wide
# (review finding, r8). The residual caveat — an UNRELATED thread
# compiling a plan inside another thread's window loses AQE/broadcast
# for that one plan — is inherent to session-scoped conf; none of this
# repo's concurrent paths (streaming foreachBatch) build lazy_stage
# queries, and the window is plan-compile-only (no jobs run inside it).
_STAGE_LOCK = threading.Lock()


def lazy_stage(df: DataFrame) -> DataFrame:
    spark = df.sparkSession
    with _STAGE_LOCK:
        old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
        old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        # broadcast exchanges submit their build job at execute() — i.e.
        # at checkpoint-RDD creation, which would materialize the build
        # side at plan-construction time. Compile the staged subplan
        # without broadcast joins: scale-consistent (the frames these
        # pipelines stage are corpus-sized member maps that would never
        # broadcast at real scale) and measured as noise at bench scale.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            return df.localCheckpoint(eager=False)
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
