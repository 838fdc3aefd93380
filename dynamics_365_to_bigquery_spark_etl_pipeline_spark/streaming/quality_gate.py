"""Quality gating AT INGEST — the sixth foreachBatch leg.

The batch side scores documents (``operators/text.quality_score``, a
pure JVM integer-arithmetic expression in [0,100] shared with
canonical-survivor selection); this leg applies the score as an
ARRIVAL-TIME filter, so low-quality text never lands in the training
corpus. It is the cheapest gate in the family: a map-side column
expression and a filter — no join, no shuffle, no broadcast — so its
per-epoch cost is one scan of the batch regardless of corpus size,
the shape that holds at any scale.

Same exactly-once choreography as the decontamination gate
(``streaming/decontaminate.py``): per-epoch ``kept/epoch=<key>`` and
``rejected/epoch=<key>`` dirs written ``mode("overwrite")`` under the
run-scoped ``<query-id>-epoch-<n>`` key — a replayed epoch
deterministically rewrites its own dirs, a fresh checkpoint cannot
alias a prior run's. Rejected rows carry the ``quality_score`` audit
column; kept rows keep the input schema (readers of ``kept/`` can
stream it onward — the legs compose dir-to-dir, pinned for the
decontaminate → dedup-index chain in ``test_stream_decontaminate``).

A custom ``score`` callable (DataFrame-column expression builder)
swaps in any gate the corpus needs — language-marker scores,
repetition ratios, length bands — as long as it stays a column
expression; a gate that needs a JOIN (e.g. against a held-out set) is
what the decontamination leg is for.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery
from pyspark.storagelevel import StorageLevel

from ..operators import text as X
from .util import (
    check_reserved_columns,
    project_to_schema,
    query_id_reader,
)


def stream_quality_gate(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    min_score: int = 50,
    score: Optional[Callable[[Column], Column]] = None,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Split a document stream on ``score(text_col) >= min_score``:
    keepers land under ``kept/`` with their input schema, the rest
    under ``rejected/`` with the score as an audit column. ``score``
    defaults to ``operators.text.quality_score`` and must be a pure
    column-expression builder (the no-shuffle contract)."""
    score_fn = score if score is not None else X.quality_score
    check_reserved_columns(schema, {"quality_score", "epoch"})

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    _query_id = query_id_reader(checkpoint_dir)

    def gate(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        key = f"{_query_id()}-epoch-{epoch_id}"
        # lineage columns outside the contract are dropped at the
        # door (shared: streaming/util.project_to_schema)
        batch_df = project_to_schema(batch_df, schema)
        # persisted around the two writes: the SCORED frame is cheap to
        # recompute (one expression), but the source scan behind it is
        # not — the heavy-hitters lesson applies to the scan, and
        # caching the scored frame also pins one score per row
        scored = batch_df.withColumn(
            "quality_score", score_fn(F.col(text_col))
        ).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            # NULL scores go to rejected/: a custom scorer CAN return
            # NULL (e.g. token_count of NULL text), and filter(keep) +
            # filter(~keep) both exclude NULL — the row would silently
            # land in NEITHER output (r11 review: data loss). A score
            # the gate cannot evaluate is a row it cannot vouch for.
            keep = F.col("quality_score") >= min_score
            scored.filter(keep).drop("quality_score").write.mode(
                "overwrite"
            ).parquet(f"{out_dir}/kept/epoch={key}")
            scored.filter(
                ~keep | F.col("quality_score").isNull()
            ).write.mode("overwrite").parquet(
                f"{out_dir}/rejected/epoch={key}"
            )
        finally:
            scored.unpersist()

    return (
        stream.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
