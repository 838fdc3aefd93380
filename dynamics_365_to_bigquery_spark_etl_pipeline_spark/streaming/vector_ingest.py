"""Streaming vector ingest into the incremental IVF/ANN layout store.

Completes the store symmetry (r10): the LSH dedup index has a
streaming leg (``stream_dedup_index``) and so does the MG summary
store (``stream_heavy_hitters``); this is the same ingest shape for
the ANN side — a file-source stream of ``(id, embedding)`` rows folded
into ``IvfLayoutStore`` one O(|batch|) append per micro-batch, so a
100 TB corpus with continuous vector arrival keeps its index current
without ever re-assigning the indexed corpus.

Exactly-once: ``IvfLayoutStore.append`` is itself two-phase (batch dir
fully on disk before the meta commit) and a replayed committed id is a
no-op, so the stream only needs the run-scoped epoch key — namespaced
by the streaming query's persisted id, same rationale as the dedup
leg: epoch numbers restart at 0 on a rebuilt checkpoint, and a bare
``epoch-<n>`` key would silently skip a new stream's early batches
against an existing store. The query-id prefix also keeps the keys out
of the store's reserved ``base``/``gen<N>`` dir namespace by
construction.

Centroids are PINNED at build time: the store must be ``build()``-t
before the stream starts (streaming cannot train centroids — the
assignment of every batch must be against the same frozen matrix or
append(probe) != rebuild(probe) by construction). What the stream DOES
surface is the store's centroid-drift guard: every append updates the
live weighted mean assignment similarity, and once the corpus walks
away from the frozen centroids ``needs_retrain`` trips (sticky in the
meta) — poll ``store.drift()`` or pass ``on_drift`` to get the signal
per epoch. The caller owns retrain scheduling (``rebuild()`` with new
centroids), exactly like the batch API.

``compact_every`` bounds probe fan-in on a long-running ingest by
folding the per-epoch batch dirs into one generation dir after every N
APPENDED batches — the always-live build/generation dir is excluded
from the count, or the cadence would degenerate to a full-corpus
rewrite every epoch (``IvfLayoutStore.compact`` — crash-safe,
probe-identical), mirroring the dedup leg's knob.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators.ivf_store import IvfLayoutStore
from .util import query_id_reader


def stream_ivf_append(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    store_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    drift_threshold: float = 0.05,
    compact_every: int = 0,
    max_files_per_trigger: int = 1,
    on_drift: Optional[Callable[[dict], None]] = None,
    lock_timeout: float = 60.0,
) -> StreamingQuery:
    """Fold a vector stream into a PRE-BUILT ``IvfLayoutStore`` one
    append per micro-batch. ``on_drift`` (optional) receives each
    epoch's drift status dict — e.g. to page a retrain scheduler the
    moment ``needs_retrain`` trips. ``drift_threshold``/``id_col``/
    ``vec_col`` must match the build: they are PINNED in the store's
    meta and a mismatched open fails loudly at stream setup (r10
    verdict #3 — a stream opened at a different threshold would
    silently move the retrain line)."""
    store = IvfLayoutStore(
        spark,
        store_path,
        drift_threshold=drift_threshold,
        id_col=id_col,
        vec_col=vec_col,
        lock_timeout=lock_timeout,
    )
    if not store.committed_batches():
        raise RuntimeError(
            f"IVF store at {store_path} has no build — build() it with "
            "trained centroids before streaming appends into it (the "
            "stream assigns every batch against the pinned build "
            "centroids)"
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    _query_id = query_id_reader(checkpoint_dir)

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        batch_key = f"{_query_id()}-epoch-{epoch_id}"
        if batch_df.isEmpty() or store.is_committed(batch_key):
            return
        drift = store.append(batch_df.select(id_col, vec_col), batch_key)
        if on_drift is not None:
            on_drift(drift)
        # cadence keys on APPENDED batches: the build/generation dir is
        # always live, so counting committed_batches() would compact
        # the FULL corpus every epoch once a first fold exists (review
        # finding)
        if compact_every and len(store.appended_batches()) >= compact_every:
            store.compact()

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
