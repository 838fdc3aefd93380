"""Streaming heavy hitters over mergeable Misra-Gries summaries
(r9 verdict #6).

The batch path (``operators/frequent.py``) answers "terms above
frequency phi·W" without shuffling the long tail; this leg keeps that
answer CURRENT on a growing ingest: each micro-batch contributes its
per-partition MG summaries (Arrow pass over only the batch), which a
driver-side store merges into one running k-counter summary — the MERGE
operation of Agarwal et al. ("Mergeable Summaries", PODS'12), whose
error bound is cumulative over any merge tree: after any number of
epochs, every item with total weight > W/(k+1) is guaranteed present in
the summary, and each ``mg_count`` undercounts its true weight by at
most W/(k+1) (W = total ingested weight so far).

Scale shape: the per-epoch Spark work is O(|batch|) (one mapInPandas
pass + an exact batch-weight aggregate); what crosses the driver is
≤ k × #partitions summary rows per epoch — metadata, not data. The
store is a single JSON document of ≤ k counters, committed atomically
per epoch with replayed epochs skipped (same exactly-once choreography
as ``stream_dedup_index``: the epoch key carries the streaming query's
persisted run id, so a rebuilt checkpoint never aliases a prior run's
epochs).

``candidates-so-far`` is intentionally a SUPERSET answer (the MG
contract). For exact current counts, join the candidates back against
the drained corpus — ``frequent.heavy_hitters_exact`` is that second
pass in batch form, and ``test_stream_heavy_hitters.py`` asserts the
drained-stream store reproduces it exactly.

Determinism note (r10 verdict nit): the compress step keeps only
counts STRICTLY above the (k+1)-th largest, so every candidate tied
with the cut drops — deterministically, regardless of dict insertion
order (the summary after a compress can hold fewer than k counters).
The candidate set is still not canonical across stores: MG merging is
epoch-ORDER-dependent (intermediate compresses see different counts
under different merge orders), so two ingests of the same data along
different epoch interleavings can carry different candidate sets near
the cut line — each a valid ≤ k superset per the MG contract. The
exact second pass downstream absorbs the difference; anything
comparing raw ``candidates()`` across stores must not expect set
equality near the cut line.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators import ledger
from ..operators.frequent import mg_partition_summaries
from ..operators.store_lock import store_write_lock
from .util import query_id_reader

META_NAME = "_mg_store.json"


class MgSummaryStore:
    """Driver-side merged Misra-Gries summary with per-epoch
    exactly-once commits. All state lives in ONE atomically-replaced
    JSON file: a crash can only lose the in-flight epoch, which the
    stream replays (uncommitted) on restart."""

    def __init__(
        self, path: str, k: int, lock_timeout: float = 60.0
    ) -> None:
        if k < 1:
            raise ValueError(f"k must be >= 1 (got {k})")
        self.path = path
        self.k = k
        # write-lock wait budget (not identity — contrast k); see
        # IvfLayoutStore.__init__'s sizing note
        self.lock_timeout = lock_timeout
        os.makedirs(path, exist_ok=True)

    def _meta_path(self) -> str:
        return os.path.join(self.path, META_NAME)

    def _read(self) -> dict:
        try:
            with open(self._meta_path()) as fh:
                meta = json.load(fh)
        except FileNotFoundError:
            return {
                "k": self.k,
                "summary": {},
                "total_w": 0,
                "committed_ids": [],
                "epoch_hwm": {},
            }
        if meta["k"] != self.k:
            raise ValueError(
                f"MG store at {self.path} was built with k={meta['k']}, "
                f"opened with k={self.k} — the merge bound W/(k+1) is "
                "per-store; rebuild instead of mixing k"
            )
        # ensure the bounded-ledger keys exist; pre-r11 flat-list ids
        # keep exact membership and fold away via record()'s pruning
        # (ledger module docstring — r10 verdict #2, r11 review)
        ledger.migrate(meta)
        return meta

    def _write(self, meta: dict) -> None:
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, self._meta_path())

    def committed_ids(self) -> list[str]:
        """The exact-membership ledger half: batch-API ids, plus — on a
        migrated pre-r11 store, until a newer epoch commits under the
        same prefix — historical epoch-shaped ids (``operators/
        ledger.py``). New epoch keys go to the bounded high-water map —
        use ``is_committed`` (r10 verdict #2)."""
        return self._read()["committed_ids"]

    def epoch_high_water(self) -> dict[str, int]:
        """``{query_id: max committed epoch}`` — the bounded replay
        ledger (O(#query restarts) entries, not O(#epochs))."""
        return dict(self._read()["epoch_hwm"])

    def is_committed(self, epoch_key: str) -> bool:
        return ledger.is_committed(self._read(), epoch_key)

    def merge_epoch(
        self, summary_rows: list, batch_w: int, epoch_key: str
    ) -> None:
        """MG merge: add the epoch's (item, mg_count) rows into the
        running summary, then compress back to ≤ k counters by
        subtracting the (k+1)-th largest and dropping non-positives —
        each compress removes ≥ (k+1)·cut total mass, so cumulative
        cuts stay ≤ W/(k+1) (PODS'12). Replayed epochs are no-ops
        (keys shaped ``*-epoch-<n>`` get the monotonic high-water
        treatment). Single-writer: the whole read-merge-write holds the
        store's write lock (r10 verdict #6)."""
        with store_write_lock(self.path, timeout=self.lock_timeout):
            meta = self._read()
            if ledger.is_committed(meta, epoch_key):
                return
            summary = dict(meta["summary"])
            for item, c in summary_rows:
                summary[item] = summary.get(item, 0) + int(c)
            if len(summary) > self.k:
                cut = sorted(summary.values(), reverse=True)[self.k]
                summary = {i: c - cut for i, c in summary.items() if c > cut}
            ledger.record(meta, epoch_key)
            self._write(
                {
                    "k": self.k,
                    "summary": summary,
                    "total_w": meta["total_w"] + int(batch_w),
                    "committed_ids": meta["committed_ids"],
                    "epoch_hwm": meta["epoch_hwm"],
                }
            )

    def candidates(self) -> dict:
        """Items-so-far with their lower-bound counts: a guaranteed
        superset of every item whose total ingested weight exceeds
        ``total_w``/(k+1)."""
        return dict(self._read()["summary"])

    def total_weight(self) -> int:
        return self._read()["total_w"]

    def threshold(self, meta: dict | None = None) -> float:
        """The guarantee line: any item above this total weight is in
        ``candidates()``. Pass an already-read ``meta`` to derive from
        one snapshot (and keep the W/(k+1) formula defined HERE, not in
        callers — r11 review)."""
        if meta is None:
            meta = self._read()
        return meta["total_w"] / (meta["k"] + 1)


def stream_heavy_hitters(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    store_path: str,
    checkpoint_dir: str,
    col: str,
    k: int,
    weight_col: str | None = None,
    max_files_per_trigger: int = 1,
    lock_timeout: float = 60.0,
) -> StreamingQuery:
    """Heavy-hitter candidates AT INGEST: file-source stream ->
    per-micro-batch MG partition summaries -> driver-side mergeable
    store (``MgSummaryStore``). Weighted streams (``weight_col``
    multiplicities — the exact-dedup representative stream the r9
    routing produces) use the same path with weights summed exactly.

    Mirrors ``stream_dedup_index``'s exactly-once choreography: the
    epoch key is ``<query-id>-epoch-<n>`` (query id read once per start
    from the checkpoint metadata), committed atomically WITH the merged
    summary — a replayed epoch is skipped, a fresh checkpoint gets
    fresh keys."""
    store = MgSummaryStore(store_path, k, lock_timeout=lock_timeout)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    _query_id = query_id_reader(checkpoint_dir)

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        epoch_key = f"{_query_id()}-epoch-{epoch_id}"
        if store.is_committed(epoch_key):
            return
        # Two actions (summary rows + exact batch weight) over one
        # cached scan: without the persist each action re-reads the
        # batch's source files — 2x ingest I/O per epoch (review
        # finding). Both collects are metadata-sized.
        batch_df.persist()
        try:
            rows = mg_partition_summaries(
                batch_df, col, store.k, weight_col
            ).collect()
            w_expr = (
                F.count(col) if weight_col is None
                else F.coalesce(
                    F.sum(F.when(F.col(col).isNotNull(), F.col(weight_col))),
                    F.lit(0),
                )
            )
            batch_w = batch_df.agg(w_expr).collect()[0][0]
        finally:
            batch_df.unpersist()
        if batch_w == 0 and not rows:
            return  # empty epoch: nothing to merge, nothing to commit
        store.merge_epoch(
            [(r[col], r["mg_count"]) for r in rows], batch_w, epoch_key
        )

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
