"""Unified training-data ingest — quality gate, decontamination, and
near-dup indexing in ONE foreachBatch stream (r12).

The r11 legs compose dir-to-dir (quality ``kept/`` feeds the
decontamination gate's file source, whose ``clean/`` feeds the dedup
index's), and that composition is the right shape when the stages are
owned by different teams or restart independently. But chained as one
logical pipeline it pays the per-leg fixed choreography three times —
three triggers, three checkpoint commits per file, and two full
intermediate materializations (every surviving row is written and
re-read twice before it reaches the index). This module runs the same
three stages inside one micro-batch:

    arriving docs
      -> quality score (map-side JVM expression)      -> rejected/
      -> held-out n-gram gate (broadcast hash join)   -> contaminated/
      -> survivors                                    -> clean/
      -> LSH index probe + append (two-phase)         -> pairs/

Per epoch that is ONE trigger, ONE checkpoint commit, zero
intermediate dir round-trips for the gates (the only re-read is
``clean/`` feeding the index — deliberate: the index then provably
indexes exactly the rows the epoch landed, and the read doubles as the
plan cut ``prepare_batch`` wants instead of re-running the gate joins).
The stage ORDER is the cheap-filter-first law: the quality gate is a
column expression (no join) and runs first so the gram explosion and
the index probe only ever see rows that passed it; decontamination
(broadcast join, no shuffle) runs second so shingling + banding —
the only shuffle-bearing stage — sees only clean survivors.

Exactly-once: the three output dirs are deterministic per-epoch
overwrites under the run-scoped ``<query-id>-epoch-<n>`` key (the
gates' contract), and the whole epoch is ordered BEFORE the index
commit — ``is_committed`` then guards the replay: a crash anywhere
before ``commit()`` replays the epoch whole (same key, same committed
index state, dirs rewritten in place); a crash after skips it with
every artifact already on disk. One store commit per epoch is also
one write-lock acquisition per epoch — a third of the chained legs'
lock traffic on a store shared with maintenance jobs.

Scale shape (the 100 TB question): per epoch the work is one batch
scan + one broadcast join + O(|survivors| + collisions) index probe —
nothing rescans the corpus, nothing shuffles except the banded
postings exchange into the index's bucketing, and the held-out gram
set is staged ONCE at stream setup. Equivalence with the chained legs
is pytest-pinned (same rejected/contaminated/clean/pairs contents);
the fixed-cost saving is measured in SCALING.md
(``scripts/ab_ingest_pipeline.py``).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery
from pyspark.storagelevel import StorageLevel

from ..operators import text as X
from ..operators.dedup_index import LshDedupIndex
from ..operators.stage import stage
from .decontaminate import contamination_hits, heldout_gram_set
from .util import (
    check_reserved_columns,
    project_to_schema,
    query_id_reader,
)


STAGE_SET_MARKER = "_stage_set.json"


def _check_stage_set_marker(dirs: list[str], stages: dict[str, bool]) -> None:
    """The stage set is fixed for a pipeline's lifetime (docstring
    precondition (2)) — persist it and refuse a restart whose OPTIONAL
    stages differ in EITHER direction (r13 advice: the ledger
    high-water check only caught toggling the span stage ON; toggling
    it OFF after a crash in the LSH-commit-to-ngram-append window
    silently lost the epoch's n-gram counts).

    The marker lives under BOTH ``out_dir`` AND ``checkpoint_dir``
    (r14 review): the replay identity the hazard rides is the
    CHECKPOINT — an operator restarting with the same checkpoint but a
    fresh out_dir would bypass an out_dir-only marker and silently
    skip the replayed epoch. Any surviving copy refuses the mismatch;
    missing copies are (re)written. Writes are atomic (tmp + replace)
    so a crash mid-setup can't leave a half marker a restart would
    choke on."""
    recorded = None
    recorded_at = None
    for d in dirs:
        try:
            with open(os.path.join(d, STAGE_SET_MARKER)) as fh:
                recorded = json.load(fh)
                recorded_at = d
        except FileNotFoundError:
            continue
        if recorded != stages:
            raise RuntimeError(
                f"pipeline dir {recorded_at!r} was previously run with "
                f"stage set {recorded}, now started with {stages} — the "
                "stage set is fixed for a checkpoint's lifetime "
                "(toggling a stage whose store ledger guards replay "
                "loses or duplicates epoch state); start a fresh "
                "checkpoint + out_dir and fresh stores to change it"
            )
    for d in dirs:
        path = os.path.join(d, STAGE_SET_MARKER)
        if not os.path.isfile(path):
            os.makedirs(d, exist_ok=True)
            tmp = path + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(stages, fh)
            os.replace(tmp, path)


def stream_ingest_pipeline(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    heldout: DataFrame,
    out_dir: str,
    index_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_score: int = 50,
    score: Optional[Callable[[Column], Column]] = None,
    n: int = 4,
    max_hits: int = 0,
    jaccard_min: float = 0.5,
    compact_every: int = 0,
    max_files_per_trigger: int = 1,
    lock_timeout: float = 60.0,
    bm25_path: Optional[str] = None,
    bm25_buckets: Optional[int] = None,
    span_store_path: Optional[str] = None,
    span_w: int = 5,
    span_min_occurrences: int = 2,
    span_max_dup_pct: Optional[float] = None,
    span_buckets: Optional[int] = None,
    stage_timings: Optional[list] = None,
) -> StreamingQuery:
    """Run the full ingest pipeline over a document file-source stream.

    ``stage_timings`` (optional, r14 — the per-epoch cost-breakdown
    hook behind ``scripts/profile_ingest_epoch.py`` and SCALING.md's
    fixed-cost table): when a list is passed, every epoch appends
    ``(epoch_id, [(stage, seconds), ...])`` wall timings of its
    internal steps. Pure observation — no timing is taken when the
    hook is None, and the hook never changes what runs.

    Outputs under ``out_dir``: ``rejected/epoch=<key>`` (failed the
    quality gate, ``quality_score`` audit column), ``contaminated/
    epoch=<key>`` (overlapped the held-out split, ``n_doc_ngrams``/
    ``n_contaminated`` audit columns), ``clean/epoch=<key>`` (the
    corpus rows, input schema), and ``pairs/epoch=<n>`` (near-dup
    pairs vs everything previously indexed — bare epoch key, the
    pairs-dir consumer contract shared with ``stream_dedup_index``:
    pairs_dir lives and dies with checkpoint_dir). The LSH index at
    ``index_path`` is appended exactly-once per epoch.

    Gate parameters mirror the standalone legs (``stream_quality_gate``,
    ``stream_decontaminate``, ``stream_dedup_index``) — equivalence
    with that chain is the module's correctness contract.

    ``bm25_path`` (optional) additionally appends each epoch's clean
    survivors to an incremental BM25 retrieval index
    (``operators/bm25_index.py``) — the corpus becomes QUERYABLE
    (``Bm25Index.topk``) in the same epoch it lands. Exactly-once by
    composition: the BM25 append runs between the clean-dir write and
    the LSH commit, and each store's own ledger guards its half — a
    crash before the BM25 append replays the whole epoch (dirs
    rewritten deterministically), between the two commits replays with
    the BM25 half a no-op, after the LSH commit skips whole.

    ``span_store_path`` (optional, r13) inserts the span-dedup gate
    between decontamination and the clean write: each decontamination
    survivor's duplicated-span stats are computed against the
    incremental n-gram count store (committed state + in-batch counts —
    the standalone ``stream_span_dedup_gate``'s exact rule, via the
    SHARED ``span_stats``/``batch_counts``/``probe_counts`` pieces) and
    written to ``spans/epoch=<key>``; with ``span_max_dup_pct`` set,
    docs over the threshold route to ``span_flagged/epoch=<key>``
    INSTEAD of ``clean/`` — the indexes then never see span-heavy docs.
    The store ingests EVERY span-stage survivor's counts (flagged
    included — their text occurred; dropping it would let a phrase
    re-arrive "fresh"). Exactly-once ORDER changes when this stage is
    on: the n-gram append becomes the epoch's LAST action and ITS
    ledger the whole-epoch guard — the span verdict reads store state,
    so the append must follow every artifact write or a replay would
    recompute different stats against double-counted state; the LSH
    commit gains its own per-store guard (the BM25 pattern) for the
    crash window between the two commits.

    PRECONDITIONS. (1) Ids: the SOURCE must not re-emit an ``id_col``
    value across epochs, and ids must be NON-NULL — BM25 df/n_docs and
    LSH postings are exact because each doc id exists once store-wide
    (a re-landed id silently inflates them; replayed EPOCHS are safe —
    each ledger no-ops its half), and a NULL id merges in per-doc
    aggregates and never equi-joins in the span routing. (2) The STAGE
    SET is fixed for a checkpoint's lifetime: the whole-epoch replay
    guard is the LAST store's ledger, so toggling ``span_store_path``
    on a checkpoint that already committed epochs without it would let
    a replayed epoch recompute different artifacts while the other
    stores skip theirs — and toggling it OFF after a crash in the
    LSH-commit-to-ngram-append window would make the replayed epoch
    skip entirely (the LSH guard is satisfied), silently losing that
    epoch's n-gram counts. BOTH directions are enforced (r13 advice):
    a ``_stage_set.json`` marker persisted under ``out_dir`` on first
    start makes any later start with a different stage set fail
    loudly BEFORE the stream begins; pre-marker checkpoints
    additionally keep the ledger high-water toggle-ON check at the
    first non-blank epoch. Start a fresh checkpoint + out_dir (and
    fresh stores — the id precondition forbids re-ingesting the old
    corpus into the same stores) to change the stage set."""
    score_fn = score if score is not None else X.quality_score
    reserved = {"quality_score", "_th", "n_doc_ngrams", "n_contaminated", "epoch"}
    if span_store_path is not None:
        reserved |= {"n_tokens", "n_dup_tokens", "dup_pct"}
    check_reserved_columns(schema, reserved)
    # coalesce INSIDE the staged subtree (r16, verdict item #4): the
    # stage compiles AQE-off, so the gram set's distinct lands in
    # shuffle.partitions (32) checkpoint blocks that every epoch's
    # broadcast rebuild re-reads as 32 tiny tasks (~0.1 s/epoch of pure
    # scheduling). The sizing rule is the BROADCAST CONTRACT, not local
    # cores: this frame is F.broadcast()-joined every epoch, so it is
    # ≤ the broadcast cap by construction — 4 blocks bounds each at
    # ~16 MB of 8-byte hashes, plenty for any gram set that can be
    # broadcast at all, and the rule never changes with cluster size.
    grams = stage(heldout_gram_set(heldout, text_col, n).coalesce(4))
    ngrams = None
    if span_store_path is not None:
        from ..operators.ngram_store import NgramCountStore

        ngrams = NgramCountStore(
            spark,
            span_store_path,
            text_col=text_col,
            w=span_w,
            # passthrough, the bm25_buckets rationale: a store built by
            # the standalone gate at a non-default bucket count must be
            # feedable without tripping the identity check
            n_buckets=(
                span_buckets
                if span_buckets is not None
                else NgramCountStore.N_BUCKETS
            ),
            lock_timeout=lock_timeout,
        )
    idx = LshDedupIndex(
        spark, index_path, jaccard_min=jaccard_min, lock_timeout=lock_timeout
    )
    bm25 = None
    if bm25_path is not None:
        from ..operators.bm25_index import Bm25Index

        bm25 = Bm25Index(
            spark,
            bm25_path,
            id_col=id_col,
            text_col=text_col,
            # passthrough so the pipeline can feed an index built with
            # a non-default bucket count by the standalone leg (the
            # identity check would otherwise kill the first epoch with
            # no parameter to fix it — r12 review)
            n_buckets=(
                bm25_buckets
                if bm25_buckets is not None
                else Bm25Index.N_BUCKETS
            ),
            lock_timeout=lock_timeout,
        )

    # recorded AFTER every construction-time validation above (reserved
    # columns, store identity checks): a first start that fails setup
    # must not pin the stage set for an out_dir that never ran (review
    # pin, r14)
    _check_stage_set_marker(
        [out_dir, checkpoint_dir],
        {"span": span_store_path is not None, "bm25": bm25_path is not None},
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    _query_id = query_id_reader(checkpoint_dir)

    # the whole-epoch replay guard is whichever store commits LAST:
    # the n-gram store when the span stage is on (its append must
    # follow every artifact write — the span verdict reads its state),
    # else the LSH index (the r12 order)
    epoch_guard = ngrams if ngrams is not None else idx
    _toggle_checked = [False]

    def run_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        import time as _time

        marks: list[tuple[str, float]] = []
        _last = [_time.perf_counter()]

        def mark(stage: str) -> None:
            if stage_timings is None:
                return
            now = _time.perf_counter()
            marks.append((stage, now - _last[0]))
            _last[0] = now

        key = f"{_query_id()}-epoch-{epoch_id}"
        # the guard store's commit is the LAST action of the epoch:
        # committed means every dir below was already written under
        # this key
        if batch_df.isEmpty() or epoch_guard.is_committed(key):
            return
        mark("guard_probe")
        if ngrams is not None and not _toggle_checked[0]:
            # the stage set is fixed per checkpoint (docstring
            # precondition): the LSH ledger holding FULLY-COMMITTED
            # epochs under this query id that the n-gram store lacks
            # means the span stage was toggled on mid-life — a replay
            # would then recompute routed artifacts the other stores
            # skip. (idx_hwm == this epoch is the legitimate
            # between-commits crash window and proceeds.)
            qid = _query_id()
            idx_hwm = idx.epoch_high_water().get(qid, -1)
            ng_hwm = ngrams.epoch_high_water().get(qid, -1)
            if ng_hwm < idx_hwm < epoch_id:
                raise RuntimeError(
                    f"span stage enabled on checkpoint {checkpoint_dir!r} "
                    f"whose LSH index already committed epochs up to "
                    f"{idx_hwm} without it (n-gram store high-water: "
                    f"{ng_hwm}) — the stage set is fixed for a "
                    "checkpoint's lifetime; start a fresh checkpoint and "
                    "fresh stores to add the span stage"
                )
            _toggle_checked[0] = True
        clean_dir = os.path.join(out_dir, "clean", f"epoch={key}")
        # persisted around the epoch's writes — the source scan behind
        # the batch is the expensive part (heavy-hitters lesson), and
        # the pin also fixes one score per row
        scored = project_to_schema(batch_df, schema).withColumn(
            "quality_score", score_fn(F.col(text_col))
        ).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            from concurrent.futures import ThreadPoolExecutor

            keep = F.col("quality_score") >= min_score
            # The epoch's routing writes are INDEPENDENT jobs until the
            # store phase (guide §2.6, r16 verdict item #3): the
            # rejected write needs only `scored`, and once `hits`
            # exists the contaminated and clean writes both derive from
            # the same two pinned frames. Spark happily runs them
            # concurrently — actions were only sequential because this
            # function called them sequentially. Two driver threads
            # overlap the write tails (measured: the rejected write's
            # ~0.35 s and the contaminated write's ~0.25 s hide under
            # the neighbouring stages); every future is result()-ed —
            # which also re-raises its exception — BEFORE any store
            # commit below, so the exactly-once ordering (all artifact
            # dirs written, then commits) is unchanged.
            pool = ThreadPoolExecutor(max_workers=2)
            rej_fut = pool.submit(
                lambda: scored.filter(
                    # NULL scores are rows the gate cannot vouch for:
                    # rejected, never silently lost (r11 review, shared
                    # with the standalone gate)
                    ~keep | F.col("quality_score").isNull()
                )
                .write.mode("overwrite")
                .parquet(os.path.join(out_dir, "rejected", f"epoch={key}"))
            )
            mark("quality_gate")
            survivors = scored.filter(keep).drop("quality_score")
            # routed contamination verdict (shared builder): small —
            # one row per contaminated distinct text — and consumed by
            # both remaining writes, so pinned
            hits = contamination_hits(
                survivors, grams, text_col, n, max_hits
            ).persist(StorageLevel.MEMORY_AND_DISK)
            try:
                tagged = (
                    survivors.withColumn("_th", F.md5(F.col(text_col)))
                    .join(hits, "_th", "left")
                    .drop("_th")
                )
                cont_fut = pool.submit(
                    lambda: tagged.filter(F.col("n_contaminated").isNotNull())
                    .write.mode("overwrite")
                    .parquet(
                        os.path.join(out_dir, "contaminated", f"epoch={key}")
                    )
                )
                mark("decontaminate")
                surv = tagged.filter(F.col("n_contaminated").isNull()).drop(
                    "n_doc_ngrams", "n_contaminated"
                )
                if ngrams is None:
                    c_new = None
                    surv.write.mode("overwrite").parquet(clean_dir)
                    cont_fut.result()
                    rej_fut.result()
                    mark("clean_write")
                else:
                    # span path: join the routing writes first — the
                    # span verdict's store reads must never overlap
                    # epoch writes that could still fail (keeps the
                    # replay reasoning exactly as documented); the
                    # rejected/contaminated overlap above still applies
                    cont_fut.result()
                    rej_fut.result()
                    # span stage (r13): verdict against COMMITTED store
                    # state + in-batch counts — the standalone gate's
                    # rule through the SHARED dup_grams/span_stats/
                    # route_by_dup_pct pieces (one rule per fact); both
                    # cuts are the one-evaluation law (the counts the
                    # verdict saw are the counts appended below)
                    from .span_gate import (
                        dup_grams,
                        route_by_dup_pct,
                        span_stats,
                    )

                    surv = surv.localCheckpoint()
                    c_new = ngrams.batch_counts(
                        surv.select(text_col)
                    ).localCheckpoint()
                    mark("span_batch_counts")
                    dup = dup_grams(ngrams, c_new, span_min_occurrences)
                    stats = span_stats(
                        surv, dup, text_col, span_w, id_col
                    ).persist(StorageLevel.MEMORY_AND_DISK)
                    try:
                        stats.write.mode("overwrite").parquet(
                            os.path.join(out_dir, "spans", f"epoch={key}")
                        )
                        mark("span_stats_write")
                        if span_max_dup_pct is None:
                            surv.write.mode("overwrite").parquet(clean_dir)
                            mark("clean_write")
                        else:
                            kept, flagged = route_by_dup_pct(
                                surv, stats, id_col, span_max_dup_pct
                            )
                            flagged.write.mode("overwrite").parquet(
                                os.path.join(
                                    out_dir, "span_flagged", f"epoch={key}"
                                )
                            )
                            kept.write.mode("overwrite").parquet(clean_dir)
                            mark("clean_write")
                    finally:
                        stats.unpersist()
            finally:
                hits.unpersist()
        finally:
            # wait for any in-flight routing write before releasing the
            # pinned frames: an epoch failing between submit and
            # result() must not leave a background write racing the
            # replay's overwrite of the same dirs
            pool.shutdown(wait=True)
            scored.unpersist()
        # index exactly what landed: the epoch's own clean dir read
        # back — a free plan cut (prepare_batch would localCheckpoint
        # anyway) that can't drift from the written corpus
        clean_on_disk = spark.read.parquet(clean_dir)
        if bm25 is not None:
            # pinned ONCE for the epoch's two store consumers: both
            # append and prepare_batch cut their own derivations, but
            # each would re-read the parquet dir — the pin makes the
            # clean corpus hit disk once per epoch (r12 review)
            clean_on_disk = clean_on_disk.localCheckpoint()
            mark("clean_reread_pin")
            if not bm25.is_committed(key) and not clean_on_disk.isEmpty():
                # before the LSH commit: a crash between the two store
                # commits replays the epoch with this half a no-op
                # (each store's own ledger guards its half; append
                # refuses empty batches, hence the probe)
                bm25.append(clean_on_disk, key)
                mark("bm25_append")
        if not idx.is_committed(key):
            # guarded like the BM25 half once the n-gram store is the
            # epoch guard: a crash between the LSH commit and the final
            # n-gram append replays the epoch, and re-probing an index
            # that already holds this batch would rewrite DIFFERENT
            # pairs (every doc would match its own stored copy)
            pairs, commit = idx.prepare_batch(
                clean_on_disk, key, id_col, text_col
            )
            pairs.write.mode("overwrite").parquet(
                os.path.join(out_dir, "pairs", f"epoch={epoch_id}")
            )
            commit()
            mark("lsh_index")
        if ngrams is not None:
            # the epoch's LAST action — this ledger entry is the
            # whole-epoch replay guard (see epoch_guard above); the
            # frame was already cut for the verdict
            ngrams.append_counts(c_new, key, cut=False)
            mark("ngram_append")
        # cadence keys on APPENDED batches (the live gen dir is
        # excluded) — counting committed_batches() degenerates to a
        # full rewrite every epoch (r10 review, shared with the
        # standalone index leg)
        if compact_every and len(idx.appended_batches()) >= compact_every:
            idx.compact()
        if (
            bm25 is not None
            and compact_every
            and len(bm25.appended_batches()) >= compact_every
        ):
            bm25.compact()
        if (
            ngrams is not None
            and compact_every
            and len(ngrams.appended_batches()) >= compact_every
        ):
            ngrams.compact()
        mark("compact_cadence")
        if stage_timings is not None:
            stage_timings.append((epoch_id, marks))

    return (
        stream.writeStream.foreachBatch(run_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
