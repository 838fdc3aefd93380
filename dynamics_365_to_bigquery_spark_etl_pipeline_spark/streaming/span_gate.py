"""Span-level duplicate detection AT INGEST — the eighth foreachBatch
leg (r12).

The batch detector (``plans/text_queries.q_text_dup_spans``) answers
"which token spans are duplicated" over a FINISHED corpus; this leg
keeps the signal current on a continuously-fed one: every arriving
micro-batch's W-token windows are counted against the incremental
n-gram count store (``operators/ngram_store.py``) PLUS the batch's own
windows, per-doc duplicated-token stats land beside the corpus, and
the batch's counts are appended to the store — so a doc repeating
boilerplate from ANY earlier epoch (or from itself, or from a
same-epoch sibling) is flagged the epoch it arrives.

AT-INGEST SEMANTICS, stated: a window is duplicated when its count in
(past corpus + this batch) reaches ``min_occurrences``. The FIRST copy
of a phrase whose later copies arrive in future epochs is not
retro-flagged (the batch detector over the final corpus would flag
both) — the same one-sided semantics as the dedup index leg, which
emits a pair when the SECOND copy arrives. The two agree exactly when
the corpus arrives in one epoch, and that equality is pytest-pinned
against the driver-oracled batch detector.

Per-epoch shapes: two delta-sized window extractions of the pinned
batch — one COUNTING aggregation whose cut frame feeds both the
duplicate verdict and the store ingest (``append_counts`` — r12
review: re-deriving counts inside append doubled the work), one
POSITIONAL explode for the per-doc fold — plus one gram-keyed join
against the store's counts through ``probe_counts`` (r13, r12 verdict
#1): the store scan PARTITION-PRUNES to the batch vocabulary's
``gram_bucket`` dirs, and with ``compact_every=1`` — the documented
LOW-LATENCY mode — the single pre-summed generation dir needs no
re-aggregation, so the store-side cost per epoch is a pruned scan, not
a corpus-vocabulary shuffle. Then the interval-union fold from the
batch detector's shipped shape, deterministic ``spans/epoch=<key>``
overwrites, and one O(delta) store append. Exactly-once: the store
append is the LAST action, so its ledger guards the epoch (the spans
dir is a deterministic overwrite under the run-scoped key).

Optional routing: ``max_dup_pct`` splits the documents themselves into
``kept/`` / ``flagged/`` epoch dirs on the duplicated-token fraction —
the quality-gate family shape, driven by cross-epoch state instead of
a per-row score.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators import curation as C
from ..operators.expr_util import explode_nonempty
from ..operators import text as X
from ..operators.ngram_store import NgramCountStore
from .util import (
    check_reserved_columns,
    project_to_schema,
    query_id_reader,
)


def dup_grams(
    store: NgramCountStore, c_new: DataFrame, min_occurrences: int
) -> DataFrame:
    """The duplicate-window verdict, ONE rule for the standalone gate
    and the unified pipeline's span stage (r13 review — the threshold
    join was copy-pasted and could drift): a window is duplicated when
    its count in (committed store + this batch) reaches
    ``min_occurrences``. ``c_new`` must be the batch's already-cut
    ``(gram, c)`` frame (the probe pushdowns and the verdict must see
    one evaluation)."""
    return (
        c_new.join(store.probe_counts(c_new), "gram", "left")
        .filter(
            F.col("c") + F.coalesce(F.col("c_past"), F.lit(0))
            >= min_occurrences
        )
        .select("gram")
    )


def route_by_dup_pct(
    docs: DataFrame, stats: DataFrame, id_col: str, max_dup_pct: float
) -> tuple[DataFrame, DataFrame]:
    """``(kept, flagged)`` split of ``docs`` on the stats frame's
    ``dup_pct`` — shared by the gate and the pipeline stage so the
    routing rule cannot fork. Ids must be NON-NULL and unique (the
    family-wide id precondition): a NULL id never equi-joins, so the
    row would silently land in neither side."""
    routed = docs.join(stats.select(id_col, "dup_pct"), id_col)
    return (
        routed.filter(F.col("dup_pct") <= max_dup_pct).drop("dup_pct"),
        routed.filter(F.col("dup_pct") > max_dup_pct),
    )


def span_stats(
    docs: DataFrame,
    dup_grams: DataFrame,
    text_col: str,
    w: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc duplicated-span stats given the duplicated-window set:
    ``(id_col, n_tokens, n_dup_tokens, dup_pct)``. The shipped batch
    detector's shape — positional windows, join to ``dup_grams``
    (column ``gram``), sorted interval-union fold, one IEEE division —
    shared here so the gate and any batch caller compute spans one
    way.

    ROUTED through distinct texts (r14, the r9 routing law the batch
    detector already follows — the r13 verdict #6 breakdown showed
    this stage carrying the pipeline's largest per-epoch cost on the
    clone-heavy fixture): every stat is a pure function of the TEXT,
    so the positional explode, the dup-gram join, and the interval
    fold run once per distinct text and the per-doc frame joins the
    results back by text hash. Exactness unchanged (same expressions,
    same one IEEE division per text; clones get bit-identical stats
    by construction) — pinned by the gate==batch-detector and
    pipeline==chained-legs equivalence tests. A doc with NULL text
    never equi-joins (the md5 key is NULL) and keeps today's
    NULL-stats row through the left join."""
    reps = (
        docs.select(
            F.md5(F.col(text_col)).alias("_th"),
            F.col(text_col).alias(text_col),
        )
        .dropDuplicates(["_th"])
    )
    # explode_nonempty (r16, the shared owner; same rationale as
    # curation.routed_dup_windows): no inferred size>0 filter, so the
    # window expression is evaluated once per distinct text.
    wins = explode_nonempty(
        reps, ["_th"], C.word_ngrams(F.col(text_col), w), "gram",
        pos_alias="pos",
    )
    pertext = (
        wins.join(dup_grams.select("gram"), "gram")
        .groupBy("_th")
        .agg(F.array_sort(F.collect_list("pos")).alias("ps"))
        .select(
            "_th",
            # shared fold (operators/curation.py — one rule with the
            # batch detector and cutter)
            C.interval_union_len(F.col("ps"), w).alias("_dup"),
        )
    )
    text_stats = reps.select(
        "_th",
        X.token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    ).join(pertext, "_th", "left")
    return (
        docs.select(id_col, F.md5(F.col(text_col)).alias("_th"))
        .join(text_stats, "_th", "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce(F.col("_dup"), F.lit(0)).cast("long").alias(
                "n_dup_tokens"
            ),
            F.when(F.col("n_tokens") == 0, F.lit(0.0))
            .otherwise(
                (100 * F.coalesce(F.col("_dup"), F.lit(0))).cast("double")
                / F.col("n_tokens").cast("double")
            )
            .alias("dup_pct"),
        )
    )


def stream_span_dedup_gate(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    out_dir: str,
    store_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 5,
    min_occurrences: int = 2,
    max_dup_pct: Optional[float] = None,
    n_buckets: int = NgramCountStore.N_BUCKETS,
    compact_every: int = 0,
    max_files_per_trigger: int = 1,
    lock_timeout: float = 60.0,
) -> StreamingQuery:
    """Flag duplicated spans in a document stream against everything
    ingested so far. Writes ``spans/epoch=<key>`` stats each epoch;
    with ``max_dup_pct`` set, also routes the documents themselves to
    ``kept/`` / ``flagged/`` epoch dirs. The n-gram count store at
    ``store_path`` is created on first use and appended exactly-once
    per epoch.

    PRECONDITION (the family-wide id rule): ``id_col`` values must be
    NON-NULL and unique within the stream — a NULL id merges all
    null-id docs in the per-doc stats aggregate and never equi-joins
    in the kept/flagged routing (the row would silently land in
    neither dir)."""
    check_reserved_columns(
        schema, {"n_tokens", "n_dup_tokens", "dup_pct", "epoch"}
    )
    store = NgramCountStore(
        spark,
        store_path,
        text_col=text_col,
        w=w,
        n_buckets=n_buckets,
        lock_timeout=lock_timeout,
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    _query_id = query_id_reader(checkpoint_dir)

    def gate(batch_df: DataFrame, epoch_id: int) -> None:
        key = f"{_query_id()}-epoch-{epoch_id}"
        # the store append is the epoch's LAST action: committed means
        # the spans (and kept/flagged) dirs were already written
        if batch_df.isEmpty() or store.is_committed(key):
            return
        docs = project_to_schema(batch_df, schema).localCheckpoint()
        # ONE gram aggregation per epoch: the cut frame feeds both the
        # duplicate verdict and the store ingest (append_counts — r12
        # review: re-deriving the counts inside append doubled the
        # delta-sized work)
        c_new = store.batch_counts(docs.select(text_col)).localCheckpoint()
        # duplicated = past corpus + this batch reaches the threshold
        # (computed against COMMITTED store state — the append below
        # has not run yet, so a replayed epoch sees identical counts).
        # The shared verdict rides probe_counts: partition-pruned to
        # the batch vocabulary's gram_buckets, re-aggregation-free when
        # one live dir holds pre-summed counts (compact_every=1, the
        # documented low-latency mode) — r12 verdict #1: this was the
        # one per-epoch cost that grew with the corpus, not the delta
        dup = dup_grams(store, c_new, min_occurrences)
        stats = span_stats(docs, dup, text_col, w, id_col).persist()
        try:
            stats.write.mode("overwrite").parquet(
                f"{out_dir}/spans/epoch={key}"
            )
            if max_dup_pct is not None:
                kept, flagged = route_by_dup_pct(
                    docs, stats, id_col, max_dup_pct
                )
                kept.write.mode("overwrite").parquet(
                    f"{out_dir}/kept/epoch={key}"
                )
                flagged.write.mode("overwrite").parquet(
                    f"{out_dir}/flagged/epoch={key}"
                )
        finally:
            stats.unpersist()
        store.append_counts(c_new, key, cut=False)  # pinned above
        if compact_every and len(store.appended_batches()) >= compact_every:
            store.compact()

    return (
        stream.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
