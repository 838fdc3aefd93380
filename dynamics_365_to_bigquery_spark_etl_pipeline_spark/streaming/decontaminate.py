"""Benchmark decontamination AT INGEST — the fifth foreachBatch leg.

The batch query (``plans/curation_queries.q_decontaminate_ngram``)
answers "which already-ingested documents overlap the held-out split";
this leg keeps the CORPUS clean instead: every arriving micro-batch is
gated against the held-out n-gram set before it lands, so benchmark
text never enters the training corpus in the first place — the shape a
continuously-fed 100 TB pipeline actually needs (a nightly batch sweep
leaves contaminated docs trainable for a day, and deleting them later
is a rewrite).

Scale shape, same law as the batch query: the held-out side is SMALL
by construction (eval benchmarks, not corpora), so its distinct-gram
set is computed ONCE at stream setup — staged via the repo's ``stage``
dispatcher so per-epoch reuse re-reads blocks instead of re-shingling —
and joined ``F.broadcast`` per epoch: the arriving batch streams
through a broadcast-hash join with NO shuffle, grams compared by their
portable 60-bit hash (8-byte ints regardless of gram length).

Exactly-once WITHOUT a store: each epoch writes
``out_dir/clean/epoch=<key>/`` and ``out_dir/contaminated/epoch=<key>/``
with ``mode("overwrite")`` where ``<key>`` is the run-scoped
``<query-id>-epoch-<n>`` (``streaming/util.query_id_reader`` — epoch
numbers restart at 0 on a rebuilt checkpoint, so a bare epoch number
would alias a prior run's dirs). A replayed epoch deterministically
rewrites its own dirs; a crash between the two writes is replayed
whole. Readers union the roots (``spark.read.parquet(out_dir +
"/clean")`` — the ``epoch=`` dirs read back as a partition column).

The batch is persisted around the two actions — the r10 heavy-hitters
review lesson: two writes over an unpersisted file-source batch scan
the input twice per epoch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery
from pyspark.storagelevel import StorageLevel

from ..operators import curation as C
from ..operators.expr_util import explode_nonempty
from ..operators.stage import stage
from .util import (
    check_reserved_columns,
    project_to_schema,
    query_id_reader,
)


# one shared definition with the batch query (operators/curation.py —
# r11 review: a second copy here could silently diverge the gate from
# the batch oracle that verifies it); re-exported for callers
heldout_gram_set = C.heldout_gram_set


def contamination_hits(
    docs: DataFrame,
    grams: DataFrame,
    text_col: str,
    n: int,
    max_hits: int,
) -> DataFrame:
    """One row per DISTINCT contaminated text: ``(_th, n_doc_ngrams,
    n_contaminated)`` keyed by the md5 routing hash of the text.

    ROUTED, same law as the batch query (r9): the overlap counts are a
    function of the text alone, so shingle + hash + broadcast-join once
    per distinct text and let the caller fan the verdict back out over
    ``_th`` — on a clone-heavy corpus the gram explosion shrinks by the
    duplication factor. One implementation for both the standalone
    decontamination gate and the unified ingest pipeline (r12): the
    gate logic is replay-guard-adjacent, and a second copy would drift
    on the next fix."""
    reps = docs.select(text_col).distinct().select(
        F.md5(F.col(text_col)).alias("_th"),
        F.array_distinct(C.word_ngrams(F.col(text_col), n)).alias("_grams"),
    )
    return (
        # explode_nonempty (r16, the shared owner): no inferred size>0
        # filter, which used to push below the distinct with the n-gram
        # expression substituted in — 2 extra evaluations per RAW batch
        # row, defeating the routing (r15)
        explode_nonempty(
            reps,
            ["_th", F.size("_grams").cast("long").alias("n_doc_ngrams")],
            "_grams",
            "_ngram",
        )
        .withColumn("gh", C.hash60(F.col("_ngram")))
        .join(F.broadcast(grams), "gh")
        .groupBy("_th", "n_doc_ngrams")
        .agg(F.count("*").alias("n_contaminated"))
        .filter(F.col("n_contaminated") > max_hits)
    )


def stream_decontaminate(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    heldout: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    n: int = 4,
    max_hits: int = 0,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Gate a document stream against ``heldout``'s n-grams: rows whose
    distinct-gram overlap exceeds ``max_hits`` land under
    ``contaminated/`` (with ``n_doc_ngrams``/``n_contaminated`` audit
    columns), the rest under ``clean/`` with their input schema. The
    default ``max_hits=0`` quarantines on ANY overlap; corpora with
    benign boilerplate overlap raise it."""
    # _th/n_doc_ngrams/n_contaminated are the gate's working/audit
    # columns, epoch its output partition column (shared guard:
    # streaming/util.check_reserved_columns — r11 reviews)
    check_reserved_columns(
        schema, {"_th", "n_doc_ngrams", "n_contaminated", "epoch"}
    )
    # coalesce(4) inside the staged subtree — the broadcast-contract
    # sizing rule; see stream_ingest_pipeline (r16, shared rationale)
    grams = stage(heldout_gram_set(heldout, text_col, n).coalesce(4))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    _query_id = query_id_reader(checkpoint_dir)

    def gate(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        key = f"{_query_id()}-epoch-{epoch_id}"
        # lineage columns outside the contract are dropped at the
        # door (shared: streaming/util.project_to_schema)
        batch_df = project_to_schema(batch_df, schema).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        try:
            # routed verdict per distinct text (shared builder, above);
            # hits persisted around the two writes, same lesson as the
            # batch itself: it is LAZY, and without the pin the clean
            # write re-runs the whole gram explosion + broadcast join a
            # second time per epoch (measured 1.8x the drain wall at
            # sf1, SCALING.md). It is the small side — one row per
            # contaminated distinct text.
            hits = contamination_hits(
                batch_df, grams, text_col, n, max_hits
            ).persist(StorageLevel.MEMORY_AND_DISK)
            try:
                tagged = (
                    batch_df.withColumn("_th", F.md5(F.col(text_col)))
                    .join(hits, "_th", "left")
                    .drop("_th")
                )
                tagged.filter(
                    F.col("n_contaminated").isNotNull()
                ).write.mode("overwrite").parquet(
                    f"{out_dir}/contaminated/epoch={key}"
                )
                tagged.filter(F.col("n_contaminated").isNull()).drop(
                    "n_doc_ngrams", "n_contaminated"
                ).write.mode("overwrite").parquet(
                    f"{out_dir}/clean/epoch={key}"
                )
            finally:
                hits.unpersist()
        finally:
            batch_df.unpersist()

    return (
        stream.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
