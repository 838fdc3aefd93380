"""Streaming tokenizer encode with a FROZEN artifact — the seventh
foreachBatch gate leg (r15).

The batch side trains and encodes in one plan (``q_bpe_token_ids``);
the production shape the artifact exists for is TRAIN ONCE, ENCODE
FOREVER: a tokenizer is frozen (``bpe.save_merges(..., vocab=)``) and
every later corpus — including corpora the training never saw — is
encoded against it as it arrives. This leg is that shape: a file
stream of documents, one ``bpe.encode_words`` pass per micro-batch
against the artifact's merge table and piece vocab, per-document id
arrays written per epoch. OOV-safety is inherited, not re-implemented:
``encode_words``' vocab -> char-fallback -> UNK chain guarantees ZERO
dropped words on a disjoint corpus (r14 verdict #3), so the stream
never silently thins a document.

Scale shape: the artifact loads ONCE at stream setup (driver) and is
closed over — per epoch the merge table and piece vocab ship to
executors bounded by chars + n_merges (a few MB at 32k merges), never
corpus-sized. Per-batch work is batch-bounded: one tokenize scan, one
Python segmentation pass over the BATCH'S DISTINCT words
(``encode_words`` dedupes internally), one batch-sized equi-join to
fan ids back onto token positions, one per-doc re-assembly aggregate.
Nothing grows with the corpus already encoded — the leg is O(|batch|)
per epoch like every other gate in the family.

Exactly-once: same choreography as the quality/decontamination gates —
per-epoch ``encoded/epoch=<key>`` dirs written ``mode("overwrite")``
under the run-scoped ``<query-id>-epoch-<n>`` key (a replayed epoch
deterministically rewrites its own dir, a fresh checkpoint cannot
alias a prior run's).

Reference parity note: the reference pipeline (CSV -> BigQuery CDC,
`/root/reference/`) has no tokenizer; this leg belongs to the
LLM-training-data extension family (SURVEY.md §2's additions),
composing the r13-r15 BPE operators with the gate-leg chassis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators import bpe
from ..operators.dedup import normalized_tokens
from ..operators.expr_util import explode_nonempty
from .util import (
    check_reserved_columns,
    project_to_schema,
    query_id_reader,
)


def stream_encode_docs(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    artifact_path: str,
    out_dir: str,
    checkpoint_dir: str,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    unk_id: int | None = None,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Encode a document stream against a frozen tokenizer artifact:
    per input document one output row ``(doc_id, piece_ids array<int>,
    n_pieces, n_unk)`` under ``encoded/epoch=<key>``. Documents that
    tokenize to nothing keep an EMPTY id array (the q_bpe_token_ids
    blank-doc rule — every arriving doc is accounted for). The
    artifact must embed a piece vocab (``load_vocab`` refuses a
    merges-only file loudly at stream SETUP, not per epoch);
    ``unk_id`` defaults to V, one past the trained ids. ``doc_id``
    must be unique within a batch (the caller's contract, as with
    every keyed leg): duplicates would have their token streams merged
    by the per-document re-assembly and each output row would carry
    the merged array."""
    merges = bpe.load_merges(artifact_path)
    vocab = bpe.load_vocab(artifact_path)
    if unk_id is None:
        unk_id = max(i for _p, i in vocab) + 1
    check_reserved_columns(schema, {"piece_ids", "n_pieces", "n_unk", "epoch"})

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    _query_id = query_id_reader(checkpoint_dir)

    def encode(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        key = f"{_query_id()}-epoch-{epoch_id}"
        batch_df = project_to_schema(batch_df, schema)
        # explode_nonempty (r16, the shared owner): one tokenizer
        # evaluation per row; the length gate subsumes the null kill
        toks = explode_nonempty(
            batch_df,
            [doc_id_col],
            normalized_tokens(F.col(text_col)),
            "word",
            pos_alias="pos",
            keep=F.length("word") > 0,
        )
        # one row per DISTINCT batch word (encode_words dedupes); the
        # join back is batch-sized, never corpus- or vocabulary-sized
        enc = bpe.encode_words(toks, merges, vocab, unk_id=unk_id)
        per_doc = (
            toks.join(enc, "word")
            .groupBy(doc_id_col)
            .agg(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "piece_ids"))
                        ),
                        lambda x: x["piece_ids"],
                    )
                ).alias("piece_ids")
            )
        )
        out = (
            batch_df.select(doc_id_col)
            .join(per_doc, doc_id_col, "left")
            .select(
                doc_id_col,
                F.coalesce(
                    "piece_ids", F.array().cast("array<int>")
                ).alias("piece_ids"),
            )
            .withColumn("n_pieces", F.size("piece_ids"))
            .withColumn(
                "n_unk",
                F.size(F.filter("piece_ids", lambda x: x == F.lit(unk_id))),
            )
        )
        out.write.mode("overwrite").parquet(
            f"{out_dir}/encoded/epoch={key}"
        )

    return (
        stream.writeStream.foreachBatch(encode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
