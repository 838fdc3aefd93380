"""Streaming document ingest into the incremental BM25 retrieval
index — the store-symmetry leg for the text-retrieval side (r12).

Every incremental store in this repo has a foreachBatch leg (LSH dedup
index, IVF layout, MG summaries); this is the same ingest shape for
``operators/bm25_index.py``: a file-source stream of documents folded
into the index one O(|batch|) append per micro-batch, so a continuously
fed corpus stays queryable (``Bm25Index.topk`` — bit-identical to the
full-corpus ``q_text_bm25_topk`` plan) without ever re-tokenizing the
indexed documents.

Exactly-once: ``Bm25Index.append`` is two-phase (postings dir fully on
disk before the meta commit, additive stats committed with the ledger
entry) and a replayed committed id is a no-op, so the stream only needs
the run-scoped epoch key — namespaced by the query's persisted id, the
family rationale (epoch numbers restart at 0 on a rebuilt checkpoint).
The query-id prefix also keeps keys out of the reserved ``gen<N>``
namespace by construction.

``compact_every`` bounds query fan-in on a long-running ingest by
folding per-epoch batch dirs into one generation after every N
APPENDED batches (generation dirs excluded from the count — the
family's cadence rule).

``append`` itself cuts the batch projection eagerly (one evaluation
feeds both the doc count and the postings — the r10 heavy-hitters
double-scan lesson, guarded in the batch API), so the leg needs no pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators.bm25_index import Bm25Index
from .util import query_id_reader


def stream_bm25_append(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = Bm25Index.N_BUCKETS,
    compact_every: int = 0,
    max_files_per_trigger: int = 1,
    lock_timeout: float = 60.0,
) -> StreamingQuery:
    """Fold a document stream into a ``Bm25Index`` one append per
    micro-batch. ``id_col``/``text_col``/``n_buckets`` must match an
    existing index's pinned identity (a mismatched open fails loudly at
    the first epoch); a fresh path starts a fresh index with these
    knobs.

    PRECONDITION (inherited from ``Bm25Index.append``): the SOURCE must
    not re-emit an ``id_col`` value across epochs — df/n_docs are exact
    because each (doc, tok) row exists once store-wide, and a re-landed
    doc id under a new epoch key silently inflates them. Replayed
    EPOCHS are safe (the ledger no-ops them); re-ingested DOCS are the
    caller's bug."""
    idx = Bm25Index(
        spark,
        index_path,
        id_col=id_col,
        text_col=text_col,
        n_buckets=n_buckets,
        lock_timeout=lock_timeout,
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    _query_id = query_id_reader(checkpoint_dir)

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        batch_key = f"{_query_id()}-epoch-{epoch_id}"
        if batch_df.isEmpty() or idx.is_committed(batch_key):
            return
        # no leg-side pin needed: append() cuts the projection eagerly
        # (ONE evaluation of the batch source feeds both the doc count
        # and the postings — r12 review moved the guard into the batch
        # API itself)
        idx.append(batch_df.select(id_col, text_col), batch_key)
        if compact_every and len(idx.appended_batches()) >= compact_every:
            idx.compact()

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
