"""Streaming BM25 ingest (r12, the seventh foreachBatch leg): a
drained stream's index must answer queries bit-identically to the
batch-built one, replays add nothing, and in-stream compaction keeps
the fold probe-identical."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.bm25_index import (
    Bm25Index,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.plans.text_queries import (
    BM25_QUERIES,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.bm25_ingest import (
    stream_bm25_append,
)

SF_DIR = "/root/testdata/sf0.001"
QUERIES = list(BM25_QUERIES)


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "text")


def _drain(spark, src, schema, idx_path, ck, **kw):
    q = stream_bm25_append(
        spark, str(src), schema, str(idx_path), str(ck), **kw
    )
    assert q.awaitTermination(240)


def _rows(df):
    return [
        (r.query_id, r.doc_id, repr(r.score), r.rank) for r in df.collect()
    ]


def test_stream_index_equals_batch_index(spark, tmp_path):
    docs = _docs(spark)
    src = tmp_path / "src"
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    _drain(
        spark, src, docs.schema, tmp_path / "idx", tmp_path / "ck",
        max_files_per_trigger=1,
    )
    streamed = Bm25Index(spark, str(tmp_path / "idx"))
    assert streamed.stats()["n_docs"] == docs.count()
    batch = Bm25Index(spark, str(tmp_path / "idx_b"))
    batch.append(docs, "all")
    assert _rows(streamed.topk(QUERIES, k=10)) == _rows(
        batch.topk(QUERIES, k=10)
    )


def test_restart_appends_nothing(spark, tmp_path):
    docs = _docs(spark)
    src = tmp_path / "src"
    docs.coalesce(1).write.parquet(str(src))
    _drain(spark, src, docs.schema, tmp_path / "idx", tmp_path / "ck")
    idx = Bm25Index(spark, str(tmp_path / "idx"))
    st = idx.stats()
    _drain(spark, src, docs.schema, tmp_path / "idx", tmp_path / "ck")
    assert idx.stats() == st


def test_in_stream_compaction_bounds_fanin(spark, tmp_path):
    docs = _docs(spark)
    src = tmp_path / "src"
    for i in range(4):
        docs.filter(F.col("doc_id") % 4 == i).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    _drain(
        spark, src, docs.schema, tmp_path / "idx", tmp_path / "ck",
        max_files_per_trigger=1, compact_every=2,
    )
    idx = Bm25Index(spark, str(tmp_path / "idx"))
    live = idx.committed_batches()
    assert len(live) <= 2 and any(b.startswith("gen") for b in live)
    batch = Bm25Index(spark, str(tmp_path / "idx_b"))
    batch.append(docs, "all")
    assert _rows(idx.topk(QUERIES, k=10)) == _rows(batch.topk(QUERIES, k=10))
