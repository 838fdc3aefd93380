"""Streaming quality gate (r11, sixth foreachBatch leg): the drained
kept/rejected split must equal the batch filter over the same corpus,
be exactly-once under replay, and honor a custom score expression."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import text as X
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.quality_gate import (
    stream_quality_gate,
)

SF_DIR = "/root/testdata/sf0.001"
MIN_SCORE = 50


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "text")


def _drain(spark, source, schema, out, ck, **kw):
    q = stream_quality_gate(
        spark, str(source), schema, str(out), str(ck),
        min_score=MIN_SCORE, **kw,
    )
    assert q.awaitTermination(180)


def test_stream_split_equals_batch_filter(spark, tmp_path):
    docs = _docs(spark)
    src = tmp_path / "src"
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    out, ck = tmp_path / "out", tmp_path / "ck"
    _drain(spark, src, docs.schema, out, ck, max_files_per_trigger=1)

    scored = docs.withColumn("q", X.quality_score(F.col("text")))
    exp_kept = {r.doc_id for r in scored.filter(F.col("q") >= MIN_SCORE).collect()}
    exp_rej = {
        (r.doc_id, r.q) for r in scored.filter(F.col("q") < MIN_SCORE).collect()
    }
    assert exp_kept and exp_rej, "fixture must split both ways"

    kept = spark.read.parquet(str(out / "kept"))
    assert set(kept.columns) - {"epoch"} == set(docs.columns)  # no audit col
    assert {r.doc_id for r in kept.collect()} == exp_kept
    rej = spark.read.parquet(str(out / "rejected"))
    assert {(r.doc_id, r.quality_score) for r in rej.collect()} == exp_rej


def test_replay_is_idempotent(spark, tmp_path):
    docs = _docs(spark)
    src = tmp_path / "src"
    docs.coalesce(1).write.parquet(str(src))
    out, ck = tmp_path / "out", tmp_path / "ck"
    _drain(spark, src, docs.schema, out, ck)
    dirs = sorted(os.listdir(out / "kept"))
    n = spark.read.parquet(str(out / "kept")).count()
    _drain(spark, src, docs.schema, out, ck)  # no new files: no new epochs
    assert sorted(os.listdir(out / "kept")) == dirs
    assert spark.read.parquet(str(out / "kept")).count() == n


def test_custom_score_expression_null_safe_and_complete(spark, tmp_path):
    """Any column-expression scorer rides the same gate — here
    token_count, which returns NULL for NULL text: the NULL-scored row
    must land in rejected/, NOT silently vanish from both outputs (r11
    review: filter(keep) and filter(~keep) each exclude NULL), and
    kept ∪ rejected must cover every input row."""
    docs = _docs(spark).unionByName(
        spark.createDataFrame([(999999, None)], _docs(spark).schema)
    )
    src = tmp_path / "src"
    docs.coalesce(1).write.parquet(str(src))
    out, ck = tmp_path / "out", tmp_path / "ck"
    _drain(spark, src, docs.schema, out, ck, score=X.token_count)
    exp = {
        r.doc_id
        for r in docs.filter(
            X.token_count(F.col("text")) >= MIN_SCORE
        ).collect()
    }
    kept = {r.doc_id for r in spark.read.parquet(str(out / "kept")).collect()}
    rej = {
        r.doc_id for r in spark.read.parquet(str(out / "rejected")).collect()
    }
    assert kept == exp
    assert 999999 in rej  # NULL score: rejected, not dropped
    all_ids = {r.doc_id for r in docs.collect()}
    assert kept | rej == all_ids and not kept & rej


def test_reserved_columns_fail_loudly(spark, tmp_path):
    for bad_col in ("quality_score", "epoch", "Quality_Score"):
        bad = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
                T.StructField(bad_col, T.LongType()),
            ]
        )
        with pytest.raises(ValueError, match="reserved column"):
            stream_quality_gate(
                spark, str(tmp_path / "src"), bad,
                str(tmp_path / "out"), str(tmp_path / "ck"),
            )


def test_gate_chains_into_gate(spark, tmp_path):
    """quality gate -> decontaminate gate, dir-to-dir: the downstream
    leg declares the upstream OUTPUT schema minus the epoch partition
    column (reserved), and the gates project each batch to the
    declared schema — without that, Spark rides the upstream epoch=
    partition column into the batch and it lands as a data column
    inside the downstream gate's own epoch= dirs, making every read of
    the output fail duplicate-column (r11 review probe)."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.decontaminate import (
        stream_decontaminate,
    )

    docs = _docs(spark)
    heldout = docs.filter(F.col("doc_id") % 13 == 0)
    src = tmp_path / "src"
    docs.coalesce(1).write.parquet(str(src))
    out1, ck1 = tmp_path / "gate1", tmp_path / "ck1"
    _drain(spark, src, docs.schema, out1, ck1)

    out2 = tmp_path / "gate2"
    q = stream_decontaminate(
        spark,
        str(out1 / "kept"),
        docs.schema,  # omits epoch: the gates project to this
        heldout,
        str(out2),
        str(tmp_path / "ck2"),
    )
    assert q.awaitTermination(180)

    clean = spark.read.parquet(str(out2 / "clean"))
    cont = spark.read.parquet(str(out2 / "contaminated"))
    kept1 = {r.doc_id for r in spark.read.parquet(str(out1 / "kept")).collect()}
    ids2 = {r.doc_id for r in clean.collect()} | {
        r.doc_id for r in cont.collect()
    }
    assert ids2 == kept1  # every quality-kept row flowed through
    # and BOTH downstream outputs carry exactly ONE epoch column (the
    # partition one) — the upstream's never leaked into the data files
    assert clean.columns.count("epoch") == 1
    assert cont.columns.count("epoch") == 1
