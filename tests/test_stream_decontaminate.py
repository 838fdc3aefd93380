"""Streaming decontamination (r11, the fifth foreachBatch leg): the
drained clean/contaminated split must equal the batch computation over
the same corpus, be exactly-once under checkpoint replay, and respect
the max_hits threshold."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import curation as C
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.decontaminate import (
    heldout_gram_set,
    stream_decontaminate,
)

SF_DIR = "/root/testdata/sf0.001"
NGRAM_N = 4


def _corpus(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    heldout = docs.filter(F.col("doc_id") % 13 == 0)
    train = docs.filter(F.col("doc_id") % 13 != 0)
    return heldout, train


def _expected_contaminated(train, heldout, max_hits=0):
    """The UNROUTED batch expression (plans/curation_queries.py shape):
    per-doc distinct-gram overlap with the held-out gram set."""
    grams = heldout_gram_set(heldout, "text", NGRAM_N)
    return (
        train.select(
            "doc_id",
            F.array_distinct(C.word_ngrams(F.col("text"), NGRAM_N)).alias("g"),
        )
        .select(
            "doc_id",
            F.size("g").cast("long").alias("n_doc_ngrams"),
            F.explode("g").alias("ngram"),
        )
        .withColumn("gh", C.hash60(F.col("ngram")))
        .join(F.broadcast(grams), "gh")
        .groupBy("doc_id", "n_doc_ngrams")
        .agg(F.count("*").alias("n_contaminated"))
        .filter(F.col("n_contaminated") > max_hits)
    )


def _drain(spark, source, heldout, out, ck, **kw):
    heldout, train = heldout
    q = stream_decontaminate(
        spark,
        str(source),
        train.schema,
        heldout,
        str(out),
        str(ck),
        n=NGRAM_N,
        **kw,
    )
    assert q.awaitTermination(180)


def _epoch_dirs(out, side):
    root = os.path.join(str(out), side)
    return sorted(d for d in os.listdir(root)) if os.path.isdir(root) else []


def test_stream_split_equals_batch(spark, tmp_path):
    heldout, train = _corpus(spark)
    src = tmp_path / "src"
    for i in range(3):
        train.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    out, ck = tmp_path / "out", tmp_path / "ck"
    _drain(spark, src, (heldout, train), out, ck, max_files_per_trigger=1)

    exp = {
        (r.doc_id, r.n_doc_ngrams, r.n_contaminated)
        for r in _expected_contaminated(train, heldout).collect()
    }
    assert exp, "fixture must actually contain contamination"
    got_cont = spark.read.parquet(str(out / "contaminated"))
    got = {
        (r.doc_id, r.n_doc_ngrams, r.n_contaminated) for r in got_cont.collect()
    }
    assert got == exp

    got_clean = spark.read.parquet(str(out / "clean"))
    assert set(got_clean.columns) - {"epoch"} == set(train.columns)
    clean_ids = {r.doc_id for r in got_clean.select("doc_id").collect()}
    all_ids = {r.doc_id for r in train.select("doc_id").collect()}
    cont_ids = {t[0] for t in got}
    assert clean_ids | cont_ids == all_ids
    assert not clean_ids & cont_ids


def test_replay_is_idempotent_and_restart_adds_nothing(spark, tmp_path):
    heldout, train = _corpus(spark)
    src = tmp_path / "src"
    train.coalesce(1).write.parquet(str(src))
    out, ck = tmp_path / "out", tmp_path / "ck"
    _drain(spark, src, (heldout, train), out, ck)

    dirs_before = (_epoch_dirs(out, "clean"), _epoch_dirs(out, "contaminated"))
    rows_before = spark.read.parquet(str(out / "clean")).count()
    # restart on the same checkpoint with no new files: zero new epochs
    _drain(spark, src, (heldout, train), out, ck)
    assert (
        _epoch_dirs(out, "clean"),
        _epoch_dirs(out, "contaminated"),
    ) == dirs_before
    assert spark.read.parquet(str(out / "clean")).count() == rows_before

    # a FRESH checkpoint is a new run: its epoch keys carry a new query
    # id, so it cannot alias (silently overwrite) the old run's dirs
    _drain(spark, src, (heldout, train), out, tmp_path / "ck2")
    assert len(_epoch_dirs(out, "clean")) == 2 * len(dirs_before[0])


def test_max_hits_threshold(spark, tmp_path):
    heldout, train = _corpus(spark)
    src = tmp_path / "src"
    train.coalesce(1).write.parquet(str(src))
    out, ck = tmp_path / "out", tmp_path / "ck"
    # raise the gate: only docs with > max_hits overlapping grams land
    # in quarantine
    counts = [
        r.n_contaminated
        for r in _expected_contaminated(train, heldout).collect()
    ]
    cut = sorted(counts)[len(counts) // 2]  # median: some above, some below
    exp = {
        (r.doc_id, r.n_contaminated)
        for r in _expected_contaminated(train, heldout, max_hits=cut).collect()
    }
    assert exp and len(exp) < len(counts), "cut must actually split"
    _drain(spark, src, (heldout, train), out, ck, max_hits=cut)
    got = {
        (r.doc_id, r.n_contaminated)
        for r in spark.read.parquet(str(out / "contaminated")).collect()
    }
    assert got == exp
    assert all(c > cut for _i, c in got)


def test_reserved_columns_fail_loudly(spark, tmp_path):
    """The gate injects _th / n_doc_ngrams / n_contaminated; a source
    schema already carrying one must fail at setup, not silently lose
    the user's column or die ambiguous per epoch (r11 review)."""
    import pytest
    from pyspark.sql import types as T

    heldout, train = _corpus(spark)
    # epoch is reserved too (the OUTPUT partition column: a data column
    # of that name makes every read of clean/ fail duplicate-column);
    # and the check is case-INsensitive, like Spark's resolution
    for bad_col in ("n_contaminated", "epoch", "N_Contaminated", "_TH"):
        bad = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
                T.StructField(bad_col, T.LongType()),
            ]
        )
        with pytest.raises(ValueError, match="reserved column"):
            stream_decontaminate(
                spark, str(tmp_path / "src"), bad, heldout,
                str(tmp_path / "out"), str(tmp_path / "ck"),
            )


def test_clean_output_chains_into_dedup_index(spark, tmp_path):
    """The legs COMPOSE: the gate's clean/ dir is itself a valid
    file-stream source (epoch read back as a declared partition
    column), so decontaminate -> dedup-at-ingest chains dir-to-dir with
    no glue — the full arrival-time pipeline. The chained index's
    accumulated pairs must equal a batch LSH pass over the same clean
    corpus."""
    from pyspark.sql import types as T

    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import (
        dedup as D,
    )
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.dedup_index import (
        LshDedupIndex,
    )
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.cdc_stream import (
        stream_dedup_index,
    )

    heldout, train = _corpus(spark)
    # inject near-dups so the chained index has pairs to find
    train = train.unionByName(
        train.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 50000).alias("doc_id"), "text"
        )
    )
    src = tmp_path / "src"
    train.coalesce(1).write.parquet(str(src))
    out, ck = tmp_path / "out", tmp_path / "ck"
    _drain(spark, src, (heldout, train), out, ck)

    clean_schema = T.StructType(
        list(train.schema) + [T.StructField("epoch", T.StringType())]
    )
    q = stream_dedup_index(
        spark,
        str(out / "clean"),
        clean_schema,
        str(tmp_path / "idx"),
        str(tmp_path / "pairs"),
        str(tmp_path / "ck_idx"),
        jaccard_min=0.5,
        max_files_per_trigger=10,
    )
    assert q.awaitTermination(180)

    got = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    clean = spark.read.parquet(str(out / "clean")).select("doc_id", "text")
    exp_idx = LshDedupIndex(spark, str(tmp_path / "idx_batch"), jaccard_min=0.5)
    pairs, commit = exp_idx.prepare_batch(clean, "all")
    exp = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b)) for r in pairs.collect()
    }
    assert exp, "fixture must produce near-dup pairs among clean docs"
    assert got == exp
