"""Streaming tokenizer encode (r15, seventh gate leg): the drained
per-doc id arrays must equal the batch encode of the same corpus
through the same artifact, keep blank docs with empty arrays, resolve
OOV words through the fallback chain (zero drops), and refuse a
merges-only artifact at stream setup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import bpe
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.dedup import (
    normalized_tokens,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.encode_stream import (
    stream_encode_docs,
)

SF_DIR = "/root/testdata/sf0.001"
N_MERGES = 30


def _train_artifact(spark, path, with_vocab=True):
    """Freeze a tokenizer on a small CLOSED-alphabet vocabulary
    ({a,d,e,h,m,n,r,s,t}), so encoding the fixture corpus genuinely
    exercises the char-fallback -> UNK chain on ordinary words (the
    fixture tokenizer is [a-z0-9]-only — non-Latin probe characters
    are stripped BEFORE encoding, so OOV must come from within the
    tokenized alphabet)."""
    wc = spark.createDataFrame(
        [
            ("the", 50), ("and", 30), ("data", 20), ("stream", 10),
            ("hates", 8), ("trend", 5), ("arm", 4), ("stand", 3),
        ],
        "word string, n long",
    ).localCheckpoint()
    merges = bpe.train_bpe(wc, N_MERGES)
    seg = bpe.segment_words(wc.select("word"), merges)
    # deterministic piece ids: count-desc then piece-asc, like the
    # registered ranking (the exact order is irrelevant to the
    # stream≡batch equivalence — both sides use THIS artifact)
    pc = (
        seg.join(wc, "word")
        .select(F.explode("pieces").alias("piece"), "n")
        .groupBy("piece")
        .agg(F.sum("n").alias("c"))
        .collect()
    )
    ranked = sorted(pc, key=lambda r: (-r["c"], r["piece"]))
    vocab = [(r["piece"], i) for i, r in enumerate(ranked)]
    bpe.save_merges(str(path), merges, vocab=vocab if with_vocab else None)
    return merges, vocab


def _encode_corpus(spark, tmp_path):
    """The encode-side corpus: the odd fixture half (disjoint from
    the closed training alphabet for most words) + a blank doc + a
    constant doc whose words survive tokenization but whose every
    character is outside the training alphabet (guaranteed UNK)."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    extra = spark.createDataFrame(
        [(900001, ""), (900002, "zzq xyz")],
        "doc_id long, text string",
    )
    return docs.filter(F.col("doc_id") % 2 == 1).unionByName(extra)


def test_stream_encode_equals_batch_and_oov_and_blank(spark, tmp_path):
    art = tmp_path / "tokenizer.json"
    merges, vocab = _train_artifact(spark, art)
    unk = len(vocab)
    corpus = _encode_corpus(spark, tmp_path)

    src = tmp_path / "src"
    for i in range(2):  # two files -> two epochs at maxFilesPerTrigger=1
        corpus.filter(F.col("doc_id") % 2 == i).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    out, ck = tmp_path / "out", tmp_path / "ck"
    q = stream_encode_docs(
        spark, str(src), corpus.schema, str(art), str(out), str(ck),
        max_files_per_trigger=1,
    )
    assert q.awaitTermination(180)

    got = {
        r.doc_id: (list(r.piece_ids), r.n_pieces, r.n_unk)
        for r in spark.read.parquet(str(out / "encoded")).collect()
    }
    # every arriving doc accounted for, exactly once
    assert len(got) == corpus.count()

    # batch twin: same artifact, same operators, one static plan
    toks = corpus.select(
        "doc_id",
        F.posexplode(normalized_tokens(F.col("text"))).alias("pos", "word"),
    ).filter(F.length("word") > 0)
    enc = bpe.encode_words(toks, merges, vocab, unk_id=unk)
    per_doc = (
        toks.join(enc, "word")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "piece_ids"))),
                    lambda x: x["piece_ids"],
                )
            ).alias("piece_ids")
        )
    )
    want = {
        r.doc_id: list(r.piece_ids)
        for r in corpus.select("doc_id").join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("piece_ids", F.array().cast("array<int>")).alias(
                "piece_ids"
            ),
        )
        .collect()
    }
    assert {d: ids for d, (ids, _np, _nu) in got.items()} == want

    # the audit columns are consistent with the arrays
    for _d, (ids, n_pieces, n_unk) in got.items():
        assert n_pieces == len(ids)
        assert n_unk == sum(1 for x in ids if x == unk)

    # blank doc: present, empty array
    assert got[900001] == ([], 0, 0)
    # all-OOV doc ("zzq xyz"): nothing dropped — one id per character
    # (6 chars across 2 words), every one the UNK id
    ids, n_pieces, n_unk = got[900002]
    assert n_pieces == 6 and n_unk == 6 and set(ids) == {unk}
    # and the fixture half exercises BOTH paths: known pieces exist
    # somewhere, UNKs exist somewhere beyond the probe doc
    assert any(
        n_unk > 0 for d, (_i, _np, n_unk) in got.items() if d != 900002
    )
    assert any(
        any(x != unk for x in ids_) for ids_, _np, _nu in got.values()
    )


def test_merges_only_artifact_refused_at_setup(spark, tmp_path):
    art = tmp_path / "merges_only.json"
    _train_artifact(spark, art, with_vocab=False)
    corpus = _encode_corpus(spark, tmp_path)
    with pytest.raises(ValueError, match="no piece vocab"):
        stream_encode_docs(
            spark, str(tmp_path / "src"), corpus.schema, str(art),
            str(tmp_path / "out"), str(tmp_path / "ck"),
        )


def test_reserved_columns_fail_loudly(spark, tmp_path):
    art = tmp_path / "tokenizer.json"
    _train_artifact(spark, art)
    bad = spark.createDataFrame(
        [(1, "a b", 3)], "doc_id long, text string, n_unk int"
    )
    with pytest.raises(ValueError, match="reserved"):
        stream_encode_docs(
            spark, str(tmp_path / "src"), bad.schema, str(art),
            str(tmp_path / "out"), str(tmp_path / "ck"),
        )
