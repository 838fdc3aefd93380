"""BM25 past the int64 line (r14, r13 verdict #1): the store
auto-widens to decimal(38,0) score products instead of dead-ending the
ingest, scores stay EXACT in both engines (pinned against a pure
arbitrary-precision Python oracle AND the DuckDB HUGEINT twin), and
in-range results are bit-identical across modes — so the
q_text_bm25_topk identity contract survives the switch."""

from __future__ import annotations

import json
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import text as X
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.bm25_index import (
    Bm25Index,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.plans.text_queries import (
    BM25_QUERIES,
    BM25_TOP,
    q_text_bm25_topk,
)

SF_DIR = "/root/testdata/sf0.001"
QUERIES = list(BM25_QUERIES)

# synthetic corpus totals safely past the int64 product line but well
# inside decimal(38,0): bound ~ 22 * 1e6 * 1e15 * 2e9 ~ 4.4e31
BIG = {"n_docs": 10**9, "s_tokens": 10**15, "max_dl": 10**6}


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "text")


def _rows(df):
    return [
        (r.query_id, r.doc_id, repr(r.score), r.rank) for r in df.collect()
    ]


def _doctor_meta(path: str, **updates) -> None:
    meta_path = os.path.join(path, "_bm25_meta.json")
    with open(meta_path) as fh:
        meta = json.load(fh)
    meta.update(updates)
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)


def _build_big_store(spark, tmp_path):
    """A store whose meta says the corpus is past the int64 line:
    real postings from the fixture docs, synthetic prior-corpus
    totals (the additive-stats design makes the scores a pure
    function of (tf, dl, df, N, S), so doctored totals exercise the
    arithmetic exactly as 1e15 real tokens would)."""
    docs = _docs(spark)
    idx = Bm25Index(spark, str(tmp_path / "bm25big"))
    idx.append(docs.filter(F.col("doc_id") % 2 == 0), "b0")
    _doctor_meta(idx.path, **BIG)
    with pytest.warns(RuntimeWarning, match="decimal38"):
        idx.append(docs.filter(F.col("doc_id") % 2 == 1), "b1")
    meta = idx._read_meta()
    assert meta["score_mode"] == "decimal38"
    return idx, meta


def _python_oracle(spark, idx, meta, k):
    """Arbitrary-precision reference: exact integer products (Python
    ints can't overflow), ONE float(num)/float(den) per term (the same
    two correctly-rounded steps both engines execute: int-to-double
    cast, IEEE division), tok-sorted float fold per doc, (score desc,
    doc_id asc) ranking."""
    qterms = X.bm25_query_terms(
        spark.createDataFrame(QUERIES, "query_id string, qtext string")
    ).collect()
    terms_by_tok: dict[str, list[str]] = {}
    for r in qterms:
        terms_by_tok.setdefault(r.tok, []).append(r.query_id)
    posts = [
        (r.doc_id, r.tok, int(r.tf), int(r.dl))
        for r in idx._read_data(
            idx._require_live_dirs(idx._read_meta(), "test")
        ).collect()
        if r.tok in terms_by_tok
    ]
    dfreq: dict[str, int] = {}
    for _d, tok, _tf, _dl in posts:
        dfreq[tok] = dfreq.get(tok, 0) + 1
    N, S = meta["n_docs"], meta["s_tokens"]
    per_doc: dict[tuple[str, str], list[tuple[str, float]]] = {}
    for doc, tok, tf, dl in posts:
        dfq = dfreq[tok]
        num = (22 * tf * S) * (2 * N - 2 * dfq + 1)
        den = (10 * tf * S + 3 * S + 9 * dl * N) * (2 * dfq + 1)
        s_t = float(num) / float(den)
        for qid in terms_by_tok[tok]:
            per_doc.setdefault((qid, doc), []).append((tok, s_t))
    scored: dict[str, list[tuple[float, str]]] = {}
    for (qid, doc), terms in per_doc.items():
        acc = 0.0
        for _tok, s_t in sorted(terms):
            acc += s_t
        scored.setdefault(qid, []).append((acc, doc))
    out = []
    for qid in sorted(scored):
        ranked = sorted(scored[qid], key=lambda t: (-t[0], t[1]))[:k]
        out.extend(
            (qid, doc, repr(score), rank + 1)
            for rank, (score, doc) in enumerate(ranked)
        )
    return out


def test_past_int64_scores_exact_vs_python_and_duckdb(spark, tmp_path):
    """The verdict's bar: ingest past the old bound, get EXACT scores
    in both engines. Spark topk == arbitrary-precision Python oracle
    == DuckDB HUGEINT twin, bit-for-bit (repr of the doubles)."""
    idx, meta = _build_big_store(spark, tmp_path)
    got = _rows(idx.topk(QUERIES, k=BM25_TOP))
    want = _python_oracle(spark, idx, meta, BM25_TOP)
    assert got == want and len(got) > 0

    # DuckDB twin over the same postings + the same huge literals
    posts_pdf = (
        idx._read_data(idx._require_live_dirs(idx._read_meta(), "test"))
        .select("doc_id", "tok", "tf", "dl")
        .toPandas()
    )
    qterms_pdf = X.bm25_query_terms(
        spark.createDataFrame(QUERIES, "query_id string, qtext string")
    ).toPandas()
    conn = duckdb.connect()
    conn.register("postings", posts_pdf)
    conn.register("qterms", qterms_pdf)
    score_sql = X.bm25_term_score_dec_sql(
        "p.tf", "p.dl", "d.df", str(meta["n_docs"]), str(meta["s_tokens"])
    )
    fold_sql = X.bm25_fold_scores_sql("score_t", "tok")
    duck = conn.execute(f"""
WITH d AS (
  SELECT p.tok, COUNT(*) AS df FROM postings p
  WHERE p.tok IN (SELECT tok FROM qterms) GROUP BY p.tok
),
scored AS (
  SELECT q.query_id, p.doc_id, p.tok, {score_sql} AS score_t
  FROM postings p JOIN qterms q USING (tok) JOIN d ON p.tok = d.tok
),
perdoc AS (
  SELECT query_id, doc_id, {fold_sql} AS score
  FROM scored GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM perdoc
)
SELECT query_id, doc_id, score, CAST(rank AS INT) AS rank FROM ranked
WHERE rank <= {BM25_TOP} ORDER BY query_id, rank
""").fetchall()
    duck_rows = [(q, d, repr(s), r) for q, d, s, r in duck]
    assert duck_rows == want


def test_in_range_topk_bit_identical_across_modes(spark, tmp_path):
    """Forcing decimal38 on an in-range corpus changes NOTHING: same
    integer products, same one double division — topk bit-identical to
    the int64 store's AND to the full-corpus q_text_bm25_topk plan."""
    docs = _docs(spark)
    a = Bm25Index(spark, str(tmp_path / "a"))
    b = Bm25Index(spark, str(tmp_path / "b"))
    for i in range(2):
        half = docs.filter(F.col("doc_id") % 2 == i)
        a.append(half, f"b{i}")
        b.append(half, f"b{i}")
    _doctor_meta(b.path, score_mode="decimal38")
    assert a.stats()["score_mode"] == "int64"
    assert b.stats()["score_mode"] == "decimal38"
    got_a = _rows(a.topk(QUERIES, k=BM25_TOP))
    got_b = _rows(b.topk(QUERIES, k=BM25_TOP))
    assert got_a == got_b == _rows(q_text_bm25_topk(spark, SF_DIR))


def test_decimal_envelope_refuses_and_commits_nothing(spark, tmp_path):
    """Past 10^38-1 there is no wider exact integer in both engines —
    the refusal (with the sharding remedy) moved HERE, and it still
    commits nothing."""
    docs = _docs(spark)
    idx = Bm25Index(spark, str(tmp_path / "bm25"))
    idx.append(docs.filter(F.col("doc_id") % 2 == 0), "b0")
    _doctor_meta(
        idx.path,
        score_mode="decimal38",
        n_docs=10**15,
        s_tokens=10**18,
        max_dl=10**9,
    )
    before = idx.committed_batches()
    with pytest.raises(ValueError, match="[Ss]hard"):
        idx.append(docs.filter(F.col("doc_id") % 2 == 1), "b1")
    assert idx.committed_batches() == before
    assert not idx.is_committed("b1")
    # and topk's belt-and-braces re-check refuses the same meta
    with pytest.raises(ValueError, match="[Ss]hard"):
        idx.topk(QUERIES, k=3)


def test_compact_preserves_score_mode(spark, tmp_path):
    idx, _meta = _build_big_store(spark, tmp_path)
    before = _rows(idx.topk(QUERIES, k=BM25_TOP))
    assert idx.compact() is True
    assert idx.stats()["score_mode"] == "decimal38"
    assert _rows(idx.topk(QUERIES, k=BM25_TOP)) == before
