"""r12 advice + verdict-nit fixes, each pinned by a test:

1. BM25 int64 score headroom is a GUARD, not a comment — the store
   refuses (loudly) to grow past the line where an ANSI-off Spark
   would silently wrap the bigint score products, and the bound is
   the true maximum of the products over every (tf, dl, df) the
   corpus admits.
2. Pre-guard stores (no ``max_dl`` in meta) are backfilled on their
   next append with the exact store-wide max.
3. ``BatchDirStore._sweep_orphans`` surfaces persistent GC failures
   as a warning instead of hiding them behind ``ignore_errors``.
"""

from __future__ import annotations

import itertools
import json
import os

import pytest
from pyspark.sql import functions as F

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import text as X
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.bm25_index import (
    Bm25Index,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.ngram_store import (
    NgramCountStore,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "text")


# -- 1: the headroom bound and the loud guard -------------------------------


def test_bound_is_true_product_maximum_small_exhaustive():
    """The guard's bound must dominate BOTH bigint products for every
    (tf, dl, df) the corpus admits (tf <= dl <= max_dl, 1 <= df <= N)
    — checked exhaustively on a small grid, exact Python ints."""
    n_docs, s_tokens, max_dl = 7, 53, 11
    bound = X.bm25_int64_products_bound(n_docs, s_tokens, max_dl)
    seen_max = 0
    for dl in range(1, max_dl + 1):
        for tf, df in itertools.product(range(1, dl + 1), range(1, n_docs + 1)):
            num = (22 * tf * s_tokens) * (2 * n_docs - 2 * df + 1)
            den = (10 * tf * s_tokens + 3 * s_tokens + 9 * dl * n_docs) * (
                2 * df + 1
            )
            seen_max = max(seen_max, num, den)
    assert seen_max == bound  # tight, not just safe


def test_bound_degenerate_corpora_are_ok():
    assert X.bm25_int64_products_bound(0, 0, 0) == 0
    X.bm25_require_int64_headroom(0, 0, 0, where="empty")  # no raise
    # the documented sf10-ish shape is comfortably inside the line
    X.bm25_require_int64_headroom(
        600_000, 60_000_000, 2_000, where="sf10-ish"
    )


def test_require_raises_past_int64():
    # one doc of ~6e8 tokens: num = 22*d*d > 2^63
    with pytest.raises(ValueError, match="int64 max"):
        X.bm25_require_int64_headroom(
            1, 700_000_000, 700_000_000, where="huge"
        )


def _doctor_meta(path: str, **updates) -> None:
    meta_path = os.path.join(path, "_bm25_meta.json")
    with open(meta_path) as fh:
        meta = json.load(fh)
    for k, v in updates.items():
        if v is None:
            meta.pop(k, None)
        else:
            meta[k] = v
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)


def test_append_past_int64_now_widens_to_decimal38(spark, tmp_path):
    """r14 (r13 verdict #1): crossing the int64 product line is no
    longer an ingest dead-end — the append WARNS, switches the store
    to score_mode='decimal38' (one-way, recorded with the commit),
    and the batch lands; the refusal moved to the decimal envelope
    (tests/test_bm25_decimal.py)."""
    docs = _docs(spark)
    idx = Bm25Index(spark, str(tmp_path / "bm25"))
    assert idx.append(docs.filter(F.col("doc_id") % 2 == 0), "b0")[
        "score_mode"
    ] == "int64"
    # simulate a corpus grown to the wrap line (synthetic totals — the
    # real corpus would need ~1e9 tokens)
    _doctor_meta(idx.path, s_tokens=10**15, n_docs=10**9, max_dl=10**6)
    with pytest.warns(RuntimeWarning, match="decimal38"):
        stats = idx.append(docs.filter(F.col("doc_id") % 2 == 1), "b1")
    assert stats["score_mode"] == "decimal38"
    assert idx.is_committed("b1")
    # one-way: a later in-range-sized append stays decimal38
    assert idx.stats()["score_mode"] == "decimal38"


def test_topk_refuses_on_doctored_meta(spark, tmp_path):
    docs = _docs(spark)
    idx = Bm25Index(spark, str(tmp_path / "bm25"))
    idx.append(docs, "b0")
    _doctor_meta(idx.path, s_tokens=10**15, n_docs=10**9, max_dl=10**6)
    with pytest.raises(ValueError, match="int64 max"):
        idx.topk([("q1", "spark pipelines")], k=3)


# -- 2: pre-guard store backfill --------------------------------------------


def test_pre_guard_store_backfills_max_dl_on_next_append(spark, tmp_path):
    docs = _docs(spark)
    idx = Bm25Index(spark, str(tmp_path / "bm25"))
    idx.append(docs.filter(F.col("doc_id") % 2 == 0), "b0")
    _doctor_meta(idx.path, max_dl=None)  # a store written before r13
    idx.append(docs.filter(F.col("doc_id") % 2 == 1), "b1")
    with open(os.path.join(idx.path, "_bm25_meta.json")) as fh:
        meta = json.load(fh)
    true_max = (
        idx._read_data(idx._require_live_dirs(idx._read_meta(), "test"))
        .agg(F.max("dl"))
        .collect()[0][0]
    )
    assert meta["max_dl"] == true_max


# -- 3: orphan-sweep failures are surfaced ----------------------------------


def test_sweep_orphans_warns_on_undeletable_dir(spark, tmp_path, monkeypatch):
    store = NgramCountStore(spark, str(tmp_path / "ng"))
    orphan = os.path.join(store._data_root(), "batch=orphan")
    os.makedirs(orphan)
    import dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.store_base as SB

    real_rmtree = SB.shutil.rmtree

    def deny(path, *a, **k):
        if os.path.basename(path) == "batch=orphan":
            raise OSError(13, "Permission denied", path)
        return real_rmtree(path, *a, **k)

    monkeypatch.setattr(SB.shutil, "rmtree", deny)
    with pytest.warns(RuntimeWarning, match="could not GC 1 orphan"):
        failed = store._sweep_orphans([])
    assert failed == 1
    assert os.path.isdir(orphan)  # still there — next sweep retries
    monkeypatch.undo()
    assert store._sweep_orphans([]) == 0  # and the retry converges
    assert not os.path.isdir(orphan)
