#!/usr/bin/env python
"""A/B: the incremental BM25 store vs the full-corpus query plan.

Two claims to measure (both arms produce BIT-IDENTICAL rows, asserted
per cycle — the equivalence is also pytest-pinned):

1. QUERY: ``Bm25Index.topk`` against a pre-built store vs the
   full-corpus ``q_text_bm25_topk`` plan. The store amortizes
   tokenization (done once at ingest) and partition-prunes the
   postings scan to the query terms' tok_buckets; the full plan
   re-tokenizes the corpus per query batch.
2. APPEND: indexing a 1/8 delta into an existing store vs rebuilding
   the index over the grown corpus — the O(|delta|) story, same
   framing as ``ab_ivf_append.py``.

Shared ``scripts/ab_lib.py`` schedule: untimed warm-up, interleaved
arms.

Usage: python scripts/ab_bm25_store.py [sf_dir] [reps]
(defaults /root/testdata/sf0.1, 3)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import ab_lib  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table  # noqa: E402
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.bm25_index import (  # noqa: E402
    Bm25Index,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.plans.text_queries import (  # noqa: E402
    BM25_QUERIES,
    BM25_TOP,
    q_text_bm25_topk,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.session import get_spark  # noqa: E402

QUERIES = list(BM25_QUERIES)


def _rows(df):
    return [(r.query_id, r.doc_id, repr(r.score), r.rank) for r in df.collect()]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = get_spark()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    work = tempfile.mkdtemp(prefix="ab_bm25_")
    try:
        # -- query: store topk vs full-corpus plan -----------------------
        store = Bm25Index(spark, os.path.join(work, "idx"))
        store.append(docs, "all")

        def store_topk(_ctx):
            return _rows(store.topk(QUERIES, k=BM25_TOP))

        def full_query(_ctx):
            return _rows(q_text_bm25_topk(spark, sf_dir))

        timings, last = ab_lib.warmup_interleaved(
            {"store_topk": store_topk, "full_query": full_query}, reps
        )
        assert last["store_topk"] == last["full_query"], "rows diverged"
        print(f"\nQUERY sf_dir={sf_dir} docs={n_docs} reps={reps}")
        print(ab_lib.summarize(timings))

        # -- ingest: delta append vs full rebuild -------------------------
        base = docs.filter(F.col("doc_id") % 8 != 0)
        delta = docs.filter(F.col("doc_id") % 8 == 0)
        n_delta = delta.count()
        seq = [0]

        def setup(_rep):
            seq[0] += 1
            d = os.path.join(work, f"ing{seq[0]}")
            appended = Bm25Index(spark, os.path.join(d, "app"))
            appended.append(base, "base")
            return d

        def append_delta(d):
            idx = Bm25Index(spark, os.path.join(d, "app"))
            idx.append(delta, "delta")
            return idx.stats()["n_docs"]

        def rebuild_all(d):
            idx = Bm25Index(spark, os.path.join(d, "reb"))
            idx.append(docs, "all")
            return idx.stats()["n_docs"]

        timings, last = ab_lib.warmup_interleaved(
            {"append_delta": append_delta, "rebuild_all": rebuild_all},
            reps,
            setup=setup,
        )
        assert last["append_delta"] == last["rebuild_all"] == n_docs
        print(
            f"\nINGEST sf_dir={sf_dir} base={n_docs - n_delta} "
            f"delta={n_delta} reps={reps}"
        )
        print(ab_lib.summarize(timings))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
