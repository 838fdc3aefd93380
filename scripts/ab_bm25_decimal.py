#!/usr/bin/env python
"""A/B: BM25 topk under score_mode='int64' vs 'decimal38' (r15, r14
verdict #5) — the PRICE of the r14 auto-widen, so a user whose store
crosses the int64 product line knows what happened to their topk
latency.

Two same-shape stores over the same corpus (same appends, same
postings layout); one has its meta doctored to score_mode='decimal38'
— the r14-pinned in-range bit-identity means the ROWS are identical
(asserted per cycle), only the score arithmetic differs: exact
decimal(38,0) products vs native long products, one IEEE double
division either way.

Shared ``scripts/ab_lib.py`` schedule: untimed warm-up, interleaved
arms.

Usage: python scripts/ab_bm25_decimal.py [sf_dir] [reps]
(defaults /root/testdata/sf0.1, 5)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import ab_lib  # noqa: E402

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table  # noqa: E402
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.bm25_index import (  # noqa: E402
    Bm25Index,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.plans.text_queries import (  # noqa: E402
    BM25_QUERIES,
    BM25_TOP,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.session import get_spark  # noqa: E402

QUERIES = list(BM25_QUERIES)


def _rows(df):
    return [(r.query_id, r.doc_id, repr(r.score), r.rank) for r in df.collect()]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    spark = get_spark()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    work = tempfile.mkdtemp(prefix="ab_bm25_dec_")
    try:
        a = Bm25Index(spark, os.path.join(work, "i64"))
        b = Bm25Index(spark, os.path.join(work, "d38"))
        a.append(docs, "all")
        b.append(docs, "all")
        meta_path = os.path.join(b.path, "_bm25_meta.json")
        with open(meta_path) as fh:
            meta = json.load(fh)
        meta["score_mode"] = "decimal38"
        with open(meta_path, "w") as fh:
            json.dump(meta, fh)
        assert a.stats()["score_mode"] == "int64"
        assert b.stats()["score_mode"] == "decimal38"

        # every cycle's rows (warm-up included) are kept and compared
        # pairwise after the run — the identity holds for EVERY cycle,
        # not just the last, without the comparison cost landing inside
        # either arm's timed wall (r15 review pass 2)
        seen: dict[str, list] = {"topk_int64": [], "topk_decimal38": []}

        def topk_int64(_ctx):
            out = _rows(a.topk(QUERIES, k=BM25_TOP))
            seen["topk_int64"].append(out)
            return out

        def topk_decimal38(_ctx):
            out = _rows(b.topk(QUERIES, k=BM25_TOP))
            seen["topk_decimal38"].append(out)
            return out

        timings, _last = ab_lib.warmup_interleaved(
            {"topk_int64": topk_int64, "topk_decimal38": topk_decimal38},
            reps,
        )
        assert len(seen["topk_int64"]) == len(seen["topk_decimal38"]) > 0
        for cyc, (ra, rb) in enumerate(
            zip(seen["topk_int64"], seen["topk_decimal38"])
        ):
            assert ra == rb, (
                f"in-range topk must be bit-identical across modes "
                f"(cycle {cyc})"
            )
        print(
            f"\nsf_dir={sf_dir} docs={n_docs} queries={len(QUERIES)} "
            f"k={BM25_TOP} reps={reps}"
        )
        print(ab_lib.summarize(timings))
        m_a = statistics.median(timings["topk_int64"])
        m_b = statistics.median(timings["topk_decimal38"])
        print(
            json.dumps(
                {
                    "topk_int64_med_sec": round(m_a, 3),
                    "topk_decimal38_med_sec": round(m_b, 3),
                    "decimal_over_int64": round(m_b / m_a, 2),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
