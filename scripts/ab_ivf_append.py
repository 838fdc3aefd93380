#!/usr/bin/env python
"""A/B: O(delta) IVF append vs full rebuild (r9 verdict #2 'Done'
criterion: measured append cost << rebuild at sf1).

Builds the store on 95% of the sf1 embeddings, then (a) appends the
remaining 5% as a delta batch and (b) full-rebuilds on 100%, timing
both; finally proves probe equivalence (append-store top-k == rebuild
top-k) on a query sample so the speed claim is for the SAME answer.

Usage: python scripts/ab_ivf_append.py [sf_dir]  (default localdata/sf1)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table  # noqa: E402
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import similarity as S  # noqa: E402
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.ivf_store import (  # noqa: E402
    IvfLayoutStore,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "localdata", "sf1")
    spark = get_spark("ab-ivf-append")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings").localCheckpoint()
    n = emb.count()
    base = emb.filter(F.col("vec_id") % 20 != 0)
    delta = emb.filter(F.col("vec_id") % 20 == 0)
    print(f"corpus {n} vectors; base {base.count()}, delta {delta.count()}")

    seeds = emb.filter(F.col("vec_id") < 64)
    cents = S.refine_centroids(emb, seeds).localCheckpoint()

    root = tempfile.mkdtemp(prefix="ab_ivf_append_")
    try:
        inc = IvfLayoutStore(spark, os.path.join(root, "inc"))
        t0 = time.perf_counter()
        inc.build(base, cents)
        t_build_base = time.perf_counter() - t0

        t0 = time.perf_counter()
        drift = inc.append(delta, "delta")
        t_append = time.perf_counter() - t0

        full = IvfLayoutStore(spark, os.path.join(root, "full"))
        t0 = time.perf_counter()
        full.build(emb, cents)
        t_rebuild = time.perf_counter() - t0

        queries = emb.filter(F.col("vec_id") % 500 == 0)
        a = sorted(tuple(r) for r in inc.topk(queries, k=10, nprobe=4).collect())
        b = sorted(tuple(r) for r in full.topk(queries, k=10, nprobe=4).collect())
        print(f"probe rows: append-store {len(a)}, rebuild {len(b)}, "
              f"equal: {a == b}")
        print(
            f"base build {t_build_base:.1f}s | append(5%) {t_append:.1f}s | "
            f"full rebuild {t_rebuild:.1f}s | rebuild/append = "
            f"{t_rebuild / t_append:.1f}x | drift {drift['degradation']:.4f} "
            f"needs_retrain={drift['needs_retrain']}"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
