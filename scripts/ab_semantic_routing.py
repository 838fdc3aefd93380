#!/usr/bin/env python
"""A/B benchmark: raw SemDeDup kernel (``semantic_dedup_pairs``:
argmax assignment + chunked within-cluster BLAS over EVERY member) vs
the r8 routed form (``semantic_dedup_pairs_deduped``: exact vector
dedup -> assignment + kernel over representatives -> output-linear
fan-out).

Both legs run over the registered query's clone-heavy corpus
(``_embedding_corpus``: fixture + injected verbatim + nudged copies; at
sf1 in ``localdata`` the fixture itself is a 10x clone of sf0.1, which
is exactly the replication the routing targets). Prints ONE JSON line
with wall times and a pair-set fingerprint (count + hashsum over
(cluster_id, id_a, id_b) — sim excluded: it is float64 from BLAS, and
the pytest equivalence tests pin it to <=1e-12 separately), the
committed source of the SCALING.md round-8 numbers.

    python scripts/ab_semantic_routing.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table  # noqa: E402
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.similarity import (  # noqa: E402
    semantic_dedup_pairs,
    semantic_dedup_pairs_deduped,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.plans.dedup_queries import (  # noqa: E402
    COSINE_DUP_MIN,
    SEM_CENTROIDS,
    _embedding_corpus,
    _semantic_jvm_pairs_raw,
    q_dedup_semantic,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.session import get_spark  # noqa: E402


def fingerprint(df):
    """Order-insensitive pair-set fingerprint: count + modular hashsum
    (pmod before sum — a raw sum of xxhash64 overflows bigint under
    ANSI at sf1 pair counts)."""
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.pmod(
                F.xxhash64("cluster_id", "id_a", "id_b"), F.lit(1_000_000_007)
            )
        ).alias("h"),
    ).collect()[0]
    return int(row.n), int(row.h or 0)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("d365-spark-ab-semantic")
    spark.sparkContext.setLogLevel("ERROR")

    corpus = _embedding_corpus(spark, sf_dir)
    seeds = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .filter(F.col("vec_id") < SEM_CENTROIDS)
    )

    legs = {
        # the registered-form (JVM cosine) pair: the r7 sweep's 189.6 s
        # row was jvm_raw — jvm_routed is what q_dedup_semantic now runs
        "jvm_raw": lambda: _semantic_jvm_pairs_raw(spark, sf_dir),
        "jvm_routed": lambda: q_dedup_semantic(spark, sf_dir),
        # the production BLAS kernel pair (sim column dropped for the
        # shared fingerprint)
        "kernel_raw": lambda: semantic_dedup_pairs(
            corpus, seeds, COSINE_DUP_MIN
        ).drop("sim"),
        "kernel_routed": lambda: semantic_dedup_pairs_deduped(
            corpus, seeds, COSINE_DUP_MIN
        ).drop("sim"),
    }
    out = {"sf_dir": sf_dir, "reps": reps}
    for name, build in legs.items():
        fingerprint(build())  # warm-up rep (JIT + shuffle dirs)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            n, h = fingerprint(build())
            times.append(time.perf_counter() - t0)
        out[name] = {
            "median_s": round(statistics.median(times), 2),
            "min_s": round(min(times), 2),
            "max_s": round(max(times), 2),
            "pairs": n,
            "hashsum": h,
        }
    out["identical_pairs"] = (
        len({(out[k]["pairs"], out[k]["hashsum"]) for k in legs}) == 1
    )
    out["jvm_speedup"] = round(
        out["jvm_raw"]["median_s"] / out["jvm_routed"]["median_s"], 1
    )
    out["kernel_speedup"] = round(
        out["kernel_raw"]["median_s"] / out["kernel_routed"]["median_s"], 1
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
