#!/usr/bin/env python
"""A/B: the unified ingest pipeline vs the chained standalone legs.

The r11 legs compose dir-to-dir: quality gate ``kept/`` is the
decontamination gate's file source, whose ``clean/`` feeds the dedup
index leg — three triggers, three checkpoints, two intermediate
materializations per surviving row. ``streaming/ingest_pipeline.py``
(r12) runs the same three stages inside ONE foreachBatch. Both shapes
land identical artifacts (pytest-pinned equivalence in
tests/test_stream_ingest_pipeline.py); this harness measures the
fixed-cost difference — at these SFs every leg is
choreography-bound (~1-1.5 s/epoch of trigger + commit + writes;
SCALING.md r11), so the unified arm's saving should approach the two
dropped legs' fixed costs and GROW with epoch count, not data size.

Arms (shared ``scripts/ab_lib.py`` schedule — untimed warm-up cycle,
then interleaved per cycle; each arm builds its own fresh out/index/
checkpoint dirs per run, the source dir is shared and read-only):

- ``unified`` — one stream_ingest_pipeline drain
- ``chained`` — stream_quality_gate drain, then stream_decontaminate
  drain over kept/, then stream_dedup_index drain over clean/

Both drains are availableNow with maxFilesPerTrigger=1 over the same
N source files. Clean-corpus row counts are asserted equal per cycle.

Usage: python scripts/ab_ingest_pipeline.py [sf_dir] [reps] [files]
(defaults /root/testdata/sf0.1, 3, 4)
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
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.session import get_spark  # noqa: E402
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.cdc_stream import (  # noqa: E402
    stream_dedup_index,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.decontaminate import (  # noqa: E402
    stream_decontaminate,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.ingest_pipeline import (  # noqa: E402
    stream_ingest_pipeline,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.quality_gate import (  # noqa: E402
    stream_quality_gate,
)

MIN_SCORE = 50
NGRAM_N = 4
JACC = 0.5
TIMEOUT = 900


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    spark = get_spark()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    heldout = docs.filter(F.col("doc_id") % 13 == 0)
    train = docs.filter(F.col("doc_id") % 13 != 0)
    schema = train.schema
    n_train = train.count()

    work = tempfile.mkdtemp(prefix="ab_ingest_")
    src = os.path.join(work, "src")
    for i in range(n_files):
        train.filter(F.col("doc_id") % n_files == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    seq = [0]

    def fresh() -> str:
        seq[0] += 1
        d = os.path.join(work, f"run{seq[0]}")
        os.makedirs(d)
        return d

    def drain(q) -> None:
        if not q.awaitTermination(TIMEOUT):
            q.stop()
            raise RuntimeError(f"drain exceeded {TIMEOUT}s")

    def unified(_ctx) -> int:
        d = fresh()
        drain(
            stream_ingest_pipeline(
                spark, src, schema, heldout, os.path.join(d, "out"),
                os.path.join(d, "idx"), os.path.join(d, "ck"),
                min_score=MIN_SCORE, n=NGRAM_N, jaccard_min=JACC,
                max_files_per_trigger=1,
            )
        )
        return spark.read.parquet(os.path.join(d, "out", "clean")).count()

    def chained(_ctx) -> int:
        d = fresh()
        out_q = os.path.join(d, "q")
        drain(
            stream_quality_gate(
                spark, src, schema, out_q, os.path.join(d, "ck_q"),
                min_score=MIN_SCORE, max_files_per_trigger=1,
            )
        )
        out_d = os.path.join(d, "dec")
        drain(
            stream_decontaminate(
                spark, os.path.join(out_q, "kept"), schema, heldout,
                out_d, os.path.join(d, "ck_d"),
                n=NGRAM_N, max_files_per_trigger=1,
            )
        )
        drain(
            stream_dedup_index(
                spark, os.path.join(out_d, "clean"), schema,
                os.path.join(d, "idx"), os.path.join(d, "pairs"),
                os.path.join(d, "ck_i"),
                jaccard_min=JACC, max_files_per_trigger=1,
            )
        )
        return spark.read.parquet(os.path.join(out_d, "clean")).count()

    try:
        timings, last = ab_lib.warmup_interleaved(
            {"unified": unified, "chained": chained}, reps
        )
        assert last["unified"] == last["chained"], (
            f"clean corpora differ: {last}"
        )
        print(
            f"\nsf_dir={sf_dir} train_docs={n_train} files={n_files} "
            f"reps={reps} clean_rows={last['unified']}"
        )
        print(ab_lib.summarize(timings))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
