"""Executable entry point — the reference's outermost surface (E1/E2:
``run_etl.sh:3-7`` submitting the job, argv table selection in the main
loop at ``incremental_etl_v1.py:37-46``) as a module CLI::

    python -m dynamics_365_to_bigquery_spark_etl_pipeline_spark \\
        <landing_dir> <sink_dir> <state_dir> [entity ...] \\
        [--bucket-partitions N] [--tie-breakers col1,col2]

With no entity arguments every entity folder under ``landing_dir`` is
processed (the reference's default loop); naming entities restricts the
run to that subset (S9). Prints one JSON status line per entity and
exits non-zero if any entity failed — failed entities keep their old
watermark and are retried on the next invocation.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m dynamics_365_to_bigquery_spark_etl_pipeline_spark",
        description="Incremental CDC ETL: landing-zone CSV deltas -> parquet sink.",
    )
    p.add_argument("landing_dir", help="landing zone with one folder of CSVs per entity")
    p.add_argument("sink_dir", help="output root; one parquet table per entity")
    p.add_argument("state_dir", help="watermark state directory")
    p.add_argument(
        "entities",
        nargs="*",
        help="optional entity subset (default: every folder in landing_dir)",
    )
    p.add_argument(
        "--bucket-partitions",
        type=int,
        default=None,
        help="hash-bucket the sink on the CDC key; incremental runs "
        "rewrite only delta-touched buckets",
    )
    p.add_argument(
        "--tie-breakers",
        default="",
        help="comma-separated extra ORDER BY columns for deterministic "
        "latest-version-per-key resolution",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    from .pipeline import EntityPipeline
    from .session import get_spark

    args = build_parser().parse_args(argv)
    tie = tuple(c for c in args.tie_breakers.split(",") if c)
    spark = get_spark("d365-etl")
    pipe = EntityPipeline(
        spark,
        args.landing_dir,
        args.sink_dir,
        args.state_dir,
        tie_breakers=tie,
        bucket_partitions=args.bucket_partitions,
    )
    results = pipe.run(only=args.entities or None)
    for r in results:
        print(json.dumps(r))
    return 1 if any(r["status"] == "error" for r in results) else 0


if __name__ == "__main__":
    sys.exit(main())
