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


def positive_int(value: str) -> int:
    """argparse type for flags where 0 must be an ERROR, not a silent
    no-op (r7 advice: --compact-buckets 0 fell through a truthiness
    check — a user expecting 'compact everything' got no compaction and
    no message)."""
    n = int(value)
    if n < 1:
        raise argparse.ArgumentTypeError(
            f"must be >= 1 (got {n}); to compact every bucket pass 2 "
            "(a 1-file bucket is already compact)"
        )
    return n


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
    p.add_argument(
        "--rollup",
        default=None,
        metavar="KEYS:VALUE[:AGGS]",
        help="maintain a grouped rollup beside each snapshot, e.g. "
        "'_company:amount' or '_company:amount:sum,count,avg,min,max' "
        "(min/max switch incremental runs to a logged recompute — they "
        "have no retraction)",
    )
    p.add_argument(
        "--compact-target-mb",
        type=int,
        default=None,
        metavar="N",
        help="after a successful run, bin-pack each processed entity's "
        "sink into ~N MiB files (published as a new version through "
        "the same atomic commit; streaming/micro-batch sinks accrete "
        "a file per batch without this)",
    )
    p.add_argument(
        "--cluster-by",
        default=None,
        metavar="col1[,col2...]",
        help="after a successful run, rewrite each processed entity's "
        "sink clustered on these columns (one column: range sort; "
        "several: Z-order) so parquet min/max stats prune scans; "
        "bin-packs files too, so it supersedes --compact-target-mb",
    )
    p.add_argument(
        "--compact-buckets",
        type=positive_int,
        default=None,
        metavar="MIN_FILES",
        help="(bucketed sinks) after a successful run, rewrite each "
        "bucket holding >= MIN_FILES parquet files down to one file "
        "(crash-safe two-phase swap; O(fragmented buckets), not "
        "O(table)) — the bucketed twin of --compact-target-mb",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    from .pipeline import EntityPipeline
    from .session import get_spark

    args = build_parser().parse_args(argv)
    tie = tuple(c for c in args.tie_breakers.split(",") if c)
    rollup = None
    if args.rollup:
        parts = args.rollup.split(":")
        if len(parts) not in (2, 3):
            print(json.dumps({"status": "error", "error": "bad --rollup format"}))
            return 1
        rollup = {"keys": parts[0].split(","), "value": parts[1]}
        if len(parts) == 3:
            rollup["aggs"] = tuple(parts[2].split(","))
    if args.cluster_by and args.compact_target_mb:
        print(
            json.dumps(
                {
                    "status": "error",
                    "error": "--cluster-by already bin-packs; drop "
                    "--compact-target-mb",
                }
            )
        )
        return 1
    if (args.compact_target_mb or args.cluster_by) and args.bucket_partitions:
        # the bucketed layout has its own delta-touched-bucket rewrite;
        # whole-table compaction is a pointer-sink maintenance op
        print(
            json.dumps(
                {
                    "status": "error",
                    "error": "--compact-target-mb applies to pointer sinks; "
                    "use --compact-buckets for bucketed sinks",
                }
            )
        )
        return 1
    if args.compact_buckets and not args.bucket_partitions:
        print(
            json.dumps(
                {
                    "status": "error",
                    "error": "--compact-buckets requires --bucket-partitions; "
                    "pointer sinks compact with --compact-target-mb",
                }
            )
        )
        return 1
    spark = get_spark("d365-etl")
    pipe = EntityPipeline(
        spark,
        args.landing_dir,
        args.sink_dir,
        args.state_dir,
        tie_breakers=tie,
        bucket_partitions=args.bucket_partitions,
        rollup=rollup,
    )
    results = pipe.run(only=args.entities or None)
    if args.compact_target_mb:
        from . import sinks

        for r in results:
            if r["status"] != "ok":
                continue
            out = pipe._sink_path(r["entity"])
            n = sinks.compact(
                spark, out, target_bytes=args.compact_target_mb * 1024 * 1024
            )
            r["compacted_files"] = n
    if args.cluster_by:
        from . import sinks

        cols = [c for c in args.cluster_by.split(",") if c]
        for r in results:
            if r["status"] != "ok":
                continue
            n = sinks.recluster(spark, pipe._sink_path(r["entity"]), cols)
            r["reclustered_files"] = n
    if args.compact_buckets:
        for r in results:
            if r["status"] != "ok":
                continue
            r["compacted_buckets"] = pipe.compact_buckets(
                r["entity"], min_files=args.compact_buckets
            )
    for r in results:
        print(json.dumps(r))
    return 1 if any(r["status"] == "error" for r in results) else 0


if __name__ == "__main__":
    sys.exit(main())
