#!/usr/bin/env python
"""A/B: single-key clustered layout vs Z-order, measured at sf1.

``tests/test_zorder.py`` proves the footer-stats geometry (files cover
hyper-rectangles); this script measures what that buys an actual Spark
scan: the same selective predicate timed against (a) a layout
range-sorted on the LEADING key only and (b) a Z-ordered layout on both
keys, over sf1 lineitem (6M rows, 64 files each).

Three probes per layout:
  lead:  l_orderkey in a 1/16 range   (both layouts should prune)
  trail: l_quantity in a ~1/16 band   (only Z-order has trailing-dim
                                       locality; single-key reads all)
  box:   both predicates together

Reported per probe: wall seconds (median of reps) and the number of
files whose footer [min,max] intersects the predicate — the I/O the
stats allow skipping. Spark's parquet reader applies the pushed filter
per row group, so pruned files cost ~open+footer only.

Usage::

    python scripts/ab_zorder.py [--sf-dir /root/repo/localdata/sf1]
                                [--files 64] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.session import get_spark  # noqa: E402


def file_hits(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
    import pyarrow.parquet as pq

    total = hits = 0
    for name in os.listdir(path):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        if md.num_rows == 0:
            continue
        idx = md.schema.to_arrow_schema().get_field_index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        total += 1
        if not (max(maxs) < lo or min(mins) > hi):
            hits += 1
    return hits, total


def timed(fn, reps: int) -> float:
    vals = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        vals.append(time.time() - t0)
    return round(statistics.median(vals), 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/localdata/sf1")
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dynamics_365_to_bigquery_spark_etl_pipeline_spark import sinks
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table

    spark = get_spark("ab-zorder")
    # second dim is l_quantity, NOT l_partkey: the scale fixtures are
    # shifted-copy replicas, so every shifted key is ~0.99-correlated
    # with every other at the macro level (a narrow partkey range lives
    # in one copy = one narrow orderkey range) and the single-key
    # layout would accidentally prune it. l_quantity is unshifted and
    # corr(l_orderkey, l_quantity) ~= 0 -- a genuine trailing dim, and
    # the realistic "filter on a measure band" shape.
    li = load_table(spark, args.sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    okey_max = li.agg(F.max("l_orderkey")).collect()[0][0]
    o_lo, o_hi = 0, okey_max // 16
    q_lo, q_hi = 1.0, 4.0  # ~1/16 of the [1, 50] quantity domain

    work = tempfile.mkdtemp(prefix="ab_zorder_")
    lin, zed = os.path.join(work, "lin"), os.path.join(work, "zed")
    try:
        t0 = time.time()
        sinks.write_clustered(li, lin, ["l_orderkey"], n_files=args.files)
        t_lin = round(time.time() - t0, 1)
        t0 = time.time()
        sinks.write_zordered(li, zed, ["l_orderkey", "l_quantity"], n_files=args.files)
        t_zed = round(time.time() - t0, 1)

        probes = {
            "lead": (F.col("l_orderkey").between(o_lo, o_hi), ("l_orderkey", o_lo, o_hi)),
            "trail": (F.col("l_quantity").between(q_lo, q_hi), ("l_quantity", q_lo, q_hi)),
        }
        out: dict = {"write_sec": {"lin": t_lin, "zed": t_zed}}
        for pname, (pred, (col, lo, hi)) in probes.items():
            for lname, path in (("lin", lin), ("zed", zed)):
                sec = timed(
                    lambda: spark.read.parquet(path)
                    .filter(pred)
                    .agg(F.sum("l_extendedprice"))
                    .collect(),
                    args.reps,
                )
                hits, total = file_hits(path, col, lo, hi)
                out[f"{pname}_{lname}"] = {"sec": sec, "files": f"{hits}/{total}"}
        box = F.col("l_orderkey").between(o_lo, o_hi) & F.col("l_quantity").between(
            q_lo, q_hi
        )
        for lname, path in (("lin", lin), ("zed", zed)):
            sec = timed(
                lambda: spark.read.parquet(path)
                .filter(box)
                .agg(F.sum("l_extendedprice"))
                .collect(),
                args.reps,
            )
            out[f"box_{lname}"] = {"sec": sec}
        # sanity: layouts agree -- count (exact) + decimal-cast sum
        # (double sums are order-dependent across layouts, decimals not)
        exact = F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        a = spark.read.parquet(lin).filter(box).agg(F.count("*"), exact).collect()[0]
        b = spark.read.parquet(zed).filter(box).agg(F.count("*"), exact).collect()[0]
        out["results_equal"] = bool(tuple(a) == tuple(b))
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
