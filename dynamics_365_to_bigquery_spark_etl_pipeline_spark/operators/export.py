"""Physical training-shard export: the write-side twin of
``plans/export_queries.py`` (reference scope note: the reference's final
step is a warehouse table overwrite, ``incremental_etl_v1.py:154-178``;
a training pipeline's final step is split/shard FILES in dataloader
order).

Layout: ``out/split=<s>/shard_id=<k>/part-*.parquet`` — hive-style
partition dirs, so a trainer reading one split partition-prunes the
others at the scan (no file listing of train/ when reading val/).

One file per (split, shard): all rows of a pair land in one task
(``repartition(split, shard_id)``), and each task writes one file per
partition dir it holds. Rows inside a file are sorted by the seeded
shuffle key — the dataloader reads sequentially and still sees a
deterministic global permutation. Every step is a per-row hash or a
single hash-shuffle: no global sort, no driver materialization.
"""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, functions as F

MANIFEST_NAME = "_export_manifest.json"


def assign_export_keys(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "seed42",
    n_shards: int = 8,
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Add deterministic ``split`` / ``shard_id`` / ``shuffle_key``
    columns from a seeded md5 of the id — stable across reruns,
    repartitionings, and engines (rand() is none of those under
    speculative re-execution or AQE re-plans)."""
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(seed)))
    h32 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    b = h32 % 100
    return df.select(
        "*",
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test")
        .alias("split"),
        (h32 % n_shards).alias("shard_id"),
        h.alias("shuffle_key"),
    )


def write_training_shards(
    df: DataFrame,
    out: str,
    id_col: str = "doc_id",
    seed: str = "seed42",
    n_shards: int = 8,
) -> dict:
    """Export ``df`` as split/shard parquet files in deterministic
    shuffle order and return (and persist) a manifest.

    The manifest is built from the written parquet FOOTERS — a
    driver-side metadata walk, not a second Spark pass over the data —
    and records per-file row counts so a dataloader (or a resumed
    export) can verify completeness without opening data pages."""
    keyed = assign_export_keys(df, id_col=id_col, seed=seed, n_shards=n_shards)
    (
        keyed.repartition("split", "shard_id")
        .sortWithinPartitions("split", "shard_id", "shuffle_key")
        .write.mode("overwrite")
        .partitionBy("split", "shard_id")
        .parquet(out)
    )
    files = []
    for root, _dirs, names in sorted(os.walk(out)):
        for name in sorted(names):
            if not name.endswith(".parquet"):
                continue
            rel = os.path.relpath(os.path.join(root, name), out)
            md = pq.read_metadata(os.path.join(root, name))
            files.append({"path": rel, "n_rows": md.num_rows})
    manifest = {
        "seed": seed,
        "n_shards": n_shards,
        "id_col": id_col,
        "n_rows": sum(f["n_rows"] for f in files),
        "files": files,
    }
    tmp = os.path.join(out, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, os.path.join(out, MANIFEST_NAME))
    return manifest


def read_split(spark, out: str, split: str) -> DataFrame:
    """Read one split. The ``split=...`` filter hits the hive partition
    column, so Spark prunes the other splits' directories at planning
    time (PartitionFilters, no data files listed or read)."""
    return spark.read.parquet(out).filter(F.col("split") == split)
