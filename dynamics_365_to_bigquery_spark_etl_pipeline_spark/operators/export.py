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

# ONE source of truth for the export hash scheme — the oracle-verified
# query family (plans/export_queries.py) imports these same names, so
# the logical split/shard queries and this physical writer can never
# silently diverge in assignment.
SEED = "seed42"
N_SHARDS = 8
# hash buckets are 0..99: 80 train / 10 val / 10 test
TRAIN_HI, VAL_HI = 80, 90


def hash_bucket(id_col, mod: int, seed: str = SEED):
    """Deterministic uniform bucket in [0, mod): first 8 hex chars of
    md5(id || seed) as a 32-bit int, mod ``mod``. Engine-portable: the
    SQL twin is CAST('0x' || substr(md5(..), 1, 8) AS UBIGINT) % mod."""
    h32 = F.conv(
        F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(seed))), 1, 8),
        16,
        10,
    ).cast("long")
    return h32 % mod


def hash_bucket_sql(id_expr: str, mod: int, seed: str = SEED) -> str:
    """DuckDB twin of :func:`hash_bucket` — same bytes, same buckets."""
    return (
        f"CAST(CAST('0x' || substr(md5(CAST({id_expr} AS VARCHAR) || '{seed}'), 1, 8)"
        f" AS UBIGINT) AS BIGINT) % {mod}"
    )


def split_expr(id_col, seed: str = SEED):
    """train/val/test column from the shared bucket scheme."""
    b = hash_bucket(id_col, 100, seed=seed)
    return (
        F.when(b < TRAIN_HI, "train").when(b < VAL_HI, "val").otherwise("test")
    )


def assign_export_keys(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = SEED,
    n_shards: int = N_SHARDS,
) -> DataFrame:
    """Add deterministic ``split`` / ``shard_id`` / ``shuffle_key``
    columns from a seeded md5 of the id — stable across reruns,
    repartitionings, and engines (rand() is none of those under
    speculative re-execution or AQE re-plans). Uses the same
    ``hash_bucket`` / split thresholds as the query family above."""
    return df.select(
        "*",
        split_expr(F.col(id_col), seed=seed).alias("split"),
        hash_bucket(F.col(id_col), n_shards, seed=seed).alias("shard_id"),
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(seed))).alias(
            "shuffle_key"
        ),
    )


def write_training_shards(
    df: DataFrame,
    out: str,
    id_col: str = "doc_id",
    seed: str = "seed42",
    n_shards: int = 8,
    fmt: str = "parquet",
) -> dict:
    """Export ``df`` as split/shard files in deterministic shuffle
    order and return (and persist) a manifest. ``fmt`` is ``parquet``
    or ``jsonl`` (newline-delimited JSON — the interchange format most
    LLM training loaders consume).

    Manifest row counts: the parquet path reads them from the written
    FOOTERS — a driver-side metadata walk, no second Spark pass. JSONL
    has no footer, so that path pays ONE extra bounded aggregate
    (per-(split, shard) counts — at most splits x shards rows on the
    driver), never a per-line driver read. Either way a dataloader (or
    a resumed export) can verify completeness without opening data."""
    if fmt not in ("parquet", "jsonl"):
        raise ValueError(f"fmt={fmt!r}: expected 'parquet' or 'jsonl'")
    keyed = assign_export_keys(df, id_col=id_col, seed=seed, n_shards=n_shards)
    writer = (
        keyed.repartition("split", "shard_id")
        .sortWithinPartitions("split", "shard_id", "shuffle_key")
        .write.mode("overwrite")
        .partitionBy("split", "shard_id")
    )
    if fmt == "parquet":
        writer.parquet(out)
    else:
        writer.json(out)

    jsonl_counts: dict[tuple[str, str], int] = {}
    if fmt == "jsonl":
        jsonl_counts = {
            (r["split"], str(r["shard_id"])): r["n"]
            for r in keyed.groupBy("split", "shard_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }

    suffix = ".parquet" if fmt == "parquet" else ".json"
    files = []
    seen_dirs: set[str] = set()
    for root, _dirs, names in sorted(os.walk(out)):
        for name in sorted(names):
            if not name.endswith(suffix):
                continue
            rel = os.path.relpath(os.path.join(root, name), out)
            if fmt == "parquet":
                md = pq.read_metadata(os.path.join(root, name))
                n_rows = md.num_rows
            else:
                # the group count stands in for the (footer-less) file
                # count ONLY under the one-file-per-(split, shard)
                # invariant the repartition above establishes — if a
                # writer option (e.g. maxRecordsPerFile) ever splits a
                # dir, fail loudly instead of double-counting. The
                # counts also come from a second evaluation of `keyed`,
                # which is deterministic by construction (seeded md5
                # keys, no rand()).
                if root in seen_dirs:
                    raise RuntimeError(
                        f"jsonl export wrote multiple data files under "
                        f"{root}; per-file manifest counts require one "
                        "file per (split, shard) dir"
                    )
                seen_dirs.add(root)
                parts = dict(
                    p.split("=", 1) for p in rel.split(os.sep)[:-1] if "=" in p
                )
                n_rows = jsonl_counts[(parts["split"], parts["shard_id"])]
            files.append({"path": rel, "n_rows": n_rows})
    manifest = {
        "seed": seed,
        "n_shards": n_shards,
        "id_col": id_col,
        "fmt": fmt,
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
