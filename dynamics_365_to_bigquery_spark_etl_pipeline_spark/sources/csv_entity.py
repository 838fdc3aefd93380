"""CSV entity source (SURVEY.md S1/S2/S7/S8).

The reference reads an entity as "all CSVs in a folder" with inferred
schema (``helper_functions.py:115``) and prunes incremental files
driver-side by object creation time (``incremental_etl_v1.py:73-77``).

Spark-first re-expression:
- **Explicit schema first.** ``inferSchema`` double-scans every file —
  fatal at 100 TB. ``read_entity`` takes a schema; ``infer_entity_schema``
  exists for bootstrap but samples a bounded number of files.
- **File pruning stays driver-side** (the reference's one good scale
  trick): we list the directory, filter by mtime > watermark, and hand
  Spark an explicit file list, so unchanged files are never opened.
  On a real object store this is the same listing call; at very large
  file counts you partition the landing zone by ingest date instead and
  let Catalyst prune partitions.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CSV_OPTIONS = {
    "header": "true",
    "multiLine": "true",
    "quote": '"',
    "escape": '"',
}


@dataclass(frozen=True)
class EntityFile:
    path: str
    mtime: float  # seconds since epoch (stand-in for object creation time)


def list_entity_files(entity_dir: str) -> list[EntityFile]:
    """Driver-side listing of an entity folder (S7)."""
    out = []
    for name in sorted(os.listdir(entity_dir)):
        if name.endswith(".csv"):
            p = os.path.join(entity_dir, name)
            out.append(EntityFile(p, os.path.getmtime(p)))
    return out


def prune_files(files: list[EntityFile], watermark: float | None) -> list[EntityFile]:
    """Incremental pruning (S8): only files newer than the watermark."""
    if watermark is None:
        return list(files)
    return [f for f in files if f.mtime > watermark]


def infer_entity_schema(
    spark: SparkSession, paths: list[str], sample_files: int = 4
) -> T.StructType:
    """Bootstrap-only schema inference over a bounded sample of files."""
    sample = paths[:sample_files]
    return (
        spark.read.options(**CSV_OPTIONS)
        .option("inferSchema", "true")
        .csv(sample)
        .schema
    )


def read_entity(
    spark: SparkSession,
    paths: list[str],
    schema: T.StructType | None = None,
    capture_corrupt: bool = False,
) -> DataFrame:
    """Read an explicit file list as one DataFrame (S1/S2).

    ``capture_corrupt`` (requires an explicit schema) adds a
    ``_corrupt_record`` column holding the raw text of unparseable rows
    (PERMISSIVE mode) instead of silently nulling them — the quarantine
    pattern; the reference has no malformed-row story at all."""
    reader = spark.read.options(**CSV_OPTIONS)
    if schema is not None:
        if capture_corrupt:
            schema = T.StructType(
                list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
            )
            reader = reader.option("mode", "PERMISSIVE").option(
                "columnNameOfCorruptRecord", "_corrupt_record"
            )
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(paths)


def split_corrupt(df: DataFrame):
    """(clean_rows, quarantined_rows) from a capture_corrupt read.

    Spark refuses to filter on ``_corrupt_record`` straight off a CSV
    scan (the raw line is only available while parsing), so the frame
    is cached first — at scale you land the parsed batch once and split
    from the materialized table instead."""
    from pyspark.sql import functions as F

    df = df.cache()
    clean = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select("_corrupt_record")
    return clean, bad
