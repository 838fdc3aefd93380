"""Training-data EXPORT surface: the last mile of an LLM data pipeline
(reference scope note: the reference ships tables to a warehouse,
`incremental_etl_v1.py:154-178`; a training pipeline ships SHARDS to a
trainer, so this family covers the operations between "curated table"
and "files a dataloader reads").

All three ops are built on one primitive: a DETERMINISTIC, seeded,
uniform per-row hash (md5 of id + seed, first 8 hex chars as a 32-bit
int). Determinism is the point — re-running the export after a cluster
failure, or on a different partitioning, must produce byte-identical
split/shard assignments (speculative re-execution and AQE re-plans make
anything rand()-based non-reproducible).

Scale notes (100 TB):
- Split/shard assignment is per-row arithmetic on a scan — no shuffle,
  no global sort, embarrassingly parallel. The classic mistake at this
  step is ``ntile() OVER (ORDER BY hash)``: a single-partition global
  window. Modulo-on-hash gives the same balance without the bottleneck
  (test-asserted: the plan contains no single-partition Exchange).
- The actual file layout step is ``df.repartition(n, shard_id)`` +
  ``sortWithinPartitions(sort_key)`` — shard-parallel writes, one file
  per shard, dataloader-ready order inside each file (same mechanics as
  sinks.write_clustered).
- PII redaction is a per-row JVM regex — no Python, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import dsum, dsum_sql

# The hash scheme (seed, thresholds, shard count, bucket function, SQL
# twin) lives in ONE place — operators/export.py — shared with the
# physical shard writer so the oracle-verified queries here and the
# files it writes can never diverge in split/shard assignment.
from ..operators.export import (  # noqa: F401  (re-exported names)
    N_SHARDS,
    SEED,
    TRAIN_HI,
    VAL_HI,
    hash_bucket as _hash_bucket,
    hash_bucket_sql as _hash_bucket_sql,
    split_expr,
)

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"


def q_export_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split: every document is assigned by
    its seeded hash bucket, so the split is stable across reruns,
    repartitionings, and engines — and disjoint by construction."""
    docs = load_table(spark, sf_dir, "documents")
    split = split_expr(F.col("doc_id"))
    return docs.select(
        "doc_id", split.alias("split"), F.col("n_chars").alias("n_chars")
    )


def q_export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded global shuffle + sharding: shard = hash % N_SHARDS (no
    global sort, no single-partition window), reported as per-shard
    balance stats. The write-side twin is repartition(N, shard_id) +
    sortWithinPartitions(shuffle_key) -> one dataloader file per shard
    in deterministic order."""
    docs = load_table(spark, sf_dir, "documents")
    shard = _hash_bucket(F.col("doc_id"), N_SHARDS)
    return (
        docs.select(shard.alias("shard_id"), "n_chars")
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            dsum(F.col("n_chars"), scale=0).alias("sum_chars"),
        )
        .orderBy("shard_id")
    )


def q_export_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub before export: count + redact email addresses with a
    per-row JVM regex. The fixture corpus is synthetic (no real PII), so
    the query plants a known email on every 7th document first — the
    redaction path is then exercised on non-degenerate input and must
    report exactly those plants. Output: per-document match count and
    the delta in characters after replacing each match with <EMAIL>."""
    docs = load_table(spark, sf_dir, "documents")
    planted = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com now"),
        ),
    ).otherwise(F.col("text"))
    redacted = F.regexp_replace(planted, EMAIL_RE, "<EMAIL>")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(planted, F.lit(EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_pii"),
        (F.length(planted) - F.length(redacted)).cast("long").alias("chars_removed"),
    )


ORACLES: dict = {}

# promoted r6: the deterministic split is the export family's flagship
# (every training run starts from it), now a registered driver row
QUERIES = {
    "q_export_split": q_export_split,
}

EXTRA_QUERIES = {
    "q_export_shards": q_export_shards,
    "q_export_pii_redact": q_export_pii_redact,
}

_PLANT = (
    "CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' || "
    "CAST(doc_id AS VARCHAR) || '@example.com now' ELSE text END"
)

EXTRA_ORACLES = {
    "q_export_split": f"""
SELECT doc_id,
  CASE WHEN {_hash_bucket_sql('doc_id', 100)} < {TRAIN_HI} THEN 'train'
       WHEN {_hash_bucket_sql('doc_id', 100)} < {VAL_HI} THEN 'val'
       ELSE 'test' END AS split,
  n_chars
FROM documents
""",
    "q_export_shards": f"""
SELECT {_hash_bucket_sql('doc_id', N_SHARDS)} AS shard_id,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  {dsum_sql('n_chars', scale=0)} AS sum_chars
FROM documents
GROUP BY 1
""",
    "q_export_pii_redact": f"""
SELECT doc_id,
  CAST(len(regexp_extract_all({_PLANT}, '{EMAIL_RE}')) AS BIGINT) AS n_pii,
  CAST(length({_PLANT})
       - length(regexp_replace({_PLANT}, '{EMAIL_RE}', '<EMAIL>', 'g'))
    AS BIGINT) AS chars_removed
FROM documents
""",
}

# promoted r6: the registered row carries its full oracle
ORACLES["q_export_split"] = EXTRA_ORACLES.pop("q_export_split")
