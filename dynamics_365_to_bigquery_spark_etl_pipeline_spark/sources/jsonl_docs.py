"""JSONL document source — the landing format training-data corpora
actually arrive in (one JSON object per line: web crawls, conversation
dumps, annotation exports). Extends the reference's CSV-entity source
pattern (SURVEY.md S1/S2; ``helper_functions.py:115``) to the document
domain with the same rules:

- **Explicit schema first.** ``inferSchema``-style sampling double-scans
  at 100 TB; ``DOC_SCHEMA`` is the contract and ``read_jsonl`` takes an
  override for other corpora. JSON lines parse per-record in parallel
  (newline-delimited — never ``multiLine``, which forces a single-split
  whole-file parse).
- **Quarantine, don't drop.** PERMISSIVE mode + ``_corrupt_record``
  captures unparseable lines for inspection; a crawl batch with 0.1%
  broken JSON must not silently shrink.
- **Metadata stays typed.** Nested ``meta`` is a typed struct, not a
  stringly map — column pruning reaches into struct fields, so reading
  ``doc_id`` + ``text`` never deserializes metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("url", T.StringType()),
                    T.StructField("fetched_at", T.StringType()),
                    T.StructField("license", T.StringType()),
                ]
            ),
        ),
    ]
)


def read_jsonl(
    spark: SparkSession,
    paths: list[str] | str,
    schema: T.StructType = DOC_SCHEMA,
    capture_corrupt: bool = True,
) -> DataFrame:
    """Read newline-delimited JSON documents with an explicit schema.

    With ``capture_corrupt`` (default), unparseable lines land in a
    ``_corrupt_record`` column (quarantine via ``split_corrupt``)
    instead of becoming silent all-NULL rows."""
    reader = spark.read
    if capture_corrupt:
        schema = T.StructType(
            list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
        )
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", "_corrupt_record"
        )
    return reader.schema(schema).json(paths)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_docs, quarantined_lines) from a ``read_jsonl`` frame.

    Same caching caveat as the CSV source: Spark cannot filter on
    ``_corrupt_record`` directly off the scan, so the parsed batch is
    cached once and split from the materialized data."""
    df = df.cache()
    clean = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select("_corrupt_record")
    return clean, bad


def write_documents_table(df: DataFrame, out_dir: str, buckets: int = 0) -> None:
    """Land parsed documents as parquet for the Tier-B operators
    (dedup/quality/similarity read this layout). ``buckets`` > 0 salts
    the write into that many ``doc_id``-hashed output groups via
    repartition — at scale this bounds file count and pre-co-locates
    the doc_id joins the curation pipeline runs next."""
    writer = df
    if buckets:
        writer = df.repartition(buckets, F.col("doc_id"))
    writer.write.mode("overwrite").parquet(out_dir)
