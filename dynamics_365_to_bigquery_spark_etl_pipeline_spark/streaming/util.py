"""Shared streaming-leg plumbing.

``query_id_reader`` is the exactly-once key ingredient every
``foreachBatch`` leg in this package uses (dedup index, heavy hitters,
vector ingest): batch/epoch keys must be namespaced by the streaming
query's PERSISTED run identity (the ``id`` Spark writes to
``checkpoint_dir/metadata``), because epoch numbers restart at 0
whenever a checkpoint dir is rebuilt — a bare ``epoch-<n>`` key would
make a NEW stream pointed at an EXISTING store silently skip its early
epochs as "already committed". The id is stable across restarts of the
same checkpoint (replays stay exactly-once) and fresh for a rebuilt
one (fresh keys).

One implementation instead of a per-module closure copy (review
finding: three byte-identical copies of replay-guard-critical logic
would drift on the next fix)."""

from __future__ import annotations

import json
import os
from typing import Callable


def check_reserved_columns(schema, reserved: set[str]) -> None:
    """Fail loudly when a gate's source schema carries a column the
    gate itself writes (audit columns, the ``epoch`` output partition
    column) — silently replacing-then-dropping a user column is data
    loss, and a duplicate makes the epoch's plan die ambiguous.
    Case-insensitive ON BOTH SIDES, like Spark's default resolution
    (r11 review: lowercasing only the schema side would let a future
    caller's mixed-case reserved literal silently disable the guard).
    ONE implementation for every gate leg (the guard was copy-pasted
    between the decontamination and quality gates — the same drift
    risk this module exists to prevent)."""
    low = {r.lower() for r in reserved}
    hit = sorted(f for f in schema.fieldNames() if f.lower() in low)
    if hit:
        raise ValueError(
            f"source schema carries reserved column(s) {hit} — the "
            "gate writes its audit/partition columns under these names "
            "(case-insensitive). Rename a genuine data column; if it "
            "is an UPSTREAM gate's epoch= partition column, just omit "
            "it from the declared schema — gates project each batch to "
            "the schema you declare"
        )


def project_to_schema(batch_df, schema):
    """Project a foreachBatch frame to exactly the DECLARED schema's
    top-level fields. A file source over another gate's output appends
    that gate's ``epoch=`` PARTITION column to the batch even when the
    declared schema omits it — carried through, it becomes a data
    column inside the consumer's own partitioned output and every read
    dies duplicate-column. Names are backtick-escaped so declared
    top-level fields containing dots keep resolving as columns, not
    nested paths (r11 reviews; one implementation for every gate —
    same rationale as ``check_reserved_columns``)."""
    from pyspark.sql import functions as F

    return batch_df.select(
        *[F.col("`" + n.replace("`", "``") + "`") for n in schema.fieldNames()]
    )


def query_id_reader(checkpoint_dir: str) -> Callable[[], str]:
    """Returns a zero-arg reader for the streaming query id persisted
    under ``checkpoint_dir``. Reads the metadata file ONCE per
    start()ed query and caches (r8 verdict #7): the file exists from
    the moment the query starts and its id never changes for the life
    of the checkpoint, so per-micro-batch re-reads are pure waste."""
    cache: list[str] = []

    def read() -> str:
        if not cache:
            with open(os.path.join(checkpoint_dir, "metadata")) as fh:
                cache.append(json.load(fh)["id"])
        return cache[0]

    return read
