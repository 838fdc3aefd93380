"""Bounded exactly-once ledger shared by the three incremental stores
(r10 verdict #2).

Every store in this package (``LshDedupIndex``, ``IvfLayoutStore``,
``MgSummaryStore``) keeps a replay guard: a set of batch ids whose
effects are already in the store, so a replayed commit is a no-op.
Through r10 that set was a flat ``committed_ids`` list inside the meta
JSON — appended once per micro-batch and rewritten whole per epoch, so
on the continuous-ingest path the stores are designed for, the ledger
grew O(#epochs) forever and the replay-guard scan plus the meta rewrite
became the driver's slow path.

The streaming legs' epoch keys are ``<query-id>-epoch-<n>`` where the
query id is the checkpoint's persisted run identity
(``streaming/util.query_id_reader``) and ``n`` is Spark's epoch id —
**monotonic per query id**, because ``foreachBatch`` processes epochs
in order and a restart replays only the last uncommitted epoch. So for
epoch-shaped ids, "is committed" ≡ ``n <= high-water(n) for that query
id``, and the ledger collapses to a ``{query_id: max_epoch}`` map:
O(#query restarts) entries, not O(#epochs).

Non-epoch ids (the batch APIs' caller-chosen ids, compaction's
``gen<N>`` ids) keep the exact-membership list — they carry no order.

Semantics note for batch-API callers: an id matching ``*-epoch-<n>``
gets the monotonic treatment too (committing ``x-epoch-7`` implies
``x-epoch-3`` is committed). That suffix is the streaming legs'
reserved shape; batch callers should not use it unless they want
exactly those semantics — the stores' docstrings say so.

Migration: pre-r11 metas carry epoch-shaped ids inside
``committed_ids``. ``migrate()`` folds them into the high-water map at
read time (idempotent; monotonicity makes the fold exact — every epoch
below a committed one was itself committed in order or was empty and
committed nothing), and the next meta write persists the new shape.
"""

from __future__ import annotations

import re

EPOCH_RE = re.compile(r"^(?P<qid>.+)-epoch-(?P<n>\d+)$")

# meta keys this module owns
IDS_KEY = "committed_ids"
HWM_KEY = "epoch_hwm"


def split_epoch(batch_id: str) -> tuple[str, int] | None:
    """``(query_id, epoch)`` when the id is epoch-shaped, else None."""
    m = EPOCH_RE.fullmatch(batch_id)
    return (m.group("qid"), int(m.group("n"))) if m else None


def migrate(meta: dict) -> dict:
    """Fold epoch-shaped ids out of ``committed_ids`` into the
    high-water map, in place; ensure both keys exist. Idempotent —
    call from every ``_read_meta``."""
    hwm = meta.setdefault(HWM_KEY, {})
    ids = meta.get(IDS_KEY, [])
    keep: list[str] = []
    for bid in ids:
        parts = split_epoch(bid)
        if parts is None:
            keep.append(bid)
        else:
            qid, n = parts
            hwm[qid] = max(hwm.get(qid, -1), n)
    meta[IDS_KEY] = keep
    return meta


def is_committed(meta: dict, batch_id: str) -> bool:
    """Replay-guard check against a migrated meta."""
    parts = split_epoch(batch_id)
    if parts is not None:
        qid, n = parts
        return n <= meta.get(HWM_KEY, {}).get(qid, -1)
    return batch_id in meta.get(IDS_KEY, [])


def record(meta: dict, batch_id: str) -> None:
    """Mark a batch id committed, in place (caller persists the meta).
    Epoch-shaped ids advance their query id's high-water mark; others
    append to the exact-membership list."""
    parts = split_epoch(batch_id)
    if parts is not None:
        qid, n = parts
        hwm = meta.setdefault(HWM_KEY, {})
        hwm[qid] = max(hwm.get(qid, -1), n)
    else:
        meta[IDS_KEY] = meta.get(IDS_KEY, []) + [batch_id]
