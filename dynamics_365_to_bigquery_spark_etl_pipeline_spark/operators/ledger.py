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
``committed_ids``. Those ids were committed under the old
EXACT-MEMBERSHIP contract — a pre-r11 batch caller could legally use
``nightly-epoch-5`` with no ordering meaning, so folding historical
ids into the high-water map would silently mark a never-ingested
``nightly-epoch-3`` as replayed (r11 review finding). ``migrate()``
therefore only ensures the meta carries both keys; pre-existing
epoch-shaped ids KEEP exact membership in the list, and only ids
committed through ``record()`` from now on advance the high-water map.
The list still converges to the bounded shape: when ``record()``
advances a query id's high-water mark, every listed id of that prefix
at or below the mark is pruned (it is implied by the mark from then
on) — one post-migration epoch folds a pre-r11 streaming history away,
while a batch caller's epoch-shaped ids survive untouched until the
caller itself opts into the monotonic semantics by committing a newer
epoch under the same prefix.
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
    """Ensure the meta carries both ledger keys, in place. Idempotent —
    call from every ``_read_meta``. Pre-existing ids — epoch-shaped or
    not — stay in the exact-membership list (module docstring: folding
    historical ids would impose ordering semantics their committers
    never chose); they fold away through ``record()``'s pruning once a
    newer epoch commits under the same prefix."""
    meta.setdefault(HWM_KEY, {})
    meta.setdefault(IDS_KEY, [])
    return meta


def is_committed(meta: dict, batch_id: str) -> bool:
    """Replay-guard check against a migrated meta. Epoch-shaped ids are
    committed when at-or-under their prefix's high-water mark OR listed
    exactly (the pre-r11 membership that migration preserves)."""
    parts = split_epoch(batch_id)
    if parts is not None:
        qid, n = parts
        if n <= meta.get(HWM_KEY, {}).get(qid, -1):
            return True
    return batch_id in meta.get(IDS_KEY, [])


def record(meta: dict, batch_id: str) -> None:
    """Mark a batch id committed, in place (caller persists the meta).
    Epoch-shaped ids advance their query id's high-water mark and prune
    now-implied list entries of the same prefix; others append to the
    exact-membership list."""
    parts = split_epoch(batch_id)
    if parts is not None:
        qid, n = parts
        hwm = meta.setdefault(HWM_KEY, {})
        hwm[qid] = max(hwm.get(qid, -1), n)
        # convergence: listed ids now implied by the mark are redundant
        # — dropping them is what bounds a migrated pre-r11 streaming
        # history to O(#query ids) after its first post-migration epoch
        meta[IDS_KEY] = [
            bid
            for bid in meta.get(IDS_KEY, [])
            if not (
                (p := split_epoch(bid)) is not None
                and p[0] == qid
                and p[1] <= hwm[qid]
            )
        ]
    elif batch_id not in meta.get(IDS_KEY, []):
        # membership-guarded so record() is idempotent like the epoch
        # path already is: a caller that skips the is_committed
        # pre-check must not grow duplicate entries unboundedly — the
        # exact mistake this module exists to prevent (r11 advice)
        meta[IDS_KEY] = meta.get(IDS_KEY, []) + [batch_id]
