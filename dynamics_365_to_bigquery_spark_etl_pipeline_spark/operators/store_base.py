"""Shared chassis for the batch-dir incremental stores (r12).

The repo's incremental stores all share one disk grammar — per-batch
``batch=<id>`` parquet dirs under a data root, one atomically-replaced
meta JSON carrying the live dir list + the bounded replay ledger
(``operators/ledger.py``) + pinned identity knobs, every mutation under
the store write lock (``operators/store_lock.py``), crash-safe
two-phase commits, ``gen<N>`` compaction generations, and orphan-dir
GC. The BM25 retrieval index (r12) and the n-gram count store (r12)
are structurally identical in all of that and differ only in what a
batch dir CONTAINS — so the chassis lives here once (the r12 review
habit: a second hand-synced copy of replay-guard-critical plumbing is
how stores drift). r13 migrated the two older stores (LSH dedup index,
IVF layout) onto it too — their test files passed UNCHANGED across the
move, which is the contract — so the replay-guard grammar now has ONE
implementation for all four batch-dir stores.

Subclasses define the class constants (``KIND``, ``META_NAME``,
``DATA_DIR``, ``IDENTITY_KEYS``) plus ``_meta_defaults()``, and get:
meta read/write with identity validation and ledger migration, the
replay-guard API, the reserved/path-traversal batch-id allowlist, the
multi-root partition-discovering reader, missing-dir loud failure,
orphan sweeps, and identity-adopting ``open()``.

Reader-vs-compact race, shared by every store on this chassis: read
APIs snapshot the meta and build a LAZY scan over that snapshot's
dirs. A ``compact()`` committed between the snapshot and the caller's
action can sweep those dirs, failing the action with a loud
FileNotFoundException — never wrong data (the swap is atomic and the
ledger survives it). Re-calling the read re-resolves to the new
generation and converges; the "maintenance cron beside the live
stream" pattern should expect that one retry on its query side.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import warnings

from pyspark.sql import DataFrame, SparkSession

from . import ledger
from .store_lock import store_write_lock


# largest IN list worth pushing to parquet as per-VALUE predicates (an
# Eq-OR chain the reader tests against file dictionaries and row-group
# stats); the JVM evaluates the chain recursively — measured: 900
# values fine, 1024 overflows the executor stack — so the cap keeps a
# wide margin. Shared by every store probe that pushes a bounded
# vocabulary (n-gram probe_counts, BM25 topk).
PARQUET_IN_MAX = 512

# set alongside the threshold upgrade so the provenance is auditable
# in the session conf (r14 ADVICE): "513 because a store probe raised
# it", distinguishable from "513 because the user chose 513"
PARQUET_IN_UPGRADE_MARKER = "spark.sparkgraft.parquetInThresholdUpgraded"


def raise_parquet_in_threshold(spark, n_values: int) -> None:
    """Let a bounded IN list reach parquet as per-value predicates:
    raise ``spark.sql.parquet.pushdown.inFilterThreshold`` past the
    cap — but ONLY when the session has never SET the key: presence in
    the session conf (read with no fallback default) is the test, so a
    user who deliberately set the threshold — even to its default
    value of 10 — is respected (r14 ADVICE; the old ``== 10`` compare
    could not tell "untouched" from "explicitly 10"). The upgrade
    records ``PARQUET_IN_UPGRADE_MARKER`` so its provenance is
    visible. Session-global and sticky by design — the probe frames
    are lazy, so a restore would race the caller's action. No-op for
    lists over the cap (those fall back to the reader's min/max range
    predicate; the Spark-side InSet still prunes the join)."""
    if n_values > PARQUET_IN_MAX:
        return
    cur = spark.conf.get(
        "spark.sql.parquet.pushdown.inFilterThreshold", None
    )
    if cur is None:
        spark.conf.set(
            "spark.sql.parquet.pushdown.inFilterThreshold",
            str(PARQUET_IN_MAX + 1),
        )
        spark.conf.set(PARQUET_IN_UPGRADE_MARKER, "true")


class BatchDirStore:
    KIND = "batch-dir"        # human name for error messages
    META_NAME = "_meta.json"  # subclass overrides
    DATA_DIR = "data"         # subclass overrides
    IDENTITY_KEYS: tuple[str, ...] = ()

    def __init__(
        self, spark: SparkSession, path: str, lock_timeout: float = 60.0
    ) -> None:
        self.spark = spark
        self.path = path
        # wait budget, not identity — size it to the longest mutating
        # op a writer may queue behind (see IvfLayoutStore.__init__)
        self.lock_timeout = lock_timeout
        os.makedirs(path, exist_ok=True)

    # -- meta ---------------------------------------------------------------
    def _meta_defaults(self) -> dict:
        """Store-specific meta fields for a FRESH store (additive
        stats, etc.); subclasses override and extend."""
        return {}

    def _migrate_meta(self, meta: dict) -> None:
        """Store-specific in-place upgrades for a meta written by an
        OLDER layout (runs before the shared ledger migration) —
        subclasses with a pre-chassis disk history override (the LSH
        index's pre-r8 metas lack ``buckets_n``/``generation``, r13)."""

    def _meta_path(self) -> str:
        return os.path.join(self.path, self.META_NAME)

    def _identity(self) -> dict:
        return {k: getattr(self, k) for k in self.IDENTITY_KEYS}

    def _read_meta(self) -> dict:
        try:
            with open(self._meta_path()) as fh:
                meta = json.load(fh)
        except FileNotFoundError:
            return {
                "batches": [],
                "committed_ids": [],
                "epoch_hwm": {},
                "generation": 0,
                **self._meta_defaults(),
                **self._identity(),
            }
        self._migrate_meta(meta)
        ledger.migrate(meta)
        for key, mine in self._identity().items():
            theirs = meta.setdefault(key, mine)
            if theirs != mine:
                raise ValueError(
                    f"{self.KIND} at {self.path} was built with "
                    f"{key}={theirs!r}, opened with {key}={mine!r} — "
                    "identity knobs are per-store; open with the stored "
                    f"values (or {type(self).__name__}.open to adopt them)"
                )
        return meta

    def _write_meta(self, meta: dict) -> None:
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, self._meta_path())

    @classmethod
    def open(
        cls, spark: SparkSession, path: str, lock_timeout: float = 60.0
    ):
        """Open an EXISTING store ADOPTING its pinned identity (the
        admin/maintenance entry point — constructor validation is for
        ingest legs). Raises FileNotFoundError when no store exists."""
        with open(os.path.join(path, cls.META_NAME)) as fh:
            meta = json.load(fh)
        knobs = {k: meta[k] for k in cls.IDENTITY_KEYS if k in meta}
        return cls(spark, path, lock_timeout=lock_timeout, **knobs)

    # -- replay-guard API -----------------------------------------------------
    def committed_batches(self) -> list[str]:
        """Live data dirs (what reads scan). Batches that produced no
        rows commit to the LEDGER but add no dir."""
        return self._read_meta()["batches"]

    def appended_batches(self, meta: dict | None = None) -> list[str]:
        """Live batch ids excluding compaction generations — the count
        a maintenance cadence keys on (the gen dir is always live after
        the first fold; see IvfLayoutStore.appended_batches)."""
        batches = (
            meta["batches"] if meta is not None else self.committed_batches()
        )
        return [b for b in batches if not re.fullmatch(r"gen\d+", b)]

    def committed_ids(self) -> list[str]:
        return self._read_meta()["committed_ids"]

    def epoch_high_water(self) -> dict[str, int]:
        return dict(self._read_meta()["epoch_hwm"])

    def is_committed(self, batch_id: str) -> bool:
        return ledger.is_committed(self._read_meta(), batch_id)

    def _check_batch_id(self, batch_id: str) -> None:
        """Allowlist, not blocklist: a path-separator id would escape
        the batch= namespace and can resolve INTO the live generation
        dir (which the rewrite path would rmtree as a crashed attempt);
        ``gen<N>`` is the store's own compaction namespace."""
        if not re.fullmatch(r"[A-Za-z0-9][A-Za-z0-9._-]*", batch_id):
            raise ValueError(
                f"batch_id {batch_id!r} must match [A-Za-z0-9._-]+ "
                "(it names a directory under the store)"
            )
        if re.fullmatch(r"gen\d+", batch_id):
            raise ValueError(
                f"batch_id {batch_id!r} is reserved (compaction names "
                "generations 'gen<N>')"
            )

    # -- disk -----------------------------------------------------------------
    def _data_root(self) -> str:
        return os.path.join(self.path, self.DATA_DIR)

    def _batch_dir(self, batch_id: str) -> str:
        return os.path.join(self._data_root(), f"batch={batch_id}")

    def _require_live_dirs(self, meta: dict, verb: str) -> list[str]:
        dirs = [self._batch_dir(b) for b in meta["batches"]]
        missing = [d for d in dirs if not os.path.isdir(d)]
        if missing:
            raise RuntimeError(
                f"{self.KIND} at {self.path} is corrupt: meta lists "
                f"live batches {meta['batches']} but these dirs are "
                f"missing on disk: {missing}; restore them or rebuild "
                f"before {verb}"
            )
        return dirs

    def _read_data(self, dirs: list[str]) -> DataFrame:
        """One multi-root scan (NOT an O(#dirs) unionByName chain —
        the r11 analyzer-cost finding). ``batch`` and any layout
        partition columns read back as partition columns; filters on
        them prune at the source."""
        return self.spark.read.option("basePath", self._data_root()).parquet(
            *dirs
        )

    def _write_bucket_sorted(
        self,
        df: DataFrame,
        out: str,
        bucket_col: str,
        sort_cols: tuple[str, ...] = (),
        bound_files: bool = False,
        n_partitions: int | None = None,
    ) -> None:
        """The bucket-dir write rule, ONE implementation for every
        store on the chassis (r13 review — three near-copies were
        diverging): ``partitionBy(bucket_col)`` dirs, rows sorted by
        ``(bucket_col, *sort_cols)`` within each task so every written
        file carries tight row-group stats on the sort key (feeds the
        ``IN (vocab)``-style pushdowns the probes do).

        ``bound_files=True`` additionally repartitions on the bucket —
        ONE file per touched bucket. Right for DELTA-sized writes
        (appends: the per-epoch file-explosion driver is tasks x
        buckets tiny files, and the extra shuffle is delta-sized);
        WRONG for corpus-sized writes (compaction/builds), where it
        would cap the rewrite at n_buckets tasks regardless of cluster
        size — those keep task-parallel writes and accept tasks x
        buckets files for the one-time fold. Stores that know their
        bucket count pass it as ``n_partitions`` so the delta shuffle
        lands in exactly that many partitions instead of the session
        default (e.g. 200 mostly-empty shuffle partitions for a
        few-row streaming append — r13 advice)."""
        if bound_files:
            df = (
                df.repartition(n_partitions, bucket_col)
                if n_partitions
                else df.repartition(bucket_col)
            )
        if sort_cols:
            df = df.sortWithinPartitions(bucket_col, *sort_cols)
        df.write.partitionBy(bucket_col).parquet(out)

    def _orphan_roots(self) -> list[str]:
        """Data roots the orphan sweep walks — one for most stores;
        the LSH index overrides with its two (buckets/, shingles/)."""
        return [self._data_root()]

    def _orphan_names(self, root: str, keep: list[str]) -> set[str]:
        """``batch=*`` dir names under ``root`` the meta doesn't
        reference."""
        keep_names = {f"batch={b}" for b in keep}
        try:
            names = os.listdir(root)
        except OSError:
            return set()
        return {
            n for n in names if n.startswith("batch=") and n not in keep_names
        }

    def sweep(self) -> dict:
        """Reclaim orphaned batch dirs NOW, under the write lock — the
        ``store_admin --sweep`` verb (r13 verdict #7): the orphans the
        r13 status line surfaces become reclaimable without writing
        code. Everything unreferenced is a folded-away compaction
        input or a crashed attempt (appends hold the same lock, so
        nothing unreferenced is in flight). Returns ``{"removed": n,
        "failed": m}`` with ``removed`` counted as DISTINCT batch ids
        — the same unit the status line's ``orphan_dirs`` reports, so
        a scheduler can reconcile the two (r13 advice); ``failed`` is
        undeletable DIRS, which also warn (``_sweep_orphans``) and are
        retried by any later sweep."""
        with store_write_lock(self.path, timeout=self.lock_timeout):
            meta = self._read_meta()
            # candidate paths per batch id FIRST, across all roots: an
            # id counts as removed only when EVERY path it had is gone
            # (review pins: a stray FILE that fails rmtree, or an LSH
            # orphan reclaimed under buckets/ but stuck under
            # shingles/, must stay failed-only — removed means GONE,
            # the unit a scheduler reconciles against orphan_dirs)
            candidates: dict[str, list[str]] = {}
            roots = self._orphan_roots()
            for root in roots:
                for n in self._orphan_names(root, meta["batches"]):
                    candidates.setdefault(n[len("batch="):], []).append(
                        os.path.join(root, n)
                    )
            failed = 0
            for root in roots:
                failed += self._sweep_orphans(meta["batches"], root=root)
            removed = sum(
                1
                for paths in candidates.values()
                if not any(os.path.lexists(p) for p in paths)
            )
        return {"removed": removed, "failed": failed}

    def _sweep_orphans(self, keep: list[str], root: str | None = None) -> int:
        """Best-effort GC of every ``batch=*`` dir the meta doesn't
        reference — listdir, not a caller's remembered list, so dirs
        orphaned by a PRIOR crash (between a meta swap and its GC
        loop) are reclaimed too instead of leaking forever (r12
        review; the ivf_store family pattern). Only called under the
        write lock: appends hold it too, so nothing unreferenced here
        is in flight — it is either a folded-away input or a crashed
        attempt whose retry rewrites it.

        Best-effort must not mean INVISIBLE: a transient failure is
        retried by the next sweep, but a persistently undeletable
        orphan would otherwise leak forever with no signal — so
        failures are counted, surfaced as ONE warning, and returned
        (r12 verdict: ``ignore_errors=True`` hid them)."""
        data_root = self._data_root() if root is None else root
        failed: list[str] = []
        for name in sorted(self._orphan_names(data_root, keep)):
            target = os.path.join(data_root, name)
            try:
                shutil.rmtree(target)
            except OSError:
                failed.append(target)
        if failed:
            warnings.warn(
                f"{self.KIND} at {self.path}: could not GC "
                f"{len(failed)} orphan dir(s) {failed} — reads never "
                "touch them; the next sweep retries, but a PERSISTENT "
                "failure (permissions?) leaks disk until fixed",
                RuntimeWarning,
                stacklevel=2,
            )
        return len(failed)
