"""Incremental IVF/ANN layout store: O(delta) appends for a GROWING
embedding corpus (r9 verdict #2).

``similarity.build_ivf_layout`` is a full rebuild — a 100 TB corpus
with daily ingest would re-assign and re-write every vector per batch.
This store mirrors the LSH dedup index's batch-dir + meta-commit shape
(``operators/dedup_index.py`` — reference scope note: the reference
re-lands whole entities nightly, ``incremental_etl_v1.py:94-118``; the
incremental shape is what survives at scale):

State on disk (under ``path/``):

- ``centroids/``           — the PINNED centroid frame the whole store
  assigns against (append batches must use the build-time centroids or
  append(probe) != rebuild(probe) by construction)
- ``vectors/batch=<id>/``  — per-batch layout dirs, each written
  ``partitionBy(bucket_id)`` exactly like the full layout, so the probe
  partition-prunes every live dir
- ``_ivf_meta.json``       — live batch ids, the replay-guard ledger
  (bounded: a ``{query_id: max_epoch}`` high-water map for the
  streaming legs' epoch keys + an exact list for batch-API ids —
  ``operators/ledger.py``), per-batch assignment stats, generation
  counter, and the store's IDENTITY (``drift_threshold`` / ``id_col``
  / ``vec_col`` are pinned at build; a mismatched open fails loudly,
  mirroring the MG store's k check — r10 verdict #3)

Per ``append``, the work is O(|delta|): the new vectors are assigned to
their argmax bucket by the same BLAS kernel the full build uses
(centroid matrix rides the closure — no pair rows), written as ONE new
``batch=<id>`` dir, and committed to the meta AFTER the dir is fully on
disk. A replayed ``append`` with a committed id is a no-op (state must
not double). A crash between the dir write and the meta commit leaves
an orphan dir reads never touch; the retry drops and rewrites it.

Centroid drift guard: the build records the corpus' mean assignment
similarity (decimal-exact mean, so the stat is layout-independent);
every append records its batch's. When the live weighted mean degrades
more than ``drift_threshold`` (relative) below the build-time mean, the
meta flips ``needs_retrain`` and ``append`` surfaces it — the signal
that the frozen centroids stopped describing the corpus and a
``rebuild`` (new centroids, new generation) is due. Appends still
succeed: the caller owns retrain scheduling, the store owns detection.

``compact()`` folds the live batch dirs into one generation dir (probe
fan-in and file counts otherwise grow O(#batches)); ``rebuild()`` is
compaction + new centroids + fresh build stats.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import ledger
from . import similarity as S
from .store_base import BatchDirStore
from .store_lock import store_write_lock

META_NAME = "_ivf_meta.json"

# meta keys pinned at build() and validated on every open
IDENTITY_KEYS = ("drift_threshold", "id_col", "vec_col")


def _assign_with_sim(
    corpus: DataFrame,
    cent_rows: list,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """The layout build's OWN assignment kernel with the winning cosine
    kept (the store's drift stat needs it) — shared, not forked, so the
    append==rebuild probe equivalence can never drift from
    ``similarity.assign_ivf_buckets_matmul``'s tie-break. Takes the
    PRE-COLLECTED id-sorted centroid rows (r15): the store memoizes
    them per generation, so a streaming ingest stops paying one
    read-parquet + collect job per micro-batch for a matrix that is
    pinned by contract."""
    return S.assign_ivf_buckets_matmul_rows(
        corpus, cent_rows, id_col, vec_col, with_sim=True
    )


class IvfLayoutStore(BatchDirStore):
    """Chassis subclass (r13 — the meta/ledger/lock/identity/orphan-GC
    grammar moved to ``store_base.BatchDirStore``; this class keeps
    only what is IVF-specific: centroids, drift guard, assignment,
    rebuild). The replay ledger gains the bounded high-water key via
    the chassis (pre-r11 flat-list ids keep exact membership and fold
    away through ``ledger.record``'s pruning); identity mismatch fails
    loudly — a stream opened at a different ``drift_threshold`` would
    silently move the retrain line (r10 verdict #3); pre-r11 metas
    carry no identity keys and adopt the instance's values."""

    KIND = "IVF store"
    META_NAME = META_NAME
    DATA_DIR = "vectors"
    IDENTITY_KEYS = IDENTITY_KEYS

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        drift_threshold: float = 0.05,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        lock_timeout: float = 60.0,
    ) -> None:
        if not 0 < drift_threshold < 1:
            raise ValueError(
                f"drift_threshold must be in (0, 1) (got {drift_threshold})"
            )
        self.drift_threshold = drift_threshold
        self.id_col = id_col
        self.vec_col = vec_col
        # lock_timeout sizes the WAIT, not the data (not identity). The
        # 60 s default suits append-vs-append contention; a stream
        # expected to ride out a concurrent compact()/rebuild() (minutes
        # of full-corpus rewrite at scale) must size this to that window
        # or the foreachBatch epoch dies in StoreLockHeld (r11 review)
        super().__init__(spark, path, lock_timeout=lock_timeout)

    def _meta_defaults(self) -> dict:
        return {"stats": {}, "build_mean_sim": None, "needs_retrain": False}

    # -- state ------------------------------------------------------------
    def _centroids_dir(self) -> str:
        """The CURRENT generation's centroid dir — versioned through the
        meta so ``rebuild`` can stage new centroids beside the live ones
        and swap atomically (two-phase, like every store in this repo)."""
        name = self._read_meta().get("centroids_dir", "centroids")
        return os.path.join(self.path, name)

    def appended_batches(self, meta: dict | None = None) -> list[str]:
        """Live batch ids excluding the build dir ``base`` on top of
        the chassis' gen-dir exclusion — the count a maintenance
        cadence should key on: the base/gen dir is ALWAYS present, so
        a cadence counting ``committed_batches()`` degenerates from
        "every N appends" to "every epoch" once a first fold exists
        (review finding)."""
        return [b for b in super().appended_batches(meta) if b != "base"]

    def centroids(self) -> DataFrame:
        """The PINNED centroid frame every batch in the current
        generation was assigned against."""
        return self.spark.read.parquet(self._centroids_dir())

    def _centroid_rows(self, meta: dict) -> list:
        """Id-sorted collected centroid rows, memoized per instance
        (r15): centroids are FROZEN for a generation by the store's
        own contract, yet every append re-read and re-collected the
        parquet — one whole Spark job per streaming micro-batch. The
        cache key is (dir name, generation, centroids_token): the token
        is a fresh uuid written into the meta by every centroid
        (re)write (``build``/``rebuild``), so ANY cross-process rewrite
        invalidates this instance's cache the moment it re-reads the
        meta — including a build-over-build that keeps name and
        generation unchanged (r15 keyed that case on the dir MTIME,
        whose coarse granularity on some filesystems could serve a
        stale matrix if the rewrite landed within the same tick —
        ADVICE r15 #3). Pre-token stores (older meta) fall back to the
        mtime key; in-process builds also reset the cache explicitly,
        and cross-process mutators hold the write lock the reading
        append also holds."""
        name = meta.get("centroids_dir", "centroids")
        path = os.path.join(self.path, name)
        token = meta.get("centroids_token")
        if token is None:  # store written by a pre-token build
            token = os.path.getmtime(path)
        key = (name, meta.get("generation"), token)
        cached = getattr(self, "_cent_cache", None)
        if cached is None or cached[0] != key:
            rows = sorted(
                self.spark.read.parquet(path)
                .select(self.id_col, self.vec_col)
                .collect(),
                key=lambda r: r[0],
            )
            self._cent_cache = (key, rows)
        return self._cent_cache[1]

    def vectors(self) -> DataFrame:
        """Every live vector — ``(id_col, vec_col)`` unioned across the
        store's committed dirs. The corpus reader maintenance flows
        retrain from (``refine_centroids(store.vectors(), ...)`` →
        ``rebuild``). Fails loudly on meta-listed dirs missing from
        disk, same as ``rebuild``/``topk`` (r10 advice: a silent
        partial corpus here would train centroids that drop the
        missing batches' neighborhoods)."""
        meta = self._read_meta()
        if not meta["batches"]:
            raise RuntimeError(
                f"IVF store at {self.path} has no build — nothing to read"
            )
        dirs = self._require_live_dirs(meta, "reading")
        return self._read_vectors(dirs)

    def _read_vectors(self, dirs: list[str]) -> DataFrame:
        """One multi-root scan over live dirs (the chassis reader —
        NOT an O(#dirs)-deep unionByName chain, r11 review). Shared by
        ``vectors()`` and ``rebuild()`` so the corpus read cannot fork;
        ``batch``/``bucket_id`` read back as partition columns and are
        projected away."""
        return self._read_data(dirs).select(self.id_col, self.vec_col)

    # -- build / append ----------------------------------------------------
    def build(self, corpus: DataFrame, centroids: DataFrame) -> dict:
        """Full (re)build as generation 0: pin the centroids, assign the
        corpus, write ``batch=base`` partitioned by bucket, record the
        build-time mean assignment similarity the drift guard compares
        against. Wipes any previous state at this path — including
        stale generation dirs a prior ``rebuild`` may have left — and
        (re)pins the store's identity knobs in the meta."""
        with store_write_lock(self.path, timeout=self.lock_timeout):
            shutil.rmtree(os.path.join(self.path, "vectors"), ignore_errors=True)
            for d in os.listdir(self.path):
                if d.startswith("centroids"):
                    shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
            cdir = os.path.join(self.path, "centroids")
            centroids.select(self.id_col, self.vec_col).write.parquet(cdir)
            # collect the written-back frame ONCE (r15): the assignment
            # kernel needs the sorted rows anyway, and len() replaces
            # the separate count job; the instance cache is reset so a
            # build-over-build cannot serve the old matrix
            self._cent_cache = None
            cent_rows = sorted(
                self.spark.read.parquet(cdir)
                .select(self.id_col, self.vec_col)
                .collect(),
                key=lambda r: r[0],
            )
            stats = self._write_batch(corpus, "base", cent_rows)
            self._write_meta(
                {
                    "batches": ["base"],
                    "committed_ids": ["base"],
                    "epoch_hwm": {},
                    "generation": 0,
                    "centroids_dir": "centroids",
                    # fresh per centroid write: the _centroid_rows cache
                    # key — monotonic-by-uniqueness where the old dir
                    # mtime had filesystem-tick granularity (r16)
                    "centroids_token": uuid.uuid4().hex,
                    # persisted so appends can bound their delta
                    # shuffle without re-counting the centroid frame
                    # (r14 verdict #4); known here for free
                    "n_centroids": len(cent_rows),
                    "stats": {"base": stats},
                    "build_mean_sim": stats["mean_sim"],
                    "needs_retrain": False,
                    **self._identity(),
                }
            )
        return self.drift()

    def _write_batch(
        self,
        vectors: DataFrame,
        batch_id: str,
        cent_rows: list,
        bound_files: bool = False,
        n_partitions: int | None = None,
    ) -> dict:
        """Assign + write one batch dir; returns its stats. The
        assignment is cut once (two consumers: the layout write and the
        stats aggregate must not run the kernel twice).
        ``bound_files=True`` (the APPEND path, r13) repartitions on the
        bucket before the write — one file per touched bucket instead
        of up to parallelism x buckets tiny files per delta, the
        file-explosion driver on a streaming ingest; ``n_partitions``
        (r15, r14 verdict #4) bounds that shuffle to
        min(n_centroids, parallelism) from the meta's persisted
        centroid count instead of the session default (200 mostly-empty
        shuffle partitions per streaming epoch). Builds/rebuilds keep
        task-parallel writes: a corpus-sized repartition to #centroids
        partitions would serialize the big write (parquet stays
        splittable either way, so probe parallelism is unaffected)."""
        assigned = _assign_with_sim(
            vectors,
            cent_rows,
            self.id_col,
            self.vec_col,
        ).localCheckpoint()
        out = self._batch_dir(batch_id)
        if os.path.isdir(out):
            shutil.rmtree(out)  # crashed earlier attempt
        # chassis write rule; no sort key — IVF probes read whole
        # pruned buckets (matmul over every vector), so there is no
        # row-level pushdown for sorted stats to feed
        self._write_bucket_sorted(
            assigned.drop("sim"),
            out,
            "bucket_id",
            bound_files=bound_files,
            n_partitions=n_partitions,
        )
        row = assigned.agg(
            F.count("*").alias("n"),
            # decimal-exact mean: the stat must not depend on partition
            # layout, or the drift guard would flap across cluster sizes
            (
                F.sum(F.col("sim").cast("decimal(20,10)")).cast("double")
                / F.count("*")
            ).alias("mean_sim"),
        ).collect()[0]
        if row["n"] == 0:
            raise ValueError(f"batch {batch_id!r} is empty — nothing to index")
        return {"n": row["n"], "mean_sim": row["mean_sim"]}

    def append(self, vectors: DataFrame, batch_id: str) -> dict:
        """Index a new batch in O(|delta|): assign against the PINNED
        build centroids, append one ``batch=<id>`` dir, commit. Returns
        the store's drift status (the caller's retrain signal). Vector
        ids must be globally unique across batches. Replay of a
        committed id is a no-op; ids shaped ``*-epoch-<n>`` are the
        streaming leg's and carry monotonic per-prefix replay semantics
        (``operators/ledger.py``). The whole append holds the store's
        write lock — see ``store_lock.store_write_lock`` for why the
        dir write is inside it (a concurrent compact's GC would sweep
        an uncommitted in-flight dir)."""
        # chassis allowlist + gen<N> reservation; 'base' (the build
        # dir) is this store's extra reserved name — an append named
        # like either would pass the replay guard, then rmtree the live
        # dir as a "crashed earlier attempt" (review finding)
        self._check_batch_id(batch_id)
        if batch_id == "base":
            raise ValueError(
                f"batch_id {batch_id!r} is reserved (the store names its "
                "build 'base')"
            )
        with store_write_lock(self.path, timeout=self.lock_timeout):
            # replay check INSIDE the lock: a concurrent writer may have
            # committed this id while we waited
            meta = self._read_meta()
            if not meta["batches"]:
                raise RuntimeError(
                    f"IVF store at {self.path} has no build — call build() "
                    "before append()"
                )
            if ledger.is_committed(meta, batch_id):
                return self.drift()  # replay: state already reflects it
            cent_rows = self._centroid_rows(meta)
            if "n_centroids" not in meta:
                # legacy store predating the persisted count: the
                # collected rows give it for free — the commit below
                # persists it
                meta["n_centroids"] = len(cent_rows)
            stats = self._write_batch(
                vectors,
                batch_id,
                cent_rows,
                bound_files=True,
                n_partitions=min(
                    int(meta["n_centroids"]),
                    self.spark.sparkContext.defaultParallelism,
                ),
            )
            # the lock freezes the meta — no re-read needed between the
            # batch write and the commit (pre-r11 this was an unlocked
            # RMW that could lose a concurrent writer's entry)
            meta["batches"] = meta["batches"] + [batch_id]
            ledger.record(meta, batch_id)
            meta["stats"][batch_id] = stats
            self._write_meta(meta)
            drift = self.drift()
            if drift["needs_retrain"] and not meta.get("needs_retrain"):
                meta["needs_retrain"] = True
                self._write_meta(meta)
        return drift

    # -- drift guard -------------------------------------------------------
    def drift(self, meta: dict | None = None) -> dict:
        """Current assignment-quality status: live weighted mean
        similarity vs the build-time mean; ``needs_retrain`` when the
        relative degradation exceeds the threshold. Pass an
        already-read ``meta`` to derive every field from ONE snapshot —
        a caller assembling a status from several reads beside a live
        writer would otherwise mix two store states (r11 review)."""
        if meta is None:
            meta = self._read_meta()
        build = meta.get("build_mean_sim")
        live = [meta["stats"][b] for b in meta["batches"] if b in meta["stats"]]
        n = sum(s["n"] for s in live)
        mean = (
            sum(s["mean_sim"] * s["n"] for s in live) / n if n else None
        )
        if build is None or mean is None:
            degradation = 0.0
        elif build != 0:
            # abs(): a NEGATIVE build mean (corpus anti-aligned with its
            # centroids) must not flip the sign and mask real
            # degradation (review finding)
            degradation = (build - mean) / abs(build)
        else:
            # relative change is undefined at build==0 — fall back to
            # the absolute drop so a degrading store still trips
            degradation = build - mean
        return {
            "build_mean_sim": build,
            "live_mean_sim": mean,
            "n_vectors": n,
            "degradation": degradation,
            "needs_retrain": bool(
                meta.get("needs_retrain")
                or degradation >= self.drift_threshold
            ),
        }

    # -- probe -------------------------------------------------------------
    def topk(self, queries: DataFrame, k: int = 10, nprobe: int = 4) -> DataFrame:
        """ANN top-k over every live batch dir — the partition-pruned
        matmul probe (``similarity.matmul_topk_from_layout``) with one
        filtered leg per dir; per-query cost is O(probed fraction) of
        the whole store, independent of how many appends built it."""
        meta = self._read_meta()
        if not meta["batches"]:
            raise RuntimeError(f"IVF store at {self.path} has no build")
        dirs = self._require_live_dirs(meta, "probing")
        return S.matmul_topk_from_layout(
            self.spark,
            dirs,
            self.centroids(),
            queries,
            k=k,
            nprobe=nprobe,
            id_col=self.id_col,
            vec_col=self.vec_col,
        )

    # -- maintenance -------------------------------------------------------
    def compact(self) -> bool:
        """Fold every live ``batch=<id>`` dir into ONE generation dir
        (same two-phase discipline as the dedup index: write the new
        dir, atomically swap the meta KEEPING ``committed_ids`` — the
        replay guard must survive compaction — then best-effort GC).
        Assignments are already on disk, so compaction is a shuffle-free
        re-write, not a re-assignment. Returns False when there is
        nothing to fold."""
        with store_write_lock(self.path, timeout=self.lock_timeout):
            meta = self._read_meta()
            live = meta["batches"]
            if len(live) <= 1:
                return False
            dirs = self._require_live_dirs(meta, "compacting")
            gen = meta["generation"] + 1
            gen_id = f"gen{gen}"
            # chassis multi-root scan; 'batch' reads back as a partition
            # column and must not be written into the generation's data
            merged = self._read_data(dirs).drop("batch")
            out = self._batch_dir(gen_id)
            if os.path.isdir(out):
                shutil.rmtree(out)  # crashed earlier attempt
            merged.write.partitionBy("bucket_id").parquet(out)
            # fold the stats the same way the data folded (weighted mean)
            live_stats = [meta["stats"][b] for b in live if b in meta["stats"]]
            n = sum(s["n"] for s in live_stats)
            folded = {
                "n": n,
                "mean_sim": sum(s["mean_sim"] * s["n"] for s in live_stats) / n,
            }
            # invariant: every live batch id is committed (belt to the
            # append() reserved-namespace guard's braces)
            ledger.record(meta, gen_id)
            self._write_meta(
                {
                    **meta,
                    "batches": [gen_id],
                    "generation": gen,
                    "stats": {gen_id: folded},
                }
            )
            self._sweep_orphans([gen_id])
        return True

    def rebuild(self, centroids: DataFrame) -> dict:
        """The retrain the drift guard asks for: re-assign EVERY stored
        vector against NEW centroids as a fresh generation (fresh build
        stats, ``needs_retrain`` cleared). Two-phase like ``compact``:
        the new centroid dir and the new layout dir are STAGED beside
        the live state, the meta swap makes both visible atomically (a
        crash mid-rebuild leaves the old generation fully readable),
        then the old dirs are GC'd best-effort. The replay guard
        survives: ids committed before the rebuild stay committed.
        Requires EVERY meta-listed live dir on disk — a rebuild from a
        partial corpus would silently and permanently drop the missing
        batches' vectors while the ledger still blocks re-ingesting
        them (r10 advice; same guard compact() always had)."""
        with store_write_lock(self.path, timeout=self.lock_timeout):
            meta = self._read_meta()
            if not meta["batches"]:
                raise RuntimeError(f"IVF store at {self.path} has no build")
            dirs = self._require_live_dirs(meta, "rebuilding")
            gen = meta["generation"] + 1
            gen_id, cdir_name = f"gen{gen}", f"centroids_gen{gen}"
            cdir = os.path.join(self.path, cdir_name)
            if os.path.isdir(cdir):
                shutil.rmtree(cdir)  # crashed earlier attempt
            centroids.select(self.id_col, self.vec_col).write.parquet(cdir)
            self._cent_cache = None
            cent_rows = sorted(
                self.spark.read.parquet(cdir)
                .select(self.id_col, self.vec_col)
                .collect(),
                key=lambda r: r[0],
            )
            stats = self._write_batch(
                self._read_vectors(dirs), gen_id, cent_rows
            )
            ledger.record(meta, gen_id)
            self._write_meta(
                {
                    "batches": [gen_id],
                    "committed_ids": meta["committed_ids"],
                    "epoch_hwm": meta["epoch_hwm"],
                    "generation": gen,
                    "centroids_dir": cdir_name,
                    "centroids_token": uuid.uuid4().hex,
                    "n_centroids": len(cent_rows),
                    "stats": {gen_id: stats},
                    "build_mean_sim": stats["mean_sim"],
                    "needs_retrain": False,
                    **self._identity(),
                }
            )
            # GC everything the new meta doesn't reference
            self._sweep_orphans([gen_id])
            for d in os.listdir(self.path):
                if d.startswith("centroids") and d != cdir_name:
                    shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
        return self.drift()
