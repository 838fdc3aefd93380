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

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import ledger
from . import similarity as S
from .store_lock import store_write_lock

META_NAME = "_ivf_meta.json"

# meta keys pinned at build() and validated on every open
IDENTITY_KEYS = ("drift_threshold", "id_col", "vec_col")


def _assign_with_sim(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """The layout build's OWN assignment kernel with the winning cosine
    kept (the store's drift stat needs it) — shared, not forked, so the
    append==rebuild probe equivalence can never drift from
    ``similarity.assign_ivf_buckets_matmul``'s tie-break."""
    return S.assign_ivf_buckets_matmul(
        corpus, centroids, id_col, vec_col, with_sim=True
    )


class IvfLayoutStore:
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
        self.spark = spark
        self.path = path
        self.drift_threshold = drift_threshold
        self.id_col = id_col
        self.vec_col = vec_col
        # how long a mutating op waits for the write lock. NOT part of
        # the store identity: it sizes the WAIT, not the data. The 60 s
        # default suits append-vs-append contention; a stream expected
        # to ride out a concurrent compact()/rebuild() (minutes of
        # full-corpus rewrite at scale) must size this to that window
        # or the foreachBatch epoch dies in StoreLockHeld (r11 review)
        self.lock_timeout = lock_timeout
        os.makedirs(path, exist_ok=True)

    # -- state ------------------------------------------------------------
    def _meta_path(self) -> str:
        return os.path.join(self.path, META_NAME)

    def _identity(self) -> dict:
        return {k: getattr(self, k) for k in IDENTITY_KEYS}

    def _read_meta(self) -> dict:
        """Load + migrate the meta. The replay ledger gains the bounded
        high-water key (``ledger.migrate``; pre-r11 flat-list ids keep
        exact membership and fold away through ``ledger.record``'s
        pruning); the store IDENTITY is validated against
        this instance's knobs and a mismatch fails loudly — a stream
        opened at a different ``drift_threshold`` would silently move
        the retrain line, different columns would break the probe
        (r10 verdict #3). Pre-r11 metas carry no identity keys: the
        instance's values are adopted and persisted on the next
        write."""
        try:
            with open(self._meta_path()) as fh:
                meta = json.load(fh)
        except FileNotFoundError:
            return {
                "batches": [],
                "committed_ids": [],
                "epoch_hwm": {},
                "generation": 0,
                "stats": {},
                "build_mean_sim": None,
                "needs_retrain": False,
                **self._identity(),
            }
        ledger.migrate(meta)
        for key, mine in self._identity().items():
            theirs = meta.setdefault(key, mine)
            if theirs != mine:
                raise ValueError(
                    f"IVF store at {self.path} was built with "
                    f"{key}={theirs!r}, opened with {key}={mine!r} — "
                    "identity knobs are per-store (pinned at build()); "
                    "open with the build values, or build() afresh to "
                    "re-pin them"
                )
        return meta

    def _write_meta(self, meta: dict) -> None:
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, self._meta_path())

    def _batch_dir(self, batch_id: str) -> str:
        return os.path.join(self.path, "vectors", f"batch={batch_id}")

    def _centroids_dir(self) -> str:
        """The CURRENT generation's centroid dir — versioned through the
        meta so ``rebuild`` can stage new centroids beside the live ones
        and swap atomically (two-phase, like every store in this repo)."""
        name = self._read_meta().get("centroids_dir", "centroids")
        return os.path.join(self.path, name)

    def committed_batches(self) -> list[str]:
        return self._read_meta()["batches"]

    def appended_batches(self, meta: dict | None = None) -> list[str]:
        """Live batch ids excluding the build/generation dir — the
        count a maintenance cadence should key on: the base/gen dir is
        ALWAYS present, so a cadence counting ``committed_batches()``
        degenerates from "every N appends" to "every epoch" once a
        first fold exists (review finding). ``meta`` as in ``drift``:
        pass a snapshot to keep multi-field status reads untorn — and
        so the reserved-name rule lives HERE, not re-derived by
        callers (r11 review)."""
        batches = (
            meta["batches"] if meta is not None else self.committed_batches()
        )
        return [
            b
            for b in batches
            if b != "base" and not re.fullmatch(r"gen\d+", b)
        ]

    def committed_ids(self) -> list[str]:
        """The exact-membership ledger half (batch-API ids, ``base``,
        ``gen<N>`` — plus, on a migrated pre-r11 store, historical
        epoch-shaped ids until a newer epoch commits under the same
        prefix: see ``operators/ledger.py``). New streaming epoch keys
        go to the bounded high-water map instead — use ``is_committed``
        for the replay check (r10 verdict #2)."""
        return self._read_meta()["committed_ids"]

    def epoch_high_water(self) -> dict[str, int]:
        """``{query_id: max committed epoch}`` — the streaming legs'
        bounded replay ledger."""
        return dict(self._read_meta()["epoch_hwm"])

    def is_committed(self, batch_id: str) -> bool:
        """Replay guard: True when the store's state already reflects
        this batch id (exact membership for batch ids, high-water for
        ``<query-id>-epoch-<n>`` keys)."""
        return ledger.is_committed(self._read_meta(), batch_id)

    @classmethod
    def open(
        cls, spark: SparkSession, path: str, lock_timeout: float = 60.0
    ) -> "IvfLayoutStore":
        """Open an EXISTING store ADOPTING its pinned identity knobs.
        The constructor validates instance knobs against the meta and
        fails loudly on mismatch — right for the ingest legs, where a
        silently different ``drift_threshold`` would move the retrain
        line (r10 verdict #3). A maintenance/admin flow is the
        opposite case: it should operate on whatever the build pinned,
        not guess constructor values. Raises ``FileNotFoundError``
        when no store exists at ``path``."""
        with open(os.path.join(path, META_NAME)) as fh:
            meta = json.load(fh)
        knobs = {k: meta[k] for k in IDENTITY_KEYS if k in meta}
        return cls(spark, path, lock_timeout=lock_timeout, **knobs)

    def centroids(self) -> DataFrame:
        """The PINNED centroid frame every batch in the current
        generation was assigned against."""
        return self.spark.read.parquet(self._centroids_dir())

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
        """One multi-root scan over live dirs — NOT an O(#dirs)-deep
        unionByName chain, whose analyzer cost grows with batch fan-in
        (r11 review). Shared by ``vectors()`` and ``rebuild()`` so the
        corpus read cannot fork. The store's batch dirs all live under
        ``<path>/vectors/``, so that root is the common ``basePath``
        multi-root partition discovery needs (explicit dir list keeps
        orphan/uncommitted dirs invisible; ``batch``/``bucket_id`` read
        back as partition columns and are projected away)."""
        return (
            self.spark.read.option(
                "basePath", os.path.join(self.path, "vectors")
            )
            .parquet(*dirs)
            .select(self.id_col, self.vec_col)
        )

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
            cents = self.spark.read.parquet(cdir)
            stats = self._write_batch(corpus, "base", cents)
            self._write_meta(
                {
                    "batches": ["base"],
                    "committed_ids": ["base"],
                    "epoch_hwm": {},
                    "generation": 0,
                    "centroids_dir": "centroids",
                    "stats": {"base": stats},
                    "build_mean_sim": stats["mean_sim"],
                    "needs_retrain": False,
                    **self._identity(),
                }
            )
        return self.drift()

    def _write_batch(
        self, vectors: DataFrame, batch_id: str, centroids: DataFrame | None = None
    ) -> dict:
        """Assign + write one batch dir; returns its stats. The
        assignment is cut once (two consumers: the layout write and the
        stats aggregate must not run the kernel twice)."""
        assigned = _assign_with_sim(
            vectors,
            self.centroids() if centroids is None else centroids,
            self.id_col,
            self.vec_col,
        ).localCheckpoint()
        out = self._batch_dir(batch_id)
        if os.path.isdir(out):
            shutil.rmtree(out)  # crashed earlier attempt
        (
            assigned.drop("sim")
            .write.partitionBy("bucket_id")
            .parquet(out)
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
        if not re.fullmatch(r"[A-Za-z0-9][A-Za-z0-9._-]*", batch_id):
            # allowlist, not blocklist: an id with a path separator
            # ('2026/08/15', 'x/../batch=gen1') would escape the
            # batch= dir and can resolve INTO the live generation dir,
            # which _write_batch would then rmtree as a crashed attempt
            # (review finding)
            raise ValueError(
                f"batch_id {batch_id!r} must match [A-Za-z0-9._-]+ "
                "(it names a directory under the store)"
            )
        if batch_id == "base" or re.fullmatch(r"gen\d+", batch_id):
            # the store's own dir namespace — an append named like the
            # live generation would pass the replay guard, then rmtree
            # the generation dir as a "crashed earlier attempt" and
            # replace the corpus with the delta (review finding)
            raise ValueError(
                f"batch_id {batch_id!r} is reserved (the store names its "
                "build 'base' and compaction/rebuild generations 'gen<N>')"
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
            stats = self._write_batch(vectors, batch_id)
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

    def _require_live_dirs(self, meta: dict, verb: str) -> list[str]:
        """Every meta-listed live batch dir, failing LOUDLY if any is
        missing on disk: any committed state has all its live dirs (the
        two-phase swaps guarantee it), so a hole is corruption — and
        silently skipping it would drop committed vectors from a probe
        result or, worse, rebuild a new generation from a partial
        corpus with ``committed_ids`` still blocking re-ingest
        (r10 advice: compact() had this check, rebuild()/topk()
        didn't)."""
        live = meta["batches"]
        missing = [
            self._batch_dir(b)
            for b in live
            if not os.path.isdir(self._batch_dir(b))
        ]
        if missing:
            raise RuntimeError(
                f"IVF store at {self.path} is corrupt: meta lists live "
                f"batches {live} but these dirs are missing on disk: "
                f"{missing}; restore them or rebuild from source before "
                f"{verb}"
            )
        return [self._batch_dir(b) for b in live]

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
            merged = self.spark.read.parquet(dirs[0])
            for d in dirs[1:]:
                merged = merged.unionByName(self.spark.read.parquet(d))
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
            base = os.path.join(self.path, "vectors")
            for d in os.listdir(base) if os.path.isdir(base) else []:
                if d.startswith("batch=") and d != f"batch={gen_id}":
                    shutil.rmtree(os.path.join(base, d), ignore_errors=True)
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
            cents = self.spark.read.parquet(cdir)
            stats = self._write_batch(self._read_vectors(dirs), gen_id, cents)
            ledger.record(meta, gen_id)
            self._write_meta(
                {
                    "batches": [gen_id],
                    "committed_ids": meta["committed_ids"],
                    "epoch_hwm": meta["epoch_hwm"],
                    "generation": gen,
                    "centroids_dir": cdir_name,
                    "stats": {gen_id: stats},
                    "build_mean_sim": stats["mean_sim"],
                    "needs_retrain": False,
                    **self._identity(),
                }
            )
            # GC everything the new meta doesn't reference
            base = os.path.join(self.path, "vectors")
            for d in os.listdir(base) if os.path.isdir(base) else []:
                if d.startswith("batch=") and d != f"batch={gen_id}":
                    shutil.rmtree(os.path.join(base, d), ignore_errors=True)
            for d in os.listdir(self.path):
                if d.startswith("centroids") and d != cdir_name:
                    shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
        return self.drift()
