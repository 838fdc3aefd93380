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
- ``_ivf_meta.json``       — live batch ids, every-ever committed ids
  (replay guard), per-batch assignment stats, generation counter

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

from . import similarity as S

META_NAME = "_ivf_meta.json"


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
        os.makedirs(path, exist_ok=True)

    # -- state ------------------------------------------------------------
    def _meta_path(self) -> str:
        return os.path.join(self.path, META_NAME)

    def _read_meta(self) -> dict:
        try:
            with open(self._meta_path()) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return {
                "batches": [],
                "committed_ids": [],
                "generation": 0,
                "stats": {},
                "build_mean_sim": None,
                "needs_retrain": False,
            }

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

    def appended_batches(self) -> list[str]:
        """Live batch ids excluding the build/generation dir — the
        count a maintenance cadence should key on: the base/gen dir is
        ALWAYS present, so a cadence counting ``committed_batches()``
        degenerates from "every N appends" to "every epoch" once a
        first fold exists (review finding)."""
        return [
            b
            for b in self.committed_batches()
            if b != "base" and not re.fullmatch(r"gen\d+", b)
        ]

    def committed_ids(self) -> list[str]:
        return self._read_meta()["committed_ids"]

    def live_dirs(self) -> list[str]:
        return [
            self._batch_dir(b)
            for b in self.committed_batches()
            if os.path.isdir(self._batch_dir(b))
        ]

    def centroids(self) -> DataFrame:
        """The PINNED centroid frame every batch in the current
        generation was assigned against."""
        return self.spark.read.parquet(self._centroids_dir())

    # -- build / append ----------------------------------------------------
    def build(self, corpus: DataFrame, centroids: DataFrame) -> dict:
        """Full (re)build as generation 0: pin the centroids, assign the
        corpus, write ``batch=base`` partitioned by bucket, record the
        build-time mean assignment similarity the drift guard compares
        against. Wipes any previous state at this path — including
        stale generation dirs a prior ``rebuild`` may have left."""
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
                "generation": 0,
                "centroids_dir": "centroids",
                "stats": {"base": stats},
                "build_mean_sim": stats["mean_sim"],
                "needs_retrain": False,
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
        committed id is a no-op."""
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
        meta = self._read_meta()
        if not meta["batches"]:
            raise RuntimeError(
                f"IVF store at {self.path} has no build — call build() "
                "before append()"
            )
        if batch_id in meta["committed_ids"]:
            return self.drift()  # replay: state already reflects this batch
        stats = self._write_batch(vectors, batch_id)
        # re-read: the meta may have moved while the batch wrote
        meta = self._read_meta()
        meta["batches"] = meta["batches"] + [batch_id]
        meta["committed_ids"] = meta["committed_ids"] + [batch_id]
        meta["stats"][batch_id] = stats
        self._write_meta(meta)
        drift = self.drift()
        if drift["needs_retrain"] and not meta.get("needs_retrain"):
            meta["needs_retrain"] = True
            self._write_meta(meta)
        return drift

    # -- drift guard -------------------------------------------------------
    def drift(self) -> dict:
        """Current assignment-quality status: live weighted mean
        similarity vs the build-time mean; ``needs_retrain`` when the
        relative degradation exceeds the threshold."""
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
        dirs = self.live_dirs()
        if not dirs:
            raise RuntimeError(f"IVF store at {self.path} has no build")
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
        meta = self._read_meta()
        live = meta["batches"]
        if len(live) <= 1:
            return False
        missing = [
            self._batch_dir(b) for b in live if not os.path.isdir(self._batch_dir(b))
        ]
        if missing:
            raise RuntimeError(
                f"IVF store at {self.path} is corrupt: meta lists live "
                f"batches {live} but these dirs are missing on disk: "
                f"{missing}; restore them or rebuild() before compacting"
            )
        gen = meta["generation"] + 1
        gen_id = f"gen{gen}"
        merged = self.spark.read.parquet(self._batch_dir(live[0]))
        for b in live[1:]:
            merged = merged.unionByName(self.spark.read.parquet(self._batch_dir(b)))
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
        self._write_meta(
            {
                **meta,
                "batches": [gen_id],
                # invariant: every live batch id is committed (belt to
                # the append() reserved-namespace guard's braces)
                "committed_ids": meta["committed_ids"] + [gen_id],
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
        survives: ids committed before the rebuild stay committed."""
        meta = self._read_meta()
        dirs = self.live_dirs()
        if not dirs:
            raise RuntimeError(f"IVF store at {self.path} has no build")
        gen = meta["generation"] + 1
        gen_id, cdir_name = f"gen{gen}", f"centroids_gen{gen}"
        cdir = os.path.join(self.path, cdir_name)
        if os.path.isdir(cdir):
            shutil.rmtree(cdir)  # crashed earlier attempt
        centroids.select(self.id_col, self.vec_col).write.parquet(cdir)
        cents = self.spark.read.parquet(cdir)
        all_vecs = self.spark.read.parquet(dirs[0]).select(self.id_col, self.vec_col)
        for d in dirs[1:]:
            all_vecs = all_vecs.unionByName(
                self.spark.read.parquet(d).select(self.id_col, self.vec_col)
            )
        stats = self._write_batch(all_vecs, gen_id, cents)
        self._write_meta(
            {
                "batches": [gen_id],
                "committed_ids": meta["committed_ids"] + [gen_id],
                "generation": gen,
                "centroids_dir": cdir_name,
                "stats": {gen_id: stats},
                "build_mean_sim": stats["mean_sim"],
                "needs_retrain": False,
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
