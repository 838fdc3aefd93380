"""Incremental MinHash-LSH dedup index: O(delta) near-dup detection for
a GROWING corpus (reference scope note: the reference re-lands whole
entities nightly, ``incremental_etl_v1.py:94-118``; a 100 TB training
corpus cannot re-run all-corpus dedup per ingest batch — each batch must
probe what is already indexed).

State on disk (under ``path/``):
- ``buckets/batch=<id>/``  — (band_id, band_hash, doc_id) LSH postings
- ``shingles/batch=<id>/`` — (doc_id, sh) shingle sets for exact verify
- ``_index_meta.json``     — committed batch ids (replay guard)

Per ``add_batch``, the work is O(|delta| + collisions):
- signatures/bands are computed for NEW docs only;
- the probe is ONE equi-join of the new postings against the stored
  postings on (band_id, band_hash) — uniform md5 keys, skew-free, never
  a scan of old signatures that share no bucket with the batch (at
  warehouse scale, storing postings bucketed-by band_hash makes the
  probe a co-located join);
- exact-Jaccard verification joins candidates back to shingle sets by
  doc_id — candidates only, never all pairs;
- the index write APPENDS one ``batch=<id>`` directory per store — no
  rewrite of prior postings.

Replay safety mirrors the CDC sink: a batch id is recorded in
``_index_meta.json`` only AFTER both stores' directories are fully
written, and a replayed ``add_batch`` with a committed id returns the
empty pair frame without touching the stores (pairs are derivable, state
must not double).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dedup as D

META_NAME = "_index_meta.json"


class LshDedupIndex:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        jaccard_min: float = 0.5,
        fast: bool = False,
    ) -> None:
        self.spark = spark
        self.path = path
        self.jaccard_min = jaccard_min
        self.sig_fn = D.minhash_signature_fast if fast else D.minhash_signature
        os.makedirs(path, exist_ok=True)

    # -- state ------------------------------------------------------------
    def _meta_path(self) -> str:
        return os.path.join(self.path, META_NAME)

    def _read_meta(self) -> dict:
        """Meta carries two distinct sets: ``batches`` = the LIVE store
        dirs to read (compaction shrinks this to one), and
        ``committed_ids`` = every batch id EVER ingested (the replay
        guard — compaction must not forget ids, or a replayed old batch
        would double its postings). Older metas carry only ``batches``;
        treat that as both."""
        try:
            with open(self._meta_path()) as fh:
                meta = json.load(fh)
        except FileNotFoundError:
            return {"batches": [], "committed_ids": [], "generation": 0}
        meta.setdefault("committed_ids", list(meta.get("batches", [])))
        meta.setdefault("generation", 0)
        return meta

    def _write_meta(self, meta: dict) -> None:
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, self._meta_path())

    def committed_batches(self) -> list[str]:
        """Live store dirs (what reads scan)."""
        return self._read_meta()["batches"]

    def committed_ids(self) -> list[str]:
        """Every batch id ever committed (what the replay guard checks);
        survives compaction."""
        return self._read_meta()["committed_ids"]

    def _commit(self, batch_id: str) -> None:
        meta = self._read_meta()
        meta["batches"] = meta["batches"] + [batch_id]
        meta["committed_ids"] = meta["committed_ids"] + [batch_id]
        self._write_meta(meta)

    def _store(self, name: str, batch_id: str | None = None) -> str:
        base = os.path.join(self.path, name)
        return os.path.join(base, f"batch={batch_id}") if batch_id else base

    def _read_committed(self, name: str, schema: str) -> DataFrame:
        """Read ONLY committed batch dirs — a crash between the store
        write and the meta commit leaves an orphan dir that must stay
        invisible (the retry rewrites it)."""
        dirs = [
            self._store(name, b)
            for b in self.committed_batches()
            if os.path.isdir(self._store(name, b))
        ]
        if not dirs:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(*dirs)

    # -- the operator ------------------------------------------------------
    def add_batch(
        self,
        docs: DataFrame,
        batch_id: str,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """Index a new batch and return its near-dup pairs: (id_a, id_b,
        jacc) for every pair with Jaccard >= jaccard_min where at least
        one side is in this batch (new-vs-corpus AND new-vs-new).
        Doc ids must be globally unique across batches."""
        empty = self.spark.createDataFrame(
            [], "id_a long, id_b long, jacc double"
        )
        if batch_id in self.committed_ids():
            return empty  # replay: state already reflects this batch
        pairs, commit = self.prepare_batch(docs, batch_id, id_col, text_col)
        commit()
        return pairs

    def prepare_batch(
        self,
        docs: DataFrame,
        batch_id: str,
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        """Two-phase variant for exactly-once consumers (the streaming
        leg): returns ``(pairs, commit)`` where ``pairs`` is computed
        against the COMMITTED state only and ``commit()`` persists the
        batch's postings. A caller that writes ``pairs`` to an
        idempotent (per-batch, overwrite) location BEFORE calling
        ``commit()`` gets exactly-once end to end: a crash before
        commit replays the whole batch against unchanged state (same
        pairs, overwritten in place); a crash after commit is caught by
        the ``committed_batches`` guard with the pairs already on
        disk."""
        sh = (
            docs.select(
                F.col(id_col).alias("doc_id"),
                D.shingles(F.col(text_col)).alias("sh"),
            )
            .filter(F.size("sh") > 0)
            # two consumers (banding + verify join) and a write below:
            # cut the plan once instead of recomputing shingles 3x
            .localCheckpoint()
        )
        banded = sh.select(
            "doc_id",
            F.posexplode(D.band_keys(self.sig_fn(F.col("sh")))).alias(
                "band_id", "band_hash"
            ),
        ).localCheckpoint()

        old_banded = self._read_committed(
            "buckets", "band_id int, band_hash string, doc_id long"
        )
        old_sh = self._read_committed("shingles", "doc_id long, sh array<string>")

        probe = (
            banded.alias("n")
            .join(
                old_banded.alias("o"),
                (F.col("n.band_id") == F.col("o.band_id"))
                & (F.col("n.band_hash") == F.col("o.band_hash")),
            )
            .select(
                F.col("o.doc_id").alias("id_a"), F.col("n.doc_id").alias("id_b")
            )
        )
        within = (
            banded.alias("a")
            .join(
                banded.alias("b"),
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        )
        cands = probe.unionByName(within).distinct()

        all_sh = old_sh.unionByName(sh)
        pairs = (
            cands.join(
                all_sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")),
                "id_a",
            )
            .join(
                all_sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")),
                "id_b",
            )
            .select("id_a", "id_b", D.jaccard(F.col("sh_a"), F.col("sh_b")).alias("jacc"))
            .filter(F.col("jacc") >= self.jaccard_min)
        )

        def commit() -> None:
            # append-only state: one new dir per store, then the meta
            # commit makes both visible atomically (crash before commit
            # -> orphan dirs are overwritten on retry, never read)
            for name, df in (("buckets", banded), ("shingles", sh)):
                out = self._store(name, batch_id)
                if os.path.isdir(out):
                    shutil.rmtree(out)  # crashed earlier attempt
                df.write.parquet(out)
            self._commit(batch_id)

        return pairs, commit

    # -- maintenance -------------------------------------------------------
    STORE_SCHEMAS = {
        "buckets": "band_id int, band_hash string, doc_id long",
        "shingles": "doc_id long, sh array<string>",
    }

    COMPACT_TARGET_BYTES = 64 * 1024 * 1024

    def compact(self, target_files: int | None = None) -> bool:
        """Merge every live ``batch=<id>`` dir into ONE generation dir
        per store. Without this, probe fan-in and file counts grow
        O(#batches) — a 100 TB ingest running thousands of batches
        would drown the probe join in tiny files. Postings are
        repartitioned on ``band_hash`` (uniform md5 — skew-free) so the
        compacted store is also better laid out for the probe join than
        the per-batch dirs it replaces.

        Crash-safe two-phase, same discipline as the sink family:

        1. write ``batch=gen<N>`` dirs for both stores (orphans until
           the meta swap — a crash here leaves the old meta pointing at
           the old dirs, fully readable; a retry rewrites the orphans);
        2. atomically swap the meta to ``batches=[gen<N>]``, KEEPING
           ``committed_ids`` (the replay guard must survive compaction
           or a replayed pre-compaction batch would double-ingest);
        3. best-effort GC of the now-invisible old dirs (a crash here
           leaves unreferenced dirs that reads never touch; the next
           compact sweeps them).

        Returns True if a compaction ran, False if there was nothing to
        merge (0 or 1 live dir)."""
        meta = self._read_meta()
        live = meta["batches"]
        if len(live) <= 1:
            return False
        gen = meta["generation"] + 1
        gen_id = f"gen{gen}"
        for name, schema in self.STORE_SCHEMAS.items():
            out = self._store(name, gen_id)
            if os.path.isdir(out):
                shutil.rmtree(out)  # crashed earlier attempt
            key = "band_hash" if name == "buckets" else "doc_id"
            # size output files by DATA, not a constant: a store of N
            # tiny batch files must compact DOWN (a fixed fan-out
            # re-fragmented small stores — measured), a large store
            # splits into ~64 MiB files
            n_files = target_files or max(
                1,
                -(-sum(
                    os.path.getsize(os.path.join(dp, f))
                    for b in live
                    if os.path.isdir(self._store(name, b))
                    for dp, _d, fs in os.walk(self._store(name, b))
                    for f in fs
                    if f.endswith(".parquet")
                ) // self.COMPACT_TARGET_BYTES),
            )
            self._read_committed(name, schema).repartition(
                n_files, key
            ).write.parquet(out)
        self._write_meta(
            {
                "batches": [gen_id],
                "committed_ids": meta["committed_ids"],
                "generation": gen,
            }
        )
        # GC everything the new meta doesn't reference — the just-merged
        # live dirs AND any orphans from a previous compact that crashed
        # between ITS meta swap and ITS sweep (reads never see either)
        for name in self.STORE_SCHEMAS:
            base = os.path.join(self.path, name)
            for d in os.listdir(base) if os.path.isdir(base) else []:
                if d.startswith("batch=") and d != f"batch={gen_id}":
                    shutil.rmtree(os.path.join(base, d), ignore_errors=True)
        return True
