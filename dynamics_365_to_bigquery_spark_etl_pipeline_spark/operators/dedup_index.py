"""Incremental MinHash-LSH dedup index: O(delta) near-dup detection for
a GROWING corpus (reference scope note: the reference re-lands whole
entities nightly, ``incremental_etl_v1.py:94-118``; a 100 TB training
corpus cannot re-run all-corpus dedup per ingest batch — each batch must
probe what is already indexed).

State on disk (under ``path/``):
- ``buckets/batch=<id>/``  — (band_hash, doc_id) LSH postings, written
  as a BUCKETED parquet table on ``band_hash`` (r8: the probe key; the
  band id is folded into the hash so the key is ONE column Spark can
  bucket on)
- ``shingles/batch=<id>/`` — (doc_id, sh) shingle sets for exact verify
- ``_index_meta.json``     — committed batch ids (replay guard) + each
  dir's bucket count (so a FRESH session can re-register the bucketed
  table DDL and keep the co-located scan)

Per ``add_batch``, the work is O(|delta| + collisions):
- signatures/bands are computed for NEW docs only;
- the probe joins the new postings against EACH stored postings dir on
  ``band_hash`` — and because every dir is a bucketed table, the stored
  side is scanned ALREADY hash-partitioned on the probe key: the only
  exchange in each probe leg is the (delta-sized) new postings being
  shuffled into the store's bucketing. The stored postings — the side
  that grows with the corpus — are NEVER re-shuffled (plan-asserted in
  tests/test_dedup_index.py). Uniform md5 keys keep the buckets
  skew-free.
- exact-Jaccard verification joins candidates back to shingle sets by
  doc_id — candidates only, never all pairs;
- the index write APPENDS one ``batch=<id>`` directory per store — no
  rewrite of prior postings. ``compact()`` merges them into one
  generation dir, re-bucketed and sized by data volume.

Replay safety mirrors the CDC sink: a batch id is recorded in
``_index_meta.json`` only AFTER both stores' directories are fully
written, and a replayed ``add_batch`` with a committed id returns the
empty pair frame without touching the stores (pairs are derivable, state
must not double). Table-catalog entries are a per-session CACHE of the
on-disk state, never the source of truth: visibility is decided solely
by the meta file, and a crash between ``saveAsTable`` and the meta
commit leaves a catalog entry + dir that reads never touch and the
retry drops and rewrites.

Pre-r8 stores (postings as plain parquet with a separate ``band_id``
column) stay readable: their dirs carry no bucket-count entry in the
meta, so they take the legacy shuffled-probe leg with the two-column
key folded at read time.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dedup as D
from . import ledger
from .store_base import BatchDirStore
from .store_lock import store_write_lock

META_NAME = "_index_meta.json"


class LshDedupIndex(BatchDirStore):
    """Chassis subclass (r13 — meta/ledger/lock/orphan-GC grammar from
    ``store_base.BatchDirStore``; this class keeps what is LSH-specific:
    the TWO data roots ``buckets``/``shingles``, the bucketed-table
    probe plumbing, and the candidate/verify join). Meta specifics:
    ``buckets_n`` maps a live batch id to its postings dir's bucket
    count (absent = pre-r8 plain parquet, read via the legacy leg);
    pre-r8 metas carry only ``batches`` and migrate in
    ``_migrate_meta``. ``jaccard_min``/``fast`` are NOT pinned identity
    (a caller may legitimately re-probe an existing index at a
    different threshold); the postings/shingles layout is
    knob-independent."""

    KIND = "dedup index"
    META_NAME = META_NAME
    DATA_DIR = "buckets"
    # default bucket count for per-batch postings dirs; compact() sizes
    # the generation store from data volume instead
    BATCH_BUCKETS = 8

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        jaccard_min: float = 0.5,
        fast: bool = False,
        batch_buckets: int | None = None,
        lock_timeout: float = 60.0,
    ) -> None:
        self.jaccard_min = jaccard_min
        self.sig_fn = D.minhash_signature_fast if fast else D.minhash_signature
        if batch_buckets is not None and batch_buckets < 1:
            # same falsy-zero trap the CLI rejects: 0 must be an error,
            # not a silent fallback to the default
            raise ValueError(f"batch_buckets must be >= 1 (got {batch_buckets})")
        self.batch_buckets = batch_buckets or self.BATCH_BUCKETS
        # lock_timeout: write-lock wait budget, not identity — size it
        # to the longest mutating op a writer may queue behind (a
        # compact() is a full-corpus rewrite; IvfLayoutStore's note)
        super().__init__(spark, path, lock_timeout=lock_timeout)

    # -- state ------------------------------------------------------------
    def _meta_defaults(self) -> dict:
        return {"buckets_n": {}}

    def _migrate_meta(self, meta: dict) -> None:
        """Pre-r8 metas carry only ``batches`` (that list was both the
        live set and the ledger); pre-r11 metas carry epoch keys in the
        flat list — they keep exact membership there and fold away via
        ``ledger.record``'s pruning (retroactive folding would impose
        ordering semantics historic batch ids never had, r11 review)."""
        meta.setdefault("committed_ids", list(meta.get("batches", [])))
        meta.setdefault("generation", 0)
        meta.setdefault("buckets_n", {})

    def _commit(self, batch_id: str, n_buckets: int) -> None:
        # caller holds the store write lock; re-check the ledger under
        # it — two same-id ingests that both passed the unlocked replay
        # check must not double the batches list
        meta = self._read_meta()
        if ledger.is_committed(meta, batch_id):
            return
        meta["batches"] = meta["batches"] + [batch_id]
        ledger.record(meta, batch_id)
        meta["buckets_n"][batch_id] = n_buckets
        self._write_meta(meta)

    def _store(self, name: str, batch_id: str | None = None) -> str:
        base = os.path.join(self.path, name)
        return os.path.join(base, f"batch={batch_id}") if batch_id else base

    def _orphan_roots(self) -> list[str]:
        """Both data roots — a crashed compact orphans the same batch
        id under buckets/ AND shingles/ (the chassis sweep() then
        reclaims and counts per batch id across them)."""
        return [self._store(name) for name in self.STORE_SCHEMAS]

    # -- bucketed-table plumbing ------------------------------------------
    def _table_name(self, batch_id: str) -> str:
        """Session-catalog name for a postings dir's bucketed table:
        derived from the index path (so two indexes never collide) and
        the batch id. The readable sanitized id is for humans; the
        appended digest of the RAW id is what guarantees uniqueness —
        sanitization alone maps distinct ids like 'b.1' and 'b-1' to
        the same name, which would silently alias one batch's postings
        to another's files (review finding, r8)."""
        digest = hashlib.md5(os.path.abspath(self.path).encode()).hexdigest()[:10]
        bdigest = hashlib.md5(batch_id.encode()).hexdigest()[:8]
        safe = "".join(c if c.isalnum() else "_" for c in batch_id)[:40]
        return f"lshidx_{digest}_{safe}_{bdigest}"

    def _drop_table(self, batch_id: str) -> None:
        self.spark.sql(
            f"DROP TABLE IF EXISTS {self._table_name(batch_id)}"
        )

    def _write_bucketed(self, df: DataFrame, batch_id: str, n: int) -> None:
        """Write postings as a bucketed external table at the store dir:
        ``repartition(n, band_hash)`` first so each task holds exactly
        one bucket's rows and the store is one file per bucket;
        ``sortBy`` so the bucketed scan also reports sorted output and a
        sort-merge probe skips the sort on the stored side."""
        out = self._store("buckets", batch_id)
        if os.path.isdir(out):
            shutil.rmtree(out)  # crashed earlier attempt
        self._drop_table(batch_id)
        (
            df.repartition(n, "band_hash")
            .write.format("parquet")
            .bucketBy(n, "band_hash")
            .sortBy("band_hash")
            .option("path", out)
            .saveAsTable(self._table_name(batch_id))
        )

    def _bucketed_postings(self, batch_id: str, n: int) -> DataFrame:
        """Scan one postings dir THROUGH its bucketed-table entry so the
        scan reports hashpartitioning(band_hash, n) and the probe join
        needs no exchange on this side. A fresh session re-registers the
        DDL from the meta's bucket count — bucketing survives restarts
        because the files (written by the bucketed writer) carry their
        bucket ids in their names."""
        name = self._table_name(batch_id)
        if not self.spark.catalog.tableExists(name):
            loc = os.path.abspath(self._store("buckets", batch_id))
            loc_sql = loc.replace("'", "''")  # paths may contain quotes
            self.spark.sql(
                f"CREATE TABLE {name} (band_hash STRING, doc_id BIGINT) "
                f"USING PARQUET CLUSTERED BY (band_hash) INTO {n} BUCKETS "
                f"LOCATION '{loc_sql}'"
            )
        return self.spark.table(name).select("band_hash", "doc_id")

    def _postings_legs(self) -> list[DataFrame]:
        """One frame per live postings dir: bucketed dirs through their
        table entry (co-located probe), pre-r8 plain dirs through a raw
        read with the two-column key folded (legacy shuffled leg)."""
        meta = self._read_meta()
        legs: list[DataFrame] = []
        for b in meta["batches"]:
            if not os.path.isdir(self._store("buckets", b)):
                continue
            n = meta["buckets_n"].get(b)
            if n:
                legs.append(self._bucketed_postings(b, n))
            else:
                old = self.spark.read.parquet(self._store("buckets", b))
                if "band_id" in old.columns:  # pre-r8 layout
                    old = old.select(
                        F.concat_ws(
                            ":", F.col("band_id"), F.col("band_hash")
                        ).alias("band_hash"),
                        "doc_id",
                    )
                legs.append(old.select("band_hash", "doc_id"))
        return legs

    def _read_committed_shingles(self) -> DataFrame:
        """Read ONLY committed batch dirs — a crash between the store
        write and the meta commit leaves an orphan dir that must stay
        invisible (the retry rewrites it)."""
        dirs = [
            self._store("shingles", b)
            for b in self.committed_batches()
            if os.path.isdir(self._store("shingles", b))
        ]
        if not dirs:
            return self.spark.createDataFrame([], "doc_id long, sh array<string>")
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
        Doc ids must be globally unique across batches. Batch ids
        shaped ``*-epoch-<n>`` are the streaming leg's and carry
        monotonic per-prefix replay semantics (``operators/ledger.py``)."""
        empty = self.spark.createDataFrame(
            [], "id_a long, id_b long, jacc double"
        )
        if self.is_committed(batch_id):
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
        # chassis allowlist + gen<N> reservation (a path-separator id
        # escapes the batch= namespace; an ingest named like the live
        # generation would rmtree and replace the compacted corpus)
        self._check_batch_id(batch_id)
        # ONE materialization for the whole batch (r14 — the per-epoch
        # breakdown showed this stage dominated by its checkpoint jobs):
        # shingles AND the banded signature keys land in one pinned
        # frame, so the minhash kernel runs exactly once per doc; the
        # exploded posting view derives lazily from the materialized
        # arrays (re-exploding pinned arrays is cheap, re-running
        # sig_fn was not — the pre-r14 shape paid a second full pass
        # to checkpoint the exploded form)
        staged = (
            docs.select(
                F.col(id_col).alias("doc_id"),
                D.shingles(F.col(text_col)).alias("sh"),
            )
            # signature as its OWN projection (r15): band_keys
            # references its argument 16 times, and an inlined
            # signature expression is re-embedded per reference (the
            # 16x blowup the batch query's staging note warns about —
            # CollapseProject keeps the column because it is multiply
            # referenced and non-cheap)
            .select("doc_id", "sh", self.sig_fn(F.col("sh")).alias("_sig"))
            .select("doc_id", "sh", D.band_keys(F.col("_sig")).alias("_bks"))
            .localCheckpoint()
        )
        # the size>0 filter sits ABOVE the checkpoint cut (r15): below
        # it, pushdown substitutes the whole shingle expression into
        # the condition and the staged job shingles 2-3x per doc; on
        # the materialized column it costs nothing. Empty-sh rows are
        # checkpointed (negligible) and excluded from BOTH stores here.
        staged = staged.filter(F.size("sh") > 0)
        sh = staged.select("doc_id", "sh")
        # ONE probe-key column: band id folded into the hash (a bucketed
        # table can then hash-partition on exactly the join key)
        banded = staged.select(
            "doc_id",
            F.posexplode("_bks").alias("band_id", "_bh"),
        ).select(
            "doc_id",
            F.concat_ws(":", F.col("band_id"), F.col("_bh")).alias("band_hash"),
        )

        old_sh = self._read_committed_shingles()

        # one co-located probe leg per stored postings dir: the stored
        # scan arrives pre-partitioned on band_hash, only the new batch's
        # (delta-sized) postings get exchanged into its bucketing
        probe_legs = [
            banded.alias("n")
            .join(old.alias("o"), "band_hash")
            .select(
                F.col("o.doc_id").alias("id_a"), F.col("n.doc_id").alias("id_b")
            )
            for old in self._postings_legs()
        ]
        within = (
            banded.alias("a")
            .join(
                banded.alias("b"),
                (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        )
        cands = within
        for leg in probe_legs:
            cands = cands.unionByName(leg)
        cands = cands.distinct()

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
            # append-only state: one new dir per store (postings as a
            # bucketed table), then the meta commit makes both visible
            # atomically (crash before commit -> orphan dirs + catalog
            # entries are overwritten on retry, never read). The write
            # lock spans the DIR writes too: a concurrent compact()'s
            # GC sweep would rmtree an uncommitted in-flight dir
            # (store_lock module docstring; r10 verdict #6).
            with store_write_lock(self.path, timeout=self.lock_timeout):
                # replay re-check FIRST, inside the lock: the lock loser
                # of two same-id ingests must not reach the dir rewrites
                # below — they rmtree + DROP the winner's just-committed
                # postings table before _commit would no-op, a window a
                # concurrent reader sees as a vanished table (r11
                # review; IvfLayoutStore.append has the same ordering)
                if ledger.is_committed(self._read_meta(), batch_id):
                    return
                # the two store writes are independent jobs over the
                # SAME pinned checkpoint (guide §2.6, r16): overlap them
                # on a second driver thread; both must have SUCCEEDED —
                # result() re-raises — before the meta commit makes
                # either visible, so the two-phase discipline holds
                from concurrent.futures import ThreadPoolExecutor

                out = self._store("shingles", batch_id)
                if os.path.isdir(out):
                    shutil.rmtree(out)  # crashed earlier attempt
                with ThreadPoolExecutor(max_workers=1) as pool:
                    fut = pool.submit(
                        self._write_bucketed,
                        banded,
                        batch_id,
                        self.batch_buckets,
                    )
                    sh.write.parquet(out)
                    fut.result()
                self._commit(batch_id, self.batch_buckets)

        return pairs, commit

    # -- maintenance -------------------------------------------------------
    STORE_SCHEMAS = {
        "buckets": "band_hash string, doc_id long",
        "shingles": "doc_id long, sh array<string>",
    }

    COMPACT_TARGET_BYTES = 64 * 1024 * 1024

    def _store_bytes(self, name: str, live: list[str]) -> int:
        return sum(
            os.path.getsize(os.path.join(dp, f))
            for b in live
            if os.path.isdir(self._store(name, b))
            for dp, _d, fs in os.walk(self._store(name, b))
            for f in fs
            if f.endswith(".parquet")
        )

    def compact(self, target_files: int | None = None) -> bool:
        """Merge every live ``batch=<id>`` dir into ONE generation dir
        per store. Without this, probe fan-in and file counts grow
        O(#batches) — a 100 TB ingest running thousands of batches
        would drown the probe join in tiny files. The generation's
        postings are written as ONE bucketed table on ``band_hash``
        (uniform md5 — skew-free), bucket count sized by data volume,
        so the post-compaction probe is a single co-located join leg.

        Crash-safe two-phase, same discipline as the sink family:

        1. write ``batch=gen<N>`` dirs for both stores (orphans until
           the meta swap — a crash here leaves the old meta pointing at
           the old dirs, fully readable; a retry rewrites the orphans);
        2. atomically swap the meta to ``batches=[gen<N>]``, KEEPING
           ``committed_ids`` (the replay guard must survive compaction
           or a replayed pre-compaction batch would double-ingest);
        3. best-effort GC of the now-invisible old dirs + their catalog
           entries (a crash here leaves unreferenced dirs that reads
           never touch; the next compact sweeps them).

        Returns True if a compaction ran, False if there was nothing to
        merge (0 or 1 live dir)."""
        with store_write_lock(self.path, timeout=self.lock_timeout):
            meta = self._read_meta()
            live = meta["batches"]
            if len(live) <= 1:
                return False
            gen = meta["generation"] + 1
            gen_id = f"gen{gen}"

            # postings: union every live leg (bucketed or legacy) and
            # rewrite as one bucketed generation table. Size output files by
            # DATA, not a constant: a store of N tiny batch files must
            # compact DOWN (a fixed fan-out re-fragmented small stores —
            # measured), a large store splits into ~64 MiB buckets.
            n_buckets = target_files or max(
                1, -(-self._store_bytes("buckets", live) // self.COMPACT_TARGET_BYTES)
            )
            # Reads tolerate missing live dirs (they skip them), but a
            # compaction folding a PARTIAL store would swap the meta to a
            # generation that permanently erases the missing batches'
            # postings/shingles — committed_ids still blocks re-ingest, so
            # the loss would be silent and unrecoverable. Require EVERY live
            # batch dir of BOTH stores on disk before merging; fail loudly
            # naming what's missing (r8 advice + r9 review finding: the
            # first guard only caught the all-missing case).
            missing = [
                self._store(name, b)
                for name in self.STORE_SCHEMAS
                for b in live
                if not os.path.isdir(self._store(name, b))
            ]
            if missing:
                raise RuntimeError(
                    f"dedup index at {self.path} is corrupt: meta lists live "
                    f"batches {live} but these store dirs are missing on "
                    f"disk: {missing}; restore them or rebuild the index "
                    "before compacting"
                )
            legs = self._postings_legs()
            merged = legs[0]
            for leg in legs[1:]:
                merged = merged.unionByName(leg)
            self._write_bucketed(merged, gen_id, n_buckets)

            n_sh_files = target_files or max(
                1, -(-self._store_bytes("shingles", live) // self.COMPACT_TARGET_BYTES)
            )
            out = self._store("shingles", gen_id)
            if os.path.isdir(out):
                shutil.rmtree(out)  # crashed earlier attempt
            self._read_committed_shingles().repartition(
                n_sh_files, "doc_id"
            ).write.parquet(out)

            self._write_meta(
                {
                    "batches": [gen_id],
                    # the replay ledger stays INGEST ids only (the
                    # guard's semantics) and must survive compaction —
                    # BOTH halves, the batch-id list and the epoch
                    # high-water map; the generation namespace cannot
                    # collide with an ingest because prepare_batch
                    # rejects 'gen<N>' batch ids outright
                    "committed_ids": meta["committed_ids"],
                    "epoch_hwm": meta["epoch_hwm"],
                    "generation": gen,
                    "buckets_n": {gen_id: n_buckets},
                }
            )
            # GC everything the new meta doesn't reference — the just-merged
            # live dirs AND any orphans from a previous compact that crashed
            # between ITS meta swap and ITS sweep (reads never see either).
            # Catalog entries are a session cache of the postings dirs:
            # drop them first (the chassis sweep only knows dirs).
            for name in self.STORE_SCHEMAS:
                base = os.path.join(self.path, name)
                if name == "buckets":
                    for d in os.listdir(base) if os.path.isdir(base) else []:
                        if d.startswith("batch=") and d != f"batch={gen_id}":
                            self._drop_table(d[len("batch=") :])
                self._sweep_orphans([gen_id], root=base)
            return True
