"""Incremental n-gram window-count store: the corpus-wide occurrence
counts behind span-level dedup, maintained O(delta) per batch (r12).

``plans/text_queries.q_text_dup_spans`` decides "is this W-token
window duplicated?" from a full-corpus count — rerun from scratch per
sweep. This store persists per-batch window counts (counts are
ADDITIVE, so batch-built state equals a full recount by arithmetic)
and lets the streaming span gate (``streaming/span_gate.py``) flag
arriving documents against everything ingested so far without ever
re-exploding the indexed corpus.

Chassis from ``operators/store_base.BatchDirStore`` (batch dirs +
bounded ledger + write lock + orphan GC + identity pinning — shared
with the BM25 index). A batch dir holds ``(gram, c)`` rows
hash-partitioned into ``gram_bucket=<b>`` dirs, ONE gram-sorted file
per bucket (r13 — bounded file counts, tight row-group stats).

Probe cost (r12 verdict #1 — this was the one per-epoch cost in any
leg that grew with the CORPUS instead of the delta): every dir holds
at most one row per gram (appends write aggregated counts, compaction
sum-merges), so with a single live dir — ``compact_every=1``, the
documented LOW-LATENCY mode — the probe needs NO re-aggregation, just
a scan. ``probe_counts(grams)`` additionally PARTITION-PRUNES that
scan to the probe vocabulary's ``gram_bucket`` dirs: sublinear reads
whenever the arriving batch's vocabulary hits fewer buckets than the
store has (size ``n_buckets`` to the expected batch vocabulary — a
small-batch low-latency gate over ``n_buckets=256`` reads only the
buckets its grams hash to; a bulk gate whose batches hit every bucket
used to degrade to the full scan). r14 (r13 verdict #2): BULK
vocabularies now consult per-bucket Bloom sidecars
(``operators/bloom_sidecar.py``, written at append/compact) first —
grams provably absent store-wide drop before any scan is planned, and
the survivors (true duplicates + ~0.2% fpp of the vocabulary) ride
the inline pushdown, so the common mostly-new backfill batch probes
survivor-shaped, not corpus-shaped. Saturated blooms or
duplicate-heavy batches fall back to scan + join, the honest
exact-semantics floor. ``past_counts()`` keeps the unpruned
whole-store frame for callers that need it.

Window extraction is the SHARED ``curation.word_ngrams`` reshape — the
same rule as the batch detector, so gate and detector cannot tokenize
differently.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import bloom_sidecar as B
from . import curation as C
from .expr_util import explode_nonempty
from . import ledger
from .store_base import (
    PARQUET_IN_MAX,
    BatchDirStore,
    raise_parquet_in_threshold,
)
from .store_lock import store_write_lock

META_NAME = "_ngram_meta.json"

IDENTITY_KEYS = ("text_col", "w", "n_buckets")

# logical-plan leaves whose re-evaluation provably replays the same
# rows: a localCheckpoint/createDataFrame RDD, an inline relation, or
# a Range — NOT a file scan (the files could change between the
# pushdown sample and the caller's join) and NOT anything carrying a
# nondeterministic expression
_PINNED_LEAVES = ("LogicalRDD", "LocalRelation", "OneRowRelation", "Range")


def _require_pinned_plan(df: DataFrame, where: str) -> None:
    """Refuse a probe frame that could re-evaluate differently (r13
    verdict #5): ``probe_counts`` derives its pushdowns from ONE
    evaluation while the caller's join re-evaluates the frame — a
    frame that grows new grams on the second evaluation would have
    them scan-filtered out and read as c_past=0, WRONG DATA with no
    error. The check is a driver-side plan walk (no job): every node
    must be deterministic and every leaf a pinned relation."""
    jplan = df._jdf.queryExecution().analyzed()
    stack = [jplan]
    while stack:
        node = stack.pop()
        children = node.children()
        n = children.size()
        cls = node.getClass().getSimpleName()
        if n == 0 and cls not in _PINNED_LEAVES:
            raise ValueError(
                f"{where}: probe frame reads a re-evaluatable source "
                f"({cls}) — the pushdowns here are derived from one "
                "evaluation while your join re-evaluates the frame, so "
                "a source that changes between the two reads missing "
                "grams as c_past=0 with no error. localCheckpoint() "
                "the frame first (the gate's rule), or pass "
                "unsafe_allow_recompute=True if the source is provably "
                "immutable"
            )
        if not node.deterministic():
            raise ValueError(
                f"{where}: probe frame carries a nondeterministic "
                f"expression ({cls}) — its re-evaluation in your join "
                "can produce grams the pushdown sample never saw, read "
                "back as c_past=0 with no error. localCheckpoint() the "
                "frame first, or pass unsafe_allow_recompute=True"
            )
        for i in range(n):
            stack.append(children.apply(i))


class NgramCountStore(BatchDirStore):
    KIND = "n-gram count store"
    META_NAME = META_NAME
    DATA_DIR = "counts"
    IDENTITY_KEYS = IDENTITY_KEYS

    N_BUCKETS = 16

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        text_col: str = "text",
        w: int = 5,
        n_buckets: int = N_BUCKETS,
        lock_timeout: float = 60.0,
    ) -> None:
        if w < 1:
            raise ValueError(f"w must be >= 1 (got {w})")
        if n_buckets < 1:
            raise ValueError(f"n_buckets must be >= 1 (got {n_buckets})")
        self.text_col = text_col
        self.w = w
        self.n_buckets = n_buckets
        super().__init__(spark, path, lock_timeout=lock_timeout)

    def _meta_defaults(self) -> dict:
        return {"n_windows": 0, "stats": {}}

    # -- ingest ---------------------------------------------------------------
    def batch_counts(self, docs: DataFrame) -> DataFrame:
        """``(gram, c)`` for one document batch — the shared
        ``word_ngrams`` reshape, counted. Public so the streaming gate
        can reuse the exact expression for its in-batch counts."""
        return (
            # explode_nonempty (r16, the shared owner): one
            # window-expression evaluation per row (no inferred size>0
            # filter); the null row of an under-w-tokens doc is dropped
            # at the generate so the stored (gram, c) rows are identical
            explode_nonempty(
                docs, [], C.word_ngrams(F.col(self.text_col), self.w), "gram"
            )
            .groupBy("gram")
            .agg(F.count("*").alias("c"))
        )

    def append(self, docs: DataFrame, batch_id: str) -> dict:
        """Add one batch's window counts in O(|delta|). Returns the
        store stats after the commit. Replay of a committed id is a
        no-op; ``*-epoch-<n>`` ids ride the bounded monotonic ledger.
        The whole operation holds the write lock (dir write included,
        so a concurrent compact's GC can't sweep it)."""
        return self.append_counts(self.batch_counts(docs), batch_id)

    def append_counts(
        self, batch_counts: DataFrame, batch_id: str, cut: bool = True
    ) -> dict:
        """``append`` for a caller that already computed the batch's
        ``(gram, c)`` frame — the span gate derives its duplicate
        verdict from the same counts it ingests, and re-exploding the
        batch here would double the delta-sized work per epoch (r12
        review). With ``cut=True`` (default) the frame is cut eagerly
        below, so a lazy input is fine; a NONDETERMINISTIC one is the
        caller's bug (the counts the verdict saw and the counts
        committed must be one view). A caller that already
        localCheckpointed the frame passes ``cut=False`` and skips the
        redundant second materialization (r13 review — the gate and
        the pipeline stage both pin the frame for their verdicts)."""
        self._check_batch_id(batch_id)
        with store_write_lock(self.path, timeout=self.lock_timeout):
            meta = self._read_meta()
            if ledger.is_committed(meta, batch_id):
                return self.stats()
            # one evaluation: counts are cut eagerly so the stats
            # aggregate and the dir write can't see two different
            # views of a nondeterministic source (the r12 append rule)
            counts = batch_counts.localCheckpoint() if cut else batch_counts
            row = counts.agg(
                F.coalesce(F.sum("c"), F.lit(0)).alias("n")
            ).collect()[0]
            n_windows = int(row["n"])
            out = self._batch_dir(batch_id)
            if os.path.isdir(out):
                shutil.rmtree(out)  # crashed earlier attempt, any retry
            if n_windows > 0:
                # delta-sized: ONE gram-sorted file per bucket (r13 —
                # the chassis rule; bounded file counts per epoch, and
                # probe_counts' gram IN (...) pushdown gets row-group
                # skipping from the sort)
                self._write_bucket_sorted(
                    self._bucketed(counts),
                    out,
                    "gram_bucket",
                    ("gram",),
                    bound_files=True,
                    n_partitions=self.n_buckets,
                )
                # per-bucket Bloom sidecar over the rows JUST written
                # (read back: one view, provably consistent with what
                # a probe will scan) — lets a BULK probe drop grams
                # that are definitely absent store-wide (r14; r13
                # verdict #2). Delta-sized, like the write itself.
                B.save_sidecar(
                    out,
                    B.build_dir_blooms(
                        self.spark, out, "gram_bucket", "gram"
                    ),
                    canary=B.executor_canary(self.spark),
                )
                meta["batches"] = meta["batches"] + [batch_id]
                # stats entries exist for LIVE dirs only (bounded meta
                # under window-less epochs — the r12 discipline)
                meta["stats"][batch_id] = {"n_windows": n_windows}
            ledger.record(meta, batch_id)
            meta["n_windows"] += n_windows
            self._write_meta(meta)
        return self.stats()

    def _bucketed(self, counts: DataFrame) -> DataFrame:
        return counts.withColumn(
            "gram_bucket",
            F.pmod(F.xxhash64("gram"), F.lit(self.n_buckets)),
        )

    def stats(self) -> dict:
        meta = self._read_meta()
        return {
            "n_windows": meta["n_windows"],
            "n_batches": len(meta["batches"]),
            "n_appended": len(self.appended_batches(meta)),
            "generation": meta["generation"],
        }

    # -- probe ------------------------------------------------------------------
    EMPTY_PROBE = "gram string, c_past long"

    def _counts_over(self, scan: DataFrame, n_dirs: int) -> DataFrame:
        """``(gram, c_past)`` from a live-dir scan. Every dir holds at
        most ONE row per gram (appends write aggregated counts,
        compaction sum-merges), so a single-dir store needs no
        re-aggregation at all — the r12-verdict fast path that makes
        ``compact_every=1`` the low-latency mode: the per-epoch probe
        drops its store-sized groupBy exchange and becomes scan +
        join."""
        if n_dirs == 1:
            return scan.select("gram", F.col("c").cast("long").alias("c_past"))
        return scan.groupBy("gram").agg(
            F.sum("c").cast("long").alias("c_past")
        )

    def past_counts(self) -> DataFrame:
        """``(gram, c_past)`` over every live dir, unpruned — the
        whole-store frame (maintenance, audits, gates whose batches
        span the full vocabulary). An empty store yields an empty frame
        (a gate's first epoch joins against nothing). Lazy over a meta
        snapshot: racing a concurrent ``compact()`` can fail the
        caller's action loudly (FileNotFoundException, never wrong
        data); re-calling re-resolves (see ``store_base``)."""
        meta = self._read_meta()
        if not meta["batches"]:
            return self.spark.createDataFrame([], self.EMPTY_PROBE)
        dirs = self._require_live_dirs(meta, "probing")
        return self._counts_over(self._read_data(dirs), len(dirs))

    # probe vocabularies at or under this size also push the gram list
    # itself into the scan (driver-side strings, ~50 KiB worst case —
    # the BM25 topk convention, where the query vocabulary is always
    # inline-sized); larger vocabularies prune by bucket only
    MAX_INLINE_VOCAB = 512

    # a BULK vocabulary (over the inline budget) first consults the
    # per-bucket Bloom sidecars: grams missing every live dir's bloom
    # are definitely absent store-wide and drop out before any scan is
    # planned; the survivors (true duplicates + ~fpp of the
    # vocabulary) ride the inline tier when they fit this budget —
    # larger survivor sets fall back to the exact-scan floor. Sized
    # above MAX_INLINE_VOCAB because a survivor list is plan-inlined
    # strings, not a parquet Eq-OR chain (the pushdown degrades to a
    # min/max range past the parquet threshold; Spark still
    # InSet-filters scan output, so the caller's join stays
    # survivor-sized either way).
    MAX_BLOOM_SURVIVORS = 2048

    # chassis-shared cap (store_base.PARQUET_IN_MAX): the per-value
    # parquet pushdown is what makes a Bloom false positive cost ZERO
    # reads (it is in no file dictionary)
    PARQUET_IN_MAX = PARQUET_IN_MAX

    def probe_counts(
        self,
        grams: DataFrame,
        max_inline_vocab: int = MAX_INLINE_VOCAB,
        unsafe_allow_recompute: bool = False,
    ) -> DataFrame:
        """``(gram, c_past)`` restricted to what the probe vocabulary
        (``grams`` — any frame with a ``gram`` column) can possibly
        match — the gate's per-epoch shape (r12 verdict #1). Two
        pushdowns, both exact:

        - PARTITION pruning: the vocabulary's ``gram_bucket`` set is
          collected driver-side (bounded by ``n_buckets``, never by
          data) and a batch hitting b of the store's n buckets reads
          ~b/n of it. A gram outside the scanned buckets cannot exist
          in them (same hash on both sides), so joining the result on
          ``gram`` loses nothing.
        - ROW-GROUP skipping: a vocabulary at or under
          ``max_inline_vocab`` grams is additionally pushed as a
          ``gram IN (...)`` data filter; the bucket files are
          gram-SORTED at write (r13), so parquet min/max stats skip
          every row group holding none of the probed grams — the
          low-latency case reads O(|vocab|) row groups, not the store.
        - BLOOM prefilter (r14): a vocabulary OVER the inline budget
          is tested against the per-bucket Bloom sidecars of every
          live dir (one vectorized Arrow pass over the delta-sized
          frame); definite misses drop (no false negatives — an
          absent gram returns no row either way) and the survivors
          ride the inline pushdown when they fit
          ``MAX_BLOOM_SURVIVORS``. A legacy dir without a sidecar or
          a survivor overflow falls back to the exact-scan floor.

        ``grams`` MUST be deterministic across evaluations (pass the
        gate's already-cut localCheckpoint frame): the pushdowns are
        derived from one evaluation and the caller's join re-evaluates
        — a nondeterministic frame whose second evaluation grows new
        grams would have them scan-filtered out and read as c_past=0,
        WRONG DATA with no error. r14 (r13 verdict #5): the rule is
        ENFORCED, not just documented — a plan-shape walk refuses
        frames with re-evaluatable leaves (file scans) or
        nondeterministic expressions before any pushdown is derived;
        ``unsafe_allow_recompute=True`` opts out for callers whose
        source is provably immutable between the probe and their
        join."""
        if not unsafe_allow_recompute:
            _require_pinned_plan(
                grams, f"{self.KIND} at {self.path}, probe_counts()"
            )
        meta = self._read_meta()
        if not meta["batches"]:
            return self.spark.createDataFrame([], self.EMPTY_PROBE)
        dirs = self._require_live_dirs(meta, "probing")
        scan = self._read_data(dirs)
        sample: list[str] | None = None
        if max_inline_vocab > 0:
            # distinct BEFORE the limit: a caller passing a
            # non-aggregated frame must not have duplicates eat the
            # sample budget and silently drop grams from the pushdown
            rows = (
                grams.select("gram")
                .distinct()
                .limit(max_inline_vocab + 1)
                .collect()
            )
            if len(rows) <= max_inline_vocab:
                sample = sorted(r.gram for r in rows)
            else:
                # BULK tier (r14; r13 verdict #2): Bloom-prefilter the
                # vocabulary against every live dir's sidecar — grams
                # that miss everywhere are DEFINITELY absent (no false
                # negatives) and contribute no row either way; the
                # survivors are usually small enough to ride the
                # inline pushdown. Any dir without a sidecar (legacy)
                # disables the tier: absence can't be proven there.
                sample = self._bloom_survivor_sample(grams, dirs)
            if sample is not None:
                # per-VALUE parquet predicates instead of one min/max
                # range: with per-bucket files whose dictionaries hold
                # hash-random gram subsets, dictionary + stats
                # filtering skips every file/row group holding NONE of
                # the probed grams — in particular, a Bloom FALSE
                # POSITIVE costs no read at all (it is in no
                # dictionary). Chassis-shared rule (store_base):
                # upgrades the untouched session default only.
                raise_parquet_in_threshold(self.spark, len(sample))
                scan = scan.filter(F.col("gram").isin(sample))
        if self.n_buckets > 1:
            # bucket ids from the complete inline sample when we have
            # it (a 512-row local frame — no second delta-sized
            # distinct exchange on the per-epoch hot path, r13 review),
            # else one pass over the probe frame
            bucket_src = (
                self.spark.createDataFrame(
                    [(g,) for g in sample], "gram string"
                )
                if sample is not None
                else grams
            )
            buckets = sorted(
                int(r["b"])
                for r in bucket_src.select(
                    F.pmod(F.xxhash64("gram"), F.lit(self.n_buckets)).alias(
                        "b"
                    )
                )
                .distinct()
                .collect()
            )
            if len(buckets) < self.n_buckets:
                scan = scan.filter(F.col("gram_bucket").isin(buckets))
        return self._counts_over(scan, len(dirs))

    def _bloom_survivor_sample(
        self, grams: DataFrame, dirs: list[str]
    ) -> list[str] | None:
        """Survivor vocabulary for a bulk probe, or None when the tier
        cannot run: a live dir without a sidecar (absence can't be
        proven there) or survivors past ``MAX_BLOOM_SURVIVORS``
        (saturated blooms / genuinely duplicate-heavy batch — the
        exact-scan floor is then the honest cost). One vectorized
        Arrow pass over the delta-sized probe frame; the sidecars ride
        a broadcast so they serialize once per executor, not per
        task."""
        probe_canary = B.executor_canary(self.spark)
        dir_blooms = [
            B.load_sidecar(d, expected_canary=probe_canary) for d in dirs
        ]
        if any(b is None for b in dir_blooms):
            return None
        tools = B.make_bloom_tools()
        bc = self.spark.sparkContext.broadcast(dir_blooms)

        def keep_hits(batches):
            import numpy as _np
            import pandas as _pd

            hashes = tools["hashes"]
            contains_hashed = tools["contains_hashed"]
            blooms = bc.value
            for pdf in batches:
                out = []
                for b, grp in pdf.groupby("b"):
                    vals = grp["gram"].to_numpy()
                    # hash ONCE per bucket group, test against every
                    # dir's bloom from the same pair (r14 review:
                    # re-hashing inside the dir loop multiplied CPU
                    # by the live-dir count)
                    h1, h2 = hashes(vals)
                    hit = _np.zeros(len(vals), dtype=bool)
                    for dd in blooms:
                        bits = dd.get(int(b))
                        if bits is not None:
                            hit |= contains_hashed(bits, h1, h2)
                    if hit.any():
                        out.append(grp.loc[hit, ["gram"]])
                if out:
                    yield _pd.concat(out)

        bucketed = grams.select("gram").withColumn(
            "b",
            F.pmod(F.xxhash64("gram"), F.lit(self.n_buckets)).cast("int"),
        )
        try:
            rows = (
                bucketed.mapInPandas(keep_hits, "gram string")
                .distinct()
                .limit(self.MAX_BLOOM_SURVIVORS + 1)
                .collect()
            )
        finally:
            # the survivors are collected above, so the broadcast is
            # consumed — release it instead of accreting multi-MiB
            # broadcast blocks across a long-lived stream's epochs
            # (r14 review)
            bc.unpersist()
        if len(rows) > self.MAX_BLOOM_SURVIVORS:
            return None
        return sorted(r.gram for r in rows)

    # -- maintenance --------------------------------------------------------------
    def compact(self) -> bool:
        """Sum-merge every live batch dir into one ``gen<N>`` dir —
        counts are additive, so the fold is a groupBy(gram).sum that
        changes no probe answer. Crash-safe two-phase, ledger
        preserved, prior-crash orphans swept (the r12 family rules)."""
        with store_write_lock(self.path, timeout=self.lock_timeout):
            meta = self._read_meta()
            self._sweep_orphans(meta["batches"])
            live = meta["batches"]
            if len(live) <= 1:
                return False
            dirs = self._require_live_dirs(meta, "compacting")
            gen = meta["generation"] + 1
            gen_id = f"gen{gen}"
            out = self._batch_dir(gen_id)
            if os.path.isdir(out):
                shutil.rmtree(out)  # crashed earlier attempt
            # vocabulary-sized: task-parallel writes (bound_files would
            # cap the fold at n_buckets tasks — r13 review); in-task
            # sort keeps the row-group stats the probe pushdown uses
            self._write_bucket_sorted(
                self._bucketed(
                    self._read_data(dirs)
                    .groupBy("gram")
                    .agg(F.sum("c").cast("long").alias("c"))
                ),
                out,
                "gram_bucket",
                ("gram",),
            )
            # fresh Bloom sidecar over the fold (also the upgrade path:
            # one compact gives a pre-r14 store bulk-probe pruning)
            B.save_sidecar(
                out,
                B.build_dir_blooms(self.spark, out, "gram_bucket", "gram"),
                canary=B.executor_canary(self.spark),
            )
            ledger.record(meta, gen_id)
            self._write_meta(
                {
                    **meta,
                    "batches": [gen_id],
                    "generation": gen,
                    # the fold's stats entry IS the additive total
                    "stats": {gen_id: {"n_windows": meta["n_windows"]}},
                }
            )
            self._sweep_orphans([gen_id])
        return True
