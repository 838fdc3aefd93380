"""Incremental BM25 retrieval index: O(delta) appends for a GROWING
text corpus (r12).

``plans/text_queries.q_text_bm25_topk`` is a full-corpus computation —
tokenize, tf/dl/df aggregates, score, rank — rerun from scratch per
query batch. At 100 TB with daily ingest that re-tokenizes the whole
corpus every time. This store persists the per-document term
statistics ONCE per batch and keeps the corpus-level stats additive,
mirroring the LSH dedup index / IVF layout store shape
(``operators/dedup_index.py``, ``operators/ivf_store.py``):

State on disk (under ``path/``):

- ``postings/batch=<id>/tok_bucket=<b>/`` — per-batch posting lists:
  one row per (doc, token) carrying ``(doc_id, tok, tf, dl)`` — the
  document length is DENORMALIZED into the postings row (the classic
  search-engine move) so a query never joins a corpus-sized doclen
  table; dirs are hash-partitioned on the token so a query
  partition-prunes to its own terms' buckets
- ``_bm25_meta.json`` — live batch ids, the bounded replay ledger
  (``operators/ledger.py``), ADDITIVE corpus stats (``n_docs``,
  ``s_tokens``, running ``max_dl`` — exact bigints, so batch-built
  scores are bit-identical to a full rebuild's by arithmetic, and the
  score-headroom guards can bound the products exactly), the active
  ``score_mode`` (``int64`` until the corpus crosses the int64 product
  line, then — one-way, r14 — ``decimal38``: exact products to 10^38-1
  in both engines, bit-identical in-range scores), per-batch stats,
  generation counter, and the pinned identity (``id_col``/
  ``text_col``/``n_buckets`` — a mismatched open fails loudly, the
  IVF/MG convention)

Per ``append`` the work is O(|delta|): tokenize the new docs (the
SHARED ``dedup.normalized_tokens`` — the full-corpus query's
tokenizer), aggregate their tf/dl, write ONE ``batch=<id>`` dir,
commit stats + ledger. Document frequency is NOT materialized: df for
a query's terms is counted at query time over the bucket-pruned
postings (each (doc, tok) row exists exactly once across batches —
doc ids must be globally unique, as in the sibling stores), so an
append never rewrites global state.

``topk(queries, k)`` is contract-bound BIT-IDENTICAL to
``q_text_bm25_topk`` over the same corpus: same tokenizer, same
rational one-division term score, same tok-sorted fold-left doc sum
(all three shared from ``operators/text.bm25_*`` /
``operators/dedup.normalized_tokens`` — one rule per fact), and the
additive meta stats equal the full computation's aggregates exactly.
Pinned in ``tests/test_bm25_index.py``.

``compact()`` folds live batch dirs into one ``gen<N>`` generation dir
(crash-safe two-phase, replay ledger preserved) so probe fan-in stays
bounded on a long-lived ingest.
"""

from __future__ import annotations

import os
import shutil
import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import ledger
from . import text as X
from .dedup import normalized_tokens
from .expr_util import explode_nonempty
from .store_base import BatchDirStore, raise_parquet_in_threshold
from .store_lock import store_write_lock

META_NAME = "_bm25_meta.json"

# meta keys pinned at first write and validated on every open
IDENTITY_KEYS = ("id_col", "text_col", "n_buckets")


class Bm25Index(BatchDirStore):
    KIND = "BM25 index"
    META_NAME = META_NAME
    DATA_DIR = "postings"
    IDENTITY_KEYS = IDENTITY_KEYS

    # token-hash partition dirs per batch: a query reads only its
    # terms' buckets, so probe I/O is |query vocab|/n_buckets of the
    # store regardless of corpus size
    N_BUCKETS = 16

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        n_buckets: int = N_BUCKETS,
        lock_timeout: float = 60.0,
    ) -> None:
        if n_buckets < 1:
            raise ValueError(f"n_buckets must be >= 1 (got {n_buckets})")
        self.id_col = id_col
        self.text_col = text_col
        self.n_buckets = n_buckets
        super().__init__(spark, path, lock_timeout=lock_timeout)

    def _meta_defaults(self) -> dict:
        return {
            "n_docs": 0,
            "s_tokens": 0,
            "max_dl": 0,
            "stats": {},
            "score_mode": "int64",
        }

    def stats(self) -> dict:
        """Corpus-level stats from ONE meta snapshot: additive exact
        ``n_docs``/``s_tokens``, live dir count, ledger sizes, and the
        active score mode (int64 until the corpus crosses the int64
        product line, decimal38 — one-way — after)."""
        meta = self._read_meta()
        return {
            "n_docs": meta["n_docs"],
            "s_tokens": meta["s_tokens"],
            "n_batches": len(meta["batches"]),
            "n_appended": len(self.appended_batches(meta)),
            "generation": meta["generation"],
            "score_mode": meta.get("score_mode", "int64"),
        }

    # -- ingest -----------------------------------------------------------
    def _tokenize(self, docs: DataFrame) -> DataFrame:
        """(doc_id, tok) — the full-corpus query's exact tokenizer."""
        # explode_nonempty (r16, the shared owner): no inferred size>0
        # filter, one tokenizer evaluation per row; the site's length
        # gate subsumes the null kill (length(NULL) is NULL)
        return explode_nonempty(
            docs,
            [F.col(self.id_col).alias("doc_id")],
            normalized_tokens(F.col(self.text_col)),
            "tok",
            keep=F.length("tok") > 0,
        )

    def _postings(self, docs: DataFrame) -> DataFrame:
        """Per-batch posting rows ``(doc_id, tok, tf, dl, tok_bucket)``
        — dl denormalized onto every row, bucket = pmod(xxhash64(tok))
        (uniform, skew-free; the same hash family as every bucketed
        store in this repo)."""
        toks = self._tokenize(docs)
        tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
        dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
        return (
            tf.join(dl, "doc_id")
            .withColumn(
                "tok_bucket", F.pmod(F.xxhash64("tok"), F.lit(self.n_buckets))
            )
        )

    def append(self, docs: DataFrame, batch_id: str) -> dict:
        """Index a new document batch in O(|delta|). Returns the
        corpus stats after the commit. Replay of a committed id is a
        no-op; ``*-epoch-<n>`` ids carry the streaming legs' bounded
        monotonic replay semantics (``operators/ledger.py``). The whole
        operation holds the store write lock — the dir write included,
        so a concurrent ``compact()``'s GC can never sweep an in-flight
        uncommitted dir.

        PRECONDITION — globally unique ``id_col`` values across every
        batch ever appended: df and ``n_docs`` are exact BECAUSE each
        (doc, tok) row exists exactly once store-wide. Re-ingesting a
        doc id under a NEW batch id silently inflates df/n_docs and
        breaks the bit-identity contract with ``q_text_bm25_topk``
        (replaying the SAME batch id is safe — the ledger no-ops it).
        The streaming legs (``streaming/bm25_ingest.py``,
        ``streaming/ingest_pipeline.py``) inherit this: the SOURCE must
        not re-emit a doc id across epochs.

        Headroom (r14): a batch pushing the corpus past the int64-exact
        score line no longer refuses — the store switches (one-way,
        with a RuntimeWarning, recorded in the meta) to
        ``score_mode='decimal38'``, whose widened exact envelope is
        10^38-1 in BOTH engines (``text.bm25_term_score_dec/_sql``);
        in-range scores are bit-identical across modes. Only a batch
        that would cross the DECIMAL envelope refuses (loudly, before
        committing) — past both engines' widest exact integer, the
        remedy is sharding across child indexes."""
        self._check_batch_id(batch_id)
        with store_write_lock(self.path, timeout=self.lock_timeout):
            meta = self._read_meta()
            if ledger.is_committed(meta, batch_id):
                return self.stats()  # replay: state already reflects it
            # ONE evaluation of the source: the projection is cut
            # eagerly and n_docs + postings both derive from the
            # materialized blocks — a second source scan would let a
            # nondeterministic input commit n_docs/s_tokens that
            # disagree with the posting rows actually written, breaking
            # the bit-identity contract (r12 review; the double-scan
            # class every foreachBatch leg guards against, here guarded
            # in the batch API itself)
            src = docs.select(self.id_col, self.text_col).localCheckpoint()
            n_docs = src.count()
            if n_docs == 0:
                raise ValueError(
                    f"batch {batch_id!r} is empty — nothing to index"
                )
            postings = self._postings(src).localCheckpoint()
            row = postings.agg(
                F.coalesce(F.sum("tf"), F.lit(0)).alias("s_tokens"),
                F.coalesce(F.max("dl"), F.lit(0)).alias("max_dl"),
            ).collect()[0]
            s_tokens = int(row["s_tokens"])
            if "max_dl" not in meta:
                # pre-guard store: one-time backfill of the max doc
                # length from the live postings (dl rides every row, so
                # this is one scan — paid once at upgrade, then additive)
                meta["max_dl"] = (
                    int(
                        self._read_data(self._require_live_dirs(meta, "upgrading"))
                        .agg(F.coalesce(F.max("dl"), F.lit(0)))
                        .collect()[0][0]
                    )
                    if meta["batches"]
                    else 0
                )
            new_max_dl = max(meta["max_dl"], int(row["max_dl"]))
            # headroom check BEFORE any commit, on the exact Python-int
            # totals this batch would create. r14 (r13 verdict #1): a
            # batch crossing the int64 product line no longer dead-ends
            # the ingest — the store AUTO-WIDENS to the decimal(38,0)
            # scorer (one-way; recorded in the meta with this commit,
            # so a crash before the write replays into the same
            # decision). The widened envelope (10^38-1, both engines'
            # widest exact integer) keeps its own loud guard: past it
            # the remedy really is sharding.
            tot_docs = meta["n_docs"] + n_docs
            tot_tokens = meta["s_tokens"] + s_tokens
            mode = meta.get("score_mode", "int64")
            where = f"BM25 index at {self.path}, append({batch_id!r})"
            if (
                mode == "int64"
                and X.bm25_int64_products_bound(
                    tot_docs, tot_tokens, new_max_dl
                )
                > X.INT64_MAX
            ):
                mode = "decimal38"
                warnings.warn(
                    f"{where}: corpus stats crossed the int64 score-"
                    "product line — switching the store to score_mode="
                    "'decimal38' (exact scores continue; in-range "
                    "scores are bit-identical across modes)",
                    RuntimeWarning,
                    stacklevel=2,
                )
            if mode == "decimal38":
                X.bm25_require_decimal38_headroom(
                    tot_docs, tot_tokens, new_max_dl, where=where
                )
            else:
                X.bm25_require_int64_headroom(
                    tot_docs, tot_tokens, new_max_dl, where=where
                )
            out = self._batch_dir(batch_id)
            if os.path.isdir(out):
                # crashed earlier attempt — removed on EVERY retry, not
                # just the rewrite path: a retry that now tokenizes to
                # zero tokens takes the no-dir branch below and would
                # otherwise leak the half-written dir until the next
                # compact's sweep (r12 review)
                shutil.rmtree(out)
            if s_tokens > 0:
                # delta-sized: ONE tok-sorted file per bucket (r13 —
                # bounded file counts on a streaming ingest; topk
                # pushes tok IN (vocab), so the sort feeds row-group
                # skipping). The chassis rule, shared with the n-gram
                # store.
                self._write_bucket_sorted(
                    postings,
                    out,
                    "tok_bucket",
                    ("tok",),
                    bound_files=True,
                    n_partitions=self.n_buckets,
                )
                meta["batches"] = meta["batches"] + [batch_id]
                # stats entries exist for LIVE dirs only — a zero-token
                # epoch must not grow the meta (a stream of all-blank
                # micro-batches would otherwise grow it O(#epochs),
                # violating the bounded-meta discipline; r12 review)
                meta["stats"][batch_id] = {
                    "n_docs": n_docs,
                    "s_tokens": s_tokens,
                }
            # a zero-token batch (all-blank docs) still counts toward
            # n_docs — the full-corpus query's N is COUNT(documents),
            # blanks included, and topk must stay bit-identical to it
            ledger.record(meta, batch_id)
            meta["n_docs"] += n_docs
            meta["s_tokens"] += s_tokens
            meta["max_dl"] = new_max_dl
            meta["score_mode"] = mode
            self._write_meta(meta)
        return self.stats()

    # -- query ------------------------------------------------------------
    def topk(self, queries: list[tuple[str, str]], k: int = 10) -> DataFrame:
        """Top-``k`` documents per query string, BM25-ranked —
        bit-identical to ``q_text_bm25_topk``'s full-corpus plan over
        the same corpus and queries (shared tokenizer, shared term
        score, shared ordered fold; additive meta stats ≡ the full
        aggregates). Returns (query_id, doc_id, score, rank).

        SCORER, precisely: the odds-lift BM25-family score — Okapi
        k1=1.2, b=0.75 with idf = (N-df+0.5)/(df+0.5) WITHOUT the log
        (transcendental-free so JVM and DuckDB results hash-match).
        Per-TERM ranking is order-identical to textbook Okapi (log is
        monotonic), but the per-document sum over MULTIPLE query terms
        weights high-idf terms more, so multi-term rankings can differ
        from Lucene/rank_bm25 output. Carried in int64 products until
        the corpus crosses the int64 line, then (r14) in decimal(38,0)
        products — same integers, same one double division, so
        in-range scores are bit-identical across modes and the
        q_text_bm25_topk identity contract survives the switch for
        any corpus the full plan can score at all.

        Scale shape: the query terms tokenize through one tiny Spark
        job (collect is query-vocabulary-sized); the postings scan
        PARTITION-PRUNES to the terms' tok_buckets across every live
        batch dir; df is counted over that pruned slice (exact — each
        (doc, tok) row exists once store-wide); everything joined to
        the scan is broadcast. No corpus-sized shuffle, no doclen join
        (dl rides the posting row).

        Concurrency: the returned frame is LAZY over a meta snapshot's
        dirs — a ``compact()`` committed between this call and the
        caller's action can sweep those dirs, failing the action with a
        loud FileNotFoundException (never wrong data). Re-calling
        re-resolves to the new generation and converges; a caller
        running queries beside a maintenance cron should expect that
        one retry."""
        if k < 1:
            raise ValueError(f"k must be >= 1 (got {k})")
        if not queries:
            raise ValueError("queries must be non-empty")
        from pyspark.sql import Window

        meta = self._read_meta()
        if not meta["batches"]:
            raise RuntimeError(
                f"BM25 index at {self.path} has no postings — append() "
                "a batch before querying"
            )
        mode = meta.get("score_mode", "int64")
        if "max_dl" in meta:
            # pre-guard stores lack the stat (append backfills it on
            # their next ingest); guarded stores can only hold totals
            # the append-time check already admitted — this re-check is
            # belt-and-braces for a meta edited out of band, against
            # the ACTIVE mode's envelope (an int64-mode meta holding
            # past-int64 stats is inconsistent: append would have
            # switched it)
            (
                X.bm25_require_decimal38_headroom
                if mode == "decimal38"
                else X.bm25_require_int64_headroom
            )(
                meta["n_docs"],
                meta["s_tokens"],
                meta["max_dl"],
                where=f"BM25 index at {self.path}, topk()",
            )
        dirs = self._require_live_dirs(meta, "querying")

        qdf = self.spark.createDataFrame(
            list(queries), "query_id string, qtext string"
        )
        # shared derivation with the full-corpus plan (one rule per
        # fact — r12 review); only the bucket column is store-specific
        qterms = X.bm25_query_terms(qdf).withColumn(
            "tok_bucket", F.pmod(F.xxhash64("tok"), F.lit(self.n_buckets))
        )
        term_rows = qterms.collect()  # query-vocabulary-sized
        if not term_rows:
            raise ValueError("queries tokenize to no terms")
        vocab = sorted({r.tok for r in term_rows})
        buckets = sorted({int(r.tok_bucket) for r in term_rows})

        # per-VALUE parquet predicates for the query vocabulary (r14,
        # the chassis rule shared with the n-gram probe): the default
        # threshold (10) degrades a >10-term vocabulary to one min/max
        # range over the tok-sorted files — per-value Eq predicates
        # keep dictionary/stats row-group skipping for real queries
        raise_parquet_in_threshold(self.spark, len(vocab))
        pruned = self._read_data(dirs).filter(
            F.col("tok_bucket").isin(buckets) & F.col("tok").isin(vocab)
        )
        # global df for the query terms: one row per (doc, tok) exists
        # store-wide, so COUNT(*) over the pruned slice is exact
        dfreq = pruned.groupBy("tok").agg(F.count("*").alias("df"))
        matched = pruned.join(
            F.broadcast(qterms.select("query_id", "tok")), "tok"
        ).join(F.broadcast(dfreq), "tok")
        if mode == "decimal38":
            # the widened twin (r14): decimal(38,0) products; the
            # corpus literals enter as Python ints (they may exceed
            # int64). In-range scores are bit-identical to the int64
            # scorer's — same integers, same one double division.
            score_t = X.bm25_term_score_dec(
                F.col("tf"),
                F.col("dl"),
                F.col("df"),
                meta["n_docs"],
                meta["s_tokens"],
            )
        else:
            score_t = X.bm25_term_score(
                F.col("tf"),
                F.col("dl"),
                F.col("df"),
                F.lit(meta["n_docs"]).cast("long"),
                F.lit(meta["s_tokens"]).cast("long"),
            )
        scored = matched.withColumn("score_t", score_t)
        per_doc = scored.groupBy("query_id", "doc_id").agg(
            X.bm25_fold_scores(F.col("tok"), F.col("score_t")).alias("score")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("doc_id").asc()
        )
        return (
            per_doc.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "doc_id", "score", "rank")
            .orderBy("query_id", "rank")
        )

    # -- maintenance --------------------------------------------------------
    def compact(self) -> bool:
        """Fold every live ``batch=<id>`` dir into one ``gen<N>``
        generation dir (probe fan-in and file counts otherwise grow
        O(#batches)). Crash-safe two-phase, replay ledger preserved,
        additive corpus stats carried over unchanged — compaction moves
        rows, never recounts them, so post-compaction scores stay
        bit-identical. Returns False when 0/1 live dirs (nothing to
        merge)."""
        with store_write_lock(self.path, timeout=self.lock_timeout):
            meta = self._read_meta()
            # reclaim leftovers of a compact that crashed between its
            # meta swap and its GC loop — without this, a single-dir
            # store would return False below and the orphans (the
            # whole pre-fold corpus) would leak forever (r12 review)
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
            # corpus-sized: task-parallel writes (bound_files here
            # would cap the whole-corpus rewrite at n_buckets tasks —
            # r13 review); the in-task sort still gives every written
            # file tok row-group stats
            self._write_bucket_sorted(
                self._read_data(dirs).select(
                    "doc_id", "tok", "tf", "dl", "tok_bucket"
                ),
                out,
                "tok_bucket",
                ("tok",),
            )
            # the fold's stats entry IS the additive totals — compaction
            # moves rows, never recounts them, and the totals are the
            # single authority (recomputing from per-batch entries was
            # a second representation that could drift; r12 review)
            folded = {
                "n_docs": meta["n_docs"],
                "s_tokens": meta["s_tokens"],
            }
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
