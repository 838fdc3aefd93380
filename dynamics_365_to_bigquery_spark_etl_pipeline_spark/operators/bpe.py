"""Distributed BPE tokenizer training (r13) — the training-data
pipeline step the text family lacked: q_text_token_ids assigns ids
from a FIXED frequency vocabulary, but a real pipeline TRAINS its
subword vocabulary from the corpus (Sennrich et al. 2015,
arXiv:1508.07909).

Scale shape (the 100 TB question): the corpus is scanned ONCE into a
``(word, n)`` frequency frame — the only corpus-sized job, one
explode + groupBy through the family's shared tokenizer. Every merge
iteration after that works on the VOCABULARY-sized frame: weighted
adjacent-pair counts (groupBy sum), a deterministic argmax (exactly
one row collected per iteration — the driver never sees data), and a
JVM-side higher-order fold (``F.aggregate``) that rewrites each
word's symbol array with the merge applied leftmost-nonoverlapping.
No Python UDF anywhere; the per-iteration frame is localCheckpointed
so 50 merges cost 50 small jobs, not one 50-transform-deep plan.

Determinism (what makes the pure-Python oracle in
tests/test_bpe.py possible): counts are exact longs and the winning
pair is chosen by (count DESC, left ASC, right ASC) — a total order,
so the merge sequence is a pure function of the corpus. Ties broken
lexicographically rather than by arrival order, which is what
hash-partitioned execution could never reproduce.

Word reshaping follows the reference BPE convention: a word becomes
its characters with ``</w>`` appended to the LAST character, so
merges cannot cross word boundaries and a full-word symbol stays
distinguishable from the same string mid-word.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import normalized_tokens

END = "</w>"


class Merge(NamedTuple):
    rank: int
    left: str
    right: str
    merged: str
    count: int


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, n)`` over the corpus — the ONE corpus-sized job; the
    merge loop never rescans documents. Shares the family tokenizer
    (``dedup.normalized_tokens``) so the trained vocabulary segments
    exactly what the other text operators count."""
    return (
        docs.select(
            F.explode(normalized_tokens(F.col(text_col))).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("n"))
    )


def _with_symbols(df: DataFrame) -> DataFrame:
    """Add the initial ``symbols`` column: the word's characters with
    the end-of-word marker folded onto the last one. Sibling columns
    ride along (``n`` for training, bare ``word`` for segmentation)."""
    # the last-element test compares against length(word) - 1, NOT
    # size(chars) - 1: HOF lambdas run interpreted without
    # subexpression elimination, so a size(split(...)) inside the
    # lambda would re-split the word per element (the dedup.py HOF
    # rule); character count == split element count for these tokens
    return df.withColumn(
        "symbols",
        F.transform(
            F.split(F.col("word"), ""),
            lambda c, i: F.when(
                i == F.length("word") - 1, F.concat(c, F.lit(END))
            ).otherwise(c),
        ),
    )


def _pair_counts(symbols: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the symbol frame — the
    vocabulary-sized groupBy each iteration runs."""
    s = F.col("symbols")
    pairs = F.zip_with(
        F.slice(s, 1, F.size(s) - 1),
        F.slice(s, 2, F.size(s) - 1),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )
    return (
        symbols.filter(F.size("symbols") >= 2)
        .select(F.explode(pairs).alias("p"), "n")
        .groupBy("p.left", "p.right")
        .agg(F.sum("n").alias("c"))
    )


def _merge_expr(left: str, right: str):
    """Column expression rewriting ``symbols`` with ``(left, right) ->
    left+right`` applied LEFTMOST-NONOVERLAPPING (the reference
    semantics: 'aaa' under (a,a) becomes [aa, a]) — a single JVM fold
    carrying one pending symbol, no UDF."""
    merged = left + right
    acc0 = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc, x):
        return (
            F.when(
                acc["pend"].isNull(),
                F.struct(acc["out"].alias("out"), x.alias("pend")),
            )
            .when(
                (acc["pend"] == left) & (x == right),
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["pend"])).alias("out"),
                    x.alias("pend"),
                )
            )
        )

    def finish(acc):
        return F.when(acc["pend"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pend"]))
        )

    return F.aggregate(F.col("symbols"), acc0, step, finish)


def _apply_merge(df: DataFrame, left: str, right: str) -> DataFrame:
    """One merge applied in place; every sibling column (``n`` during
    training, ``word`` during segmentation) rides along untouched."""
    return df.withColumn("symbols", _merge_expr(left, right))


# (word, n) frames at or under this row count train driver-locally:
# the frame is the DISTINCT-WORD vocabulary (not the corpus), it
# almost always fits the driver, and the incremental pure-Python loop
# below does a 32k-merge production vocabulary in seconds where the
# distributed loop pays ~0.7 s of job choreography PER MERGE (r13
# verdict: 32k merges ~ 6 h of driver-coordinated rounds). Bigger
# vocabularies keep the distributed loop. Bit-identity between the
# two paths is pytest-pinned (tests/test_bpe.py).
LOCAL_VOCAB_THRESHOLD = 500_000


def _word_symbols(word: str) -> list[str]:
    """The reference reshape: characters, END folded onto the last."""
    return [*word[:-1], word[-1] + END]


def _sweep(syms: list[str], left: str, right: str, merged: str) -> list[str]:
    """One merge applied leftmost-nonoverlapping — the pure-Python
    twin of ``_merge_expr``'s JVM fold (same pending-symbol walk)."""
    out: list[str] = []
    pend = None
    for x in syms:
        if pend is None:
            pend = x
        elif pend == left and x == right:
            out.append(merged)
            pend = None
        else:
            out.append(pend)
            pend = x
    if pend is not None:
        out.append(pend)
    return out


def _train_bpe_local(
    wc: list[tuple[str, int]], n_merges: int, min_count: int
) -> list[Merge]:
    """The driver-local trainer: EXACTLY the distributed loop's
    semantics — exact long counts, (count DESC, left ASC, right ASC)
    total-order argmax, leftmost-nonoverlapping sweeps — but with the
    classic incremental bookkeeping (pair->count deltas only for the
    words a merge touches, a lazy-invalidation heap for the argmax) so
    a merge round costs O(affected words), not O(vocabulary). Heap
    entries are (-count, left, right): stale entries (their pair's
    count has since changed — merges both create and, via merged-
    symbol string collisions like (a,bc)/(ab,c) -> abc, INCREASE
    existing pairs) are detected by re-checking the live count at pop
    time; every count change pushes a fresh entry first."""
    import heapq

    words: list[tuple[list[str], int]] = [
        (_word_symbols(w), n) for w, n in wc if w
    ]
    counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for i, (syms, n) in enumerate(words):
        for p in zip(syms, syms[1:]):
            counts[p] = counts.get(p, 0) + n
            where.setdefault(p, set()).add(i)
    heap = [(-c, p[0], p[1]) for p, c in counts.items()]
    heapq.heapify(heap)
    merges: list[Merge] = []
    for rank in range(n_merges):
        best = None
        while heap:
            negc, left, right = heap[0]
            cur = counts.get((left, right), 0)
            if cur == -negc and cur >= min_count:
                best = (left, right, cur)
                break
            heapq.heappop(heap)  # stale or under-threshold entry
        if best is None:
            break  # corpus ran dry — shorter table, never an error
        left, right, cur = best
        merged = left + right
        merges.append(Merge(rank, left, right, merged, cur))
        changed: set[tuple[str, str]] = set()
        for i in sorted(where.get((left, right), ())):
            syms, n = words[i]
            new_syms = _sweep(syms, left, right, merged)
            old_pairs = list(zip(syms, syms[1:]))
            new_pairs = list(zip(new_syms, new_syms[1:]))
            for p in old_pairs:
                counts[p] -= n
                changed.add(p)
            for p in new_pairs:
                counts[p] = counts.get(p, 0) + n
                changed.add(p)
            for p in set(old_pairs) - set(new_pairs):
                where[p].discard(i)
            for p in set(new_pairs) - set(old_pairs):
                where.setdefault(p, set()).add(i)
            words[i] = (new_syms, n)
        for p in changed:
            if counts.get(p, 0) > 0:
                heapq.heappush(heap, (-counts[p], p[0], p[1]))
            else:
                counts.pop(p, None)
                where.pop(p, None)
    return merges


def train_bpe(
    words: DataFrame,
    n_merges: int,
    min_count: int = 1,
    local_threshold: int = LOCAL_VOCAB_THRESHOLD,
) -> list[Merge]:
    """Learn up to ``n_merges`` BPE merges from a ``(word, n)``
    frequency frame (``word_counts``' output). Returns the merge table
    in rank order; stops early when no pair reaches ``min_count``
    (the corpus ran dry — shorter output, never an error).

    Two paths, bit-identical by test: a vocabulary at or under
    ``local_threshold`` rows is collected and trained driver-locally
    (r14 — the post-scan ``(word, n)`` frame is vocabulary-sized and
    the incremental local loop makes production merge counts
    practical: measured in SCALING.md); larger vocabularies run the
    distributed loop — vocabulary-sized pair-count rounds, exactly one
    driver-side row per iteration, each round's symbol frame cut so
    the lineage stays one-merge deep. ``local_threshold=0`` forces the
    distributed path."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1 (got {n_merges})")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1 (got {min_count})")
    if local_threshold:
        # ONE evaluation decides AND supplies the local path (review
        # pin: a count-then-collect pair ran the corpus-sized
        # word_counts aggregation twice for un-pinned callers, and a
        # nondeterministic frame could pass the size check on one
        # evaluation and collect different rows on the next); an
        # over-threshold vocabulary costs one bounded driver transfer
        # before falling through to the distributed loop
        rows = words.limit(local_threshold + 1).collect()
        if len(rows) <= local_threshold:
            return _train_bpe_local(
                [(r["word"], int(r["n"])) for r in rows],
                n_merges,
                min_count,
            )
    symbols = (
        _with_symbols(words).select("symbols", "n").localCheckpoint()
    )
    merges: list[Merge] = []
    for rank in range(n_merges):
        top = (
            _pair_counts(symbols)
            .filter(F.col("c") >= min_count)
            .orderBy(
                F.col("c").desc(), F.col("left").asc(), F.col("right").asc()
            )
            .limit(1)
            .collect()
        )
        if not top:
            break  # corpus ran dry — shorter merge table, never an error
        row = top[0]
        merges.append(
            Merge(
                rank,
                row["left"],
                row["right"],
                row["left"] + row["right"],
                int(row["c"]),
            )
        )
        if rank + 1 == n_merges:
            break  # the final frame is never read — don't fold it
        # superseded checkpoints are reclaimed by the ContextCleaner
        # once unreferenced; explicit unpersist() doesn't reach
        # localCheckpoint storage
        symbols = _apply_merge(
            symbols, row["left"], row["right"]
        ).localCheckpoint()
    return merges


MERGES_VERSION = 1


def save_merges(path: str, merges: list[Merge]) -> None:
    """Persist a trained merge table as the tokenizer ARTIFACT (r14 —
    train once, segment any later corpus): versioned JSON, atomic
    rename (a crash mid-write must never leave a half tokenizer a
    later pipeline would load)."""
    import json
    import os

    payload = {
        "version": MERGES_VERSION,
        "end": END,
        "merges": [list(m) for m in merges],
    }
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
    os.replace(tmp, path)


def load_merges(path: str) -> list[Merge]:
    """Load a ``save_merges`` artifact, validating the version, the
    end-of-word marker, and rank contiguity — a table with holes or a
    foreign marker would segment silently differently, not fail.

    A repeated ``(left, right)`` pair at two ranks is ACCEPTED, not
    rejected: it is replay-meaningful (an intermediate merge can
    re-create a pair via a merged-string collision, and the fold
    replay applies both occurrences), and since r15 both
    ``segment_words`` impls handle it identically (rank-list lookup in
    ``single_pass``; parity test-pinned in tests/test_advice_r14.py),
    so there is no per-impl divergence left for a duplicate to
    trigger (r14 ADVICE)."""
    import json

    with open(path) as fh:
        payload = json.load(fh)
    if payload.get("version") != MERGES_VERSION:
        raise ValueError(
            f"merge table at {path} has version {payload.get('version')!r}"
            f" (this build reads {MERGES_VERSION})"
        )
    if payload.get("end") != END:
        raise ValueError(
            f"merge table at {path} was trained with end-of-word marker "
            f"{payload.get('end')!r}, this build uses {END!r} — "
            "segmentations would silently differ"
        )
    merges = [Merge(*m) for m in payload["merges"]]
    for i, m in enumerate(merges):
        if m.rank != i or m.merged != m.left + m.right:
            raise ValueError(
                f"merge table at {path} is corrupt at rank {i}: {m}"
            )
    return merges


def segment_words(
    words: DataFrame,
    merges: list[Merge],
    checkpoint_every: int = 10,
    impl: str = "single_pass",
) -> DataFrame:
    """``(word, pieces array<string>)`` — apply the trained merge
    table in rank order over a word frame (distinct corpus words or
    new OOV words alike; pairs the training never saw simply never
    merge).

    ``impl='single_pass'`` (default, r14): ONE vectorized Arrow pass —
    per word, repeatedly apply the lowest-rank merge not yet applied
    whose pair is present (each merge at most once, ascending rank:
    exactly the replay semantics, skipping the absent ones), with the
    merge table shipped once per executor. Wall is independent of
    n_merges' plan depth — the r13 fold replay built an
    n_merges-deep chain (3,200 localCheckpoints at 32k merges).
    NOTE: each merge applies ONCE even if a LATER merge re-creates its
    pair via a merged-string collision ((a,b)->ab next to c after
    (ab,c) already ran) — subword-nmt's re-applying priority loop
    differs there; this repo's contract is the replay, pinned by the
    pure-Python oracle.

    ``impl='fold'``: the r13 JVM fold chain (no Python anywhere), cut
    every ``checkpoint_every`` merges so the analyzer never sees an
    unboundedly deep plan — the right path when Python workers are
    unavailable and n_merges is small. Both paths are bit-identical by
    test."""
    if impl == "fold":
        if checkpoint_every < 1:
            raise ValueError(
                f"checkpoint_every must be >= 1 (got {checkpoint_every})"
            )
        cur = _with_symbols(words.select("word"))
        for i, m in enumerate(merges):
            cur = _apply_merge(cur, m.left, m.right)
            if (i + 1) % checkpoint_every == 0:
                cur = cur.localCheckpoint()
        return cur.select("word", F.col("symbols").alias("pieces"))
    if impl != "single_pass":
        raise ValueError(f"impl must be 'single_pass' or 'fold' (got {impl!r})")
    table = [(m.left, m.right, m.merged) for m in merges]
    end = END

    # closures, not module functions — the worker-shipping rule
    def run(batches):
        import bisect as _bisect

        import pandas as _pd

        # pair -> SORTED rank list, not a last-wins dict (r14 ADVICE):
        # a table may legitimately carry the same (left, right) at two
        # ranks — the fold replay applies BOTH (an intermediate merge
        # can re-create a pair via a merged-string collision), so the
        # single-pass must consider every rank of a pair, taking the
        # lowest one past the replay cursor. A last-wins dict kept
        # only the final rank and silently diverged from the replay.
        ranks = {}
        for i, (l, r, _m) in enumerate(table):
            ranks.setdefault((l, r), []).append(i)

        def sweep(syms, left, right, merged):
            out, pend = [], None
            for x in syms:
                if pend is None:
                    pend = x
                elif pend == left and x == right:
                    out.append(merged)
                    pend = None
                else:
                    out.append(pend)
                    pend = x
            if pend is not None:
                out.append(pend)
            return out

        def segment(word):
            # mirror the fold impl on degenerate rows (review pin:
            # impl parity includes them): NULL -> NULL, '' -> ['']
            if word is None:
                return None
            if not word:
                return [""]
            syms = [*word[:-1], word[-1] + end]
            done = -1
            while True:
                best = None
                for p in zip(syms, syms[1:]):
                    rks = ranks.get(p)
                    if rks is not None:
                        # lowest rank of this pair past the cursor
                        j = _bisect.bisect_right(rks, done)
                        if j < len(rks) and (
                            best is None or rks[j] < best
                        ):
                            best = rks[j]
                if best is None:
                    return syms
                left, right, merged = table[best]
                syms = sweep(syms, left, right, merged)
                done = best

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "word": pdf["word"],
                    "pieces": [segment(w) for w in pdf["word"]],
                }
            )

    return words.select("word").mapInPandas(run, "word string, pieces array<string>")
