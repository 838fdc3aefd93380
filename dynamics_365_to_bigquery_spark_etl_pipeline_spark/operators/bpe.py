"""Distributed BPE tokenizer training (r13) — the training-data
pipeline step the text family lacked: q_text_token_ids assigns ids
from a FIXED frequency vocabulary, but a real pipeline TRAINS its
subword vocabulary from the corpus (Sennrich et al. 2015,
arXiv:1508.07909).

Scale shape (the 100 TB question): the corpus is scanned ONCE into a
``(word, n)`` frequency frame — the only corpus-sized job, one
explode + groupBy through the family's shared tokenizer. Every merge
round after that works on the VOCABULARY-sized frame. Since r15 the
default distributed path is BATCHED (r14 verdict #2): each round runs
one fused stats job (adjacent-pair counts + trigram created-pair
bounds), collects up to ``max_batch`` candidate rows, keeps the
longest prefix provably equal to the sequential merge sequence
(``_select_batch``), and applies the whole batch in ONE vectorized
Arrow ``mapInPandas`` pass (``_apply_merge_batch``) — so Python
workers ARE on the default distributed path. ``max_batch=1`` restores
the r13 shape: zero Python on executors, one row collected per round,
a JVM-side higher-order fold (``F.aggregate``) rewriting each word's
symbol array leftmost-nonoverlapping. Either way the per-round frame
is localCheckpointed so n rounds cost n small jobs, not one
n-transform-deep plan; under ``local_threshold`` (default 500k
distinct words) the whole vocabulary trains driver-local instead.

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
from .expr_util import explode_nonempty

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
        # explode_nonempty (r16, the shared owner): one tokenizer
        # evaluation per row; the length gate subsumes the null kill
        explode_nonempty(
            docs,
            [],
            normalized_tokens(F.col(text_col)),
            "word",
            keep=F.length("word") > 0,
        )
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
# distributed loop pays per-ROUND job choreography (batched since
# r15; one round per merge before that). Bigger vocabularies keep the
# distributed loop. Bit-identity between the paths is pytest-pinned
# (tests/test_bpe.py).
#
# COUPLING (r14 verdict #6): this constant also gates the BROADCAST
# of vocabulary-sized frames in the token-id plans
# (plans/text_queries.py uses `broadcast_vocab_ok(n)`): a frame of
# <= this many (word, pieces) rows is safely broadcast-joinable on
# the same driver that could have collected it; raising the
# threshold raises the broadcast ceiling WITH it, and vocabularies
# past it fall back to a shuffle join instead of silently shipping a
# multi-GB broadcast.
LOCAL_VOCAB_THRESHOLD = 500_000


def broadcast_vocab_ok(n_rows: int) -> bool:
    """True when a vocabulary-sized frame of ``n_rows`` is safe to
    broadcast — the stated coupling to ``LOCAL_VOCAB_THRESHOLD``
    (see the comment there). Callers switch to a plain shuffle join
    when False; results are identical either way (test-pinned)."""
    return n_rows <= LOCAL_VOCAB_THRESHOLD


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


def _select_batch(
    cands: list[tuple[str, str, int]],
    bounds: dict[tuple[str, str], int],
    alphabet: set[str],
) -> list[tuple[str, str, int]]:
    """Greedy EXACT-equivalent batch selection over one round's
    globally sorted candidate pairs (r15, r14 verdict #2): the longest
    prefix of ``cands`` that is PROVABLY the sequence sequential BPE
    would emit, so a whole batch of merges costs one distributed round
    instead of one round each.

    Inputs: ``cands`` = the top pairs in the trainer's total order
    (count DESC, left ASC, right ASC), already >= min_count;
    ``bounds[(l, r)]`` = the pair's exact trigram-context bound
    tb = max(max_x T(x, l, r), max_y T(l, r, y)) where T is the
    weighted adjacent-TRIPLE count over the current symbol frame;
    ``alphabet`` = every symbol occurring in any pair.

    Equivalence argument (tested bit-identical vs the sequential
    paths): applying a selected merge p_i = (l_i, r_i) -> m_i can
    change the table only by (a) DECREASING counts of pairs sharing a
    component with p_i, and (b) creating instances of pairs containing
    the fresh string m_i. Every created instance sits at a site whose
    ORIGINAL symbol sequence contained the trigram (x, l_i, r_i) or
    (l_i, r_i, y) — even when an earlier batch merge replaced the
    neighbor (the site "l1 r1 li ri" creating (m_1, m_i) is witnessed
    by the original trigram (r_1, l_i, r_i)) — so every pair created
    by p_i has weighted count <= tb_i. By induction, at sequential
    step j the argmax is still p_j provided:

    1. no CROSS-conflict across the batch: a merge site "l_i r_i"
       destroys exactly the adjacent pairs (x, l_i) and (r_i, y), so
       p_j's own count is untouched iff r_j != l_i and l_j != r_i for
       every i != j (sharing a LEFT with another left, or a right
       with a right, is harmless — two sites can then never overlap a
       symbol position); and since the batch is a PREFIX of the total
       order, every unselected existing pair ranked below p_j stays
       below (its count never increases);
    2. c_j strictly exceeds g_{j-1} = max over i<j of tb_i — created
       pairs from DISTINCT merged strings are distinct pairs, so
       their counts never stack (the max suffices, not the sum);
    3. selection STOPS right after any member whose m_i string equals
       an existing symbol (creations could then BOOST an existing
       pair, voiding the no-increase invariant for later members) or
       an earlier member's merged string (creations from both would
       stack on the same pair strings, voiding rule 2's max). The
       stopped batch itself is still exact: boosts from p_i only
       threaten steps after i.

    The first candidate is always selected (rules guard LATER
    members), so every round makes progress; the worst case (every
    top pair sharing a symbol, e.g. a tiny character alphabet early
    in training) degenerates to the sequential one-merge round."""
    batch: list[tuple[str, str, int]] = []
    lefts: set[str] = set()
    rights: set[str] = set()
    merged_seen: set[str] = set()
    g = 0
    for left, right, c in cands:
        if left in rights or right in lefts:
            break
        if c <= g:
            break
        batch.append((left, right, c))
        lefts.add(left)
        rights.add(right)
        g = max(g, bounds.get((left, right), 0))
        m = left + right
        if m in alphabet or m in merged_seen:
            break
        merged_seen.add(m)
    return batch


def _round_stats(
    symbols: DataFrame, limit: int, min_count: int
) -> list[tuple[str, str, int, int]]:
    """ONE distributed job computing everything a batched round's
    driver-side selection needs: the top ``limit`` pairs in the
    trainer's total order (count DESC, left ASC, right ASC) with each
    pair's created-pair bound attached. Returns
    ``[(left, right, count, tb)]`` where tb = max over contexts of the
    weighted adjacent-TRIPLE count — max_x T(x, l, r) (left creations
    (x, m)) vs max_y T(l, r, y) (right creations (m, y)) — exact over
    the CURRENT symbol frame; pairs with no interior context
    (word-edge only) create nothing and get tb = 0.

    One explode emits three legs per word — the adjacency-pair leg
    ('P': the pair count) and the two trigram context legs ('L'/'R',
    kept separate so the max is tight, not side-mixed) — then a
    two-level aggregate folds them into one row per pair. Fusing the
    count and the bound into one job halves the round's driver
    choreography vs a topk-then-bounds pair of jobs."""
    s = F.col("symbols")
    pair_leg = F.zip_with(
        F.slice(s, 1, F.size(s) - 1),
        F.slice(s, 2, F.size(s) - 1),
        lambda a, b: F.struct(
            a.alias("pl"),
            b.alias("pr"),
            F.lit(None).cast("string").alias("ctx"),
            F.lit("P").alias("side"),
        ),
    )
    tri = F.zip_with(
        F.slice(s, 1, F.size(s) - 2),
        F.zip_with(
            F.slice(s, 2, F.size(s) - 2),
            F.slice(s, 3, F.size(s) - 2),
            lambda b, c: F.struct(b.alias("b"), c.alias("c")),
        ),
        lambda a, t: F.struct(
            a.alias("a"), t["b"].alias("b"), t["c"].alias("c")
        ),
    )
    ctx_legs = F.flatten(
        F.transform(
            tri,
            lambda t: F.array(
                F.struct(
                    t["b"].alias("pl"),
                    t["c"].alias("pr"),
                    t["a"].alias("ctx"),
                    F.lit("L").alias("side"),
                ),
                F.struct(
                    t["a"].alias("pl"),
                    t["b"].alias("pr"),
                    t["c"].alias("ctx"),
                    F.lit("R").alias("side"),
                ),
            ),
        )
    )
    legs = F.when(F.size(s) >= 3, F.concat(pair_leg, ctx_legs)).otherwise(
        pair_leg
    )
    rows = (
        symbols.filter(F.size("symbols") >= 2)
        .select(F.explode(legs).alias("e"), "n")
        .select("e.*", "n")
        .groupBy("pl", "pr", "side", "ctx")
        .agg(F.sum("n").alias("cnt"))
        .groupBy("pl", "pr")
        .agg(
            F.sum(F.when(F.col("side") == "P", F.col("cnt"))).alias("c"),
            F.max(
                F.when(F.col("side") != "P", F.col("cnt"))
            ).alias("tb"),
        )
        .filter(F.col("c") >= min_count)
        .orderBy(
            F.col("c").desc(), F.col("pl").asc(), F.col("pr").asc()
        )
        .limit(limit)
        .collect()
    )
    return [
        (r["pl"], r["pr"], int(r["c"]), int(r["tb"] or 0)) for r in rows
    ]


def _apply_merge_batch(
    df: DataFrame, batch: list[tuple[str, str, str]]
) -> DataFrame:
    """Apply a CROSS-CONFLICT-FREE merge batch in ONE pass over the
    symbol frame. Because no member's right equals another's left (or
    vice versa) and every merged string is fresh, merge sites of
    different members can never overlap a symbol position, so a
    single leftmost-nonoverlapping walk testing each adjacency
    against the batch dict equals applying the merges sequentially in
    rank order (at any position at most one member matches, and a
    created symbol cannot re-match within the pass — the walk never
    reconsiders emitted output). One vectorized Arrow pass over the
    vocabulary-sized frame — dict lookup beats a JVM fold re-walking
    the array once per merge, and beats interpreted HOF map lookups
    which are linear per probe. Closure, not module function (the
    worker-shipping rule)."""
    table = list(batch)

    def run(batches):
        import pandas as _pd

        pairs = {(l, r): m for l, r, m in table}

        def sweep_all(syms):
            out, pend = [], None
            for x in syms:
                if pend is None:
                    pend = x
                else:
                    m = pairs.get((pend, x))
                    if m is not None:
                        out.append(m)
                        pend = None
                    else:
                        out.append(pend)
                        pend = x
            if pend is not None:
                out.append(pend)
            return out

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "symbols": [list(sweep_all(s)) for s in pdf["symbols"]],
                    "n": pdf["n"],
                }
            )

    return df.mapInPandas(run, "symbols array<string>, n long")


def train_bpe(
    words: DataFrame,
    n_merges: int,
    min_count: int = 1,
    local_threshold: int = LOCAL_VOCAB_THRESHOLD,
    max_batch: int = 512,
) -> list[Merge]:
    """Learn up to ``n_merges`` BPE merges from a ``(word, n)``
    frequency frame (``word_counts``' output). Returns the merge table
    in rank order; stops early when no pair reaches ``min_count``
    (the corpus ran dry — shorter output, never an error).

    Paths, all bit-identical by test: a vocabulary at or under
    ``local_threshold`` rows is collected and trained driver-locally
    (r14 — the post-scan ``(word, n)`` frame is vocabulary-sized and
    the incremental local loop makes production merge counts
    practical: measured in SCALING.md); larger vocabularies run the
    distributed loop, which since r15 emits a provably-sequential
    BATCH of up to ``max_batch`` merges per round (``_select_batch``:
    prefix-disjoint candidates under a created-pair count guard) —
    cutting the driver-choreography cost from one round per merge to
    one round per batch (measured in SCALING.md; wide-alphabet
    corpora batch near ``max_batch``, a tiny character alphabet
    degenerates toward one merge per round early on).
    ``local_threshold=0`` forces the distributed path; ``max_batch=1``
    forces the r13 one-merge-per-round loop (no Python workers
    anywhere in that path)."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1 (got {n_merges})")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1 (got {min_count})")
    if max_batch < 1:
        raise ValueError(f"max_batch must be >= 1 (got {max_batch})")
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
    order = (F.col("c").desc(), F.col("left").asc(), F.col("right").asc())
    alphabet: set[str] | None = None
    if max_batch > 1:
        # the collision alphabet, maintained DRIVER-SIDE: seeded with
        # the initial symbols (one job), then every emitted merge's
        # string is added. A SUPERSET of the live symbol set (symbols
        # merged away are never removed) — the collision stop only
        # gets more conservative, never wrong — and it saves a
        # distinct-collect job per round
        alphabet = {
            r["s"]
            for r in symbols.select(F.explode("symbols").alias("s"))
            .distinct()
            .collect()
        }
    while len(merges) < n_merges:
        if max_batch == 1:
            # the r13 loop: one JVM-only round per merge
            top = (
                _pair_counts(symbols)
                .filter(F.col("c") >= min_count)
                .orderBy(*order)
                .limit(1)
                .collect()
            )
            if not top:
                break  # corpus ran dry — shorter table, never an error
            row = top[0]
            batch = [(row["left"], row["right"], int(row["c"]))]
        else:
            stats = _round_stats(
                symbols, min(max_batch, n_merges - len(merges)), min_count
            )
            if not stats:
                break
            batch = _select_batch(
                [(l, r, c) for l, r, c, _tb in stats],
                {(l, r): tb for l, r, _c, tb in stats},
                alphabet,
            )
        for left, right, c in batch:
            merges.append(Merge(len(merges), left, right, left + right, c))
            if alphabet is not None:
                alphabet.add(left + right)
        if len(merges) >= n_merges:
            break  # the final frame is never read — don't fold it
        # superseded checkpoints are reclaimed by the ContextCleaner
        # once unreferenced; explicit unpersist() doesn't reach
        # localCheckpoint storage
        if max_batch == 1:
            left, right, _c = batch[0]
            symbols = _apply_merge(symbols, left, right).localCheckpoint()
        else:
            symbols = _apply_merge_batch(
                symbols, [(l, r, l + r) for l, r, _c in batch]
            ).localCheckpoint()
    return merges


MERGES_VERSION = 1


def save_merges(
    path: str,
    merges: list[Merge],
    vocab: list[tuple[str, int]] | None = None,
) -> None:
    """Persist a trained merge table as the tokenizer ARTIFACT (r14 —
    train once, segment any later corpus): versioned JSON, atomic
    rename (a crash mid-write must never leave a half tokenizer a
    later pipeline would load). ``vocab`` (r15) optionally embeds the
    trained piece->id table so a later pipeline can ENCODE, not just
    segment — readers that only want merges (``load_merges``) ignore
    it, so the format version is unchanged."""
    import json
    import os

    payload = {
        "version": MERGES_VERSION,
        "end": END,
        "merges": [list(m) for m in merges],
    }
    if vocab is not None:
        payload["vocab"] = [[p, int(i)] for p, i in vocab]
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
    return _validate_payload(path, _read_payload(path))


def _read_payload(path: str) -> dict:
    import json

    with open(path) as fh:
        return json.load(fh)


def _validate_payload(path: str, payload: dict) -> list[Merge]:
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


def load_vocab(path: str) -> list[tuple[str, int]]:
    """The embedded piece->id table of a ``save_merges(..., vocab=)``
    artifact, for ``encode_words`` over a LATER corpus. Validates the
    shared envelope (version/marker, via ``load_merges``' checks on
    the same file), piece uniqueness, and that ids are exactly
    0..V-1 — a table with holes or duplicates would encode silently
    differently, not fail. Raises on a merges-only artifact: encoding
    without the trained id assignment is a different operation
    (``segment_words``), not a degraded mode."""
    payload = _read_payload(path)  # ONE read + parse (r15 review)
    _validate_payload(path, payload)  # shared envelope validation
    if "vocab" not in payload:
        raise ValueError(
            f"artifact at {path} carries no piece vocab — it was saved "
            "merges-only; re-save with save_merges(..., vocab=) to encode"
        )
    vocab = [(p, int(i)) for p, i in payload["vocab"]]
    pieces = [p for p, _i in vocab]
    ids = sorted(i for _p, i in vocab)
    if len(set(pieces)) != len(pieces) or ids != list(range(len(vocab))):
        raise ValueError(
            f"artifact at {path} has a corrupt vocab: pieces must be "
            "unique and ids exactly 0..V-1"
        )
    return vocab


def encode_words(
    words: DataFrame,
    merges: list[Merge],
    vocab: list[tuple[str, int]],
    unk_id: int | None = None,
) -> DataFrame:
    """``(word, piece_ids array<int>)`` over ANY word frame — the
    OOV-SAFE encode the artifact advertises (r15, r14 verdict #3):
    a corpus disjoint from training drops ZERO tokens. Resolution per
    segmented piece, in order:

    1. the trained vocab id (broadcast join on the piece);
    2. CHARACTER fallback — an unknown piece re-splits into its
       characters (the end-of-word marker stays folded on the last
       one, preserving the reassembly invariant) and each character
       resolves through the same vocab;
    3. the reserved UNK id (default: V, one past the trained ids) for
       characters the training corpus never saw.

    Every input word therefore yields >= 1 id (segmentation never
    drops a word; the fallback chain never drops a piece). Output is
    ONE ROW PER DISTINCT WORD — the input is deduplicated on ``word``
    internally (the final groupBy would otherwise concatenate the id
    arrays of duplicate rows; r15 review pass 2), so callers encoding
    an exploded token frame join the result back on ``word``. Rows
    with NULL words are the caller's bug and are dropped by the
    explode — feed ``normalized_tokens`` output. The vocab ships
    driver->executors once (bounded: it is the trained piece table, at
    most chars + n_merges rows)."""
    if unk_id is None:
        unk_id = max(i for _p, i in vocab) + 1
    spark = words.sparkSession
    vdf = spark.createDataFrame(vocab, "piece string, piece_id int")
    words = words.select("word").dropDuplicates(["word"])
    ex = segment_words(words, merges).select(
        "word", F.posexplode("pieces").alias("ppos", "piece")
    )
    # pinned: the known and fallback branches below both read this
    # frame — without the cut the vocabulary-sized Python segmentation
    # pass (and the vocab join) would re-execute per union branch
    # (the q_bpe_token_ids review pin; r15 review)
    j1 = ex.join(F.broadcast(vdf), "piece", "left").localCheckpoint()
    known = j1.filter(F.col("piece_id").isNotNull()).select(
        "word", "ppos", F.lit(0).alias("cpos"), "piece_id"
    )
    has_end = F.col("piece").endswith(END)
    core = F.when(
        has_end,
        F.col("piece").substr(
            F.lit(1), F.length("piece") - F.lit(len(END))
        ),
    ).otherwise(F.col("piece"))
    # the last-core-char index is computed off the BASE column, not
    # ``core`` — HOF lambdas run interpreted without subexpression
    # elimination, so length(core) would re-evaluate the when/substr
    # per element (the _with_symbols rule; r15 review pass 2). When
    # has_end: len(core) - 1 == length(piece) - len(END) - 1.
    chars = F.transform(
        F.split(core, ""),
        lambda ch, i: F.when(
            has_end & (i == F.length("piece") - F.lit(len(END) + 1)),
            F.concat(ch, F.lit(END)),
        ).otherwise(ch),
    )
    fallback = (
        j1.filter(F.col("piece_id").isNull())
        .select(
            "word", "ppos", F.posexplode(chars).alias("cpos", "cpiece")
        )
        .join(
            F.broadcast(vdf.withColumnRenamed("piece", "cpiece")),
            "cpiece",
            "left",
        )
        .select(
            "word",
            "ppos",
            "cpos",
            F.coalesce("piece_id", F.lit(unk_id)).alias("piece_id"),
        )
    )
    return (
        known.unionByName(fallback)
        .groupBy("word")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ppos", "cpos", "piece_id"))
                ),
                lambda x: x["piece_id"],
            ).alias("piece_ids")
        )
    )


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
