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


def train_bpe(
    words: DataFrame,
    n_merges: int,
    min_count: int = 1,
) -> list[Merge]:
    """Learn up to ``n_merges`` BPE merges from a ``(word, n)``
    frequency frame (``word_counts``' output). Returns the merge table
    in rank order; stops early when no pair reaches ``min_count``
    (the corpus ran dry — shorter output, never an error). Exactly one
    driver-side row per iteration (the winning pair); each iteration's
    symbol frame is cut so the lineage stays one-merge deep."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1 (got {n_merges})")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1 (got {min_count})")
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


def segment_words(
    words: DataFrame, merges: list[Merge], checkpoint_every: int = 10
) -> DataFrame:
    """``(word, pieces array<string>)`` — replay the trained merge
    table in rank order over a word frame (distinct corpus words or
    new OOV words alike; pairs the training never saw simply never
    merge). The fold chain is cut every ``checkpoint_every`` merges so
    the analyzer never sees an unboundedly deep plan."""
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
