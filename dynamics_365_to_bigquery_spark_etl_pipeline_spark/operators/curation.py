"""Corpus-curation operators for LLM training-data pipelines (BASELINE
north star; no counterpart in the reference, which stops at per-entity
CDC — SURVEY.md §2.7): benchmark decontamination, deterministic
stratified sampling, blocklist filtering, and sequence packing.

Like ``operators/text.py``, everything here is a pure JVM-side column
expression (whole-stage codegen, no Python) with an exact ANSI-SQL
mirror, so each step is oracle-checkable and scales linearly with
executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .expr_util import bind_once, explode_nonempty


def heldout_gram_set(
    heldout: DataFrame, text_col: str = "text", n: int = 4
) -> DataFrame:
    """The held-out split's distinct word-n-gram hashes — one ``gh``
    column of 60-bit ints, the broadcast side of a decontamination
    join. Distinct texts first: duplicate held-out docs cannot change
    a gram-set union. ONE definition shared by the batch query
    (``plans/curation_queries.q_decontaminate_ngram``) and the ingest
    gate (``streaming/decontaminate.stream_decontaminate``) — two
    copies would let the gate silently diverge from the batch oracle
    that verifies it (r11 review)."""
    return (
        explode_nonempty(
            # one explode_nonempty owner for every tokenizer/gram
            # explode (r16): outer generate + null kill at the
            # generate, so Catalyst never infers the size>0 filter
            # whose pushdown re-evaluates the n-gram chain per row
            # (below the distinct, when it pushes that far — r15)
            heldout.select(text_col).distinct(),
            [],
            F.array_distinct(word_ngrams(F.col(text_col), n)),
            "ngram",
        )
        .select(hash60(F.col("ngram")).alias("gh"))
        .distinct()
    )


def word_ngrams(text: Column, n: int) -> Column:
    """Array of word ``n``-grams (space-joined) over whitespace tokens;
    empty array when the document has fewer than ``n`` tokens.

    Built as a ``zip_with`` chain over n shifted slices, NOT as
    ``transform(sequence(...), i -> slice(toks, i, n))``: a lambda that
    references ``toks`` re-evaluates the whole regexp+split subtree PER
    ELEMENT (higher-order functions run interpreted, no subexpression
    elimination) — measured 39 s vs 4 s for bigrams over 50k docs. The
    token subtree is additionally ``bind_once``-bound (r15): HOF
    *argument* positions each embed their own COPY of the tree, so the
    n+1 slice/size references re-ran the regexp+split per reference —
    binding it as a lambda variable evaluates it once per row (the
    contamination-hits pipeline measured 3.9 -> 1.8 s at sf0.1, rows
    identical). The ``when`` guard keeps the under-n-tokens case an
    EMPTY array. Trimming is regexp-based: ``F.trim`` strips SPACES
    only, so a trailing tab would otherwise split into a phantom empty
    token (caught by the seeded-random property test)."""
    toks = F.split(F.regexp_replace(text, r"^\s+|\s+$", ""), r"\s+")
    return bind_once(toks, lambda t: ngrams_from_tokens(t, n))


def ngrams_from_tokens(toks: Column, n: int) -> Column:
    """Array-based n-gram core shared by ``word_ngrams`` (whitespace
    tokens) and the collocation family (``dedup.normalized_tokens``) —
    one owner for the zip_with reshape. ``toks`` must be a cheap
    expression (storage or projected column): it appears n+1 times as
    HOF *arguments* (fine, evaluated once per row), never inside a
    lambda."""
    n_pos = F.size(toks) - F.lit(n - 1)
    length = F.greatest(n_pos, F.lit(0))
    grams = F.slice(toks, 1, length)
    for i in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, i + 1, length),
            lambda x, y: F.concat_ws(" ", x, y),
        )
    return F.when(n_pos > 0, grams).otherwise(F.array().cast("array<string>"))


def word_ngrams_sql(expr: str, n: int) -> str:
    """DuckDB mirror of ``word_ngrams`` (same regexp whitespace-trim —
    DuckDB TRIM is also space-only)."""
    toks = (
        f"regexp_split_to_array(regexp_replace({expr}, '^\\s+|\\s+$', '', 'g'),"
        f" '\\s+')"
    )
    return ngrams_from_tokens_sql(toks, n)


def ngrams_from_tokens_sql(arr: str, n: int) -> str:
    """DuckDB mirror of ``ngrams_from_tokens`` (1-indexed inclusive
    slices; ``range(a, b)`` is empty when b <= a, so no guard needed)."""
    return (
        f"list_transform(range(1, LEN({arr}) - {n} + 2), "
        f"i -> array_to_string({arr}[i:i + {n - 1}], ' '))"
    )


def hash60(col: Column) -> Column:
    """Uniform 60-bit non-negative hash of a string column — the
    portable md5 family (DuckDB: ``('0x' || substr(md5(x), 1, 15))::
    BIGINT``), used wherever sampling or bucketing must reproduce
    bit-for-bit across engines and re-executions."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def sample_permille(key: Column, permille: Column) -> Column:
    """Deterministic Bernoulli sample: keep a row iff
    ``hash60(key) % 1000 < permille``. Hash-based (not ``rand()``) so
    the sample is stable under retries, AQE re-partitioning, and
    speculative re-execution — the only sampling that is reproducible
    on a 1000-executor cluster."""
    return (hash60(key) % 1000) < permille


def sample_permille_sql(key_expr: str, permille_expr: str) -> str:
    return f"({hash60_sql(key_expr)} % 1000) < ({permille_expr})"


# -- span-level duplicate detection (shared core, r12) ----------------------
# ONE implementation of the routed duplicate-window derivation and the
# interval-union fold for all three consumers — the span detector
# (q_text_dup_spans), the span cutter (q_text_cut_dup_spans), and the
# streaming span gate's per-doc stats: three hand-synced copies of
# span-dedup-critical logic is the drift class the r12 store chassis
# exists to prevent, applied to expressions (r12 review).


def interval_union_len(sorted_starts: Column, w: int) -> Column:
    """``|union of [p, p+w-1]|`` over a SORTED array of interval
    starts: for equal-length-w intervals, union length =
    Σ min(w, p_{i+1} - p_i) with a ``-w`` sentinel (the first interval
    contributes exactly w). Exact integers, no w× explode, no distinct
    exchange — the oracle twins keep the naive explode+distinct shape,
    so every hash check verifies this identity."""
    return F.aggregate(
        sorted_starts,
        F.struct(
            F.lit(-w).cast("long").alias("prev"),
            F.lit(0).cast("long").alias("tot"),
        ),
        lambda acc, p: F.struct(
            p.cast("long").alias("prev"),
            (
                acc["tot"]
                + F.least(F.lit(w).cast("long"), p.cast("long") - acc["prev"])
            ).alias("tot"),
        ),
        lambda acc: acc["tot"],
    )


def routed_dup_windows(
    docs: DataFrame,
    text_col: str,
    w: int,
    min_occurrences: int,
    id_col: str = "doc_id",
    spread: int | None = None,
):
    """The routed duplicate-window derivation (the r9 law applied to
    span dedup): windows are a function of the TEXT alone, and a
    window's corpus-wide occurrence count = per-distinct-text count ×
    clone multiplicity, summed — so the gram explosion runs once per
    DISTINCT text (measured 27.0 -> 5.9 s at sf1 on the 10x-cloned
    fixture) and verdicts fan back over the md5 routing key.

    Returns ``(members, reps, wins, dup)``: the (id, _th) member map,
    the (_th, text) distinct-text frame, the (_th, pos, gram)
    positional windows per distinct text, and the duplicated-window
    set (one ``gram`` column, corpus count >= min_occurrences)."""
    members = docs.select(id_col, F.md5(F.col(text_col)).alias("_th"))
    reps = (
        docs.select(text_col)
        .distinct()
        .select(F.md5(F.col(text_col)).alias("_th"), text_col)
    )
    if spread:
        # scan-split-conditioned spread (r16, guide §2/§6): callers
        # pass catalog.kernel_spread(...) — the distinct's exchange is
        # AQE-coalesced to ~1 task on split-starved fixtures, making
        # the W-window zip_with chain (this family's dominant CPU)
        # single-core; one tiny (_th, text) exchange spreads it. None
        # at real scale — the plan is then unchanged.
        reps = reps.repartition(spread)
    mult = members.groupBy("_th").agg(F.count("*").alias("mult"))
    # one explode_nonempty owner (r16): no inferred size>0 filter, so
    # the window expression is evaluated once per distinct text (r15)
    wins = explode_nonempty(
        reps, ["_th"], word_ngrams(F.col(text_col), w), "gram",
        pos_alias="pos",
    )
    dup = (
        wins.groupBy("_th", "gram")
        .agg(F.count("*").alias("c"))
        .join(mult, "_th")
        .groupBy("gram")
        .agg(F.sum(F.col("c") * F.col("mult")).alias("c"))
        .filter(F.col("c") >= min_occurrences)
        .select("gram")
    )
    return members, reps, wins, dup
