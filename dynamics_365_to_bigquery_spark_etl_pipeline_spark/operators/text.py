"""Text-analysis operators for LLM training-data pipelines (BASELINE
north star; no counterpart in the reference, which has no row-level text
processing — SURVEY.md §2.7).

All operators are pure JVM-side column expressions (no Python UDFs), so
they stay inside whole-stage codegen and scale linearly with executors:
token counting, quality scoring, language-ID heuristics, and document
fingerprinting, each with an exact ANSI-SQL mirror for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker lists for the n-gram/stopword
# language-ID heuristic. Deterministic and SQL-mirrorable; real
# pipelines would swap in fastText/CLD3 via a Pandas UDF.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "y"),
    "zh": ("de", "shi", "le"),
}

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def token_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty/blank strings. Regexp-trims
    because ``F.trim`` / DuckDB ``TRIM`` strip spaces only — a trailing
    tab would otherwise split into a phantom empty token (both engines
    identically, but still the wrong count)."""
    trimmed = F.regexp_replace(text, r"^\s+|\s+$", "")
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def token_count_sql(expr: str) -> str:
    t = f"regexp_replace({expr}, '^\\s+|\\s+$', '', 'g')"
    return (
        f"CASE WHEN LENGTH({t}) = 0 THEN 0 "
        f"ELSE LEN(regexp_split_to_array({t}, '\\s+')) END"
    )


def char_classes(text: Column) -> dict[str, Column]:
    """Character-class tallies used by quality scoring."""
    return {
        "n_chars": F.length(text),
        "n_alpha": F.length(F.regexp_replace(text, r"[^A-Za-z]", "")),
        "n_digit": F.length(F.regexp_replace(text, r"[^0-9]", "")),
        "n_punct": F.length(F.regexp_replace(text, r"[^.,;:!?]", "")),
        "n_space": F.length(F.regexp_replace(text, r"[^ ]", "")),
    }


def stopword_hits(text: Column, words: tuple[str, ...] = STOPWORDS) -> Column:
    """How many tokens are stopwords (exact word match, lowercased)."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def stopword_hits_sql(expr: str, words: tuple[str, ...] = STOPWORDS) -> str:
    wl = ", ".join(f"'{w}'" for w in words)
    return (
        f"LEN(list_filter(regexp_split_to_array(LOWER(TRIM({expr})), '\\s+'),"
        f" t -> t IN ({wl})))"
    )


def lang_score(text: Column, markers: tuple[str, ...]) -> Column:
    """Marker-token hit count for one language."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def lang_score_sql(expr: str, markers: tuple[str, ...]) -> str:
    ml = ", ".join(f"'{m}'" for m in markers)
    return (
        f"LEN(list_filter(regexp_split_to_array(LOWER(TRIM({expr})), '\\s+'),"
        f" t -> t IN ({ml})))"
    )


def quality_score(text: Column) -> Column:
    """Heuristic quality score in [0,100]: length band + alpha ratio +
    stopword ratio, exact integer arithmetic (no FP, so both engines and
    every partitioning agree bit-for-bit). Single source of truth shared
    by ``q_text_quality_score``, the curation composite, and canonical-
    survivor selection — the SQL twin below must change in lockstep."""
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    n_tokens = token_count(text)
    n_stop = stopword_hits(text)
    length_pts = F.when((n_chars >= 100) & (n_chars <= 2000), 40).otherwise(10)
    alpha_pts = F.when(n_alpha * 100 >= n_chars * 60, 30).otherwise(5)
    stop_pts = F.when(n_stop * 100 >= n_tokens * 5, 30).otherwise(5)
    return (length_pts + alpha_pts + stop_pts).cast("int")


def quality_score_sql(expr: str) -> str:
    return f"""CAST(
    (CASE WHEN LENGTH({expr}) >= 100 AND LENGTH({expr}) <= 2000 THEN 40 ELSE 10 END)
    + (CASE WHEN LENGTH(regexp_replace({expr}, '[^A-Za-z]', '', 'g')) * 100
             >= LENGTH({expr}) * 60 THEN 30 ELSE 5 END)
    + (CASE WHEN {stopword_hits_sql(expr)} * 100 >= {token_count_sql(expr)} * 5
       THEN 30 ELSE 5 END)
  AS INT)"""


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the normalized text (lowercased,
    non-alphanumerics collapsed to single spaces, trimmed). Same idea as
    content-defined dedup keys; md5 is portable to the SQL oracle."""
    normalized = F.trim(F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " "))
    return F.md5(normalized)


def fingerprint_sql(expr: str) -> str:
    return f"md5(TRIM(regexp_replace(LOWER({expr}), '[^a-z0-9]+', ' ', 'g')))"
