"""Text-analysis query family over ``documents`` (Tier B, BASELINE
north star): token counting, quality scoring, language-ID heuristic,
fingerprinting. All JVM-side expressions with exact SQL mirrors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import text as X


def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token / character-class counts per document, including BPE-ish
    regex tokenization (SURVEY §7.1: "whitespace + a BPE-ish regex"):
    words, numbers, and punctuation runs counted as separate tokens, the
    pre-tokenization GPT-style BPE applies. One scan, all per-row JVM
    expressions."""
    docs = load_table(spark, sf_dir, "documents")
    cc = X.char_classes(F.col("text"))
    t = F.col("text")
    # The three BPE token classes partition the non-space text (each
    # maximal run belongs to exactly one class), so counting matches
    # per class replaces materializing the token array + per-element
    # regex filters (~25% faster, same values).
    n_words = F.regexp_count(t, F.lit("[A-Za-z]+"))
    n_nums = F.regexp_count(t, F.lit("[0-9]+"))
    n_punct = F.regexp_count(t, F.lit(r"[^A-Za-z0-9\s]+"))
    return docs.select(
        "doc_id",
        X.token_count(t).alias("n_tokens"),
        cc["n_chars"].alias("n_chars_live"),
        cc["n_alpha"].alias("n_alpha"),
        cc["n_space"].alias("n_space"),
        X.stopword_hits(t).alias("n_stopwords"),
        (n_words + n_nums + n_punct).alias("n_bpe_tokens"),
        n_words.alias("n_word_tokens"),
        n_nums.alias("n_num_tokens"),
    )


def q_text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score in [0,100]: length band + alpha ratio +
    stopword ratio, computed with exact integer arithmetic (portable)."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_chars = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_tokens = X.token_count(t)
    n_stop = X.stopword_hits(t)
    length_pts = F.when((n_chars >= 100) & (n_chars <= 2000), 40).otherwise(10)
    alpha_pts = F.when(n_alpha * 100 >= n_chars * 60, 30).otherwise(5)
    stop_pts = F.when(n_stop * 100 >= n_tokens * 5, 30).otherwise(5)
    return docs.select(
        "doc_id",
        (length_pts + alpha_pts + stop_pts).cast("int").alias("quality_score"),
    )


def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-stopword language ID: argmax language by marker hits, with
    deterministic alphabetical tie-break, 'und' when no marker hits."""
    docs = load_table(spark, sf_dir, "documents")
    scores = [
        X.lang_score(F.col("text"), markers).alias(f"s_{lang}")
        for lang, markers in sorted(X.LANG_MARKERS.items())
    ]
    scored = docs.select("doc_id", "lang", *scores)
    langs = sorted(X.LANG_MARKERS)
    best = F.greatest(*[F.col(f"s_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier languages win ties
        pred = F.when((F.col(f"s_{lang}") == best) & (best > 0), lang).otherwise(pred)
    return scored.select("doc_id", "lang", pred.alias("pred_lang"))


def q_text_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint per document (md5 of normalized text) plus
    source-level fingerprint cardinality."""
    docs = load_table(spark, sf_dir, "documents")
    with_fp = docs.select("source", X.fingerprint(F.col("text")).alias("fp"))
    return (
        with_fp.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("fp").alias("n_distinct_fp"),
        )
    )


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation gate — the composition a training-data
    pipeline actually ships: keep a document iff it is (a) the
    exact-dedup survivor of its content-fingerprint group, (b)
    identified as English, and (c) above the quality bar. Three
    doc_id-keyed joins of the individual Tier-B stages (one shuffle
    key throughout — co-partitioned at scale), each stage separately
    oracle-checked, the composition checked here."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    survivors = (
        docs.select("doc_id", X.fingerprint(F.col("text")).alias("fp"))
        .withColumn("keep", F.min("doc_id").over(Window.partitionBy("fp")))
        .filter(F.col("doc_id") == F.col("keep"))
        .select("doc_id")
    )
    quality = q_text_quality_score(spark, sf_dir)
    lang = q_text_lang_id(spark, sf_dir).select("doc_id", "pred_lang")
    return (
        quality.join(lang, "doc_id")
        .join(survivors, "doc_id")
        .filter((F.col("quality_score") >= 70) & (F.col("pred_lang") == "en"))
        .select("doc_id", "pred_lang", "quality_score")
    )


QUERIES = {
    "q_text_token_stats": q_text_token_stats,
    "q_text_quality_score": q_text_quality_score,
    "q_text_lang_id": q_text_lang_id,
    "q_text_fingerprint_groups": q_text_fingerprint_groups,
}

_TOKENS = X.token_count_sql("text")
_STOPS = X.stopword_hits_sql("text")

_LANG_SCORE_COLS = ",\n  ".join(
    f"{X.lang_score_sql('text', markers)} AS s_{lang}"
    for lang, markers in sorted(X.LANG_MARKERS.items())
)
_LANGS = sorted(X.LANG_MARKERS)
_BEST = "GREATEST(" + ", ".join(f"s_{lang}" for lang in _LANGS) + ")"
_PRED_CASE = (
    "CASE "
    + " ".join(
        f"WHEN s_{lang} = {_BEST} AND {_BEST} > 0 THEN '{lang}'" for lang in _LANGS
    )
    + " ELSE 'und' END"
)

ORACLES = {
    "q_text_token_stats": f"""
SELECT doc_id,
  {_TOKENS} AS n_tokens,
  LENGTH(text) AS n_chars_live,
  LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
  LENGTH(regexp_replace(text, '[^ ]', '', 'g')) AS n_space,
  {_STOPS} AS n_stopwords,
  LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS n_bpe_tokens,
  LEN(list_filter(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+'),
      t -> regexp_matches(t, '^[A-Za-z]+$'))) AS n_word_tokens,
  LEN(list_filter(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+'),
      t -> regexp_matches(t, '^[0-9]+$'))) AS n_num_tokens
FROM documents
""",
    "q_text_quality_score": f"""
SELECT doc_id,
  CAST(
    (CASE WHEN LENGTH(text) >= 100 AND LENGTH(text) <= 2000 THEN 40 ELSE 10 END)
    + (CASE WHEN LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 100
             >= LENGTH(text) * 60 THEN 30 ELSE 5 END)
    + (CASE WHEN {_STOPS} * 100 >= {_TOKENS} * 5 THEN 30 ELSE 5 END)
  AS INT) AS quality_score
FROM documents
""",
    "q_text_lang_id": f"""
WITH scored AS (
  SELECT doc_id, lang,
  {_LANG_SCORE_COLS}
  FROM documents
)
SELECT doc_id, lang, {_PRED_CASE} AS pred_lang FROM scored
""",
    "q_text_fingerprint_groups": f"""
SELECT source, COUNT(*) AS n_docs,
  COUNT(DISTINCT {X.fingerprint_sql('text')}) AS n_distinct_fp
FROM documents
GROUP BY source
""",
}

EXTRA_QUERIES = {
    # composition of the registered quality/lang/fingerprint stages
    # (registry is at the driver's 50-row cap; full oracle below)
    "q_corpus_curation": q_corpus_curation,
}

EXTRA_ORACLES = {
    "q_corpus_curation": f"""
WITH q AS (
  SELECT doc_id,
    CAST(
      (CASE WHEN LENGTH(text) >= 100 AND LENGTH(text) <= 2000 THEN 40 ELSE 10 END)
      + (CASE WHEN LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 100
               >= LENGTH(text) * 60 THEN 30 ELSE 5 END)
      + (CASE WHEN {_STOPS} * 100 >= {_TOKENS} * 5 THEN 30 ELSE 5 END)
    AS INT) AS quality_score
  FROM documents
),
scored AS (
  SELECT doc_id,
  {_LANG_SCORE_COLS}
  FROM documents
),
l AS (SELECT doc_id, {_PRED_CASE} AS pred_lang FROM scored),
s AS (
  SELECT doc_id FROM (
    SELECT doc_id,
      MIN(doc_id) OVER (PARTITION BY {X.fingerprint_sql('text')}) AS keep
    FROM documents
  ) WHERE doc_id = keep
)
SELECT q.doc_id, l.pred_lang, q.quality_score
FROM q JOIN l USING (doc_id) JOIN s USING (doc_id)
WHERE q.quality_score >= 70 AND l.pred_lang = 'en'
""",
}
