"""r15 optimization pins: bind_once evaluation semantics, the
no-expensive-chain-inside-Filter plan shape the explode_outer /
filter-above-stage fixes bought, and the IVF store's centroid-row
cache invalidation."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import (
    curation as C,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import (
    dedup as D,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.expr_util import (
    bind_once,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _filter_blocks(plan: str) -> list[str]:
    """Detail bodies of Filter operators in a formatted plan."""
    import re

    blocks = re.split(r"\n\(\d+\) ", plan)
    return [b for b in blocks[1:] if b.startswith("Filter")]


def test_bind_once_value_equality(spark):
    """bind_once(build) must equal build(expr) for normal, short,
    blank, and NULL text — including the empty-array guard branches."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "two words"),
        (3, ""),
        (4, None),
        (5, "  leading and trailing   whitespace  "),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = docs.select("doc_id", D.shingles(F.col("text")).alias("v")).collect()
    # the pre-r15 inline shape: same reshape, argument as expression
    def inline(text, k=3):
        toks = D.normalized_tokens(text)
        n_pos = F.size(toks) - F.lit(k - 1)
        length = F.greatest(n_pos, F.lit(0))
        grams = F.slice(toks, 1, length)
        for j in range(1, k):
            grams = F.zip_with(
                grams, F.slice(toks, j + 1, length),
                lambda x, y: F.concat_ws(" ", x, y),
            )
        return F.when(n_pos > 0, F.array_distinct(grams)).otherwise(
            F.array().cast("array<string>")
        )

    b = docs.select("doc_id", inline(F.col("text")).alias("v")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # word_ngrams too (the other bind_once consumer)
    a = docs.select(C.word_ngrams(F.col("text"), 4).alias("v")).collect()
    toks = F.split(F.regexp_replace(F.col("text"), r"^\s+|\s+$", ""), r"\s+")
    b = docs.select(C.ngrams_from_tokens(toks, 4).alias("v")).collect()
    assert [r["v"] for r in a] == [r["v"] for r in b]


def test_bind_once_single_evaluation_in_plan(spark):
    """The token subtree appears exactly ONCE per bind_once output
    column in the compiled plan — k slice references no longer embed
    k copies of the regexp+split tree."""
    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    plan = _plan(docs.select(D.shingles(F.col("text")).alias("sh")))
    assert plan.count("regexp_replace") == 1


def test_no_gram_chain_inside_filters(spark):
    """The r15 explode_outer fix: contamination_hits' compiled plan
    must not re-evaluate the n-gram zip_with chain inside any Filter —
    the inferred size>0 filter of a plain explode used to push the
    whole chain below the distinct (2 extra evaluations per RAW row)."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.decontaminate import (
        contamination_hits,
        heldout_gram_set,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i} x y z a b c d") for i in range(20)],
        "doc_id long, text string",
    )
    grams = heldout_gram_set(docs.limit(3), "text", 4)
    plan = _plan(contamination_hits(docs, grams, "text", 4, 0))
    for body in _filter_blocks(plan):
        assert "zip_with" not in body, body[:400]


def test_explode_outer_rows_match_plain_explode(spark):
    """ngram_store.batch_counts (outer + isnotnull) emits exactly the
    rows a plain explode emitted — including a doc too short for any
    window (dropped, not counted as a NULL gram)."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.ngram_store import (
        NgramCountStore,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "too short"), (3, None)],
        "doc_id long, text string",
    )
    store = NgramCountStore.__new__(NgramCountStore)
    store.text_col = "text"
    store.w = 5
    got = {
        (r["gram"], r["c"])
        for r in NgramCountStore.batch_counts(store, docs).collect()
    }
    assert got == {("a b c d e", 1), ("b c d e f", 1)}
    assert all(g is not None for g, _ in got)


def test_ivf_centroid_cache_invalidated_by_rebuild(spark, tmp_path):
    """The r15 centroid-row memoization must never serve a previous
    generation's matrix: after rebuild() with different centroids, an
    append assigns against the NEW centroids."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.ivf_store import (
        IvfLayoutStore,
    )

    def vecs(rows):
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    store = IvfLayoutStore(spark, str(tmp_path / "store"))
    # two orthogonal centroids; corpus near centroid 0
    store.build(
        vecs([(100, [1.0, 0.0]), (101, [0.9, 0.1])]),
        vecs([(0, [1.0, 0.0]), (1, [0.0, 1.0])]),
    )
    store.append(vecs([(102, [1.0, 0.05])]), "b1")  # populates the cache
    assert store._cent_cache is not None
    # rebuild with SWAPPED centroid ids: bucket for an x-axis vector
    # must now be id 5, not 0 — a stale cache would keep assigning 0
    store.rebuild(vecs([(5, [1.0, 0.0]), (6, [0.0, 1.0])]))
    store.append(vecs([(103, [1.0, 0.02])]), "b2")
    rows = (
        spark.read.parquet(str(tmp_path / "store" / "vectors"))
        .filter(F.col("vec_id") == 103)
        .collect()
    )
    assert rows and all(r["bucket_id"] == 5 for r in rows)


def test_ivf_centroid_cache_invalidated_by_build_over_build(spark, tmp_path):
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.ivf_store import (
        IvfLayoutStore,
    )

    def vecs(rows):
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    store = IvfLayoutStore(spark, str(tmp_path / "store"))
    store.build(vecs([(100, [1.0, 0.0])]), vecs([(0, [1.0, 0.0])]))
    store.append(vecs([(101, [1.0, 0.1])]), "b1")
    # build AGAIN over the same path with a different centroid id set
    store.build(vecs([(100, [1.0, 0.0])]), vecs([(7, [1.0, 0.0])]))
    store.append(vecs([(102, [1.0, 0.1])]), "b2")
    rows = (
        spark.read.parquet(str(tmp_path / "store" / "vectors"))
        .filter(F.col("vec_id") == 102)
        .collect()
    )
    assert rows and all(r["bucket_id"] == 7 for r in rows)
