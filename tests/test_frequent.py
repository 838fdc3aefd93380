"""Misra-Gries frequent-items: the superset guarantee and the exact
two-pass heavy-hitters equality, under adversarial partitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import frequent as FR


def _skewed(spark, n_items=50, scale=600):
    """Zipf-ish: item i appears ~scale/i times (deterministic)."""
    rows = []
    for i in range(1, n_items + 1):
        rows.extend([f"item{i}"] * (scale // i))
    return spark.createDataFrame([(r,) for r in rows], "item string")


def test_mg_union_contains_every_guaranteed_heavy_item(spark):
    """Every item with global freq > N/(k+1) must appear in the union
    of per-partition summaries — even with many partitions and a k far
    below the distinct count (compression constantly firing)."""
    df = _skewed(spark).repartition(16)
    n = df.count()
    k = 10
    cands = {
        r.item for r in FR.mg_partition_summaries(df, "item", k).select("item").collect()
    }
    true = {r.item: r.c for r in df.groupBy("item").agg(F.count("*").alias("c")).collect()}
    for item, c in true.items():
        if c > n / (k + 1):
            assert item in cands, (item, c, n / (k + 1))


def test_mg_single_partition_counts_are_bounded_undercounts(spark):
    """On one partition: mg_count <= true count and within N/(k+1)."""
    df = _skewed(spark).repartition(1)
    n = df.count()
    k = 10
    got = {r.item: r.mg_count for r in FR.mg_partition_summaries(df, "item", k).collect()}
    true = {r.item: r.c for r in df.groupBy("item").agg(F.count("*").alias("c")).collect()}
    assert got  # summaries are non-empty
    for item, mg in got.items():
        assert 0 < mg <= true[item]
        assert true[item] - mg <= n / (k + 1)


def test_heavy_hitters_exact_equals_group_by_having(spark):
    """The sketch path's OUTPUT is exact: identical rows and counts to
    the naive GROUP BY ... HAVING, regardless of partitioning."""
    phi = 0.02
    for parts in (1, 7, 32):
        df = _skewed(spark).repartition(parts)
        n = df.count()
        got = {
            (r.item, r.n_occurrences)
            for r in FR.heavy_hitters_exact(df, "item", phi).collect()
        }
        want = {
            (r.item, r.c)
            for r in df.groupBy("item").agg(F.count("*").alias("c")).collect()
            if r.c > phi * n
        }
        assert got == want, parts


def test_heavy_hitters_rejects_bad_phi(spark):
    df = _skewed(spark)
    with pytest.raises(ValueError, match="phi"):
        FR.heavy_hitters_exact(df, "item", 0.0)


def test_weighted_heavy_hitters_equal_expanded_stream(spark):
    """r9: the weighted path (distinct items + multiplicity — what the
    dedup routing feeds it) must produce IDENTICAL rows and counts to
    the same stream physically expanded, across partitionings — both
    the weighted MG summaries (PODS'12 merge bound over weighted
    increments) and the weighted exact recount."""
    phi = 0.05
    # > ceil(1/phi) = 20 distinct items so the weighted COMPRESS fires
    # (r9 review: 6 items never exceeded k, leaving the compress
    # arithmetic untested in the equivalence check)
    rows = [("a", 40), ("b", 25), ("c", 3), ("d", 1), ("e", 9), ("f", 2)] + [
        (f"tail{j}", 1 + j % 3) for j in range(25)
    ]
    weighted = spark.createDataFrame(rows, "item string, w long")
    expanded = spark.createDataFrame(
        [(i,) for i, w in rows for _ in range(w)], "item string"
    )
    want = {
        (r.item, r.n_occurrences)
        for r in FR.heavy_hitters_exact(expanded, "item", phi).collect()
    }
    assert want  # the fixture has qualifying items
    for parts in (1, 3, 8):
        got = {
            (r.item, r.n_occurrences)
            for r in FR.heavy_hitters_exact(
                weighted.repartition(parts), "item", phi, weight_col="w"
            ).collect()
        }
        assert got == want, parts


def test_weighted_mg_summaries_bound_holds(spark):
    """Weighted MG summaries undercount by at most W_partition/(k+1)."""
    rows = [(f"i{j}", (j % 7) + 1) for j in range(300)] + [("big", 500)]
    df = spark.createDataFrame(rows, "item string, w long").repartition(1)
    k = 10
    got = {
        r.item: r.mg_count
        for r in FR.mg_partition_summaries(df, "item", k, "w").collect()
    }
    true = {i: 0 for i, _ in rows}
    for i, w in rows:
        true[i] += w
    W = sum(true.values())
    assert "big" in got  # the heavy item always survives
    for item, mg in got.items():
        assert 0 < mg <= true[item]
        assert true[item] - mg <= W / (k + 1)


def test_weighted_mg_rejects_fractional_weights(spark):
    """int() on a fractional per-batch sum would truncate (a 0.9/batch
    item accumulates 0 forever) and silently lose guaranteed
    candidates — fractional weight columns must fail loudly."""
    df = spark.createDataFrame([("a", 0.9), ("b", 2.5)], "item string, w double")
    with pytest.raises(Exception, match="integer type"):
        FR.mg_partition_summaries(df, "item", 5, "w").collect()


def test_weighted_mg_drops_nonpositive_counters(spark):
    """Zero-weight items on a never-compressed partition must not leak
    mg_count=0 rows (the positive-lower-bound contract)."""
    df = spark.createDataFrame(
        [("a", 5), ("zero", 0), ("b", 2)], "item string, w long"
    ).repartition(1)
    got = {r.item: r.mg_count for r in FR.mg_partition_summaries(df, "item", 10, "w").collect()}
    assert got == {"a": 5, "b": 2}
