"""Data-quality operator: N row-level checks must cost one scan, the
quarantine split must partition exactly, and set-level checks must
report real duplicates/orphans."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import quality as Q

SF_DIR = "/root/testdata/sf0.001"


def test_violation_counts_single_scan_and_null_semantics(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "F"), (2, None, "O"), (3, 500.0, "X"), (None, 20.0, "F")],
        "k long, price double, status string",
    )
    checks = [
        Q.not_null("k"),
        Q.in_range("price", 0, 100),
        Q.one_of("status", ["F", "O"]),
    ]
    [row] = Q.violation_counts(df, checks).collect()
    # NULL price fails the range check (null predicate = violation)
    assert (row.n_rows, row.not_null_k, row.range_price, row.one_of_status) == (
        4, 1, 2, 1,
    )

    # N checks, ONE scan: exactly one leaf scan in the physical plan
    plan = (
        Q.violation_counts(load_table(spark, SF_DIR, "orders"), checks=[
            Q.not_null("o_custkey"),
            Q.in_range("o_totalprice", 0, 100),
            Q.one_of("o_orderstatus", ["F"]),
            Q.matches("o_orderpriority", "^1-"),
        ])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") == 1


def test_duplicate_check_names_rejected_explicit_names_pass(spark):
    """Two same-kind checks on one column collide on the default alias;
    violation_counts must reject that loudly, and explicit name= must
    make both results addressable."""
    import pytest

    df = spark.createDataFrame(
        [(1, 5.0), (2, 50.0), (3, 500.0)], "k long, price double"
    )
    with pytest.raises(ValueError, match="range_price"):
        Q.violation_counts(
            df, [Q.in_range("price", 0, 100), Q.in_range("price", 0, 10)]
        )

    [row] = Q.violation_counts(
        df,
        [
            Q.in_range("price", 0, 100, name="price_loose"),
            Q.in_range("price", 0, 10, name="price_tight"),
        ],
    ).collect()
    assert (row.price_loose, row.price_tight) == (1, 2)


def test_split_quarantine_partitions_exactly(spark):
    orders = load_table(spark, SF_DIR, "orders")
    checks = [Q.in_range("o_totalprice", 0, 100_000), Q.one_of("o_orderstatus", ["F", "O"])]
    ok, bad = Q.split_quarantine(orders, checks)
    n, n_ok, n_bad = orders.count(), ok.count(), bad.count()
    assert n_ok + n_bad == n and n_bad > 0 and n_ok > 0
    # the quarantine really is the violating set
    assert bad.filter(
        F.col("o_totalprice").between(0, 100_000)
        & F.col("o_orderstatus").isin(["F", "O"])
    ).count() == 0


def test_duplicate_keys_and_orphans(spark):
    events = load_table(spark, SF_DIR, "events")
    dups = Q.duplicate_keys(events, ["user_id", "event_type"])
    assert dups.count() > 0
    assert dups.filter(F.col("n") <= 1).count() == 0

    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    assert Q.orphan_rows(li, "l_orderkey", orders, "o_orderkey").count() == 0
    # drop half the orders -> orphans appear
    half = orders.filter(F.col("o_orderkey") % 2 == 0)
    assert Q.orphan_rows(li, "l_orderkey", half, "o_orderkey").count() > 0
