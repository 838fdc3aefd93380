"""Date-partitioned landing zone: Catalyst must prune partitions from
the scan (the SCALING.md §sources claim, proven rather than asserted)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_date_partitioned_landing_prunes_scan(spark, tmp_path):
    out = str(tmp_path / "events_by_date")
    ev = load_table(spark, SF_DIR, "events")
    ev.withColumn("event_date", F.to_date("ts")).write.partitionBy(
        "event_date"
    ).parquet(out)
    n_parts = sum(d.startswith("event_date=") for d in os.listdir(out))
    assert n_parts > 5

    day = "2024-01-03"
    df = spark.read.parquet(out).filter(F.col("event_date") == day)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the predicate must land in PartitionFilters (directory-level
    # pruning before any file IO), NOT in PushedFilters/row filters
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "event_date" in pf

    # and the pruned scan reads exactly the one partition's files
    want = {
        tuple(r)
        for r in ev.filter(F.to_date("ts") == day)
        .select("event_id", "user_id")
        .collect()
    }
    got = {tuple(r) for r in df.select("event_id", "user_id").collect()}
    assert got == want and len(got) > 0
    # file-level proof: only files under the matching directory are selected
    files = [r.file_path for r in df.select(
        F.input_file_name().alias("file_path")).distinct().collect()]
    assert files and all(f"event_date={day}" in f for f in files)


def test_aqe_splits_skewed_join(spark, tmp_path):
    """The SCALING.md skew posture ("AQE skew-join for what salting
    doesn't cover") demonstrated live: a 95%-one-key join, thresholds
    scaled down to fixture size, must show skew-split sort-merge-join
    partitions in the final adaptive plan."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        # force SMJ: with broadcast available the small side would never skew-split
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        n = 200_000
        skewed = spark.range(n).select(
            F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("payload"),
        )
        dim = spark.range(0, n, 1).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
        )
        joined = skewed.join(dim, "k")
        # collect() drives THIS DataFrame's QueryExecution, so the
        # adaptive plan below is the executed (final) one — count()
        # would execute a different QueryExecution and leave this plan
        # unoptimized
        assert len(joined.collect()) == n  # correctness first
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_prunes_fact_fact_join(spark):
    """Runtime row-level filtering: a selective filter on one fact side
    injects a bloom filter (`might_contain`) into the other side's scan
    of a shuffle join, so at scale the big side drops non-joining rows
    BEFORE the exchange. The injection is gated on the application-side
    scan size (default 10 GB — exactly the 100 TB regime this engine
    targets); the test lowers the gate to prove the path on fixture
    data, and restores every conf it touches."""
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        # force the shuffle join (broadcast sidesteps runtime filters)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "1KB",
        )
        orders = load_table(spark, SF_DIR, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, SF_DIR, "lineitem")
        j = (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_linestatus")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, "bloom runtime filter not injected"
        # and the filtered plan still computes the right answer
        want = {
            (r.l_linestatus, r["count"])
            for r in li.join(
                F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey")
            )
            .groupBy("l_linestatus")
            .count()
            .collect()
        }
        assert {(r.l_linestatus, r["count"]) for r in j.collect()} == want
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Co-located join: two tables bucketed on the join key by the same
    bucket count sort-merge-join with NO exchange on either side — the
    join's only Exchange in the whole plan is the downstream agg. This
    is the 100 TB fact-fact join posture: pay the bucketing shuffle
    once at write time, never again per query."""
    import shutil

    def drop(name):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        # a table dir orphaned by a dead session blocks saveAsTable even
        # after DROP (the catalog no longer knows it): remove it too
        loc = os.path.join(
            spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"), name
        )
        shutil.rmtree(loc, ignore_errors=True)

    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        orders = load_table(spark, SF_DIR, "orders")
        li = load_table(spark, SF_DIR, "lineitem")
        drop("bt_orders")
        drop("bt_li")
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
            "overwrite"
        ).saveAsTable("bt_orders")
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
            "overwrite"
        ).saveAsTable("bt_li")

        def shape(left, right):
            j = (
                left.join(right, F.col("l_orderkey") == F.col("o_orderkey"))
                .groupBy("o_orderstatus")
                .count()
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            return plan.count("Exchange"), {
                (r.o_orderstatus, r["count"]) for r in j.collect()
            }

        n_bucketed, got = shape(spark.table("bt_li"), spark.table("bt_orders"))
        n_plain, want = shape(li, orders)
        assert got == want and len(got) > 0
        # bucketed: ONLY the agg exchanges; unbucketed: both join sides too
        assert n_bucketed == 1, f"bucketed join still shuffles ({n_bucketed})"
        assert n_plain >= 3
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        drop("bt_orders")
        drop("bt_li")
