"""Unit tests for the Tier A operator policies (SURVEY.md §5 item 4):
name normalization + collision drop, temporal stringify, drift
alignment, NOT-IN/anti-join null semantics, window-dedup tie-breaking.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import cdc
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.coerce import (
    drift_union,
    stringify_temporal,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.names import (
    normalize_columns,
    normalize_name,
    plan_normalized_projection,
    rename_company,
    table_name_from_path,
)


def test_normalize_name_strips_suffixes():
    assert normalize_name("Systemcreatedat-2000000001") == "systemcreatedat"
    assert normalize_name("No-1") == "no"
    assert normalize_name("plain") == "plain"


def test_collision_drop_removes_all_occurrences():
    plan = plan_normalized_projection(["No-1", "no-2", "Name-3", "Keep"])
    assert plan == [("Name-3", "name"), ("Keep", "keep")]


def test_normalize_columns_single_projection(spark):
    df = spark.createDataFrame(
        [(1, 2, 3, 4)], ["No-1", "no-2", "Name-3", "Keep"]
    )
    out = normalize_columns(df)
    assert out.columns == ["name", "keep"]
    assert out.collect() == [(3, 4)]


def test_table_name_from_path():
    assert table_name_from_path("gs://bucket/Sales Invoice-123/") == "salesinvoice123"


def test_rename_company(spark):
    df = spark.createDataFrame([("acme",)], ["$company"])
    assert rename_company(df).columns == ["_company"]


def test_stringify_temporal(spark):
    df = spark.createDataFrame(
        [("2024-03-05 06:07:08",)], ["raw"]
    ).select(F.col("raw").cast("timestamp").alias("ts"), F.lit("x").alias("s"))
    out = stringify_temporal(df)
    assert dict(out.dtypes) == {"ts": "string", "s": "string"}
    assert out.first().ts == "2024-03-05 06:07:08"


def test_drift_union_alignment(spark):
    delta = spark.createDataFrame([(1, "a")], ["id", "new_col"])
    snapshot = spark.createDataFrame([(2, 9.5)], ["id", "old_col"])
    out = drift_union(delta, snapshot)
    assert out.columns == ["id", "new_col", "old_col"]
    rows = {tuple(r) for r in out.collect()}
    assert rows == {(1, "a", None), (2, None, 9.5)}


def test_drift_union_casts_delta_to_snapshot_types(spark):
    delta = spark.createDataFrame([("7",)], ["id"])  # string on delta side
    snapshot = spark.createDataFrame([(8,)], ["id"])  # long on snapshot side
    out = drift_union(delta, snapshot)
    assert dict(out.dtypes)["id"] == "bigint"
    assert {r.id for r in out.collect()} == {7, 8}


def _changelog(spark, rows):
    schema = T.StructType(
        [
            T.StructField("systemid", T.StringType()),
            T.StructField("systemcreatedat", T.StringType()),
            T.StructField("systemmodifiedat", T.StringType()),
            T.StructField("systemcreatedby", T.StringType()),
            T.StructField("systemmodifiedby", T.StringType()),
            T.StructField("v", T.LongType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


LIVE = "{11111111-1111-1111-1111-111111111111}"


def _live(key, ts, v):
    return (key, ts, ts, LIVE, LIVE, v)


def _delete(key, v=0):
    return (key, None, None, cdc.ZERO_GUID, cdc.ZERO_GUID, v)


def test_soft_delete_removes_every_version(spark):
    df = _changelog(
        spark,
        [
            _live("a", "2024-01-01 00:00:00", 1),
            _live("a", "2024-01-02 00:00:00", 2),
            _delete("a"),
            _live("b", "2024-01-01 00:00:00", 3),
        ],
    )
    out = cdc.filter_soft_deletes(df)
    assert {r.systemid for r in out.collect()} == {"b"}


def test_soft_delete_null_key_does_not_empty_table(spark):
    """The reference's NOT IN would return ZERO rows if a sentinel key
    were NULL (three-valued logic); the anti-join must not."""
    df = _changelog(
        spark,
        [
            _live("a", "2024-01-01 00:00:00", 1),
            _delete(None),
        ],
    )
    out = cdc.filter_soft_deletes(df)
    assert {r.systemid for r in out.collect()} == {"a", None}


def test_resolve_snapshot_keeps_key_with_null_sentinel_predicate(spark):
    """A key whose every row evaluates the sentinel predicate to NULL
    (null timestamps AND null audit GUIDs) must be KEPT: the anti-join
    form keeps it (NULL predicate rows are not sentinels), so the
    one-pass form must too. Regression for the NULL-MAX drop bug."""
    df = _changelog(
        spark,
        [
            ("a", None, None, None, None, 1),  # predicate -> NULL, not a delete
            _live("b", "2024-01-01 00:00:00", 2),
        ],
    )
    composed = cdc.latest_version_per_key(
        cdc.filter_soft_deletes(df), tie_breakers=("v",)
    )
    one_pass = cdc.resolve_snapshot(df, tie_breakers=("v",))
    expected = {(r.systemid, r.v) for r in composed.collect()}
    assert ("a", 1) in expected
    assert {(r.systemid, r.v) for r in one_pass.collect()} == expected


def test_latest_version_deterministic_tiebreak(spark):
    df = _changelog(
        spark,
        [
            _live("a", "2024-01-01 00:00:00", 10),
            _live("a", "2024-01-01 00:00:00", 20),  # same ts — tie
        ],
    )
    out = cdc.latest_version_per_key(df, tie_breakers=("v",))
    assert [(r.systemid, r.v) for r in out.collect()] == [("a", 20)]


def test_resolve_snapshot_end_to_end(spark):
    df = _changelog(
        spark,
        [
            _live("a", "2024-01-01 00:00:00", 1),
            _live("a", "2024-01-03 00:00:00", 3),
            _live("a", "2024-01-02 00:00:00", 2),
            _live("b", "2024-01-01 00:00:00", 4),
            _delete("b"),
            _live("c", "2024-01-05 00:00:00", 5),
        ],
    )
    out = cdc.resolve_snapshot(df, tie_breakers=("v",))
    assert {(r.systemid, r.v) for r in out.collect()} == {("a", 3), ("c", 5)}


def test_merge_cdc_equals_full_load(spark):
    batch1 = [
        _live("a", "2024-01-01 00:00:00", 1),
        _live("b", "2024-01-01 00:00:00", 2),
    ]
    batch2 = [
        _live("a", "2024-01-02 00:00:00", 3),
        _delete("b"),
        _live("c", "2024-01-02 00:00:00", 4),
    ]
    snap1 = cdc.resolve_snapshot(_changelog(spark, batch1), tie_breakers=("v",))
    merged = cdc.merge_cdc(snap1, _changelog(spark, batch2), tie_breakers=("v",))
    full = cdc.resolve_snapshot(_changelog(spark, batch1 + batch2), tie_breakers=("v",))
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in full.collect()}


def test_merge_cdc_delta_only_matches_full_merge(spark):
    batch1 = [
        _live("a", "2024-01-01 00:00:00", 1),
        _live("b", "2024-01-01 00:00:00", 2),
        _live("z", "2024-01-01 00:00:00", 9),  # untouched by delta
    ]
    batch2 = [
        _live("a", "2024-01-02 00:00:00", 3),
        _delete("b"),
    ]
    snap1 = cdc.resolve_snapshot(_changelog(spark, batch1), tie_breakers=("v",))
    fast = cdc.merge_cdc_delta_only(snap1, _changelog(spark, batch2), tie_breakers=("v",))
    full = cdc.merge_cdc(snap1, _changelog(spark, batch2), tie_breakers=("v",))
    assert {tuple(r) for r in fast.collect()} == {tuple(r) for r in full.collect()}


def test_merge_cdc_delta_only_null_keys_do_not_accumulate(spark):
    """NULL keys never equi-match the delta-key set, so a naive
    semi/anti split passes snapshot NULL-key rows through untouched
    while the delta's NULL-key rows resolve independently — one extra
    NULL-key row per merge. The delta-only merge must keep exactly one,
    like the batch resolve (whose window puts all NULLs in one
    partition)."""
    batch1 = [
        _live(None, "2024-01-01 00:00:00", 1),
        _live("a", "2024-01-01 00:00:00", 2),
    ]
    batch2 = [_live(None, "2024-01-02 00:00:00", 3)]
    snap1 = cdc.resolve_snapshot(_changelog(spark, batch1), tie_breakers=("v",))
    fast = cdc.merge_cdc_delta_only(snap1, _changelog(spark, batch2), tie_breakers=("v",))
    full = cdc.merge_cdc(snap1, _changelog(spark, batch2), tie_breakers=("v",))
    assert {tuple(r) for r in fast.collect()} == {tuple(r) for r in full.collect()}
    assert fast.filter(F.col("systemid").isNull()).count() == 1

    # a later delta WITHOUT null keys must not drop (or duplicate) the
    # snapshot's resolved NULL-key row either
    batch3 = [_live("b", "2024-01-03 00:00:00", 4)]
    fast2 = cdc.merge_cdc_delta_only(fast, _changelog(spark, batch3), tie_breakers=("v",))
    full2 = cdc.merge_cdc(fast, _changelog(spark, batch3), tie_breakers=("v",))
    assert {tuple(r) for r in fast2.collect()} == {tuple(r) for r in full2.collect()}
    assert fast2.filter(F.col("systemid").isNull()).count() == 1


def test_merge_cdc_delta_only_small_delta_still_broadcasts(spark):
    """The broadcast hint on the delta-key set was removed (a forced
    broadcast of a large backfill delta would blow driver memory at
    scale); AQE/statistics must still pick a broadcast join for a small
    delta on its own."""
    snap = cdc.resolve_snapshot(
        _changelog(
            spark, [_live(f"k{i}", "2024-01-01 00:00:00", i) for i in range(200)]
        ),
        tie_breakers=("v",),
    )
    delta = _changelog(spark, [_live("k0", "2024-01-02 00:00:00", 999)])
    merged = cdc.merge_cdc_delta_only(snap, delta, tie_breakers=("v",))
    merged.collect()  # materialize so AQE finalizes the plan
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_chunk_documents_edge_rules(spark):
    """Chunking rule pinned: n<=chunk -> one chunk; boundary-aligned and
    ragged tails both emit >= overlap+1 tokens with at least one new;
    blank docs emit nothing; invalid overlap rejected."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.text import (
        chunk_documents,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),  # 10 tokens, aligned: 3 chunks
            (2, "a b c d e f g h i j k"),  # 11 tokens: ragged tail chunk
            (3, "x y"),  # n < chunk
            (4, "p q r s"),  # n == chunk
            (5, "   "),  # blank: dropped
            (6, "solo"),
        ],
        "doc_id int, text string",
    )
    got = {
        (r.doc_id, r.chunk_id): (r.n_chunk_tokens, r.chunk_text)
        for r in chunk_documents(docs, chunk=4, overlap=1).collect()
    }
    assert got == {
        (1, 0): (4, "a b c d"),
        (1, 1): (4, "d e f g"),
        (1, 2): (4, "g h i j"),
        (2, 0): (4, "a b c d"),
        (2, 1): (4, "d e f g"),
        (2, 2): (4, "g h i j"),
        (2, 3): (2, "j k"),
        (3, 0): (2, "x y"),
        (4, 0): (4, "p q r s"),
        (6, 0): (1, "solo"),
    }
    # every non-first chunk shares exactly `overlap` leading tokens with
    # its predecessor's tail and contributes at least one new token
    for (doc, cid), (n, _txt) in got.items():
        if cid > 0:
            assert n >= 2  # overlap(1) + at least one new token

    import pytest as _pytest

    for bad in [(4, 4), (4, 5), (0, 0)]:
        with _pytest.raises(ValueError):
            chunk_documents(docs, chunk=bad[0], overlap=bad[1])
