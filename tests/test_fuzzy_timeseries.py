"""Edge semantics for the blocked fuzzy join (operators/fuzzy.py) and
time-series resample/forward-fill (operators/timeseries.py). Their
fixture-scale oracle parity runs in test_entry_contract; these pin the
properties the fixtures cannot exercise."""

from __future__ import annotations

import datetime as dt
import os
import itertools

from pyspark.sql import Row

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.fuzzy import (
    fuzzy_join_d1,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.timeseries import (
    resample_ffill,
)


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fuzzy_join_matches_brute_force_on_adversarial_strings(spark):
    # Every edit class at d=1 (substitution / deletion / insertion /
    # exact duplicate), d=2 strings that SHARE a deletion variant
    # (candidate generated, must be verified away), repeated chars
    # (duplicate variants), and 0/1-char strings.
    names = [
        "alpha", "alphb",          # substitution
        "beta", "bet", "betaa",    # deletion / insertion
        "gamma", "gamma",          # exact duplicate content, two ids
        "ab", "ba",                # d=2 via transposition, shares variant "a"? (b? no: {ab,b,a} vs {ba,a,b} share both)
        "aa", "a", "",             # short + repeated chars
        "delta", "dxlta", "dxltx", # chain: d1, then d2 from the head
    ]
    df = spark.createDataFrame(
        [Row(rid=i, name=n) for i, n in enumerate(names)]
    )
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_join_d1(df, "rid", "name").collect()
    }
    want = {
        (i, j, _levenshtein(a, b))
        for (i, a), (j, b) in itertools.combinations(enumerate(names), 2)
        if _levenshtein(a, b) <= 1
    }
    assert got == want
    # sanity: the adversarial set really exercises both directions
    assert any(d == 0 for _, _, d in want) and any(d == 1 for _, _, d in want)
    # "ab"/"ba" (d=2, transposition) share deletion variants, so they are
    # candidates — the levenshtein verify must reject them
    assert (7, 8) not in {(a, b) for a, b, _ in got}


def test_fuzzy_join_null_strings_never_match(spark):
    df = spark.createDataFrame(
        [Row(rid=0, name=None), Row(rid=1, name=None), Row(rid=2, name="x")]
    )
    assert fuzzy_join_d1(df, "rid", "name").count() == 0


def test_resample_ffill_fills_gaps_and_keeps_keys_isolated(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 30)

    def at(hours, minutes=0):
        return t0 + dt.timedelta(hours=hours, minutes=minutes)

    rows = [
        # key "u": events in hours 0 and 3 -> hours 1,2 are gaps
        Row(k="u", ts=at(0), v=10.0),
        Row(k="u", ts=at(0, 10), v=20.0),
        Row(k="u", ts=at(3), v=40.0),
        # key "w": single event -> single-row series, no fill needed
        Row(k="w", ts=at(1), v=7.5),
    ]
    out = resample_ffill(spark.createDataFrame(rows), "k", "ts", "v", "hour")
    got = {
        (r.key, r.bucket_start.hour, r.n_events, r.avg_value_ffill)
        for r in out.collect()
    }
    assert got == {
        ("u", 0, 2, 15.0),  # real bucket: exact decimal avg of 10, 20
        ("u", 1, 0, 15.0),  # gap carries hour 0's average
        ("u", 2, 0, 15.0),
        ("u", 3, 1, 40.0),
        ("w", 1, 1, 7.5),   # w's series never sees u's values
    }


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@given(
    st.lists(
        st.text(alphabet="abc", min_size=0, max_size=6),
        min_size=2,
        max_size=15,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_fuzzy_join_property_equals_brute_force(spark, names):
    """Property: on random small-alphabet strings (dense d<=1 pairs and
    plenty of shared-variant d=2 near-misses), the blocked join's pair
    set equals all-pairs levenshtein <= 1 — full recall AND no false
    positives, regardless of duplicates, empties, or repeated chars."""
    df = spark.createDataFrame(
        [Row(rid=i, name=n) for i, n in enumerate(names)]
    )
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_join_d1(df, "rid", "name").collect()
    }
    want = {
        (i, j, _levenshtein(a, b))
        for (i, a), (j, b) in itertools.combinations(enumerate(names), 2)
        if _levenshtein(a, b) <= 1
    }
    assert got == want


@given(
    st.lists(
        st.text(alphabet="abc", min_size=0, max_size=6),
        min_size=2,
        max_size=12,
    )
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_fuzzy_join_d2_property_equals_brute_force(spark, names):
    """Depth-2 recall/precision property: neighborhood intersection at
    d=2 must find exactly the lev<=2 pairs (shared variants bound the
    distance only by 4, so precision rides on the verify step)."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.fuzzy import (
        fuzzy_join,
    )

    df = spark.createDataFrame(
        [Row(rid=i, name=n) for i, n in enumerate(names)]
    )
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_join(df, "rid", "name", max_dist=2).collect()
    }
    want = {
        (i, j, _levenshtein(a, b))
        for (i, a), (j, b) in itertools.combinations(enumerate(names), 2)
        if _levenshtein(a, b) <= 2
    }
    assert got == want


@given(
    st.lists(
        st.sampled_from(["", "a", "ab", "abc", "abb", "bbc", "cab", "abcd"]),
        min_size=2,
        max_size=14,
    ),
    st.sampled_from([1, 2]),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_fuzzy_join_deduped_pair_set_equals_raw(spark, names, d):
    """Routing equivalence (round-7 verdict #5): exact-dedup ->
    representatives -> fuzzy -> fan-out must produce the IDENTICAL
    (id_a, id_b, dist) set as the raw join, on clone-heavy inputs
    (sampled_from forces duplicate strings, the case the routing
    exists for) at both supported depths — including the intra-group
    dist-0 pairs and the cross-product fan-out of duplicated matches."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.fuzzy import (
        fuzzy_join,
        fuzzy_join_deduped,
    )

    df = spark.createDataFrame([Row(rid=i, name=n) for i, n in enumerate(names)])
    raw = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_join(df, "rid", "name", max_dist=d).collect()
    }
    routed = [
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_join_deduped(df, "rid", "name", max_dist=d).collect()
    ]
    assert len(routed) == len(set(routed))  # no duplicate pairs
    assert set(routed) == raw


def test_fuzzy_join_rejects_unsupported_depth(spark):
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.fuzzy import (
        fuzzy_join,
    )

    df = spark.createDataFrame([Row(rid=0, name="x")])
    for bad in (0, 3):
        try:
            fuzzy_join(df, "rid", "name", max_dist=bad)
            raise AssertionError(f"max_dist={bad} must raise")
        except ValueError:
            pass


SF_DIR_PLANS = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_new_operator_plan_shapes(spark):
    """Physical-plan gates for the round-6 additions: the fuzzy join
    must never plan a cartesian product; the window-bearing series ops
    must never collapse to a SinglePartition sort; the collocation
    scoring joins must stay broadcast (no sort-merge shuffle of the
    vocabulary)."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.plans import (
        analytics_queries as AQ,
    )
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.plans import (
        dedup_queries as DQ,
    )
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.plans import (
        text_queries as TQ,
    )

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    p = plan_of(DQ.q_fuzzy_join_d1(spark, SF_DIR_PLANS))
    assert "CartesianProduct" not in p

    p = plan_of(AQ.q_resample_ffill(spark, SF_DIR_PLANS))
    assert "SinglePartition" not in p

    p = plan_of(AQ.q_events_rolling_zscore(spark, SF_DIR_PLANS))
    assert "SinglePartition" not in p

    p = plan_of(TQ.q_text_collocations(spark, SF_DIR_PLANS))
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_resolve_entities_planted_clusters(spark):
    """Entity resolution on planted messy master data: typo variants
    collapse transitively to one golden record, distinct entities stay
    apart, singletons map to themselves."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.fuzzy import (
        resolve_entities,
    )

    rows = [
        # cluster A: chained typos (0-1 direct, 1-2 direct, 0-2 is d=2
        # -> transitive closure must still unify all three)
        Row(rid=0, name="acme corp"),
        Row(rid=1, name="acme corp."),
        Row(rid=2, name="acme corpx."),
        # cluster B: exact duplicate pair
        Row(rid=3, name="widget llc"),
        Row(rid=4, name="widget llc"),
        # singletons, far from everything
        Row(rid=5, name="zeta industries"),
        Row(rid=6, name="omega holdings"),
    ]
    out = resolve_entities(
        spark.createDataFrame(rows), "rid", "name", max_dist=1
    )
    got = {(r.id, r.canonical_id, r.n_members) for r in out.collect()}
    assert got == {
        (0, 0, 3), (1, 0, 3), (2, 0, 3),
        (3, 3, 2), (4, 3, 2),
        (5, 5, 1), (6, 6, 1),
    }


def test_interval_overlap_join_edges(spark):
    """Planted interval edges for the overlap join: exact-touch
    boundaries count as overlap (closed intervals), nested intervals
    match, pairs sharing SEVERAL buckets emit exactly one row,
    duplicate input rows keep their multiplicity, same-bucket disjoint
    intervals are filtered, and keys never cross."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.asof import (
        interval_overlap_join,
    )

    W = 10
    left = spark.createDataFrame(
        [
            # id, lo, hi
            ("k1", 1, 0, 35),    # spans buckets 0..3
            ("k1", 2, 50, 54),
            ("k2", 3, 0, 5),     # same numbers as k1's, different key
        ],
        "key string, id_a int, lo_a long, hi_a long",
    )
    right = spark.createDataFrame(
        [
            ("k1", 10, 30, 60),  # overlaps 1 ([30,35]) AND 2 ([50,54])
            ("k1", 11, 35, 36),  # touches 1 exactly at 35 -> overlap
            ("k1", 12, 36, 40),  # disjoint from 1 (starts after hi)
            ("k1", 13, 10, 12),  # nested inside 1
            ("k1", 15, 10, 25),  # nested in 1, SHARES BUCKETS {1, 2}
            ("k2", 14, 100, 101),
        ],
        "key string, id_b int, lo_b long, hi_b long",
    )
    out = interval_overlap_join(
        left, right, "key", "lo_a", "hi_a", "lo_b", "hi_b", W
    )
    rows = [(r.id_a, r.id_b) for r in out.collect()]
    # (1,15) shares buckets {1,2} with left interval 1 — must emit once
    assert sorted(rows) == [(1, 10), (1, 11), (1, 13), (1, 15), (2, 10)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan

    # duplicate input ROWS are legitimate data and keep multiplicity
    # (a distinct-based dedup would collapse them)
    dup_left = spark.createDataFrame(
        [("k", 0, 10), ("k", 0, 10)], "key string, lo_a long, hi_a long"
    )
    one_right = spark.createDataFrame(
        [("k", 5, 15)], "key string, lo_b long, hi_b long"
    )
    assert (
        interval_overlap_join(
            dup_left, one_right, "key", "lo_a", "hi_a", "lo_b", "hi_b", W
        ).count()
        == 2
    )
