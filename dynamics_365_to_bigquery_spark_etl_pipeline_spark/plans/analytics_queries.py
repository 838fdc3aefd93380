"""Event-stream analytics: time windows, sessionization, JSON props
(SURVEY.md §7.1 Tier B event-stream ops).

These are the batch expressions of the streaming constructs the
reference hand-rolls (§2.6): tumbling windows over event time, session
assignment via gap detection, and JSON prop extraction. The streaming
variants (withWatermark / session_window / foreachBatch) live in
``streaming/`` and are pytest-verified; these batch twins are the
oracle-checked semantics.

Scale notes: all three shapes are single-shuffle (groupBy on the
window/user key); sessionization is one window function pass over a
user-partitioned sort — at 100 TB, partition the source by date and
user bucketing keeps the sort local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import davg_sql, dsum, dsum_sql

SESSION_GAP_MIN = 30


def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling window per event type (F.window ≡ date_trunc for
    aligned 1-hour windows)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").start.alias("hour_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
    )


def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 hour window, 15 min slide): each event lands in
    four windows; counts per (window_start, event_type)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "n_events",
        )
    )


def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON prop extraction + aggregation (props is a JSON string)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def q_events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT twin of q_events_json_props (same oracle): props parsed
    once into Spark 4's binary VARIANT encoding, fields extracted with
    typed variant_get. At scale this is the semi-structured posture —
    parse once at ingest, store VARIANT, extract many times without
    re-tokenizing JSON text per query (get_json_object re-parses the
    string on every extraction)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def sessionized(ev: DataFrame) -> DataFrame:
    """Gap-based session assignment (new session after > SESSION_GAP_MIN
    idle): (user_id, ts, event_id, us, session_id). ONE owner for the
    lag/flag/cumsum construction, shared by ``q_events_sessionize`` and
    the interval-overlap query so the session definitions cannot
    drift."""
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w = Window.partitionBy("user_id").orderBy(*order)
    micros = F.unix_micros(F.col("ts"))
    gap_us = micros - F.lag(micros).over(w)
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        micros.alias("us"),
        F.when(gap_us.isNull() | (gap_us > SESSION_GAP_MIN * 60 * 1_000_000), 1)
        .otherwise(0)
        .alias("new_s"),
    )
    return flagged.select(
        "user_id",
        "ts",
        "event_id",
        "us",
        F.sum("new_s")
        .over(
            Window.partitionBy("user_id")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("session_id"),
    )


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user is idle
    > 30 min (lag + cumulative sum — the batch twin of session_window)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        sessionized(ev)
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        )
    )


def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event counts per user over the event-type enum."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
        .na.fill(0)
        .select(
            "user_id",
            F.col("click").alias("n_click"),
            F.col("view").alias("n_view"),
            F.col("purchase").alias("n_purchase"),
            F.col("signup").alias("n_signup"),
            F.col("error").alias("n_error"),
        )
    )


def q_events_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact row-level dedup on a projection (dropDuplicates ≡ GROUP BY
    at scale: one hash-aggregate shuffle on the dedup key)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").dropDuplicates(["user_id", "event_type"])


def q_incr_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance: the per-event-type value aggregate
    kept up to date across three incremental loads (split on ts), each
    step aggregating ONLY its delta and folding the partial into the
    running state — never re-reading earlier data. The oracle is the
    full recompute, so the comparison proves increment order and
    batching are invisible in the result (exact decimal partials
    compose; see operators/incr.py).

    Scale: each run shuffles |delta| rows into |touched groups| partials
    and merges tables of |groups| rows — O(|delta|) per run vs the
    reference's nightly O(|table|) overwrite."""
    from ..operators import incr

    ev = load_table(spark, sf_dir, "events")
    splits = ["2024-01-11 00:00:00", "2024-01-21 00:00:00"]
    batches = [
        ev.filter(F.col("ts") < splits[0]),
        ev.filter((F.col("ts") >= splits[0]) & (F.col("ts") < splits[1])),
        ev.filter(F.col("ts") >= splits[1]),
    ]
    state = None
    for b in batches:
        state = incr.merge_group_stats(
            state, incr.partial_group_stats(b, ["event_type"], "value"),
            ["event_type"],
        )
    return incr.finalize_group_stats(state)


FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_WINDOW_HOURS = 24  # conversion deadline per step


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict sequential funnel view → click → purchase: a user counts
    for step k only with a step-k event AFTER their step-(k-1) entry
    time and within the 24 h conversion window (min-per-step alone
    over-counts users who clicked before ever viewing, and an unbounded
    window converts everyone in a dense corpus). Output: one row per
    step with the surviving-user count.

    Scale shape: each step is a filtered scan aggregated to ONE row per
    user, then a user-key join with the (even smaller) previous step's
    survivors — every shuffle is on user_id over per-user rows, never
    raw events, and each step's table shrinks monotonically. At 100 TB
    the event filter pushes to the scan and the per-user tables are
    join-key co-partitioned."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[1])
        .join(s1, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr(f"INTERVAL {FUNNEL_WINDOW_HOURS} HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[2])
        .join(s2, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr(f"INTERVAL {FUNNEL_WINDOW_HOURS} HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    rows = [
        s1.agg(F.lit(f"1_{FUNNEL_STEPS[0]}").alias("step"), F.count("*").alias("n_users")),
        s2.agg(F.lit(f"2_{FUNNEL_STEPS[1]}").alias("step"), F.count("*").alias("n_users")),
        s3.agg(F.lit(f"3_{FUNNEL_STEPS[2]}").alias("step"), F.count("*").alias("n_users")),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def q_events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by the week of their FIRST
    event; for each (cohort week, week offset) the count of cohort
    members active that week. Monday-truncated weeks in both engines;
    offset = whole weeks between the cohort week and the active week.

    Scale shape: one aggregate to per-user first-event times, one
    distinct over (user, week) — both user-keyed shuffles over per-user
    /per-user-week rows — then a user-key join and a final small
    aggregate; nothing ever windows or sorts the raw event stream."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("active_week")
    ).distinct()
    return (
        active.join(firsts, "user_id")
        .groupBy(
            F.col("cohort_week").cast("string").alias("cohort_week"),
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


EPOCH_2024_US = 1_704_067_200 * 1_000_000  # 2024-01-01 UTC, microseconds


def q_events_trend_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per event type: least-squares trend slope
    of value over time (value-units/day) and the value-time correlation.

    Built from EXACT decimal moment sums, not ``regr_slope``/``corr``
    built-ins: double-summed moments are partitioning/order-dependent
    FP, so two engines (or two AQE plans) disagree in the last digits.
    Here x = centered event-time micros (decimal(14,0)), y =
    floor(value*1000) (decimal(10,0)) — both integral, so every sum and
    product is exact and engine-identical; only the FINAL slope/corr
    division happens in doubles, an identical IEEE expression tree on
    identical inputs in both engines, then rounded. Scale shape: one
    hash aggregate with map-side partials, same as any sum."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    # 19,0 operands so products bind at (38,0) in BOTH engines (DuckDB
    # sizes a product at p1+p2, Spark at p1+p2+1 capped to 38 — either
    # way exact here: |x| <= ~2.6e12, so x*x <= ~7e24 << 1e38)
    x = (F.unix_micros(F.col("ts")) - F.lit(EPOCH_2024_US)).cast("decimal(19,0)")
    y = F.floor(F.col("value") * 1000).cast("decimal(19,0)")
    s = (
        ev.select("event_type", x.alias("x"), y.alias("y"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    cov_num = d("n") * d("sxy") - d("sx") * d("sy")
    var_x = d("n") * d("sxx") - d("sx") * d("sx")
    var_y = d("n") * d("syy") - d("sy") * d("sy")
    return s.select(
        "event_type",
        "n",
        F.round(cov_num / var_x * F.lit(86400000000.0) / F.lit(1000.0), 6).alias(
            "slope_per_day"
        ),
        F.round(cov_num / F.sqrt(var_x * var_y), 6).alias("corr_xy"),
    )


QUERIES = {
    "q_events_tumbling": q_events_tumbling,
    "q_events_sliding": q_events_sliding,
    "q_events_json_props": q_events_json_props,
    "q_events_sessionize": q_events_sessionize,
    "q_events_pivot": q_events_pivot,
}

EXTRA_QUERIES = {
    # exact-dedup family: registered sibling q_dedup_exact (documents)
    "q_events_dedup_exact": q_events_dedup_exact,
    # agg family sibling: incremental maintenance of q_events_tumbling's
    # aggregate shape, oracle = full recompute
    "q_incr_agg_maintenance": q_incr_agg_maintenance,
    # VARIANT twin of registered q_events_json_props (same oracle)
    "q_events_variant_props": q_events_variant_props,
    # event-analytics composites: strict sequential funnel + weekly
    # cohort retention (full SQL oracles below)
    "q_events_funnel": q_events_funnel,
    "q_events_cohort_retention": q_events_cohort_retention,
    # statistical aggregates from exact decimal moments (full oracle)
    "q_events_trend_stats": q_events_trend_stats,
}

ORACLES = {
    "q_events_tumbling": f"""
SELECT date_trunc('hour', ts) AS hour_start, event_type,
  COUNT(*) AS n_events, {dsum_sql('value')} AS sum_value
FROM events
GROUP BY 1, 2
""",
    "q_events_sliding": """
-- sliding windows: an event at ts belongs to the 4 hour-long windows
-- starting at the 15-min marks in (ts - 1h, ts]
WITH expanded AS (
  SELECT e.event_type,
         time_bucket(INTERVAL 15 MINUTES, e.ts) - (o.i * INTERVAL 15 MINUTES)
           AS win_start,
         e.ts
  FROM events e, (SELECT unnest(range(0, 4)) AS i) o
)
SELECT win_start, event_type, COUNT(*) AS n_events
FROM expanded
WHERE ts >= win_start AND ts < win_start + INTERVAL 1 HOUR
GROUP BY win_start, event_type
""",
    "q_events_json_props": """
SELECT event_type, COUNT(*) AS n,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
  MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
  MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events
GROUP BY event_type
""",
    "q_events_sessionize": f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
           OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_MIN * 60 * 1000000}
         THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sessions AS (
  SELECT user_id, ts,
    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS session_id
  FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events,
  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
FROM sessions
GROUP BY user_id, session_id
""",
    "q_events_pivot": """
SELECT user_id,
  COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
  COUNT(*) FILTER (WHERE event_type = 'view') AS n_view,
  COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
  COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
  COUNT(*) FILTER (WHERE event_type = 'error') AS n_error
FROM events
GROUP BY user_id
""",
    "q_events_dedup_exact": """
SELECT DISTINCT user_id, event_type FROM events
""",
    "q_incr_agg_maintenance": """
SELECT event_type,
  CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE) AS sum_value,
  COUNT(*) AS n_rows,
  (CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE) / COUNT(*)) AS avg_value
FROM events
GROUP BY event_type
""",
}

ORACLES["q_events_funnel"] = f"""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > s1.t1
    AND e.ts <= s1.t1 + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > s2.t2
    AND e.ts <= s2.t2 + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
  GROUP BY e.user_id
)
SELECT '1_{FUNNEL_STEPS[0]}' AS step, COUNT(*) AS n_users FROM s1
UNION ALL
SELECT '2_{FUNNEL_STEPS[1]}' AS step, COUNT(*) AS n_users FROM s2
UNION ALL
SELECT '3_{FUNNEL_STEPS[2]}' AS step, COUNT(*) AS n_users FROM s3
"""

ORACLES["q_events_cohort_retention"] = """
WITH firsts AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS active_week
  FROM events
)
SELECT CAST(cohort_week AS VARCHAR) AS cohort_week,
       CAST(datediff('day', cohort_week, active_week) / 7 AS BIGINT)
         AS week_offset,
       COUNT(*) AS n_users
FROM active JOIN firsts USING (user_id)
GROUP BY 1, 2
"""

ORACLES["q_events_trend_stats"] = f"""
WITH base AS (
  SELECT event_type,
    CAST(epoch_us(ts) - {EPOCH_2024_US} AS DECIMAL(19,0)) AS x,
    CAST(FLOOR(value * 1000) AS DECIMAL(19,0)) AS y
  FROM events
),
s AS (
  SELECT event_type, COUNT(*) AS n,
    SUM(x) AS sx, SUM(y) AS sy,
    SUM(x * y) AS sxy,
    SUM(x * x) AS sxx,
    SUM(y * y) AS syy
  FROM base GROUP BY event_type
)
SELECT event_type, n,
  ROUND(
    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
    * 86400000000.0 / 1000.0, 6) AS slope_per_day,
  ROUND(
    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr_xy
FROM s
"""

# the VARIANT twin shares the registered JSON query's oracle verbatim
ORACLES["q_events_variant_props"] = ORACLES["q_events_json_props"]
EXTRA_ORACLES = {name: ORACLES.pop(name) for name in list(EXTRA_QUERIES)}


def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularized per-user hourly series with forward fill
    (operators/timeseries.py): one row per (user, hour) across each
    user's own [first, last] event hour, empty hours carrying the
    previous hour's exact-decimal average value. The gap-fill semantics
    the reference's consumers would hand-roll in BigQuery SQL, as one
    spine-join-window plan."""
    from ..operators.timeseries import resample_ffill

    ev = load_table(spark, sf_dir, "events")
    out = resample_ffill(ev, "user_id", "ts", "value", "hour")
    return out.withColumnRenamed("key", "user_id").withColumnRenamed(
        "bucket_start", "hour_start"
    )


EXTRA_QUERIES["q_resample_ffill"] = q_resample_ffill
# ANSI ffill without IGNORE NULLS: gaps-and-islands — a running count of
# non-null bucket values numbers each island, whose single non-null
# leader MAX() recovers. The carried value is the exact decimal-sum
# average, so Spark and DuckDB agree bit-for-bit.
EXTRA_ORACLES["q_resample_ffill"] = f"""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour_start,
         COUNT(*) AS n_in_bucket, {davg_sql('value')} AS avg_in_bucket
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT user_id, date_trunc('hour', MIN(ts)) AS lo,
         date_trunc('hour', MAX(ts)) AS hi
  FROM events GROUP BY user_id
),
spine AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
           AS hour_start
  FROM bounds
),
joined AS (
  SELECT s.user_id, s.hour_start,
         COALESCE(h.n_in_bucket, 0) AS n_events, h.avg_in_bucket,
         COUNT(h.avg_in_bucket) OVER (
           PARTITION BY s.user_id ORDER BY s.hour_start) AS island
  FROM spine s
  LEFT JOIN hourly h
    ON s.user_id = h.user_id AND s.hour_start = h.hour_start
)
SELECT user_id, hour_start, n_events,
       MAX(avg_in_bucket) OVER (PARTITION BY user_id, island)
         AS avg_value_ffill
FROM joined
"""


ZSCORE_LOOKBACK = 24  # trailing events per user
ZSCORE_MIN_N = 12     # below this history, never flag
ZSCORE_Z = 3          # |z| > 3 flags


def q_events_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags: an event is anomalous when its
    value sits more than ZSCORE_Z sample standard deviations from the
    mean of the SAME user's trailing ZSCORE_LOOKBACK events (current row
    excluded — the event must not mask itself).

    The test |y - s/n| > z*sqrt((n*ssq - s^2)/n^2) is algebraically
    cleared of division and sqrt:  (n*y - s)^2 > z^2 * (n*ssq - s^2) —
    every operand an exact decimal from integral y = floor(value*1000),
    so the flag needs NO floating point at all and both engines agree
    bit-for-bit (same posture as q_events_trend_stats' moments).

    Shape: ONE window pass partitioned by user (count/sum/sumsq share
    the frame), never a SinglePartition; at 100 TB repartition by
    (user, coarse time) and carry the tail across the boundary."""
    ev = load_table(spark, sf_dir, "events")
    y = F.floor(F.col("value") * 1000).cast("decimal(19,0)")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ZSCORE_LOOKBACK, -1)
    )
    base = ev.select("event_id", "user_id", "ts", y.alias("y"))
    n = F.count("y").over(w)
    s = F.sum("y").over(w)
    ssq = F.sum(F.col("y") * F.col("y")).over(w)
    lhs = (n * F.col("y") - s) * (n * F.col("y") - s)
    rhs = F.lit(ZSCORE_Z * ZSCORE_Z) * (n * ssq - s * s)
    return base.select(
        "event_id",
        "user_id",
        n.alias("n_window"),
        ((n >= ZSCORE_MIN_N) & (lhs > rhs)).alias("is_anomaly"),
    )


EXTRA_QUERIES["q_events_rolling_zscore"] = q_events_rolling_zscore
EXTRA_ORACLES["q_events_rolling_zscore"] = f"""
WITH base AS (
  SELECT event_id, user_id, ts,
         CAST(FLOOR(value * 1000) AS DECIMAL(19,0)) AS y
  FROM events
),
m AS (
  SELECT event_id, user_id, y,
    COUNT(y) OVER w AS n, SUM(y) OVER w AS s, SUM(y * y) OVER w AS ssq
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {ZSCORE_LOOKBACK} PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, n AS n_window,
       (n >= {ZSCORE_MIN_N}
        AND (n * y - s) * (n * y - s)
            > {ZSCORE_Z * ZSCORE_Z} * (n * ssq - s * s)) AS is_anomaly
FROM m
"""


HIST_BINS = 20  # equi-width bins over the observed value range


def q_events_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of event values per event type: bin edges
    from the GLOBAL min/max (one broadcast one-row aggregate), bin
    assignment as exact integer arithmetic on floor((v - lo) * B /
    span) with the max value clamped into the last bin. Counts are the
    only output — no floats cross the engine boundary except the
    bin_lo/bin_hi edges, which are the same single IEEE expression on
    identical doubles in both engines.

    Shape: one scan for the range, one broadcast, one hash aggregate on
    (event_type, bin) — bounded key domain, map-side partials."""
    ev = load_table(spark, sf_dir, "events")
    rng = ev.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    # integral scaling via FLOOR on BOTH engines (same posture as
    # trend_stats): a bare Spark .cast('long') TRUNCATES toward zero
    # while DuckDB's CAST(... AS BIGINT) ROUNDS to nearest — 55k rows
    # per 1M differ on the fixtures, and parity would hold only until
    # a perturbed value landed beside a bin border. floor/FLOOR are
    # semantically identical everywhere.
    v = F.floor(F.col("value") * 100).cast("long")
    lo = F.floor(F.col("lo") * 100).cast("long")
    hi = F.floor(F.col("hi") * 100).cast("long")
    raw_bin = ((v - lo) * HIST_BINS) / (hi - lo)
    bin_id = F.least(
        F.floor(raw_bin).cast("int"), F.lit(HIST_BINS - 1)
    )
    return (
        ev.crossJoin(F.broadcast(rng))
        .groupBy("event_type", bin_id.alias("bin_id"))
        .agg(F.count("*").alias("n"))
    )


EXTRA_QUERIES["q_events_histogram"] = q_events_histogram
EXTRA_ORACLES["q_events_histogram"] = f"""
WITH rng AS (
  SELECT CAST(FLOOR(MIN(value) * 100) AS BIGINT) AS lo,
         CAST(FLOOR(MAX(value) * 100) AS BIGINT) AS hi
  FROM events
)
SELECT event_type,
       LEAST(
         CAST(FLOOR(
           (CAST(FLOOR(value * 100) AS BIGINT) - lo) * {HIST_BINS}
             / CAST(hi - lo AS DOUBLE)) AS INT),
         {HIST_BINS - 1}) AS bin_id,
       COUNT(*) AS n
FROM events, rng
GROUP BY 1, 2
"""
