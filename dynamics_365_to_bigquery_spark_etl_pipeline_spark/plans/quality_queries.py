"""Data-quality check surface over the star schema (the validation
layer the reference lacks — it publishes whatever the CSVs contain,
``helper_functions.py:109-131``).

One registered-shape query demonstrates the three check classes:
- row-level checks: ONE aggregate scan for all of them;
- key-uniqueness: one hash-aggregate shuffle;
- referential integrity: one anti-join (broadcast when the PK side is
  small).
The three 1-row results compose with broadcast cross joins — total cost
is one scan per TABLE touched, regardless of how many checks run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import quality as Q

PRICE_HI = 100_000


def q_dq_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Violation counts across all three check classes. Bounds are
    deliberately tighter than the data (price cap, status/priority
    subsets) so the counts are non-degenerate on the clean synthetic
    fixture."""
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    lineitem = load_table(spark, sf_dir, "lineitem")
    checks = [
        Q.not_null("o_custkey"),
        Q.in_range("o_totalprice", 0, PRICE_HI),
        Q.one_of("o_orderstatus", ["F", "O"]),
        Q.matches("o_orderpriority", "^[1-3]-"),
    ]
    row_level = Q.violation_counts(orders, checks)
    dup = Q.duplicate_keys(events, ["user_id", "event_type"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_event_keys")
    )
    orphan = Q.orphan_rows(lineitem, "l_orderkey", orders, "o_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orphan_lineitems")
    )
    return row_level.join(F.broadcast(dup)).join(F.broadcast(orphan))


QUERIES: dict = {}
ORACLES: dict = {}

# Registry is at the 50-row driver cap; oracle-verified in pytest.
EXTRA_QUERIES = {"q_dq_violations": q_dq_violations}

EXTRA_ORACLES = {
    "q_dq_violations": f"""
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_rows,
  (SELECT CAST(COUNT(*) FILTER (o_custkey IS NULL) AS BIGINT) FROM orders)
    AS not_null_o_custkey,
  (SELECT CAST(COUNT(*) FILTER (o_totalprice IS NULL
      OR NOT o_totalprice BETWEEN 0 AND {PRICE_HI}) AS BIGINT) FROM orders)
    AS range_o_totalprice,
  (SELECT CAST(COUNT(*) FILTER (o_orderstatus IS NULL
      OR o_orderstatus NOT IN ('F', 'O')) AS BIGINT) FROM orders)
    AS one_of_o_orderstatus,
  (SELECT CAST(COUNT(*) FILTER (o_orderpriority IS NULL
      OR NOT regexp_matches(o_orderpriority, '^[1-3]-')) AS BIGINT) FROM orders)
    AS matches_o_orderpriority,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM (
     SELECT user_id, event_type FROM events
     GROUP BY user_id, event_type HAVING COUNT(*) > 1))
    AS n_dup_event_keys,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
   WHERE l_orderkey IS NULL OR l_orderkey NOT IN
     (SELECT o_orderkey FROM orders))
    AS n_orphan_lineitems
""",
}
