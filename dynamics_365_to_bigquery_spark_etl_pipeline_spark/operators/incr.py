"""Incremental aggregate maintenance (materialized-view delta update).

The reference recomputes every sink table from scratch each night
(``incremental_etl_v1.py:184-188`` overwrites the full snapshot). For
algebraic aggregates (SUM / COUNT / MIN / MAX) that is O(|table|) work
per run when O(|delta| + |touched groups|) suffices: aggregate ONLY the
delta, then merge the partial with the previous aggregate state.

Spark-first shape: the merge is ``unionByName`` of two already-small
aggregate tables followed by a re-aggregation — partials of algebraic
aggregates compose exactly, so this is the same math Spark's own
map-side partial aggregation performs, lifted across pipeline runs. One
shuffle of |groups| rows (not |table|), skew-irrelevant, and the sums
use fixed-scale decimals so the result is bit-identical to a full
recompute regardless of how many increments produced it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(25,2)"

# The aggregate ENVELOPE of delta maintenance: SUM/COUNT (and AVG via
# finalize) have exact retractions — a negated partial cancels the old
# contribution. MIN/MAX do NOT: deleting the current minimum says
# nothing about the runner-up without rescanning the group, so a
# min/max rollup under updates/deletes must recompute, never retract.
RETRACTABLE_AGGS = frozenset({"sum", "count", "avg"})
NON_RETRACTABLE_AGGS = frozenset({"min", "max"})


def partial_group_stats(
    delta: DataFrame,
    keys: list[str],
    value_col: str,
    aggs: tuple[str, ...] = ("sum", "count"),
) -> DataFrame:
    """Aggregate state for one batch: exact decimal sum + row count per
    group (always), plus min/max when requested. This is the ONLY thing
    that ever needs persisting."""
    exprs = [
        F.sum(F.col(value_col).cast(DEC)).alias("sum_value"),
        F.count("*").alias("n_rows"),
    ]
    if "min" in aggs:
        exprs.append(F.min(value_col).alias("min_value"))
    if "max" in aggs:
        exprs.append(F.max(value_col).alias("max_value"))
    return delta.groupBy(*keys).agg(*exprs)


_STATE_COLS = ("sum_value", "n_rows", "min_value", "max_value")


def merge_group_stats(old: DataFrame | None, partial: DataFrame, keys: list[str]) -> DataFrame:
    """Fold a new batch's partial into the running aggregate state.
    Associative + commutative, so increments can arrive in any order and
    any grouping — the invariant the property test pins. min/max
    partials compose under INSERT-only folding (min of mins); their
    retraction is rejected by ``negate_group_stats``."""
    if old is None:
        return partial
    exprs = [
        F.sum("sum_value").cast(DEC).alias("sum_value"),
        F.sum("n_rows").alias("n_rows"),
    ]
    if "min_value" in partial.columns:
        exprs.append(F.min("min_value").alias("min_value"))
    if "max_value" in partial.columns:
        exprs.append(F.max("max_value").alias("max_value"))
    return old.unionByName(partial).groupBy(*keys).agg(*exprs)


def negate_group_stats(state: DataFrame) -> Column | DataFrame:
    """Retraction form of an aggregate state: merging it cancels the
    original contribution exactly (decimal negation is exact). This is
    what lets UPDATE/DELETE-shaped deltas maintain a SUM/COUNT rollup:
    subtract the touched keys' old partials, add their new ones.

    MIN/MAX have no retraction (see ``NON_RETRACTABLE_AGGS``): raising
    here is the guard that keeps a min/max rollup from silently
    publishing wrong extrema after a delete."""
    bad = [c for c in ("min_value", "max_value") if c in state.columns]
    if bad:
        raise ValueError(
            f"cannot retract {bad}: min/max aggregate state is not "
            "retractable under deletes/updates — recompute the rollup "
            "from the post-merge snapshot instead"
        )
    return state.select(
        *[c for c in state.columns if c not in _STATE_COLS],
        (-F.col("sum_value")).cast(DEC).alias("sum_value"),
        (-F.col("n_rows")).alias("n_rows"),
    )


def finalize_group_stats(state: DataFrame) -> DataFrame:
    """Publishable view of the state: double sum + derived mean (one
    IEEE division of two exact values — engine-portable); min/max pass
    through when present."""
    return state.select(
        *[c for c in state.columns if c not in ("sum_value", "n_rows")],
        F.col("sum_value").cast("double").alias("sum_value"),
        F.col("n_rows").alias("n_rows"),
        (F.col("sum_value").cast("double") / F.col("n_rows")).alias("avg_value"),
    )
