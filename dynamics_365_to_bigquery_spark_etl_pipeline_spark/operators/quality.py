"""Declarative data-quality checks (the reference loads whatever the
CSVs contain, ``helper_functions.py:109-131`` — no validation layer; a
warehouse-grade engine needs one between landing and publish).

Design rule: ALL row-level checks compile into ONE aggregate pass —
each check is a CASE-counted expression in a single ``agg`` — and the
quarantine split is one filter on the disjunction. Never one scan per
check: at 100 TB, N checks must still cost one table read.

Set-level checks (key uniqueness, referential integrity) are their own
shuffles by nature (a groupBy / an anti-join), declared separately so
the caller knows which checks are scans and which are shuffles.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """A named row-level predicate that VALID rows satisfy."""

    name: str
    predicate: Column


def not_null(col: str, name: str | None = None) -> Check:
    return Check(name or f"not_null_{col}", F.col(col).isNotNull())


def in_range(col: str, lo, hi, name: str | None = None) -> Check:
    """Two ranges on the same column need explicit ``name=`` — the
    default alias is per-column, and ``violation_counts`` rejects
    duplicate names loudly rather than emitting colliding columns."""
    return Check(name or f"range_{col}", F.col(col).between(lo, hi))


def matches(col: str, pattern: str, name: str | None = None) -> Check:
    return Check(name or f"matches_{col}", F.col(col).rlike(pattern))


def one_of(col: str, values: list, name: str | None = None) -> Check:
    return Check(name or f"one_of_{col}", F.col(col).isin(values))


def violation_counts(df: DataFrame, checks: list[Check]) -> DataFrame:
    """One row: total row count + per-check violation counts, computed
    in a SINGLE aggregate scan (each check is a conditional count in
    the same agg — adding a check adds an expression, not a pass).
    NULL predicate results count as violations (a null-valued range
    check is not a pass). Check names must be unique — duplicate
    aggregate aliases would make per-check results inaccessible by
    name, so that's an error here, not a silent column collision."""
    names = [c.name for c in checks]
    dupes = sorted({n for n in names if names.count(n) > 1})
    if dupes:
        raise ValueError(
            f"duplicate check names {dupes}: give explicit name= to "
            "distinguish same-kind checks on the same column"
        )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in checks:
        aggs.append(
            F.sum(F.when(c.predicate.eqNullSafe(True), 0).otherwise(1))
            .cast("long")
            .alias(c.name)
        )
    return df.agg(*aggs)


def split_quarantine(df: DataFrame, checks: list[Check]) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantined): one filter each on the conjunction of all
    checks — two passes over the input only because the two outputs go
    to different sinks; each is a plain pushdown-friendly filter."""
    ok = F.lit(True)
    for c in checks:
        ok = ok & c.predicate.eqNullSafe(True)
    return df.filter(ok), df.filter(~ok)


def duplicate_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """Set-level check: key tuples appearing more than once, with their
    multiplicity. One hash-aggregate shuffle on the key."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def orphan_rows(df: DataFrame, fk: str, dim: DataFrame, pk: str) -> DataFrame:
    """Set-level check: rows whose foreign key has no match in ``dim``
    (NULL fks are orphans too — they reference nothing). Broadcast
    anti-join when the dimension is small; AQE decides otherwise."""
    return df.join(
        dim.select(F.col(pk).alias("__pk")),
        F.col(fk) == F.col("__pk"),
        "left_anti",
    )
