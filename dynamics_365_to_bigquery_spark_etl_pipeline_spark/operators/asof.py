"""As-of and range joins — operators Spark lacks natively (SURVEY.md §2.3
notes the reference has no join family at all; these complete the
temporal-join surface a CDC/analytics engine needs).

As-of join, scalable form: instead of per-group ``merge_asof`` in
Python, union the two sides with a side tag, window-sort once per key,
and fill the right side's attributes forward (``last_value ignorenulls``
over rows unbounded-preceding). ONE shuffle on the key, no Python, no
per-group pandas — this is the 100 TB implementation; DuckDB's native
ASOF JOIN is the oracle.

Range join, scalable form: bucketize the range key to width = range
span, equi-join on (key, bucket) ∪ (key, bucket+1), then filter the
exact predicate — turns an inequality join (which Spark executes as
broadcast-nested-loop) into two skew-free hash joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the newest right row with
    ``right_ts <= left_ts`` (``<`` when strict) for the same key.

    Left columns pass through; right payload columns arrive suffixed
    ``_asof`` (NULL when no prior right row exists).
    """
    lhs = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rhs_cols = [F.col(key), F.col(right_ts).alias("__ts"), F.lit(0).alias("__side")] + [
        F.col(c).alias(f"__r_{c}") for c in right_payload
    ]
    rhs = right.select(rhs_cols)
    lhs_aligned = lhs.select(
        *left.columns,
        "__side",
        "__ts",
        *[F.lit(None).cast(dict(rhs.dtypes)[f"__r_{c}"]).alias(f"__r_{c}") for c in right_payload],
    )
    unioned = lhs_aligned.unionByName(rhs, allowMissingColumns=True)

    # Tie order decides whether an exact-tie right row is visible to the
    # left row: right-before-left (side 0 first) for <=, left-before-
    # right for strict <. The frame never changes.
    order = [F.col("__ts").asc(), F.col("__side").asc() if not strict else F.col("__side").desc()]
    w = Window.partitionBy(key).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    filled = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}_asof")
            for c in right_payload
        ],
    )
    return filled.filter(F.col("__side") == 1).drop(
        "__side", "__ts", *[f"__r_{c}" for c in right_payload]
    )


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_val: Column,
    right_val: Column,
    span: int,
    predicate,
) -> DataFrame:
    """Equi-join on (key, bucket) and (key, bucket+1) with bucket width
    = span, then apply the exact range predicate. ``predicate`` takes
    (left_val_col, right_val_col) -> Column over the joined frame."""
    lb = left.withColumn("__v", left_val).withColumn(
        "__b", F.floor(F.col("__v") / F.lit(span)).cast("long")
    )
    rb = right.withColumn("__w", right_val).withColumn(
        "__b", F.floor(F.col("__w") / F.lit(span)).cast("long")
    )
    # A right row can only satisfy the predicate from its own bucket or
    # the one below (span == predicate width), so the bucket is part of
    # the JOIN KEY — two hash joins instead of a per-key cross join.
    shifted = rb.withColumn("__b", F.col("__b") - 1)
    candidates = lb.join(rb, on=[key, "__b"], how="inner").unionByName(
        lb.join(shifted, on=[key, "__b"], how="inner")
    )
    return candidates.filter(predicate(F.col("__v"), F.col("__w"))).drop("__v", "__w", "__b")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    lo_a: str,
    hi_a: str,
    lo_b: str,
    hi_b: str,
    bucket_width: int,
) -> DataFrame:
    """Interval x interval OVERLAP join (distinct from the point-in-
    range join above): all same-``key`` pairs with
    ``lo_a <= hi_b AND lo_b <= hi_a``, without a nested-loop join.

    Each interval explodes into every ``bucket_width`` bucket it
    covers; overlapping intervals necessarily share a covered bucket,
    so an equi-join on (key, bucket) has full recall and the exact
    predicate filters the candidates. Candidate volume is
    sum(interval_length / width) per side — size ``bucket_width`` near
    the typical interval length so most intervals explode into O(1)
    buckets; a pathologically long interval degrades that one row, not
    the join shape.

    A pair whose intervals share SEVERAL buckets is kept only where
    ``bucket == floor(max(lo_a, lo_b) / width)`` — the first bucket of
    the overlap region, covered by both sides by definition — so each
    pair emits from exactly ONE bucket. That replaces a distinct():
    no extra shuffle, and duplicate input ROWS keep their multiplicity
    (a distinct over the joined row would silently collapse them)."""
    la = left.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_a) / F.lit(bucket_width)),
                F.floor(F.col(hi_a) / F.lit(bucket_width)),
            )
        ),
    )
    rb = right.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_b) / F.lit(bucket_width)),
                F.floor(F.col(hi_b) / F.lit(bucket_width)),
            )
        ),
    )
    first_shared = F.floor(
        F.greatest(F.col(lo_a), F.col(lo_b)) / F.lit(bucket_width)
    )
    return (
        la.join(rb, [key, "__b"])
        .filter(
            (F.col("__b") == first_shared)
            & (F.col(lo_a) <= F.col(hi_b))
            & (F.col(lo_b) <= F.col(hi_a))
        )
        .drop("__b")
    )
