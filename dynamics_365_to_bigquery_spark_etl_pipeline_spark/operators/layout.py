"""Multi-dimensional data layout: Z-order (Morton) clustering.

``sinks.write_clustered`` handles the single-key case: range-partition +
sort makes per-file min/max stats disjoint on ONE column. But a 100 TB
fact table is usually filtered on several independent columns (tenant +
time, user + event type), and a lexicographic sort only skips on the
leading key — files cover the full range of every trailing column.

Z-ordering interleaves the bits of all cluster keys into one Morton
code and sorts by that, so every file covers a small HYPER-RECTANGLE of
the key space rather than a slab: min/max footer stats then prune scans
on ANY of the clustered columns (Delta/Iceberg ``OPTIMIZE ZORDER BY``;
no counterpart in the reference, which rewrites whole tables —
SURVEY.md §2.1 sink notes).

Everything is JVM-side column expressions (shift/and/or inside
whole-stage codegen) — the bit interleave is ~``bits × n_cols`` integer
ops per row, no Python in the hot path. The per-column [min, max] used
for normalization comes from one tiny aggregate (or caller-supplied
hints, same pattern as the grid dedup's footer hints).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16 bits/dim keeps the interleaved code inside a signed 64-bit long for
# up to 4 dims (64 bits total) with plenty of rank resolution per file.
DEFAULT_BITS = 16
MAX_TOTAL_BITS = 63  # stay positive in a signed long


def scale_to_rank(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map a numeric column into [0, 2**bits) by linear min/max scaling.

    Double arithmetic then floor — rank resolution, not exact order, is
    what Z-ordering needs (ties within a rank cost locality, never
    correctness, since the layout is only a skipping hint). A constant
    column (lo == hi) maps to rank 0.
    """
    top = (1 << bits) - 1
    span = (hi - lo).cast("double")
    scaled = F.floor((col.cast("double") - lo.cast("double")) * top / span)
    clamped = F.least(F.greatest(scaled, F.lit(0)), F.lit(top))
    ranked = F.when(span <= 0, F.lit(0)).otherwise(clamped).cast("long")
    # NULL keys (or an all-NULL column, where lo/hi are NULL) rank to 0:
    # they cluster together at the origin instead of nulling the whole
    # interleaved code and landing in an arbitrary range partition.
    return F.coalesce(ranked, F.lit(0).cast("long"))


def interleave_bits(ranks: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton code: bit i of rank j lands at position ``i*n + j``.

    Unrolled into ``bits * n`` shift/and/or expressions — all inside
    whole-stage codegen, no UDF. With default bits=16 this supports up
    to 3 dims in a positive signed long (4 dims at bits=15).
    """
    n = len(ranks)
    if n == 0:
        raise ValueError("interleave_bits needs at least one rank column")
    if bits * n > MAX_TOTAL_BITS:
        raise ValueError(
            f"{bits} bits x {n} dims = {bits * n} exceeds {MAX_TOTAL_BITS}; "
            "lower bits= (rank resolution) to fit a signed 64-bit code"
        )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for j, r in enumerate(ranks):
            bit = F.shiftright(r, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + j))
    return z


def zorder_code(
    df: DataFrame,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    stats: dict[str, tuple] | None = None,
) -> Column:
    """Z-order sort key over ``cols`` for ``df``.

    ``stats`` maps column -> (min, max); when absent, ONE small
    all-aggregate scan computes them (driver-side metadata, not data —
    the same "hints replace scans" contract as the grid dedup's
    ``k_dims`` derivation). Layouts only need approximate bounds, so
    stale hints from a previous run's footers are fine.
    """
    from pyspark.sql.types import NumericType

    if not cols:
        raise ValueError("zorder_code needs at least one column")
    for c in cols:
        if not isinstance(df.schema[c].dataType, NumericType):
            raise ValueError(
                f"zorder_code: column {c!r} is {df.schema[c].dataType}; "
                "Z-ordering needs numeric keys (rank-scale a string/time "
                "key to a numeric surrogate first — hashing would destroy "
                "the range locality the layout exists to create)"
            )
    if stats is None:
        row = df.agg(
            *[F.min(c).alias(f"lo_{c}") for c in cols],
            *[F.max(c).alias(f"hi_{c}") for c in cols],
        ).collect()[0]
        stats = {c: (row[f"lo_{c}"], row[f"hi_{c}"]) for c in cols}
    ranks = [
        scale_to_rank(F.col(c), F.lit(stats[c][0]), F.lit(stats[c][1]), bits)
        for c in cols
    ]
    return interleave_bits(ranks, bits)
