"""Engine-portable numeric expressions.

Float aggregation order differs between engines (and between Spark
partitionings of the SAME data), so any oracle-compared aggregate must be
exact: cast each row to a fixed-scale DECIMAL, sum exactly, then cast the
total back to DOUBLE (exact for our magnitudes, far below 2^53).

This is also the right 100 TB posture: decimal sums are deterministic
under AQE re-partitioning and speculative re-execution, where double sums
are run-to-run nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 2, precision: int = 25) -> Column:
    """Exact sum: per-row cast to DECIMAL(precision, scale), cast back to
    double. SQL mirror: CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def dsum_sql(expr: str, scale: int = 2, precision: int = 25) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def davg(col: Column | str, scale: int = 2, precision: int = 25) -> Column:
    """Exact-inputs average: exact decimal sum divided by count in double
    (one IEEE division of two exact values — engine-identical)."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale, precision) / F.count(c)


def davg_sql(expr: str, scale: int = 2, precision: int = 25) -> str:
    return f"({dsum_sql(expr, scale, precision)} / COUNT({expr}))"
