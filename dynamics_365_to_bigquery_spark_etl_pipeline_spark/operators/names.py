"""Column-name normalization policy (SURVEY.md P1/P2/P11).

The reference strips bc2adls numeric suffixes and lowercases
(``helper_functions.py:9-13``), then drops *every* occurrence of any name
that collides after normalization (``helper_functions.py:16-23`` +
``helper_functions.py:130-137``). It applies renames in a
``withColumnRenamed`` loop — one Project node per column, which blows up
analyzer time on 300+-column Dynamics tables. Here the whole policy is
planned driver-side over metadata and applied as ONE ``select``, so the
logical plan stays a single projection regardless of column count.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUFFIX_RE = re.compile(r"-\d+")


def normalize_name(name: str) -> str:
    """``Systemcreatedat-2000000001`` -> ``systemcreatedat``."""
    return _SUFFIX_RE.sub("", name).lower()


def plan_normalized_projection(names: list[str]) -> list[tuple[str, str]]:
    """Return ``(original, normalized)`` pairs for the surviving columns.

    Columns whose normalized names collide are ALL dropped (both ``No-1``
    and ``no-2`` vanish), matching the reference's positional-index drop.
    """
    normalized = [normalize_name(n) for n in names]
    counts = Counter(normalized)
    return [(orig, norm) for orig, norm in zip(names, normalized) if counts[norm] == 1]


def normalize_columns(df: DataFrame) -> DataFrame:
    """Apply P1+P2 as a single projection."""
    plan = plan_normalized_projection(df.columns)
    return df.select([F.col(f"`{orig}`").alias(norm) for orig, norm in plan])


def table_name_from_path(path: str) -> str:
    """GCS-folder path -> sink table name: last segment, alnum-only,
    lowercased (``helper_functions.py:55-63``)."""
    last = path.rstrip("/").split("/")[-1]
    return "".join(ch for ch in last if ch.isalnum()).lower()


def rename_company(df: DataFrame) -> DataFrame:
    """``$company`` -> ``_company`` for sink compatibility
    (``helper_functions.py:183``)."""
    if "$company" in df.columns:
        return df.withColumnRenamed("$company", "_company")
    return df
