"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose every implemented operator family from
SURVEY.md §2 plus the Tier-B extensions, each mirrored by DuckDB-
runnable ANSI SQL where SQL can express it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.session import tune_existing
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.plans import (
    advanced_queries,
    analytics_queries,
    cdc_queries,
    curation_queries,
    dedup_queries,
    export_queries,
    functions_queries,
    multimodal_queries,
    quality_queries,
    similarity_queries,
    sql_surface_queries,
    text_queries,
    tpch_queries,
)

_PLAN_MODULES = [
    cdc_queries,
    tpch_queries,
    analytics_queries,
    text_queries,
    dedup_queries,
    similarity_queries,
    multimodal_queries,
    advanced_queries,
    functions_queries,
    sql_surface_queries,
    curation_queries,
    export_queries,
    quality_queries,
]

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: CDC snapshot resolution (soft-delete anti-join +
    latest-version-per-key window) over the sf0.001 events changelog."""
    tune_existing(spark)
    return cdc_queries.cdc_snapshot(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver-registered queries. Kept at exactly <= 50 entries: the
    driver checks the first 50 registry entries, so every registered
    query gets a CORRECTNESS row. Near-duplicate operator variants live
    in ``extra_queries()`` (same oracle harness, pytest-verified)."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _PLAN_MODULES:
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _PLAN_MODULES:
        out.update(mod.ORACLES)
    return out


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Operator variants whose family already has a registered driver
    row; verified by the identical DuckDB-oracle comparison in pytest
    (tests/test_entry_contract.py) to keep the driver registry <= 50."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _PLAN_MODULES:
        out.update(getattr(mod, "EXTRA_QUERIES", {}))
    return out


def extra_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _PLAN_MODULES:
        out.update(getattr(mod, "EXTRA_ORACLES", {}))
    return out
