"""Driver-contract smoke + oracle parity for every registered query.

Mirrors the driver: t1 smoke via ``entry``, t2 DuckDB-oracle comparison
for each ``queries()``/``oracle_sql()`` pair (at sf0.001 here for speed;
the driver runs sf0.01 — run with SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01
to reproduce exactly).
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry_mod
from .oracle_harness import compare

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


_ALL_QUERIES = {**entry_mod.queries(), **entry_mod.extra_queries()}
_ALL_ORACLES = {**entry_mod.oracle_sql(), **entry_mod.extra_oracle_sql()}


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_every_oracle_key_has_query():
    assert set(_ALL_ORACLES) <= set(_ALL_QUERIES), (
        f"oracle keys without queries: {set(_ALL_ORACLES) - set(_ALL_QUERIES)}"
    )


def test_registry_within_driver_budget():
    """The driver checks the first 50 registry entries; keep the
    registered set at <= 50 so every one gets a CORRECTNESS row, and
    don't let registered/extra names collide."""
    q, extra = entry_mod.queries(), entry_mod.extra_queries()
    assert len(q) <= 50, f"{len(q)} registered queries exceed the 50-row driver budget"
    assert not set(q) & set(extra)


@pytest.mark.parametrize("name", sorted(_ALL_ORACLES))
def test_oracle_parity(spark, name):
    compare(spark, SF_DIR, _ALL_QUERIES[name], _ALL_ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(_ALL_QUERIES) - set(_ALL_ORACLES)))
def test_no_oracle_rows_only(spark, name):
    """Driver's weaker check for non-SQL-expressible queries: runs and
    returns rows with a stable schema."""
    df = _ALL_QUERIES[name](spark, SF_DIR)
    assert len(df.schema.fields) > 0
    assert df.count() > 0
