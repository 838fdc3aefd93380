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


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_every_oracle_key_has_query():
    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(o) <= set(q), f"oracle keys without queries: {set(o) - set(q)}"


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql()))
def test_oracle_parity(spark, name):
    compare(spark, SF_DIR, entry_mod.queries()[name], entry_mod.oracle_sql()[name])


@pytest.mark.parametrize(
    "name", sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql()))
)
def test_no_oracle_rows_only(spark, name):
    """Driver's weaker check for non-SQL-expressible queries: runs and
    returns rows with a stable schema."""
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert len(df.schema.fields) > 0
    assert df.count() > 0
