"""The local mirror of the driver's t2 gate: every queries() entry that has
an oracle_sql() must match DuckDB exactly (row count + columns + values,
order-insensitive) at sf0.001. One parametrized test per query."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.helpers import compare_query

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    compare_query(df, ORACLES[name], sf_dir)


def test_every_oracle_has_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
