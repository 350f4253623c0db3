"""Pre-flight for the driver's t2 gate: every oracle-backed query must
match its DuckDB twin (columns + row count + order-insensitive values)
at sf=0.01, exactly as the driver compares them."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.oracle_parity import compare, duckdb_connect

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_correct):
    con = duckdb_connect(sf_correct)
    yield con
    con.close()


def test_every_query_has_callable():
    assert QUERIES, "queries() must not be empty"
    for name, fn in QUERIES.items():
        assert callable(fn), name


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity(name, spark, sf_correct, con):
    problems = compare(QUERIES[name](spark, sf_correct), con, ORACLES[name])
    assert not problems, f"{name}: {problems}"
