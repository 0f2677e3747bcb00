"""Every DuckDB oracle SQL must at least PLAN against the real views.

The oracle strings in afspark.entry_queries only execute inside
tools/check_oracle.py / the driver's correctness gate — pytest never ran
them, so a mechanical edit that corrupts the SQL (observed: an inline
``--`` comment that swallowed the FROM clause of five shared CTEs) sails
through the test suite and fails 7 queries at the gate.  ``EXPLAIN`` in
DuckDB parses, binds, and plans the query against the sf0.001 views
without executing it, so this closes the class in ~seconds and with no
Spark session.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from afspark.entry_queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TINY", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

_WITH_SQL = {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(_WITH_SQL))
def test_oracle_sql_plans(con, name):
    con.sql(f"EXPLAIN {_WITH_SQL[name]}")


def test_registry_has_sql_oracles():
    # guard against the dict silently degrading to rows-only checks
    assert len(_WITH_SQL) >= 140
