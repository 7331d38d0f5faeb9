"""Every oracle_sql() string must at least PLAN in DuckDB — a fast
syntax/resolution gate so an oracle regression is caught by pytest, not
only by the full parity sweep."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


@pytest.mark.heavy
def test_every_oracle_sql_plans(con):
    oracles = E.oracle_sql()
    assert len(oracles) >= 45
    for name, sql in oracles.items():
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as exc:  # pragma: no cover
            pytest.fail(f"oracle for {name!r} failed to plan: {exc}")
