"""Marked-slow sweep of EVERY oracle-gated query against its DuckDB
oracle at sf0.01 — the in-repo twin of the driver's correctness gate.

The driver's window hash-verifies only the first 50 registry entries per
round (the gated ordering rotates, `__spark_entry__._registry`); this
sweep covers all gated queries every run so oracle drift is caught
without waiting for a rotation to bring a query back into the window.

Excluded by default via pytest.ini ``addopts = -m "not slow"``; run with
``python -m pytest -m slow tests/test_oracle_parity_slow.py -q``.
"""

from __future__ import annotations

import os
from pathlib import Path

import duckdb
import pytest

import __spark_entry__ as E
from scripts_dev.oracle_parity import TABLES, canon, equal

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.01")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not Path(SF_DIR).is_dir(), reason=f"{SF_DIR} missing"),
]

_REGISTRY = E._registry()
_GATED = [n for n, (_fn, sql) in _REGISTRY.items() if sql is not None]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _GATED)
def test_oracle_parity(name, spark, oracle_con):
    fn, sql = _REGISTRY[name]
    sdf = canon(fn(spark, SF_DIR).toPandas())
    ddf = canon(oracle_con.sql(sql).df())
    assert len(sdf) == len(ddf), f"rowcount spark={len(sdf)} duckdb={len(ddf)}"
    assert list(sdf.columns) == list(ddf.columns)
    bad = []
    for c in sdf.columns:
        same, why = equal(sdf[c], ddf[c])
        if not same:
            bad.append((c, why))
    assert not bad, f"mismatch: {bad}"
