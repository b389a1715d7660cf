"""Full registry vs DuckDB oracle parity at sf0.001 — the local replica
of the driver's correctness gate (driver runs sf0.01)."""

from __future__ import annotations

import pytest

from minispark_spark.registry import REGISTRY, _ensure_loaded
from tests.oracle_check import compare_query, duckdb_conn

_ensure_loaded()


@pytest.fixture(scope="module")
def con(sf_dir):
    return duckdb_conn(sf_dir)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_parity(spark, con, sf_dir, name):
    ok, msg = compare_query(spark, con, name, sf_dir)
    assert ok, msg
