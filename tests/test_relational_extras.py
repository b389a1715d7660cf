"""Local-only twins of registry entries whose natural output type the
driver harness cannot canonicalize (top-level array/map/struct cells)."""

from __future__ import annotations

import pytest

from minispark_spark.plans.relational import collect_sorted_array
from tests.oracle_check import duckdb_conn


@pytest.fixture(scope="module")
def con(sf_dir):
    return duckdb_conn(sf_dir)


def test_collect_sorted_array_twin(spark, con, sf_dir):
    """Array-typed twin of agg_collect_sorted: the sorted collect_set
    itself (not its serialization) matches DuckDB element-for-element."""
    got = {
        r["c_mktsegment"]: (list(r["nation_keys"]), r["n_nations"])
        for r in collect_sorted_array(spark, sf_dir).collect()
    }
    want = {
        seg: (keys, n)
        for seg, keys, n in con.execute(
            """
            SELECT c_mktsegment,
                   list_sort(list(DISTINCT c_nationkey)) AS nation_keys,
                   COUNT(DISTINCT c_nationkey) AS n_nations
            FROM customer GROUP BY c_mktsegment
            """
        ).fetchall()
    }
    assert got == want


def test_serialized_matches_array_twin(spark, sf_dir):
    """The driver-visible serialized form is exactly the comma-join of
    the array twin — no information lost in the harness workaround."""
    from minispark_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    ser = {
        r["c_mktsegment"]: r["nation_keys"]
        for r in REGISTRY["agg_collect_sorted"].fn(spark, sf_dir).collect()
    }
    arr = {
        r["c_mktsegment"]: ",".join(str(k) for k in r["nation_keys"])
        for r in collect_sorted_array(spark, sf_dir).collect()
    }
    assert ser == arr
