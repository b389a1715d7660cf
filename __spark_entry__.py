"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``minispark_spark`` package; the query
inventory is the registry (minispark_spark/registry.py) — one entry
per implemented operator from SURVEY.md §2 plus the training-data
extension operators (dedup / similarity / text / events).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from minispark_spark import registry

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's benchmark TPC-H Q1 variant
    (reference README.md:141-158) on sf0.001. Routed through the
    registry so session defaults (UTC timezone, AQE) apply even on a
    caller-provided SparkSession."""
    return registry.all_queries()["q1_pricing_summary"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    return registry.all_oracles()
