"""Bucketed tables — co-located joins and aggregations without a shuffle.

At 100 TB the dominant cost of fact-fact joins (orders ⨝ lineitem) is
the exchange of both sides. Writing the tables bucketed by the join key
(`bucketBy(n, key)`) makes the partitioning part of the table layout:
Spark records bucket specs in the catalog, and a join of two tables
bucketed by the same key into the same bucket count plans with **no
Exchange on either side** (verified in tests/test_bucketing.py).

The same layout accelerates `groupBy(key)` (no re-shuffle) and makes
bucket pruning possible for point lookups. This is the engine's answer
to the reference's hash-partitioned shuffle files (reference
``tasks.py:343-395``) — except the partitioning is persisted once at
write time instead of being recreated on every query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str | list[str],
    n_buckets: int = 32,
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) parquet
    table in the session catalog. ``sort_by`` additionally sorts within
    buckets, enabling sort-merge joins with neither exchange NOR sort."""
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *cols)
    if sort_by:
        scols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*scols)
    w.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
