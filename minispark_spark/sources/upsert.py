"""Partition-level upsert over plain parquet — MERGE without a lakehouse.

The reference's only mutation is whole-file rewrite through its
BlockFile API (reference io.py:198-263; no INSERT/UPDATE/DDL — SURVEY
§2.4). At 100 TB the practical upsert primitive on open-format parquet
is DYNAMIC PARTITION OVERWRITE: union the incoming batch with the
current rows of ONLY the partitions it touches, dedupe latest-wins,
and rewrite just those partitions. Untouched partitions are not read
and not written — cost scales with the delta, not the table.

This is exactly what ``spark.sql.sources.partitionOverwriteMode =
dynamic`` does on write: only partitions present in the incoming
DataFrame are replaced. The read side prunes to the touched
partitions via a partition-column filter (PartitionFilters in the
scan, no data files of other days opened).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_partitions(
    batch: DataFrame,
    table_path: str,
    key_cols: list[str],
    partition_col: str,
    order_col: str,
) -> None:
    """Latest-wins upsert of ``batch`` into the parquet table at
    ``table_path`` (partitioned by ``partition_col``).

    Touched partitions are discovered from the batch (distinct over the
    partition column — tiny), existing rows of ONLY those partitions are
    unioned in, and per key the row with the greatest ``order_col``
    survives (ties prefer the incoming batch). One shuffle on the key,
    writes limited to touched partitions."""
    import os

    spark = batch.sparkSession
    touched = [r[0] for r in batch.select(partition_col).distinct().collect()]
    if os.path.exists(table_path):
        current = spark.read.parquet(table_path).filter(
            F.col(partition_col).isin(touched)
        )
        merged = current.withColumn("__src", F.lit(0)).unionByName(
            batch.withColumn("__src", F.lit(1))
        )
    else:  # first load: table does not exist yet
        merged = batch.withColumn("__src", F.lit(1))
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(order_col).desc(), F.col("__src").desc()
    )
    latest = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        latest.write.mode("overwrite").partitionBy(partition_col).parquet(table_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
