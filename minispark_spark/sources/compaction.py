"""Small-file compaction for partitioned parquet tables.

Streaming sinks and frequent CDC upserts accrete many tiny files per
partition; at scale that inflates scan task counts, file-listing time,
and parquet footer overhead until the table is slower to read than it
is big. The fix is periodic partition-local compaction: rewrite only
the partitions whose file count exceeds a threshold, each into
size-targeted files, using dynamic partition overwrite so untouched
partitions keep their files (and their mtimes) byte-identical.

This is the OPTIMIZE half of a lakehouse maintenance loop (the other
half, snapshot isolation, lives in ``snapshots.py``); the reference has
no notion of table maintenance at all — its tables are single files
rewritten whole (reference io.py:198-263).
"""

from __future__ import annotations

import glob
import math
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_BYTES = 128 << 20  # one healthy scan task per file


def partition_file_stats(table_path: str, partition_col: str) -> dict[str, tuple[int, int]]:
    """{partition_value: (file_count, total_bytes)} from the directory
    layout (driver-side listing — the same listing any planner does)."""
    stats: dict[str, tuple[int, int]] = {}
    for pdir in glob.glob(os.path.join(table_path, f"{partition_col}=*")):
        files = [
            f
            for f in glob.glob(os.path.join(pdir, "*.parquet"))
            if not os.path.basename(f).startswith("_")
        ]
        if files:
            value = os.path.basename(pdir).split("=", 1)[1]
            stats[value] = (len(files), sum(os.path.getsize(f) for f in files))
    return stats


def compact_partitions(
    spark: SparkSession,
    table_path: str,
    partition_col: str,
    max_files_per_partition: int = 4,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> list[str]:
    """Rewrite every partition holding more than ``max_files_per_partition``
    files into ``ceil(bytes/target_bytes)`` files. Returns the partition
    values compacted. Reads prune to the selected partitions
    (PartitionFilters); the dynamic-overwrite write replaces only them."""
    stats = partition_file_stats(table_path, partition_col)
    crowded = {
        value: nbytes
        for value, (nfiles, nbytes) in stats.items()
        if nfiles > max_files_per_partition
    }
    if not crowded:
        return []
    df = spark.read.parquet(table_path).filter(
        F.col(partition_col).cast("string").isin(list(crowded))
    )
    # Per-partition-VALUE bucket counts: hashing on the partition column
    # alone would land every row of a crowded partition in one task and
    # emit one arbitrarily large file. A salt with
    # ceil(partition_bytes/target_bytes) buckets per value splits each
    # partition across that many tasks/files, so the size target holds
    # even for a single hot partition.
    buckets = {v: max(1, math.ceil(nb / target_bytes)) for v, nb in crowded.items()}
    n_out = sum(buckets.values())
    bucket_map = F.create_map(
        *[F.lit(x) for value, n in buckets.items() for x in (value, n)]
    )
    data_cols = [c for c in df.columns if c != partition_col]
    salted = df.withColumn(
        "__compact_salt",
        F.pmod(F.hash(*[F.col(c) for c in data_cols]),
               bucket_map[F.col(partition_col).cast("string")]),
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            # repartition on (partition value, salt) so each task writes
            # ~one size-targeted file of ~one partition (no N-tasks x
            # M-partitions blowup, no single-task hot partition)
            salted.repartition(
                n_out, F.col(partition_col), F.col("__compact_salt")
            )
            .drop("__compact_salt")
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(table_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return sorted(crowded)
