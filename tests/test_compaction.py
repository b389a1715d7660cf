"""Compaction: crowded partitions shrink to few files with identical
values; quiet partitions' files are physically untouched."""

from __future__ import annotations

import glob
import os

from minispark_spark.sources.compaction import compact_partitions, partition_file_stats


def _files(path: str, part: str) -> dict[str, float]:
    return {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(path, part, "*.parquet"))
        if not os.path.basename(f).startswith("_")
    }


def test_compacts_only_crowded_partitions(spark, tmp_path):
    path = str(tmp_path / "tbl")
    # d1: 8 tiny files (crowded); d2: 2 files (left alone)
    d1 = spark.createDataFrame([(i, "d1") for i in range(80)], "id int, day string")
    d2 = spark.createDataFrame([(i, "d2") for i in range(100, 110)], "id int, day string")
    d1.repartition(8).write.partitionBy("day").mode("append").parquet(path)
    d2.repartition(2).write.partitionBy("day").mode("append").parquet(path)

    before_total = spark.read.parquet(path).groupBy().sum("id").collect()[0][0]
    d2_before = _files(path, "day=d2")
    assert partition_file_stats(path, "day")["d1"][0] == 8

    compacted = compact_partitions(spark, path, "day", max_files_per_partition=4)
    assert compacted == ["d1"]

    stats = partition_file_stats(path, "day")
    assert stats["d1"][0] <= 4
    assert _files(path, "day=d2") == d2_before  # same files, same mtimes
    assert spark.read.parquet(path).groupBy().sum("id").collect()[0][0] == before_total
    assert spark.read.parquet(path).count() == 90

    # idempotent: nothing left to compact
    assert compact_partitions(spark, path, "day", max_files_per_partition=4) == []
