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


def test_crowded_partition_splits_into_sized_files(spark, tmp_path):
    """A single crowded partition must come out as ceil(bytes/target)
    files written by that many tasks — not one huge single-task file
    (the salt on (partition, bucket) is what spreads it)."""
    path = str(tmp_path / "tbl2")
    hot = spark.createDataFrame([(i, "hot") for i in range(5000)], "id int, day string")
    hot.repartition(10).write.partitionBy("day").mode("append").parquet(path)
    nfiles, nbytes = partition_file_stats(path, "day")["hot"]
    assert nfiles == 10

    target = max(1, nbytes // 4)  # force ~4+ output buckets
    compacted = compact_partitions(
        spark, path, "day", max_files_per_partition=4, target_bytes=target
    )
    assert compacted == ["hot"]
    n_after, _ = partition_file_stats(path, "day")["hot"]
    assert 2 <= n_after < 10  # split across buckets, still compacted
    out = spark.read.parquet(path)
    assert out.count() == 5000
    assert out.groupBy().sum("id").collect()[0][0] == 4999 * 5000 // 2
