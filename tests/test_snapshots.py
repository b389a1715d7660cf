"""Snapshot tables: atomic publish, time travel, rollback, vacuum."""

from __future__ import annotations

import os

import pytest

from minispark_spark.sources import snapshots as snap


def _df(spark, tag: str, n: int):
    return spark.range(n).selectExpr("cast(id as int) as id", f"'{tag}' as tag")


def test_publish_read_timetravel_rollback(spark, tmp_path):
    tdir = str(tmp_path / "tbl")
    assert snap.publish_snapshot(_df(spark, "a", 3), tdir) == 1
    assert snap.publish_snapshot(_df(spark, "b", 5), tdir) == 2

    assert snap.current_version(tdir) == 2
    assert snap.read_snapshot(spark, tdir).count() == 5
    # time travel to the retained first version
    assert snap.read_snapshot(spark, tdir, version=1).collect()[0].tag == "a"

    snap.rollback(tdir, 1)
    assert snap.read_snapshot(spark, tdir).count() == 3


def test_reader_resolved_before_publish_is_stable(spark, tmp_path):
    """A plan resolved against v=1 keeps reading v=1's immutable files
    even after v=2 commits — snapshot isolation."""
    tdir = str(tmp_path / "tbl2")
    snap.publish_snapshot(_df(spark, "a", 4), tdir)
    reader = snap.read_snapshot(spark, tdir)  # resolves v=1 paths now
    snap.publish_snapshot(_df(spark, "b", 9), tdir)
    assert reader.count() == 4
    assert snap.read_snapshot(spark, tdir).count() == 9


def test_failed_publish_leaves_pointer_untouched(spark, tmp_path):
    tdir = str(tmp_path / "tbl3")
    snap.publish_snapshot(_df(spark, "a", 2), tdir)
    # a write that dies mid-execution: commit must never happen
    from pyspark.sql import functions as F

    boom = F.udf(lambda x: 1 // 0, "long")
    bad = spark.range(4).select(boom("id").alias("id"))
    with pytest.raises(Exception):
        snap.publish_snapshot(bad, tdir)
    assert snap.current_version(tdir) == 1
    assert snap.read_snapshot(spark, tdir).count() == 2
    # and the next publish recovers, skipping past any orphan dir
    v = snap.publish_snapshot(_df(spark, "c", 6), tdir)
    assert snap.read_snapshot(spark, tdir, version=v).count() == 6


def test_vacuum_retains_committed(spark, tmp_path):
    tdir = str(tmp_path / "tbl4")
    for tag in "abcd":
        snap.publish_snapshot(_df(spark, tag, 2), tdir)
    snap.rollback(tdir, 1)  # committed version is now the OLDEST
    removed = snap.vacuum(tdir, keep=2)
    assert 1 not in removed  # never drop the committed version
    assert snap.read_snapshot(spark, tdir).collect()[0].tag == "a"


def test_publish_skips_foreign_version_dirs(spark, tmp_path):
    """Debris from a crashed or racing publisher (an existing v-dir we
    didn't create) must never be written into: the next publish lands
    in a FRESH version and leaves the debris byte-untouched."""
    import os

    from minispark_spark.sources.snapshots import current_version, publish_snapshot

    d = str(tmp_path / "t")
    df = spark.createDataFrame([(1,)], "x int")
    publish_snapshot(df, d)                      # v=1
    os.makedirs(os.path.join(d, "v=2"))          # racer/crash debris
    v = publish_snapshot(df, d)
    assert v == 3 and current_version(d) == 3
    assert os.listdir(os.path.join(d, "v=2")) == []  # debris untouched
