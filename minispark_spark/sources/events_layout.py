"""Event-time partitioned ingest layout (partition pruning for events).

The events sibling of ``sources/bucketing.py``: the raw events table is
one unpartitioned parquet file, so every bounded-date query scans all of
it. A production event store ingests partitioned by event DATE (the
universal time-series layout — Hive/Delta/Iceberg all do this), which
turns any event-time predicate into directory-level partition pruning:
Spark's scan lists only the matching ``event_date=YYYY-MM-DD/``
directories, and files outside the range are never opened, never
footer-read, never decoded. At 100 TB x years of history this is the
difference between scanning a week and scanning the archive.

Layout build is idempotent per (sf_dir, source mtime) under the
sidecache flock, exactly like the bucketed TPC-H twins; repartitioning
by the partition column before the write yields one file per date
instead of n_input_partitions x n_dates small files.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from minispark_spark.sources.sidecache import build_lock, side_dir
from minispark_spark.sources.tables import load_table


# Campaign labels by day-of-month — the marketing-calendar dimension
# used by the dynamic-partition-pruning gate. Derived from the events
# table's own dates (not hardcoded to a year) so driver testdata
# regeneration cannot desynchronize the calendar from the facts.
CAMPAIGN_CASE = (
    "CASE WHEN day(event_date) IN (5, 6) THEN 'launch' "
    "WHEN day(event_date) IN (12, 13) THEN 'promo' "
    "WHEN day(event_date) IN (26, 27) THEN 'retarget' "
    "ELSE 'off' END"
)


def ensure_campaign_calendar(spark: SparkSession, sf_dir: str) -> str:
    """Idempotently persist the campaign-calendar DIMENSION table (one
    row per distinct event date, labeled by CAMPAIGN_CASE) as parquet.
    It must be a FILE-BACKED table, not an in-memory literal frame:
    Spark's dynamic-partition-pruning rule only plans the pruning
    subquery when the filtering side is a scan with a selective
    predicate (probed: a LocalRelation calendar plans NO
    dynamicpruningexpression; this parquet one does)."""
    root = side_dir("/tmp/minispark_events_partitioned", sf_dir, "campaign_cal")
    stamp = root + ".stamp"
    src_mtime = str(os.path.getmtime(os.path.join(sf_dir, "events.parquet")))
    with build_lock(root):
        if os.path.exists(stamp) and open(stamp).read() == src_mtime:
            return root
        shutil.rmtree(root, ignore_errors=True)
        cal = (
            load_table(spark, sf_dir, "events")
            .select(F.to_date("ts").alias("event_date"))
            .distinct()
            .select("event_date", F.expr(CAMPAIGN_CASE).alias("campaign"))
        )
        cal.coalesce(1).write.mode("overwrite").parquet(root)
        with open(stamp, "w") as fh:
            fh.write(src_mtime)
    return root


def ensure_events_partitioned(spark: SparkSession, sf_dir: str) -> str:
    """Idempotently persist the date-partitioned events layout for
    ``sf_dir``; returns its path. Rebuilds when the source mtime
    changes; concurrent sessions serialize on the flock."""
    root = side_dir("/tmp/minispark_events_partitioned", sf_dir, "by_date")
    stamp = root + ".stamp"
    src_mtime = str(os.path.getmtime(os.path.join(sf_dir, "events.parquet")))
    with build_lock(root):
        if os.path.exists(stamp) and open(stamp).read() == src_mtime:
            return root
        shutil.rmtree(root, ignore_errors=True)
        ev = load_table(spark, sf_dir, "events").withColumn(
            "event_date", F.to_date("ts")
        )
        # One file per date: partition-column repartition before the
        # partitioned write (same trick as the bucketed layout's
        # repartition-on-bucket-key).
        ev.repartition(F.col("event_date")).write.partitionBy(
            "event_date"
        ).mode("overwrite").parquet(root)
        with open(stamp, "w") as fh:
            fh.write(src_mtime)
    return root
