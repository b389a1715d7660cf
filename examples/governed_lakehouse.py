"""End-to-end governed-lakehouse demo: the table lifecycle a data
platform runs around every production dataset, composed from the
oracle-verified governance primitives:

    ingest (audit gate) -> quarantine violations -> publish snapshot
    -> late batch: CDC upsert -> publish v2 -> snapshot diff (what
    changed?) -> compliance delete (user blocklist) -> publish v3
    -> equi-depth layout stats -> exact quantile SLO check

Every stage is ALSO a registry query (or its library primitive) the
correctness gate verifies against DuckDB: lineitem_quality_audit,
snapshot_diff_orders, events_gdpr_delete, orders_equidepth_buckets,
orders_exact_quantiles.

Run:  python examples/governed_lakehouse.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from minispark_spark.operators.selection import exact_quantiles_frame
from minispark_spark.session import get_spark
from minispark_spark.sources import snapshots
from minispark_spark.sources.tables import load_table
from minispark_spark.sources.upsert import delete_partitioned


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("governed-demo", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="governed_")
    table = f"{work}/events_table"
    snaps = f"{work}/events_snapshots"

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "value",
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
    )

    # 1. Ingest gate: audit the batch BEFORE it reaches the table.
    audit = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("value") < 0).cast("long")).alias("neg_value"),
        F.sum(F.col("user_id").isNull().cast("long")).alias("null_user"),
    ).first()
    print(f"ingest audit: {audit['n']} rows, "
          f"{audit['neg_value']} negative values, {audit['null_user']} null users")
    clean = ev.filter((F.col("value") >= 0) & F.col("user_id").isNotNull())

    # 2. First load + snapshot v1 (atomic pointer commit).
    clean.filter(F.col("event_id") % 3 != 0).write.partitionBy("day").parquet(table)
    v1 = snapshots.publish_snapshot(spark.read.parquet(table), snaps)

    # 3. Late batch arrives: partitioned upsert, then snapshot v2.
    late = clean.filter(F.col("event_id") % 3 == 0)
    from minispark_spark.sources.upsert import upsert_partitions

    upsert_partitions(late, table, ["event_id"], "day", "event_id")
    v2 = snapshots.publish_snapshot(spark.read.parquet(table), snaps)

    # 4. What changed between v1 and v2?
    diff = snapshots.snapshot_diff(spark, snaps, v1, v2, key_cols=["event_id"])
    diff.groupBy("change").count().orderBy("change").show()

    # 5. Compliance: erase a user blocklist, partition-scoped.
    touched = delete_partitioned(spark, table, "day", F.col("user_id") % 97 == 0)
    print(f"compliance delete touched {len(touched)} of "
          f"{spark.read.parquet(table).select('day').distinct().count()} day partitions")
    snapshots.publish_snapshot(spark.read.parquet(table), snaps)

    # 6. Layout planning: exact value-range stats for the next rewrite.
    exact_quantiles_frame(
        spark.read.parquet(table), "value", [0.5, 0.99]
    ).orderBy("q").show()

    print(f"versions retained: {snapshots._versions(snaps)}, "
          f"committed: {snapshots.current_version(snaps)}")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
