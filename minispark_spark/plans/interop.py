"""Interop queries: the reference's native BlockFile format driven
end-to-end through the oracle gate (parquet → blockfile → Spark scan,
checked value-for-value against DuckDB reading the original parquet)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minispark_spark.registry import query
from minispark_spark.sources import blockfile
from minispark_spark.sources.sidecache import build_lock, side_dir


@query(
    "blockfile_roundtrip",
    oracle="""
        SELECT CAST(r_regionkey AS INTEGER) AS r_regionkey, r_name
        FROM region
    """,
    doc="Reference BlockFile format interop: export region to the "
    "reference's native binary format (sources/blockfile.py implements "
    "it as a Spark Python DataSource, one scan partition per block — "
    "reference io.py:180-313) and scan it back; every value must match "
    "DuckDB reading the original parquet.",
)
def blockfile_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    blockfile.register(spark)
    dest = side_dir("/tmp/minispark_blockfile", sf_dir, "region.bin")
    with build_lock(dest):
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        blockfile.convert_parquet_to_blockfile(
            spark, os.path.join(sf_dir, "region.parquet"), dest
        )
    return (
        spark.read.format("blockfile")
        .load(dest)
        .select(F.col("r_regionkey").cast("int").alias("r_regionkey"), "r_name")
    )


@query(
    "zorder_pruned_scan",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM events
        WHERE user_id BETWEEN 100 AND 199 AND value BETWEEN 10 AND 60
    """,
    doc="Range scan over a Z-order-clustered copy of events "
    "(sources/layout.py: bit-interleaved multi-dim sort key -> "
    "repartitionByRange + sorted parquet). Values must match DuckDB on "
    "the unclustered original; the layout win (row-group min/max "
    "skipping on BOTH filter columns) is measured in tests/"
    "test_layout.py. At 100 TB this layout is the difference between "
    "scanning everything and scanning a few percent.",
)
def zorder_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark.sources.layout import write_zordered
    from minispark_spark.sources.tables import load_table

    dest = side_dir("/tmp/minispark_zorder", sf_dir, "events")
    stamp = dest + ".stamp"
    src_mtime = str(os.path.getmtime(os.path.join(sf_dir, "events.parquet")))
    with build_lock(dest):
        if not (os.path.exists(stamp) and open(stamp).read() == src_mtime):
            write_zordered(
                load_table(spark, sf_dir, "events").select(
                    "event_id", "user_id", "value"
                ),
                dest,
                ["user_id", "value"],
                num_files=8,
            )
            with open(stamp, "w") as fh:
                fh.write(src_mtime)
    return (
        spark.read.parquet(dest)
        .filter(F.col("user_id").between(100, 199) & F.col("value").between(10, 60))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
    )


@query(
    "events_cdc_upsert",
    oracle="""
        SELECT user_id, event_type,
               strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               event_id, value
        FROM (
            SELECT user_id, event_type, ts, event_id, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, event_type, date_trunc('day', ts)
                       ORDER BY event_id DESC
                   ) AS rn
            FROM events
        )
        WHERE rn = 1
    """,
    doc="CDC upsert via dynamic partition overwrite (sources/upsert.py): "
    "load two-thirds of events into a day-partitioned parquet table, "
    "then upsert the remaining third keyed by (user_id, event_type, "
    "day) with latest-wins on event_id — only touched day-partitions "
    "are read or rewritten (physically verified in tests/"
    "test_upsert.py). Final table must equal DuckDB's "
    "latest-per-key over ALL events.",
)
def events_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark.sources.tables import load_table
    from minispark_spark.sources.upsert import upsert_partitions

    dest = side_dir("/tmp/minispark_upsert", sf_dir, "events")
    stamp = dest + ".stamp"
    src_mtime = str(os.path.getmtime(os.path.join(sf_dir, "events.parquet")))
    with build_lock(dest):
        if not (os.path.exists(stamp) and open(stamp).read() == src_mtime):
            ev = load_table(spark, sf_dir, "events").select(
                "user_id",
                "event_type",
                F.date_format(
                    F.date_trunc("day", F.col("ts")), "yyyy-MM-dd"
                ).alias("day"),
                "event_id",
                "value",
            )
            import shutil

            shutil.rmtree(dest, ignore_errors=True)
            upsert_partitions(
                ev.filter(F.col("event_id") % 3 != 0), dest,
                ["user_id", "event_type", "day"], "day", "event_id",
            )
            upsert_partitions(
                ev.filter(F.col("event_id") % 3 == 0), dest,
                ["user_id", "event_type", "day"], "day", "event_id",
            )
            with open(stamp, "w") as fh:
                fh.write(src_mtime)
    # Explicit schema: an EMPTY events table upserts into a partitioned
    # dir with zero day= directories, where inference fails (the
    # empty-partitioned-write gotcha); the schema is known, declare it.
    from pyspark.sql.types import StringType, StructField, StructType

    t = {f.name: f.dataType for f in load_table(spark, sf_dir, "events").schema.fields}
    read_schema = StructType(
        [
            StructField("user_id", t["user_id"]),
            StructField("event_type", t["event_type"]),
            StructField("event_id", t["event_id"]),
            StructField("value", t["value"]),
            StructField("day", StringType()),
        ]
    )
    return spark.read.schema(read_schema).parquet(dest).select(
        "user_id", "event_type", F.col("day").cast("string").alias("day"), "event_id", "value"
    )


@query(
    "cross_join_region_pairs",
    oracle="""
        SELECT a.r_name AS name_a, b.r_name AS name_b
        FROM region a CROSS JOIN region b
        WHERE a.r_regionkey < b.r_regionkey
    """,
    doc="Explicit CROSS JOIN (cartesian product) + anti-symmetric "
    "filter — the one join shape missing from the set-op/join family "
    "(reference supports only equi-join, tasks.py:250). Spark plans "
    "BroadcastNestedLoopJoin for the tiny side; a cartesian over two "
    "big tables would be rejected by design.",
)
def cross_join_region_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark.sources.tables import load_table

    r = load_table(spark, sf_dir, "region")
    a = r.select(F.col("r_regionkey").alias("key_a"), F.col("r_name").alias("name_a"))
    b = r.select(F.col("r_regionkey").alias("key_b"), F.col("r_name").alias("name_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("key_a") < F.col("key_b"))
        .select("name_a", "name_b")
    )


@query(
    "snapshot_read_committed",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
    """,
    doc="Snapshot-table read (sources/snapshots.py): publish orders in "
    "two versioned snapshots (half, then full) with atomic pointer-swap "
    "commits; reading the committed pointer must return exactly the "
    "full table. Readers resolve one immutable v-dir — concurrent "
    "publishes can never expose a half-written table (isolation and "
    "rollback proven in tests/test_snapshots.py).",
)
def snapshot_read_committed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark.sources import snapshots as snap
    from minispark_spark.sources.tables import load_table

    tdir = side_dir("/tmp/minispark_snapshots", sf_dir, "orders")
    stamp = tdir + ".stamp"
    src_mtime = str(os.path.getmtime(os.path.join(sf_dir, "orders.parquet")))
    with build_lock(tdir):
        if not (os.path.exists(stamp) and open(stamp).read() == src_mtime):
            import shutil

            shutil.rmtree(tdir, ignore_errors=True)
            orders = load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey", "o_totalprice"
            )
            snap.publish_snapshot(orders.filter(F.col("o_orderkey") % 2 == 0), tdir)
            snap.publish_snapshot(orders, tdir)  # v2 = full table, committed last
            with open(stamp, "w") as fh:
                fh.write(src_mtime)
    return snap.read_snapshot(spark, tdir)


@query(
    "arrow_ipc_roundtrip",
    oracle="""
        SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey, n_name,
               CAST(n_regionkey AS INTEGER) AS n_regionkey
        FROM nation
    """,
    doc="Arrow IPC (Feather v2) format interop: export nation to a "
    "directory of IPC files (sources/arrowipc.py — a Spark Python "
    "DataSource moving RecordBatches end-to-end, one scan partition "
    "per file) and scan it back; every value must match DuckDB reading "
    "the original parquet. The export a pandas/polars consumer mmaps "
    "zero-copy.",
)
def arrow_ipc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minispark_spark.sources import arrowipc

    arrowipc.register(spark)
    dest = side_dir("/tmp/minispark_arrowipc", sf_dir, "nation.arrow")
    stamp = dest + ".stamp"
    src = os.path.join(sf_dir, "nation.parquet")
    src_mtime = str(os.path.getmtime(src))
    with build_lock(dest):
        if not (os.path.exists(stamp) and open(stamp).read() == src_mtime):
            arrowipc.convert_parquet_to_arrow(spark, src, dest)
            with open(stamp, "w") as fh:
                fh.write(src_mtime)
    return (
        spark.read.format("arrowipc")
        .load(dest)
        .select(
            F.col("n_nationkey").cast("int").alias("n_nationkey"),
            "n_name",
            F.col("n_regionkey").cast("int").alias("n_regionkey"),
        )
    )
