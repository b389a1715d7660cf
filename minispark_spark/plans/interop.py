"""Interop queries: the reference's native BlockFile format driven
end-to-end through the oracle gate (parquet → blockfile → Spark scan,
checked value-for-value against DuckDB reading the original parquet)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minispark_spark.registry import query
from minispark_spark.sources import blockfile


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
    dest_dir = os.path.join("/tmp/minispark_blockfile", os.path.basename(sf_dir.rstrip("/")))
    os.makedirs(dest_dir, exist_ok=True)
    dest = os.path.join(dest_dir, "region.bin")
    blockfile.convert_parquet_to_blockfile(spark, os.path.join(sf_dir, "region.parquet"), dest)
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

    dest = os.path.join(
        "/tmp/minispark_zorder", os.path.basename(sf_dir.rstrip("/")), "events"
    )
    stamp = dest + ".stamp"
    src_mtime = str(os.path.getmtime(os.path.join(sf_dir, "events.parquet")))
    if not (os.path.exists(stamp) and open(stamp).read() == src_mtime):
        write_zordered(
            load_table(spark, sf_dir, "events").select("event_id", "user_id", "value"),
            dest,
            ["user_id", "value"],
            num_files=8,
        )
        os.makedirs(os.path.dirname(stamp), exist_ok=True)
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
