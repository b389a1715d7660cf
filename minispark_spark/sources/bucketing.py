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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str | list[str],
    n_buckets: int = 32,
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) parquet
    table in the session catalog. ``sort_by`` additionally sorts within
    buckets, enabling sort-merge joins with neither exchange NOR sort.
    ``path`` makes it an EXTERNAL table: the data outlives the session's
    in-memory catalog and can be re-registered metadata-only."""
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *cols)
    if sort_by:
        scols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*scols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


# TPC-H hot-key layout: lineitem + orders co-bucketed on orderkey (the
# fact-fact join every multi-way TPC-H query pays for), customer on
# custkey. Persisted once per (sf_dir, testdata mtime); q5/q8 bucketed
# variants read these and plan the orders-lineitem join with NO
# exchange on either side. At 100 TB this is the layout decision that
# retires the two dominant shuffles of the suite (q5/q8 measured as
# the honest heavies at sf=10, BASELINE.md).
TPCH_BUCKETS = 32


def tpch_bucketed_names(sf_dir: str) -> dict[str, str]:
    """Catalog table names for the bucketed TPC-H copies, keyed by the
    sf_dir path hash so distinct datasets never collide."""
    import hashlib

    h = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return {
        "lineitem": f"lineitem_bko_{h}",
        "orders": f"orders_bko_{h}",
        "customer": f"customer_bkc_{h}",
    }


def ensure_tpch_bucketed(
    spark: SparkSession, sf_dir: str, n_buckets: int = TPCH_BUCKETS
) -> dict[str, str]:
    """Idempotently persist the bucketed TPC-H hot tables for
    ``sf_dir``; returns {logical: catalog table name}.

    Each table is repartitioned on its bucket key before the write so
    every bucket lands in ONE file — the layout that lets Spark use the
    within-bucket sort (SortMergeJoin with neither exchange nor sort).
    Rebuilds when the source parquet mtime changes; guarded by the
    sidecache flock so concurrent sessions can't interleave."""
    from minispark_spark.sources.sidecache import build_lock, side_dir
    from minispark_spark.sources.tables import load_table

    # Reading the within-bucket sort requires
    # spark.sql.legacy.bucketedTableScan.outputOrdering=true at QUERY
    # planning time; that conf is a declared default (session.get_spark
    # and registry._SESSION_DEFAULTS), not a side effect of this build
    # helper — building a table must not silently change how the rest
    # of the session plans.
    names = tpch_bucketed_names(sf_dir)
    root = side_dir("/tmp/minispark_bucketed", sf_dir, "tpch")
    stamp = root + ".stamp"
    src_mtime = str(os.path.getmtime(os.path.join(sf_dir, "lineitem.parquet")))
    specs = [
        ("lineitem", names["lineitem"], "l_orderkey"),
        ("orders", names["orders"], "o_orderkey"),
        ("customer", names["customer"], "c_custkey"),
    ]
    with build_lock(root):
        if os.path.exists(stamp) and open(stamp).read() == src_mtime:
            # Data on disk is current; a fresh session only needs the
            # catalog metadata re-created (the default in-memory
            # catalog forgets tables between sessions — without this
            # every new session would redo the full bucketed write).
            for logical, table, key in specs:
                if not spark.catalog.tableExists(table):
                    _register_external_bucketed(
                        spark,
                        table,
                        os.path.join(root, logical),
                        key,
                        n_buckets,
                        # Schema from the SOURCE table, not file
                        # inference: an EMPTY source writes a bucketed
                        # dir with no data files, where inference fails
                        # in a fresh session (empty-corpus sweep).
                        schema=load_table(spark, sf_dir, logical).schema,
                    )
            return names
        for logical, table, key in specs:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            df = load_table(spark, sf_dir, logical).repartition(
                n_buckets, F.col(key)
            )
            write_bucketed(
                df,
                table,
                key,
                n_buckets,
                sort_by=key,
                path=os.path.join(root, logical),
            )
        with open(stamp, "w") as fh:
            fh.write(src_mtime)
    return names


def _register_external_bucketed(
    spark: SparkSession, table: str, path: str, key: str, n_buckets: int, schema=None
) -> None:
    """Metadata-only registration of an existing bucketed parquet dir
    (bucket ids are encoded in the file names Spark wrote). Pass
    ``schema`` when the dir may hold zero data files (empty source)."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
    spark.sql(
        f"CREATE TABLE {table} ({cols}) USING PARQUET "
        f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {n_buckets} BUCKETS "
        f"LOCATION '{path}'"
    )
