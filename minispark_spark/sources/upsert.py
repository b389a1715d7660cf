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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _table_exists(spark: SparkSession, table_path: str) -> bool:
    """Existence through Hadoop's FileSystem API, so hdfs:///s3a://
    tables resolve correctly (a driver-local os.path check would say
    'missing' for every remote table and silently skip the merge)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(table_path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def _partition_dirs_exist(spark: SparkSession, table_path: str, partition_col: str) -> bool:
    """True when the table still holds at least one ``col=value``
    partition directory (Hadoop FS API, so remote tables resolve)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(table_path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return False
    prefix = f"{partition_col}="
    return any(
        st.getPath().getName().startswith(prefix) for st in fs.listStatus(hpath)
    )


def _escape_partition_value(spark: SparkSession, value) -> str:
    """Hive-escape a partition value exactly as Spark does when naming
    the partition directory (value ``b:c`` is written as dir
    ``part=b%3Ac``). Building the raw ``part=b:c`` path would target a
    directory that does not exist and silently leave the data on disk.
    Delegates to the same JVM routine the writer uses
    (ExternalCatalogUtils.escapePathName) with a Python mirror as
    fallback."""
    s = str(value)
    try:
        return str(
            spark._jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(
                s
            )
        )
    except Exception:
        # Mirror of Spark's needsEscaping charset (catalyst
        # ExternalCatalogUtils): control chars + the path-hostile set.
        special = set('"#%\'*/:=?\\\x7f{[]^')
        out = []
        for ch in s:
            if ord(ch) < 0x20 or ch in special:
                out.append("%%%02X" % ord(ch))
            else:
                out.append(ch)
        return "".join(out)


def latest_wins_plan(
    current: DataFrame | None,
    batch: DataFrame,
    key_cols: list[str],
    order_col: str,
) -> DataFrame:
    """The merge + per-key latest-wins reduction ``upsert_partitions``
    executes before its dynamic-partition write — factored so the plan
    linter audits the pre-sink plan (VERDICT r6 item #6), not the
    rescan of the written table. One shuffle on the key columns; ties
    prefer the incoming batch (``__src`` desc)."""
    if current is not None:
        merged = current.withColumn("__src", F.lit(0)).unionByName(
            batch.withColumn("__src", F.lit(1))
        )
    else:
        merged = batch.withColumn("__src", F.lit(1))
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(order_col).desc(), F.col("__src").desc()
    )
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


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
    spark = batch.sparkSession
    touched = [r[0] for r in batch.select(partition_col).distinct().collect()]
    if any(t is None for t in touched):
        # NULL partitions round-trip as __HIVE_DEFAULT_PARTITION__ and
        # break the isin() merge below — refuse rather than silently
        # dropping existing rows of the null partition.
        raise ValueError("upsert_partitions: NULL partition values are not supported")
    # The partition-dirs check matters for EMPTY first loads: writing an
    # empty batch leaves a table dir with zero col= directories, where
    # schema inference fails — treat that as table-does-not-exist.
    if _table_exists(spark, table_path) and _partition_dirs_exist(
        spark, table_path, partition_col
    ):
        current = spark.read.parquet(table_path).filter(
            F.col(partition_col).isin(touched)
        )
    else:  # first load: table does not exist yet
        current = None
    latest = latest_wins_plan(current, batch, key_cols, order_col)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        latest.write.mode("overwrite").partitionBy(partition_col).parquet(table_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def delete_partitioned(
    spark: SparkSession,
    table_path: str,
    partition_col: str,
    predicate,
) -> list:
    """Partition-scoped DELETE over a plain parquet table (the
    compliance / right-to-be-forgotten primitive): discover which
    partitions contain matching rows (partition-column distinct over
    the matching slice — tiny), rewrite ONLY those partitions with the
    matching rows removed, and physically drop partitions whose rows
    were ALL deleted (dynamic partition overwrite only replaces
    partitions PRESENT in the written frame, so an all-deleted
    partition must be removed through the FileSystem API or its old
    files would silently survive). Untouched partitions are not read
    and not written — cost scales with the delete's partition
    footprint, not the table. Returns the touched partition values.
    """
    cur = spark.read.parquet(table_path)
    touched = [
        r[0]
        for r in cur.filter(predicate).select(partition_col).distinct().collect()
    ]
    if not touched:
        return []
    if any(t is None for t in touched):
        # A NULL partition value lands in the __HIVE_DEFAULT_PARTITION__
        # dir and isin([None]) matches nothing — the merge below would
        # silently rewrite zero rows while returning a non-empty
        # `touched` list implying success. Mirror upsert_partitions and
        # refuse loudly (a compliance delete must never silently no-op).
        raise ValueError("delete_partitioned: NULL partition values are not supported")
    # SQL DELETE semantics: only rows where the predicate is TRUE are
    # deleted — a NULL-valued predicate keeps the row. A bare
    # ~predicate is NULL for those rows and filter() would drop them
    # from the rewrite, silently deleting rows that never matched.
    kept = cur.filter(F.col(partition_col).isin(touched)).filter(
        ~F.coalesce(predicate, F.lit(False))
    )
    surviving = {
        r[0] for r in kept.select(partition_col).distinct().collect()
    }
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        if surviving:
            kept.write.mode("overwrite").partitionBy(partition_col).parquet(table_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    for part in touched:
        if part in surviving:
            continue
        hpath = jvm.org.apache.hadoop.fs.Path(
            f"{table_path}/{partition_col}={_escape_partition_value(spark, part)}"
        )
        fs = hpath.getFileSystem(hconf)
        fs.delete(hpath, True)
    # Compliance deletes must not silently fail: re-read the touched
    # partitions (pruned scan) and confirm zero matching rows remain.
    # Only the every-partition-deleted case (no partition dirs left, so
    # no parquet files to infer a schema from) legitimately skips the
    # check — any other read error must surface, not be swallowed into
    # a false "verified clean".
    if _partition_dirs_exist(spark, table_path, partition_col):
        remaining = (
            spark.read.parquet(table_path)
            .filter(F.col(partition_col).isin(touched))
            .filter(predicate)
            .limit(1)
            .count()
        )
    else:
        remaining = 0
    if remaining:
        raise RuntimeError(
            "delete_partitioned: rows matching the predicate survived the "
            "rewrite — delete did not take effect"
        )
    return touched
