"""Arrow IPC DataSource (sources/arrowipc.py): round-trip fidelity,
multi-file parallel layout, column pruning, write modes, and external
readability (pyarrow reads what Spark wrote — the interop contract)."""

from __future__ import annotations

import glob
import os

import pyarrow.ipc as pa_ipc
import pytest
from pyspark.sql import functions as F

from minispark_spark.sources import arrowipc


@pytest.fixture()
def dest(tmp_path) -> str:
    return str(tmp_path / "out.arrow")


def _demo(spark):
    return spark.range(0, 1000, 1, 4).select(
        F.col("id"),
        (F.col("id") * 2).alias("doubled"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("name"),
        (F.col("id") / 3.0).alias("ratio"),
    )


def test_roundtrip_values_and_schema(spark, dest):
    arrowipc.register(spark)
    df = _demo(spark)
    df.write.format("arrowipc").mode("overwrite").save(dest)
    back = spark.read.format("arrowipc").load(dest)
    assert back.schema == df.schema
    assert sorted(back.collect()) == sorted(df.collect())


def test_one_file_per_nonempty_partition(spark, dest):
    arrowipc.register(spark)
    _demo(spark).write.format("arrowipc").mode("overwrite").save(dest)
    files = glob.glob(os.path.join(dest, "*.arrow"))
    assert len(files) == 4  # 4 input partitions, all non-empty
    # and the scan parallelizes one partition per file
    assert spark.read.format("arrowipc").load(dest).rdd.getNumPartitions() == 4


def test_pyarrow_reads_sparks_output(spark, dest):
    arrowipc.register(spark)
    _demo(spark).write.format("arrowipc").mode("overwrite").save(dest)
    total = 0
    for f in sorted(glob.glob(os.path.join(dest, "*.arrow"))):
        with pa_ipc.open_file(f) as r:
            t = r.read_all()
            assert t.schema.names == ["id", "doubled", "name", "ratio"]
            total += t.num_rows
    assert total == 1000


def test_column_pruning_selects_subset(spark, dest):
    arrowipc.register(spark)
    _demo(spark).write.format("arrowipc").mode("overwrite").save(dest)
    got = spark.read.format("arrowipc").load(dest).select("name", "id")
    rows = {r["id"]: r["name"] for r in got.collect()}
    assert rows[7] == "v7" and len(rows) == 1000


def test_overwrite_and_append_modes(spark, dest):
    arrowipc.register(spark)
    _demo(spark).limit(10).write.format("arrowipc").mode("overwrite").save(dest)
    _demo(spark).limit(5).write.format("arrowipc").mode("append").save(dest)
    assert spark.read.format("arrowipc").load(dest).count() == 15
    _demo(spark).limit(5).write.format("arrowipc").mode("overwrite").save(dest)
    assert spark.read.format("arrowipc").load(dest).count() == 5


def test_empty_partitions_leave_no_files(spark, dest):
    arrowipc.register(spark)
    df = _demo(spark).filter(F.col("id") < 250)  # only partition 0 survives
    df.write.format("arrowipc").mode("overwrite").save(dest)
    files = glob.glob(os.path.join(dest, "*.arrow"))
    assert len(files) == 1
    assert spark.read.format("arrowipc").load(dest).count() == 250


def test_stream_source_and_sink_roundtrip(spark, tmp_path):
    """Batch-write 3 IPC files, stream-read them (one micro-batch per
    offset range) into an arrowipc STREAMING sink, then batch-read the
    sink: same rows. Exercises both stream halves end to end."""
    arrowipc.register(spark)
    src = str(tmp_path / "src.arrow")
    dst = str(tmp_path / "dst.arrow")
    df = _demo(spark).repartition(3)
    df.write.format("arrowipc").mode("overwrite").save(src)
    schema = spark.read.format("arrowipc").load(src).schema
    q = (
        spark.readStream.format("arrowipc")
        .schema(schema)
        .load(src)
        .writeStream.format("arrowipc")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start(dst)
    )
    q.awaitTermination()
    back = spark.read.format("arrowipc").load(dst)
    assert sorted(back.collect()) == sorted(df.collect())
    files = glob.glob(os.path.join(dst, "*.arrow"))
    assert all(os.path.basename(f).startswith("part-b") for f in files)


def test_stream_sink_batch_replay_is_idempotent(spark, tmp_path):
    """Re-committing the same batch id must rewrite the same file names
    (os.replace), not duplicate rows — the exactly-once contract."""
    import pyarrow as pa

    dst = str(tmp_path / "sink.arrow")
    schema = pa.schema([("x", pa.int64())])
    w = arrowipc._ArrowIPCStreamWriter(dst, schema)
    def run_batch():
        msg = w.write(iter([pa.record_batch([pa.array([1, 2, 3])], schema=schema)]))
        w.commit([msg], batchId=7)
    run_batch()
    run_batch()  # replay of batch 7
    files = glob.glob(os.path.join(dst, "*.arrow"))
    assert len(files) == 1 and os.path.basename(files[0]) == "part-b00000007-00000.arrow"
    with pa_ipc.open_file(files[0]) as r:
        assert r.read_all().num_rows == 3
