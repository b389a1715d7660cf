"""BlockFile DataSource: round-trip, block parallelism, append, limits,
and byte-level parity against the reference implementation itself
(imported from /root/reference — behavioral oracle, no code shared)."""

from __future__ import annotations

import datetime as dt
import importlib
import os
import sys
import types

import pytest

from minispark_spark.sources import blockfile as bf

ROWS = [
    (1, "apple", 1.5, dt.datetime(2024, 1, 1, 12, 0, 0)),
    (2, "banana", -2.25, dt.datetime(2024, 6, 15, 23, 59, 59, 123456)),
    (3, "", 0.0, dt.datetime(1970, 1, 1, 0, 0, 1)),
    (4, "crème brûlée", 3.125, dt.datetime(2030, 12, 31, 6, 30)),
]
SCHEMA = "id int, name string, score float, ts timestamp"


def _write_df(spark, path, rows=ROWS, schema=SCHEMA):
    bf.register(spark)
    df = spark.createDataFrame(rows, schema)
    df.coalesce(1).write.format("blockfile").mode("overwrite").save(path)
    return df


def _load_reference_io():
    """Import the reference's io module (its package __init__ is empty,
    so no extra deps get pulled in)."""
    pkg = types.ModuleType("mini_spark")
    pkg.__path__ = ["/root/reference/src/mini_spark"]
    sys.modules.setdefault("mini_spark", pkg)
    return importlib.import_module("mini_spark.io")


def test_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t.bin")
    df = _write_df(spark, path)
    back = spark.read.format("blockfile").load(path)
    assert back.schema.simpleString() == "struct<id:int,name:string,score:float,ts:timestamp>"
    assert sorted(back.collect()) == sorted(df.collect())


def test_multi_block_parallel_scan(spark, tmp_path):
    path = str(tmp_path / "big.bin")
    bf.register(spark)
    df = spark.range(5000).selectExpr("cast(id as int) as id")
    (
        df.coalesce(1)
        .write.format("blockfile")
        .option("rows_per_block", "1000")  # writer coalesces Arrow batches to this
        .mode("overwrite")
        .save(path)
    )
    assert len(bf.block_spans(path)) == 5
    back = spark.read.format("blockfile").load(path)
    # one scan partition per block, like the reference's per-block ScanJobs
    assert back.rdd.getNumPartitions() == 5
    assert back.count() == 5000
    assert back.agg({"id": "sum"}).collect()[0][0] == 5000 * 4999 // 2


def test_append_mode(spark, tmp_path):
    path = str(tmp_path / "a.bin")
    _write_df(spark, path)
    bf.register(spark)
    more = spark.createDataFrame([(9, "ninth", 9.0, dt.datetime(2025, 1, 1))], SCHEMA)
    more.coalesce(1).write.format("blockfile").mode("append").save(path)
    assert spark.read.format("blockfile").load(path).count() == len(ROWS) + 1


def test_string_over_255_bytes_rejected(spark, tmp_path):
    path = str(tmp_path / "long.bin")
    bf.register(spark)
    df = spark.createDataFrame([("x" * 300,)], "s string")
    with pytest.raises(Exception, match="255"):
        df.write.format("blockfile").mode("overwrite").save(path)


def test_null_rejected(spark, tmp_path):
    path = str(tmp_path / "null.bin")
    bf.register(spark)
    df = spark.createDataFrame([(1, None)], "a int, b string")
    with pytest.raises(Exception, match="NULL"):
        df.write.format("blockfile").mode("overwrite").save(path)


def test_empty_write_read(spark, tmp_path):
    path = str(tmp_path / "empty.bin")
    _write_df(spark, path, rows=[], schema=SCHEMA)
    back = spark.read.format("blockfile").load(path)
    assert back.count() == 0
    assert len(back.schema.fields) == 4


def test_reference_reads_our_files(spark, tmp_path):
    """Files we write are valid to the reference engine byte-for-byte."""
    ref_io = _load_reference_io()
    path = tmp_path / "ours.bin"
    _write_df(spark, str(path))
    rows = list(ref_io.BlockFile(path).read_data_rows())
    assert sorted(r["id"] for r in rows) == [1, 2, 3, 4]
    by_id = {r["id"]: r for r in rows}
    assert by_id[1]["name"] == "apple"
    assert by_id[4]["name"] == "crème brûlée"
    assert by_id[2]["score"] == pytest.approx(-2.25)
    # box TZ is UTC, so reference local-time µs == our UTC-instant µs
    assert by_id[2]["ts"] == dt.datetime(2024, 6, 15, 23, 59, 59, 123456)


def test_we_read_reference_files(spark, tmp_path):
    """Files the reference writes load through spark.read unchanged.

    ASCII strings only: the reference's Python writer stores the
    CHARACTER count as the length prefix but writes UTF-8 BYTES
    (reference io.py:100-104), so its own non-ASCII round-trip is
    corrupt (its Zig engine and our writer both use byte lengths —
    which is why the reference reads our non-ASCII files correctly in
    test_reference_reads_our_files, while files it writes itself are
    only well-formed for ASCII)."""
    ref_io = _load_reference_io()
    ct = importlib.import_module("mini_spark.constants").ColumnType
    path = tmp_path / "theirs.bin"
    ascii_rows = [r if r[0] != 4 else (4, "creme brulee", r[2], r[3]) for r in ROWS]
    schema = [("id", ct.INTEGER), ("name", ct.STRING), ("score", ct.FLOAT), ("ts", ct.TIMESTAMP)]
    ref_io.BlockFile(path, schema).write_tuples(ascii_rows)
    bf.register(spark)
    back = spark.read.format("blockfile").load(str(path))
    got = sorted((r.id, r.name, r.ts) for r in back.collect())
    assert got == sorted((r[0], r[1], r[3]) for r in ascii_rows)


def test_parquet_conversion_roundtrip(spark, tmp_path, sf_dir):
    """region.parquet → blockfile → parquet preserves every value."""
    src = os.path.join(sf_dir, "region.parquet")
    bin_path = str(tmp_path / "region.bin")
    pq_path = str(tmp_path / "region_back.parquet")
    bf.convert_parquet_to_blockfile(spark, src, bin_path)
    back = bf.convert_blockfile_to_parquet(spark, bin_path, pq_path)
    orig = bf.coerce_for_blockfile(spark.read.parquet(src))
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, orig.collect()))


def test_multi_partition_write_stitches_all_parts(spark, tmp_path):
    """A parallel (7-partition) write must stitch every task's blocks
    into one valid single-file BlockFile — readable by us AND by the
    reference's own reader."""
    path = tmp_path / "multi.bin"
    bf.register(spark)
    df = spark.range(10000).repartition(7).selectExpr("cast(id as int) as id")
    df.write.format("blockfile").mode("overwrite").save(str(path))
    assert len(bf.block_spans(str(path))) == 7
    back = spark.read.format("blockfile").load(str(path))
    assert back.count() == 10000
    assert back.agg({"id": "sum"}).collect()[0][0] == 10000 * 9999 // 2
    ref_io = _load_reference_io()
    assert ref_io.BlockFile(path).rows() == 10000


def test_user_schema_projection(spark, tmp_path):
    """A user-supplied .schema(...) subset is honored: only those
    columns are decoded and returned (the format's length prefixes let
    the reader skip the rest without parsing them)."""
    path = str(tmp_path / "proj.bin")
    _write_df(spark, path)
    back = spark.read.format("blockfile").schema("name string, id int").load(path)
    assert back.columns == ["name", "id"]
    assert sorted((r.name, r.id) for r in back.collect()) == sorted(
        (r[1], r[0]) for r in ROWS
    )
    with pytest.raises(Exception, match="not in"):
        spark.read.format("blockfile").schema("nope string").load(path).collect()


def test_writer_coalesces_small_batches_into_one_block(spark, tmp_path):
    """Default write of 50k rows (many ~10k-row Arrow batches) must land
    ONE full block, not one block per batch — block count drives footer
    size and scan task count."""
    path = str(tmp_path / "coalesce.bin")
    bf.register(spark)
    df = spark.range(50000).selectExpr("cast(id as int) as id")
    df.coalesce(1).write.format("blockfile").mode("overwrite").save(path)
    assert len(bf.block_spans(path)) == 1


def test_streaming_source_tails_appended_blocks(spark, tmp_path):
    """readStream over a BlockFile: first drain sees the initial blocks;
    after an append, a restart from the same checkpoint reads ONLY the
    new blocks (offset = committed block count)."""
    path = str(tmp_path / "stream.bin")
    ckpt = str(tmp_path / "ckpt")
    bf.register(spark)
    opts = {"rows_per_block": "1000"}
    df1 = spark.range(0, 3000).selectExpr("cast(id as int) as id")
    df1.coalesce(1).write.format("blockfile").options(**opts).mode("overwrite").save(path)

    out = str(tmp_path / "out")

    def drain() -> None:
        q = (
            spark.readStream.format("blockfile")
            .load(path)
            .writeStream.format("parquet")  # memory sink can't recover a checkpoint
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    first = spark.read.parquet(out).agg({"id": "count"}).collect()[0][0]
    assert first == 3000

    df2 = spark.range(3000, 5000).selectExpr("cast(id as int) as id")
    df2.coalesce(1).write.format("blockfile").options(**opts).mode("append").save(path)
    drain()
    rows = spark.read.parquet(out)
    # 5000 total (the restart read ONLY the 2 appended blocks, no replay)
    assert rows.count() == 5000
    assert rows.agg({"id": "sum"}).collect()[0][0] == 4999 * 5000 // 2


def test_streaming_sink_appends_per_microbatch(spark, tmp_path):
    """writeStream into a BlockFile: micro-batches append blocks; the
    final single file holds every row and opens in the reference's own
    reader."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink.bin")
    ckpt = str(tmp_path / "ckpt_sink")
    bf.register(spark)
    spark.range(6000).selectExpr("cast(id as int) as id").repartition(3).write.parquet(src)
    q = (
        spark.readStream.schema("id int")
        .option("maxFilesPerTrigger", "1")  # several micro-batches
        .parquet(src)
        .writeStream.format("blockfile")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start(sink)
    )
    q.awaitTermination(180)
    back = spark.read.format("blockfile").load(sink)
    assert back.count() == 6000
    assert back.agg({"id": "sum"}).collect()[0][0] == 6000 * 5999 // 2
    ref_io = _load_reference_io()
    assert ref_io.BlockFile(__import__("pathlib").Path(sink)).rows() == 6000


def test_streaming_sink_new_query_not_suppressed_by_old_stamp(spark, tmp_path):
    """A NEW streaming query (fresh checkpoint) writing to a sink path a
    previous query already stamped must not have its batch 0 silently
    skipped as a 'replay' — the replay stamp is keyed by query identity
    (checkpointLocation), not by batchId alone."""
    bf.register(spark)
    sink = str(tmp_path / "shared_sink.bin")

    def run_query(src: str, ckpt: str) -> None:
        q = (
            spark.readStream.schema("id int")
            .parquet(src)
            .writeStream.format("blockfile")
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start(sink)
        )
        q.awaitTermination(120)

    src1 = str(tmp_path / "src1")
    spark.range(0, 100).selectExpr("cast(id as int) as id").coalesce(1).write.parquet(src1)
    run_query(src1, str(tmp_path / "ckpt1"))
    assert spark.read.format("blockfile").load(sink).count() == 100

    # brand-new query, batchId restarts at 0, same sink path
    src2 = str(tmp_path / "src2")
    spark.range(100, 250).selectExpr("cast(id as int) as id").coalesce(1).write.parquet(src2)
    run_query(src2, str(tmp_path / "ckpt2"))
    back = spark.read.format("blockfile").load(sink)
    assert back.count() == 250  # old stamp did NOT swallow the new query's batch
    assert back.agg({"id": "sum"}).collect()[0][0] == 249 * 250 // 2


def test_streaming_sink_stamp_replay_and_crash_repair(tmp_path):
    """Unit-level stamp semantics: same-key replays skip, a crash that
    appended data but missed the stamp is detected via block count and
    not double-appended."""
    path = str(tmp_path / "unit.bin")
    fields = [("id", 0)]
    w = bf._BlockFileStreamWriter(path, fields, 1000, stamp_key="ckptA")
    w.commit([], batchId=0)
    assert bf.read_footer(path) == []
    stamp0 = w._read_stamp()
    assert stamp0 == {"key": "ckptA", "batch_id": 0, "blocks_after": 0}

    # replay of the same batch id: no error, no change
    w.commit([], batchId=0)
    assert w._read_stamp() == stamp0

    # crash simulation: batch 1's data was appended (block count grew)
    # but the stamp still says batch 0 — redelivery of batch 1 must be
    # recognized as applied and only repair the stamp.
    import struct as _struct

    with open(path, "r+b") as f:
        body = f.read()[: -4]  # strip empty footer (count=0)
        f.seek(0)
        f.truncate()
        block = _struct.pack("<I", 1) + _struct.pack("<Q", 4) + _struct.pack("<i", 7)
        f.write(body + block + _struct.pack("<Q", len(body)) + _struct.pack("<I", 1))
    assert len(bf.read_footer(path)) == 1
    w.commit([], batchId=1)
    assert w._read_stamp() == {"key": "ckptA", "batch_id": 1, "blocks_after": 1}
    assert len(bf.read_footer(path)) == 1  # nothing double-appended

    # a different query (different key) is never suppressed: its commit
    # goes through and re-keys the stamp.
    w2 = bf._BlockFileStreamWriter(path, fields, 1000, stamp_key="ckptB")
    w2.commit([], batchId=0)
    assert w2._read_stamp() == {"key": "ckptB", "batch_id": 0, "blocks_after": 1}


def test_reference_nonascii_file_raises_clear_error(spark, tmp_path):
    """The reference's Python writer records CHARACTER counts in string
    length prefixes while writing UTF-8 BYTES (reference io.py), so its
    non-ASCII files are self-corrupt. We must refuse them loudly, not
    return shifted garbage."""
    ref_io = _load_reference_io()
    ct = importlib.import_module("mini_spark.constants").ColumnType
    path = tmp_path / "bad_utf8.bin"
    ref_io.BlockFile(path, [("name", ct.STRING)]).write_tuples(
        [("crème",), ("brûlée",), ("plain",)]
    )
    bf.register(spark)
    with pytest.raises(Exception, match="character-counted|not round-trippable"):
        spark.read.format("blockfile").load(str(path)).collect()


def test_wrong_typed_schema_override_rejected(spark, tmp_path):
    """A user .schema(...) override with a column present under a
    different type fails with a descriptive error at plan time, not an
    opaque Arrow conversion error at scan time."""
    path = str(tmp_path / "typed.bin")
    _write_df(spark, path)
    with pytest.raises(Exception, match="cast after reading"):
        spark.read.format("blockfile").schema("id string").load(path).collect()


def test_streaming_sink_ignores_legacy_unkeyed_stamp(tmp_path):
    """A pre-round-2 stamp (bare batchId, no query key) is
    unattributable — it must be ignored rather than suppress a new
    query's batches (the exact silent-data-loss the keyed stamp fixes)."""
    path = str(tmp_path / "legacy.bin")
    fields = [("id", 0)]
    with open(path + ".last-batch", "w") as f:
        f.write("7")  # legacy format: high-water mark from some old query
    w = bf._BlockFileStreamWriter(path, fields, 1000, stamp_key="ckptX")
    w.commit([], batchId=0)  # old code would skip (0 <= 7); new code commits
    assert bf.read_footer(path) == []  # file was created (empty commit)
    assert w._read_stamp() == {"key": "ckptX", "batch_id": 0, "blocks_after": 0}
