"""Arrow IPC (Feather v2) directories as a Spark DataSource.

The Arrow IPC file format is the lingua franca of the Python data
stack (pandas/polars `.feather`, Arrow Flight payloads, ML feature
dumps). This module makes a directory of ``*.arrow`` files a
first-class Spark source/sink:

    spark.dataSource.register(ArrowIPCDataSource)
    spark.read.format("arrowipc").load("features.arrow")
    df.write.format("arrowipc").mode("overwrite").save("out.arrow")

Layout: a DIRECTORY of self-describing IPC files (each carries the
schema), one per write task — the parquet deployment model, so reads
parallelize one Spark partition per file and writes never funnel
through the driver. Data moves as Arrow RecordBatches end-to-end
(DataSourceArrowWriter / RecordBatch reads): zero per-row Python.

Column pruning: Spark pushes the wanted columns into the reader and
the IPC footer lets us materialize ONLY those columns' buffers
(``RecordBatchFileReader`` + per-batch column selection). There are no
row-group statistics (IPC has no min/max), so predicates stay in
Spark — like BlockFile, this is an interop format: convert to parquet
when you need pushdown over 100 TB.

No reference analogue (the reference's only format is BlockFile);
extends the interop family (JSONL/ORC/CSV/BlockFile converters).
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid
from collections.abc import Iterator

import pyarrow as pa
import pyarrow.ipc as pa_ipc
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.pandas.types import from_arrow_schema, to_arrow_schema
from pyspark.sql.types import StructType

FORMAT_NAME = "arrowipc"


def _files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(glob.glob(os.path.join(path, "*.arrow")))


class _ArrowIPCReader(DataSourceReader):
    """One Spark partition per IPC file (each file is self-contained)."""

    def __init__(self, path: str, wanted: list[str]):
        self.path = path
        self.wanted = wanted

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(f) for f in _files(self.path)] or [InputPartition(None)]

    def read(self, partition: InputPartition) -> Iterator[pa.RecordBatch]:
        if partition.value is None:
            return
        with pa_ipc.open_file(partition.value) as reader:
            for i in range(reader.num_record_batches):
                batch = reader.get_batch(i)
                if self.wanted != batch.schema.names:
                    batch = batch.select(self.wanted)
                yield batch


class _PartMessage(WriterCommitMessage):
    def __init__(self, part_path: str):
        self.part_path = part_path


class _ArrowIPCWriter(DataSourceArrowWriter):
    """Each task streams its batches into one IPC file under a staging
    dir; commit renames the staging dir into place for Overwrite
    (atomic on one FS) or moves the part files in under collision-free
    names for Append. (Spark offers Python data sources exactly these
    two modes.)"""

    def __init__(self, path: str, schema: pa.Schema, overwrite: bool):
        self.path = path
        self.arrow_schema = schema
        self.overwrite = overwrite
        self.staging = f"{path}.spark-staging-{uuid.uuid4().hex[:8]}"

    def write(self, iterator: Iterator[pa.RecordBatch]) -> _PartMessage:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        os.makedirs(self.staging, exist_ok=True)
        # Attempt-unique staged name: a retried or speculative attempt
        # of the same partition must not race the first attempt onto
        # one file (a torn IPC footer reads as corruption later). Only
        # the attempt whose message Spark commits gets moved in.
        part = os.path.join(self.staging, f"part-{uuid.uuid4().hex[:8]}-{pid:05d}.arrow")
        n = 0
        with pa_ipc.new_file(part, self.arrow_schema) as sink:
            for batch in iterator:
                sink.write_batch(batch)
                n += batch.num_rows
        if n == 0:  # empty partitions leave no file (parquet convention)
            os.remove(part)
        return _PartMessage(part if n else "")

    def commit(self, messages: list[_PartMessage]) -> None:
        # Move ONLY the committed attempts' files — the staging dir may
        # also hold leftovers from failed or speculative attempts.
        committed = sorted(m.part_path for m in messages if m and m.part_path)
        os.makedirs(self.staging, exist_ok=True)
        if self.overwrite:
            final = self.staging + "-final"
            os.makedirs(final, exist_ok=True)
            for i, sp in enumerate(committed):
                os.replace(sp, os.path.join(final, f"part-{i:05d}.arrow"))
            if not committed:
                # Empty frame: persist a schema-only file (parquet does
                # the same) so a later read can still infer the schema
                # instead of failing on a file-less directory.
                with pa_ipc.new_file(
                    os.path.join(final, "part-empty.arrow"), self.arrow_schema
                ):
                    pass
            if os.path.exists(self.path):
                shutil.rmtree(self.path)
            os.rename(final, self.path)
            shutil.rmtree(self.staging, ignore_errors=True)
            return
        # Append (the only other mode Spark offers Python data sources):
        # staged names carry an attempt uuid, so they are already
        # collision-free against prior appends.
        os.makedirs(self.path, exist_ok=True)
        for sp in committed:
            os.replace(sp, os.path.join(self.path, os.path.basename(sp)))
        if not committed and not _files(self.path):
            with pa_ipc.new_file(
                os.path.join(self.path, "part-empty.arrow"), self.arrow_schema
            ):
                pass
        shutil.rmtree(self.staging, ignore_errors=True)

    def abort(self, messages: list[_PartMessage]) -> None:
        shutil.rmtree(self.staging, ignore_errors=True)


class _ArrowIPCStreamReader(DataSourceStreamReader):
    """Tail a growing IPC directory as a Structured Streaming source.

    Offset = lexicographic HIGH-WATERMARK of file basenames: each
    micro-batch reads the files whose names sort after the previous
    watermark, one Spark partition per new file. Name-based (not
    count-based) offsets make the batch boundary deterministic — a
    count into a re-sorted list can silently skip one file and re-read
    another when a new name sorts before already-counted ones.

    REQUIRES a producer whose new files always sort after existing
    ones — the streaming sink's part-b<batchId>-<i>.arrow names
    guarantee this. Directories grown by the BATCH append mode are NOT
    valid stream input: its attempt-uuid names are unordered, so a
    late-sorting new file would fall behind the watermark and never be
    read (restriction per the layout contract; use the streaming sink
    to feed a stream)."""

    def __init__(self, path: str, wanted: list[str]):
        self.path = path
        self.wanted = wanted

    def initialOffset(self) -> dict:
        return {"watermark": ""}

    def latestOffset(self) -> dict:
        files = _files(self.path)
        return {"watermark": os.path.basename(files[-1]) if files else ""}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        lo, hi = start["watermark"], end["watermark"]
        files = [
            f for f in _files(self.path) if lo < os.path.basename(f) <= hi
        ]
        return [InputPartition(f) for f in files] or [InputPartition(None)]

    def read(self, partition: InputPartition) -> Iterator[pa.RecordBatch]:
        if partition.value is None:
            return
        with pa_ipc.open_file(partition.value) as reader:
            for i in range(reader.num_record_batches):
                batch = reader.get_batch(i)
                if self.wanted != batch.schema.names:
                    batch = batch.select(self.wanted)
                yield batch

    def commit(self, end: dict) -> None:
        pass


class _ArrowIPCStreamWriter(DataSourceStreamArrowWriter):
    """Streaming sink: every micro-batch's task files are staged, then
    commit renames them to deterministic part-b<batchId>-<i>.arrow
    names via os.replace — a RE-DELIVERED batch id rewrites the very
    same names, so replays are idempotent without any stamp file (the
    directory layout itself is the ledger). Pairs with the streaming
    reader: batch-id-prefixed names keep the sorted file list in
    append order."""

    def __init__(self, path: str, schema: pa.Schema):
        self.path = path
        self.arrow_schema = schema
        self.staging = f"{path}.spark-stream-staging-{uuid.uuid4().hex[:8]}"

    def write(self, iterator: Iterator[pa.RecordBatch]) -> _PartMessage:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        os.makedirs(self.staging, exist_ok=True)
        part = os.path.join(self.staging, f"stage-{uuid.uuid4().hex[:8]}-{pid:05d}.arrow")
        n = 0
        with pa_ipc.new_file(part, self.arrow_schema) as sink:
            for batch in iterator:
                sink.write_batch(batch)
                n += batch.num_rows
        if n == 0:
            os.remove(part)
        return _PartMessage(part if n else "")

    def commit(self, messages: list[_PartMessage], batchId: int) -> None:
        os.makedirs(self.path, exist_ok=True)
        staged = sorted(m.part_path for m in messages if m and m.part_path)
        for i, sp in enumerate(staged):
            os.replace(sp, os.path.join(self.path, f"part-b{batchId:08d}-{i:05d}.arrow"))

    def abort(self, messages: list[_PartMessage], batchId: int) -> None:
        shutil.rmtree(self.staging, ignore_errors=True)


class ArrowIPCDataSource(DataSource):
    """``spark.read.format("arrowipc")`` / ``df.write.format("arrowipc")``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("arrowipc: a path is required (.load(path)/.save(path))")
        return path

    def schema(self) -> StructType:
        files = _files(self._path())
        if not files:
            raise FileNotFoundError(f"arrowipc: no *.arrow files under {self._path()}")
        with pa_ipc.open_file(files[0]) as reader:
            return from_arrow_schema(reader.schema)

    def reader(self, schema: StructType) -> _ArrowIPCReader:
        return _ArrowIPCReader(self._path(), [f.name for f in schema.fields])

    def writer(self, schema: StructType, overwrite: bool) -> _ArrowIPCWriter:
        return _ArrowIPCWriter(self._path(), to_arrow_schema(schema), overwrite)

    def streamReader(self, schema: StructType) -> _ArrowIPCStreamReader:
        return _ArrowIPCStreamReader(self._path(), [f.name for f in schema.fields])

    def streamWriter(self, schema: StructType, overwrite: bool) -> _ArrowIPCStreamWriter:
        return _ArrowIPCStreamWriter(self._path(), to_arrow_schema(schema))


_REGISTERED: set[str] = set()


def register(spark: SparkSession) -> None:
    app = spark.sparkContext.applicationId
    if app not in _REGISTERED:
        spark.dataSource.register(ArrowIPCDataSource)
        _REGISTERED.add(app)


def convert_parquet_to_arrow(spark: SparkSession, src_parquet: str, dest: str) -> None:
    """Parquet table → Arrow IPC directory (the export your Python-side
    consumers mmap with zero copies)."""
    register(spark)
    from minispark_spark.sources.tables import _normalize_ntz

    df = _normalize_ntz(spark.read.parquet(src_parquet))
    df.write.format(FORMAT_NAME).mode("overwrite").save(dest)
