"""BlockFile — the reference engine's native columnar format as a
Spark DataSource.

The reference stores every table in a single binary "BlockFile"
(reference io.py:180-313; zig-src/src/block_file.zig mirrors it):

    header   1 byte column count, then per column:
             1 byte type ordinal | 1 byte name length | name UTF-8
    blocks   u32 LE row count, then per column in schema order:
             u64 LE payload byte length | payload
             INTEGER    4-byte LE signed int32 each        (ordinal 0)
             STRING     one u8 length per row, then the    (ordinal 1)
                        concatenated UTF-8 bytes (≤255 B/value)
             FLOAT      4-byte LE float32 each             (ordinal 2)
             TIMESTAMP  8-byte LE int64 µs since epoch     (ordinal 3)
    footer   u64 LE start offset per block | u32 LE block count

This module implements the format from that spec (clean-room — no code
shared with the reference) as a Spark 4 Python DataSource, so a
reference user's existing ``.bin`` tables are directly queryable:

    spark.dataSource.register(BlockFileDataSource)
    spark.read.format("blockfile").load("fruits.bin")
    df.write.format("blockfile").mode("overwrite").save("out.bin")

Scale notes: reads parallelize one Spark partition per block (the
reference fans out one scan job per block the same way,
plan.py:90-93). Decode/encode is numpy-vectorized into Arrow batches —
no per-row Python. The format itself is single-file/local-disk with no
column statistics, so there is nothing to push filters into (a block
must be decoded to be filtered; Spark applies predicates after the
scan). It is an interop/export format: at 100 TB you convert to
parquet once (``convert_blockfile_to_parquet``) and keep pushdown,
pruning, and splittable scans.

Timestamps on disk are µs since epoch; we expose them as Spark
TIMESTAMP instants (sessions here run UTC). NULLs are unrepresentable
in the format (SURVEY §1.2) — writes fail fast on null values.
"""

from __future__ import annotations

import json
import logging
import os
import struct
import uuid
from typing import Iterator

log = logging.getLogger(__name__)

import numpy as np
import pyarrow as pa

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
from pyspark.sql.types import (
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

FORMAT_NAME = "blockfile"
MAX_STRING_BYTES = 255
# Reference ROWS_PER_BLOCK is 2 Mi rows (constants.py:7). We default to
# 1 Mi to keep per-block Arrow batches comfortably inside executor
# memory for wide strings; any row count per block is valid to readers.
DEFAULT_ROWS_PER_BLOCK = 1 << 20

_ORDINAL_TO_SPARK = {
    0: IntegerType(),
    1: StringType(),
    2: FloatType(),
    3: TimestampType(),
}
_SPARK_TO_ORDINAL = {
    "integer": 0,
    "string": 1,
    "float": 2,
    "timestamp": 3,
}
_ORDINAL_TO_ARROW = {
    0: pa.int32(),
    1: pa.string(),
    2: pa.float32(),
    3: pa.timestamp("us"),
}


# ---------------------------------------------------------------------------
# Binary layout (pure functions over bytes; shared by reader and writer)
# ---------------------------------------------------------------------------


def read_header(buf: bytes) -> tuple[list[tuple[str, int]], int]:
    """Parse the schema header; returns ([(name, ordinal)], data_start)."""
    ncols = buf[0]
    pos = 1
    schema: list[tuple[str, int]] = []
    for _ in range(ncols):
        ordinal = buf[pos]
        name_len = buf[pos + 1]
        name = buf[pos + 2 : pos + 2 + name_len].decode("utf-8")
        pos += 2 + name_len
        if ordinal not in _ORDINAL_TO_SPARK:
            raise ValueError(f"blockfile: unknown type ordinal {ordinal} for column {name!r}")
        schema.append((name, ordinal))
    return schema, pos


def read_footer(path: str) -> list[int]:
    """Block start offsets from the trailing [offsets…][count] footer."""
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        f.seek(size - 4)
        (count,) = struct.unpack("<I", f.read(4))
        if count == 0:
            return []
        f.seek(size - 4 - 8 * count)
        return list(struct.unpack(f"<{count}Q", f.read(8 * count)))


def block_spans(path: str) -> list[tuple[int, int]]:
    """(start, end) byte span per block — ends at the next block or the
    footer, so a scan task reads exactly its block's bytes."""
    starts = read_footer(path)
    if not starts:
        return []
    footer_start = os.path.getsize(path) - 4 - 8 * len(starts)
    ends = starts[1:] + [footer_start]
    return list(zip(starts, ends))


def decode_block(
    buf: bytes,
    offset: int,
    schema: list[tuple[str, int]],
    wanted: list[str] | None = None,
) -> pa.RecordBatch:
    """Decode one block at ``offset`` into an Arrow batch (vectorized).
    With ``wanted``, unneeded columns are skipped over by their length
    prefix without decoding — the format's own projection trick
    (reference io.py:118-124)."""
    (nrows,) = struct.unpack_from("<I", buf, offset)
    pos = offset + 4
    arrays = []
    names: list[str] = []
    for name, ordinal in schema:
        (nbytes,) = struct.unpack_from("<Q", buf, pos)
        pos += 8
        if wanted is not None and name not in wanted:
            pos += nbytes
            continue
        payload = buf[pos : pos + nbytes]
        pos += nbytes
        names.append(name)
        if ordinal == 0:
            arr = pa.Array.from_buffers(pa.int32(), nrows, [None, pa.py_buffer(payload)])
        elif ordinal == 2:
            arr = pa.Array.from_buffers(pa.float32(), nrows, [None, pa.py_buffer(payload)])
        elif ordinal == 3:
            arr = pa.Array.from_buffers(pa.timestamp("us"), nrows, [None, pa.py_buffer(payload)])
        else:  # STRING: u8 lengths block, then concatenated UTF-8
            lengths = np.frombuffer(payload, dtype=np.uint8, count=nrows)
            offsets = np.zeros(nrows + 1, dtype=np.int32)
            np.cumsum(lengths, out=offsets[1:])
            data = payload[nrows:]
            # The reference's writer records CHARACTER counts in the
            # length prefix while writing UTF-8 BYTES (reference
            # io.py: `len(str(val)) & 0xFF`), so a reference-written
            # file with non-ASCII strings is self-corrupt: the length
            # prefixes no longer tile the payload. Fail loudly instead
            # of returning silently shifted garbage.
            if int(offsets[-1]) != len(data):
                raise ValueError(
                    f"blockfile: column {name!r} string lengths sum to "
                    f"{int(offsets[-1])} bytes but the payload holds "
                    f"{len(data)} — this file was written with "
                    "character-counted length prefixes (the reference "
                    "writer's behavior for non-ASCII strings) and is "
                    "not round-trippable; re-export it with ASCII-only "
                    "strings or from this engine's writer"
                )
            arr = pa.Array.from_buffers(
                pa.utf8(),
                nrows,
                [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data)],
            )
            try:
                arr.validate(full=True)  # UTF-8 well-formedness
            except pa.lib.ArrowInvalid as exc:
                raise ValueError(
                    f"blockfile: column {name!r} contains bytes that are "
                    f"not valid UTF-8 under the recorded lengths ({exc}); "
                    "the file is corrupt or was written with character-"
                    "counted prefixes (reference writer + non-ASCII)"
                ) from None
        arrays.append(arr)
    if wanted is not None:  # emit in the requested order
        by_name = dict(zip(names, arrays))
        names = list(wanted)
        arrays = [by_name[n] for n in names]
    return pa.RecordBatch.from_arrays(arrays, names=names)


def encode_block(batch: pa.RecordBatch, ordinals: list[int]) -> bytes:
    """Encode one Arrow batch as one block (row count + per-column payloads)."""
    out = [struct.pack("<I", batch.num_rows)]
    for col, ordinal in zip(batch.columns, ordinals):
        if col.null_count:
            raise ValueError(
                "blockfile: NULL values are unrepresentable in the format "
                "(reference has no NULL support) — drop or fill them first"
            )
        if ordinal == 0:
            payload = col.to_numpy(zero_copy_only=False).astype("<i4", copy=False).tobytes()
        elif ordinal == 2:
            payload = col.to_numpy(zero_copy_only=False).astype("<f4", copy=False).tobytes()
        elif ordinal == 3:
            micros = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
            payload = micros.astype("<i8", copy=False).tobytes()
        else:  # STRING
            arr = col.cast(pa.large_utf8())  # int64 offsets: safe for any block
            raw = np.frombuffer(
                arr.buffers()[1], dtype=np.int64, count=arr.offset + len(arr) + 1
            )[arr.offset :]
            offsets = raw - raw[0]
            lengths = np.diff(offsets)
            if lengths.size and int(lengths.max()) > MAX_STRING_BYTES:
                raise ValueError(
                    f"blockfile: string value exceeds {MAX_STRING_BYTES} bytes "
                    "(1-byte length prefix in the format); shorten or store in parquet"
                )
            data_buf = arr.buffers()[2]
            start = int(raw[0])
            data = data_buf.to_pybytes()[start : start + int(offsets[-1])] if data_buf else b""
            payload = lengths.astype(np.uint8).tobytes() + data
        out.append(struct.pack("<Q", len(payload)))
        out.append(payload)
    return b"".join(out)


def encode_header(fields: list[tuple[str, int]]) -> bytes:
    out = [bytes([len(fields)])]
    for name, ordinal in fields:
        nb = name.encode("utf-8")
        if len(nb) > MAX_STRING_BYTES:
            raise ValueError(f"blockfile: column name {name!r} longer than 255 bytes")
        out.append(bytes([ordinal, len(nb)]) + nb)
    return b"".join(out)


def blockfile_schema_to_spark(schema: list[tuple[str, int]]) -> StructType:
    return StructType(
        [StructField(name, _ORDINAL_TO_SPARK[ordinal], nullable=False) for name, ordinal in schema]
    )


def spark_schema_to_ordinals(schema: StructType) -> list[tuple[str, int]]:
    fields = []
    for f in schema.fields:
        ordinal = _SPARK_TO_ORDINAL.get(f.dataType.typeName())
        if ordinal is None:
            raise ValueError(
                f"blockfile: column {f.name!r} has unsupported type {f.dataType.simpleString()} "
                "(format supports int, float, string, timestamp — see coerce_for_blockfile)"
            )
        fields.append((f.name, ordinal))
    return fields


# ---------------------------------------------------------------------------
# Spark DataSource
# ---------------------------------------------------------------------------


class _BlockFileReader(DataSourceReader):
    """One Spark partition per block — the reference's own scan fan-out
    unit (one ScanJob per block, reference plan.py:90-93)."""

    def __init__(self, path: str, file_schema: list[tuple[str, int]], wanted: list[str]):
        self.path = path
        self.file_schema = file_schema
        self.wanted = wanted  # columns to emit, in requested order

    def partitions(self) -> list[InputPartition]:
        spans = block_spans(self.path)
        return [InputPartition(s) for s in spans] or [InputPartition(None)]

    def read(self, partition: InputPartition) -> Iterator[pa.RecordBatch]:
        if partition.value is None:
            return
        start, end = partition.value
        with open(self.path, "rb") as f:
            f.seek(start)
            buf = f.read(end - start)
        yield decode_block(buf, 0, self.file_schema, self.wanted)


class _PartFileMessage(WriterCommitMessage):
    def __init__(self, part_path: str):
        self.part_path = part_path


class _BlockFileWriter(DataSourceArrowWriter):
    """Each task writes its partition's blocks to a side file; commit
    stitches them into the single-file format (header + blocks +
    footer) by streaming bytes and shifting offsets — no row decode on
    the driver. Assumes a filesystem shared between executors and
    driver, which is the format's own deployment model (local disk,
    reference io.py)."""

    def __init__(
        self,
        path: str,
        fields: list[tuple[str, int]],
        overwrite: bool,
        rows_per_block: int = DEFAULT_ROWS_PER_BLOCK,
    ):
        self.path = path
        self.fields = fields
        self.overwrite = overwrite
        self.rows_per_block = rows_per_block
        self.parts_dir = path + ".spark-parts"

    def write(self, iterator: Iterator[pa.RecordBatch]) -> _PartFileMessage:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        # Attempt id in the name: a speculative/zombie duplicate attempt
        # must never interleave writes into the winner's part file.
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        os.makedirs(self.parts_dir, exist_ok=True)
        part_path = os.path.join(self.parts_dir, f"part-{pid:05d}-{attempt}")
        ordinals = [o for _, o in self.fields]
        offsets: list[int] = []
        pending: list[pa.RecordBatch] = []
        pending_rows = 0

        def flush(f, final: bool) -> None:
            # Coalesce Arrow batches (~10k rows each from Spark) into
            # full blocks so a big write yields few, large blocks —
            # block count drives both footer size and scan task count.
            nonlocal pending, pending_rows
            if pending_rows == 0 or (not final and pending_rows < self.rows_per_block):
                return
            table = pa.Table.from_batches(pending).combine_chunks()
            pending, pending_rows = [], 0
            n = table.num_rows
            cut = 0
            while cut < n:
                take = min(self.rows_per_block, n - cut)
                if not final and take < self.rows_per_block:
                    remainder = table.slice(cut).to_batches()
                    pending = list(remainder)
                    pending_rows = n - cut
                    break
                chunk = table.slice(cut, take).to_batches()
                merged = (
                    pa.Table.from_batches(chunk).combine_chunks().to_batches()[0]
                    if len(chunk) != 1
                    else chunk[0]
                )
                offsets.append(f.tell())
                f.write(encode_block(merged, ordinals))
                cut += take

        with open(part_path, "wb") as f:
            for batch in iterator:
                if batch.num_rows == 0:
                    continue
                pending.append(batch)
                pending_rows += batch.num_rows
                flush(f, final=False)
            flush(f, final=True)
            # per-part footer so commit can locate blocks without decoding
            for off in offsets:
                f.write(struct.pack("<Q", off))
            f.write(struct.pack("<I", len(offsets)))
        return _PartFileMessage(part_path)

    def commit(self, messages: list[_PartFileMessage]) -> None:
        import shutil

        tmp = self.path + ".tmp"
        starts: list[int] = []
        with open(tmp, "wb") as out:
            if os.path.exists(self.path) and not self.overwrite:
                with open(self.path, "rb") as f:
                    existing_fields, _ = read_header(f.read(2 + 257 * 256))
                if existing_fields != self.fields:
                    raise ValueError(
                        f"blockfile append: schema mismatch with existing {self.path}"
                    )
                starts = read_footer(self.path)
                # stream existing [header + blocks) — never materialized
                footer_start = os.path.getsize(self.path) - 4 - 8 * len(starts)
                with open(self.path, "rb") as f:
                    shutil.copyfileobj(f, out, length=1 << 20)  # type: ignore[arg-type]
                out.truncate(footer_start)
                out.seek(footer_start)
            else:
                out.write(encode_header(self.fields))
            # Only files named in commit messages are stitched (a losing
            # task attempt's orphan part is ignored and cleaned up).
            for msg in sorted(messages, key=lambda m: m.part_path):
                part_starts = read_footer(msg.part_path)
                body_end = os.path.getsize(msg.part_path) - 4 - 8 * len(part_starts)
                shift = out.tell()
                with open(msg.part_path, "rb") as f:
                    copied = 0
                    while copied < body_end:
                        chunk = f.read(min(1 << 20, body_end - copied))
                        out.write(chunk)
                        copied += len(chunk)
                starts.extend(shift + s for s in part_starts)
            for s in starts:
                out.write(struct.pack("<Q", s))
            out.write(struct.pack("<I", len(starts)))
        os.replace(tmp, self.path)
        self._cleanup()

    def abort(self, messages: list[_PartFileMessage]) -> None:
        self._cleanup()

    def _cleanup(self) -> None:
        if os.path.isdir(self.parts_dir):
            for name in os.listdir(self.parts_dir):
                os.unlink(os.path.join(self.parts_dir, name))
            os.rmdir(self.parts_dir)


class _BlockFileStreamReader(DataSourceStreamReader):
    """Tail a growing BlockFile as a Structured Streaming source.

    The stream offset is simply the number of committed blocks: each
    micro-batch reads the blocks appended since the last offset, one
    Spark partition per new block. Assumes an append-only producer
    (existing blocks immutable — our writer's append mode guarantees
    this; note the reference's own ``append_data`` REWRITES a final
    partial block when merging small appends, reference io.py:292-301,
    so producers feeding a stream should append full blocks)."""

    def __init__(self, path: str, file_schema: list[tuple[str, int]], wanted: list[str]):
        self.path = path
        self.file_schema = file_schema
        self.wanted = wanted

    def initialOffset(self) -> dict:
        return {"blocks": 0}

    def latestOffset(self) -> dict:
        try:
            return {"blocks": len(read_footer(self.path))}
        except FileNotFoundError:
            return {"blocks": 0}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        spans = block_spans(self.path)[start["blocks"] : end["blocks"]]
        return [InputPartition(s) for s in spans] or [InputPartition(None)]

    def read(self, partition: InputPartition) -> Iterator[pa.RecordBatch]:
        if partition.value is None:
            return
        start, end = partition.value
        with open(self.path, "rb") as f:
            f.seek(start)
            buf = f.read(end - start)
        yield decode_block(buf, 0, self.file_schema, self.wanted)

    def commit(self, end: dict) -> None:
        pass


class _BlockFileStreamWriter(_BlockFileWriter, DataSourceStreamArrowWriter):
    """Streaming sink: every micro-batch appends its blocks to the
    single target file (same task-side part files as the batch writer;
    the per-batch commit stitches them in append mode). Re-delivered
    batch ids are deduplicated via a high-water-mark stamp next to the
    file, keyed by the query identity (its checkpointLocation when
    given, else a per-run token): a *different* query writing to the
    same sink path restarts batch ids at 0 and must not be suppressed
    by a stale stamp. Crash between data append and stamp write is
    healed by recording the post-append block count: a replay of the
    next batch that finds the file already grown past the stamped
    count treats that batch as applied. Pairs with the streaming
    reader: its block-count offsets only ever grow."""

    def __init__(
        self,
        path: str,
        fields: list[tuple[str, int]],
        rows_per_block: int,
        stamp_key: str,
    ):
        super().__init__(path, fields, overwrite=False, rows_per_block=rows_per_block)
        self._batch_stamp = path + ".last-batch"
        # Stable across restarts of the same query when the caller set
        # checkpointLocation (the common production case); a fresh
        # query (new checkpoint dir) gets a different key and is never
        # false-skipped.
        self._stamp_key = stamp_key

    def _read_stamp(self) -> dict | None:
        try:
            with open(self._batch_stamp) as f:
                raw = f.read().strip()
        except FileNotFoundError:
            return None
        try:
            stamp = json.loads(raw)
            if isinstance(stamp, dict) and "batch_id" in stamp:
                return stamp
        except ValueError:
            pass
        # pre-round-2 stamp format: a bare batchId with no query key.
        # Unattributable -> ignore it rather than risk silent data loss
        # for a new query reusing the sink path.
        log.warning(
            "blockfile sink %s: ignoring legacy un-keyed replay stamp %r",
            self.path,
            raw,
        )
        return None

    def _write_stamp(self, batch_id: int, blocks_after: int) -> None:
        tmp = self._batch_stamp + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "key": self._stamp_key,
                    "batch_id": batch_id,
                    "blocks_after": blocks_after,
                },
                f,
            )
        os.replace(tmp, self._batch_stamp)

    def _block_count(self) -> int:
        try:
            return len(read_footer(self.path))
        except FileNotFoundError:
            return 0

    def commit(self, messages, batchId: int = -1) -> None:  # noqa: N803
        stamp = self._read_stamp()
        if stamp is not None and stamp.get("key") == self._stamp_key:
            last = stamp["batch_id"]
            if batchId <= last:
                log.info(
                    "blockfile sink %s: skipping replayed batch %d (<= stamped %d)",
                    self.path,
                    batchId,
                    last,
                )
                self._cleanup()
                return
            if batchId == last + 1 and self._block_count() > stamp.get(
                "blocks_after", 1 << 62
            ):
                # The previous run crashed after appending this batch's
                # data but before stamping it: the file already grew past
                # the stamped count, so this delivery is a replay.
                log.warning(
                    "blockfile sink %s: batch %d already appended by a "
                    "crashed run (file has %d blocks > stamped %d); "
                    "skipping replay and repairing the stamp",
                    self.path,
                    batchId,
                    self._block_count(),
                    stamp["blocks_after"],
                )
                self._cleanup()
                self._write_stamp(batchId, self._block_count())
                return
        super().commit(messages)
        self._write_stamp(batchId, self._block_count())

    def abort(self, messages, batchId: int = -1) -> None:  # noqa: N803
        self._cleanup()


class BlockFileDataSource(DataSource):
    """``spark.read.format("blockfile")`` / ``df.write.format("blockfile")``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("blockfile: a path is required (.load(path)/.save(path))")
        return path

    def schema(self) -> StructType:
        with open(self._path(), "rb") as f:
            head = f.read(2 + 257 * 256)  # upper bound of header size
        fields, _ = read_header(head)
        return blockfile_schema_to_spark(fields)

    def _validated_read_schema(
        self, schema: StructType
    ) -> tuple[list[tuple[str, int]], list[str]]:
        """Check the effective schema (user ``.schema(...)`` or ours)
        against the file header: every requested column must exist AND
        carry the file's type — a wrong-typed override would otherwise
        surface as an opaque Arrow conversion error at scan time."""
        with open(self._path(), "rb") as f:
            head = f.read(2 + 257 * 256)
        fields, _ = read_header(head)
        available = dict(fields)
        unknown = [f.name for f in schema.fields if f.name not in available]
        if unknown:
            raise ValueError(f"blockfile: columns {unknown} not in {self._path()}")
        for f in schema.fields:
            file_type = _ORDINAL_TO_SPARK[available[f.name]]
            if f.dataType != file_type:
                raise ValueError(
                    f"blockfile: column {f.name!r} is "
                    f"{file_type.simpleString()} in {self._path()} but the "
                    f"requested schema declares {f.dataType.simpleString()}; "
                    "the format stores fixed-width payloads and cannot be "
                    "read under a different type — cast after reading"
                )
        return fields, [f.name for f in schema.fields]

    def reader(self, schema: StructType) -> _BlockFileReader:
        fields, wanted = self._validated_read_schema(schema)
        return _BlockFileReader(self._path(), fields, wanted)

    def streamReader(self, schema: StructType) -> _BlockFileStreamReader:
        fields, wanted = self._validated_read_schema(schema)
        return _BlockFileStreamReader(self._path(), fields, wanted)

    def writer(self, schema: StructType, overwrite: bool) -> _BlockFileWriter:
        rows_per_block = int(self.options.get("rows_per_block", DEFAULT_ROWS_PER_BLOCK))
        return _BlockFileWriter(
            self._path(), spark_schema_to_ordinals(schema), overwrite, rows_per_block
        )

    def streamWriter(self, schema: StructType, overwrite: bool) -> _BlockFileStreamWriter:
        rows_per_block = int(self.options.get("rows_per_block", DEFAULT_ROWS_PER_BLOCK))
        # Replay-dedup stamp key: the query's checkpointLocation when the
        # caller set one (stable across restarts of the same query,
        # distinct for new queries), else a per-run token — which still
        # dedups re-delivery within a run and never suppresses another
        # query's batches.
        stamp_key = self.options.get("checkpointlocation") or self.options.get(
            "checkpointLocation"
        )
        if not stamp_key:
            stamp_key = f"run-{uuid.uuid4()}"
        return _BlockFileStreamWriter(
            self._path(), spark_schema_to_ordinals(schema), rows_per_block, stamp_key
        )


_REGISTERED: set[str] = set()


def register(spark: SparkSession) -> None:
    app = spark.sparkContext.applicationId
    if app not in _REGISTERED:
        spark.dataSource.register(BlockFileDataSource)
        _REGISTERED.add(app)


# ---------------------------------------------------------------------------
# Convenience converters (mirror reference utils.py:179-203's CSV→BlockFile)
# ---------------------------------------------------------------------------


def coerce_for_blockfile(df: DataFrame) -> DataFrame:
    """Best-effort cast to the format's four types: integral→int32,
    fractional→float32, timestamp_ntz→timestamp. Errors on anything
    else (arrays, structs, binary…)."""
    from pyspark.sql import functions as F

    casts = {"long": "int", "short": "int", "byte": "int", "double": "float",
             "decimal": "float", "timestamp_ntz": "timestamp", "date": "timestamp"}
    cols = []
    for f in df.schema.fields:
        t = f.dataType.typeName()
        target = casts.get(t.split("(")[0])
        cols.append(F.col(f.name).cast(target).alias(f.name) if target else F.col(f.name))
    return df.select(*cols)


def convert_blockfile_to_parquet(spark: SparkSession, src: str, dest: str) -> DataFrame:
    """One-time promotion of a reference BlockFile table to parquet —
    the scale path (statistics, pushdown, splittable scans)."""
    register(spark)
    spark.read.format(FORMAT_NAME).load(src).write.mode("overwrite").parquet(dest)
    return spark.read.parquet(dest)


def convert_parquet_to_blockfile(spark: SparkSession, src: str, dest: str) -> None:
    """Export parquet to the reference's native format (for running the
    reference engine side-by-side on identical data)."""
    register(spark)
    df = coerce_for_blockfile(spark.read.parquet(src))
    df.write.format(FORMAT_NAME).mode("overwrite").save(dest)


def _dump(path: str, limit: int) -> None:
    """CLI twin of reference examples/read_block_file.py — print a
    BlockFile's schema and first rows without starting a JVM (the
    codec above is pure Python/Arrow)."""
    with open(path, "rb") as f:
        head = f.read(2 + 257 * 256)
    fields, _ = read_header(head)
    type_names = {0: "int", 1: "string", 2: "float", 3: "timestamp"}
    print(f"{path}: {len(block_spans(path))} block(s)")
    print("schema:", ", ".join(f"{n} {type_names[o]}" for n, o in fields))
    remaining = limit
    with open(path, "rb") as f:
        buf = f.read()
    for start, _end in block_spans(path):
        if remaining <= 0:
            break
        batch = decode_block(buf, start, fields)
        for row in batch.to_pylist()[:remaining]:
            print(row)
            remaining -= 1


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description="Print a BlockFile's schema and contents.")
    ap.add_argument("file")
    ap.add_argument("--limit", type=int, default=20)
    args = ap.parse_args()
    _dump(args.file, args.limit)
