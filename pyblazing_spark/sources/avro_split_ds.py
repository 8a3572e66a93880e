"""Splittable Avro source: byte-range partitions WITHIN one container
file, as a PySpark Python DataSource.

:func:`pyblazing_spark.sources.avro_files.read_avro` parallelizes at
FILE granularity (binaryFile: one task per container), which is the
right unit for the trees our sink writes — but at 100 TB someone hands
you ONE 50 GB ``.avro`` file, and a file-per-task reader gives it one
task. This source implements the spec's answer, the same way Hadoop's
AvroInputFormat does: the 16-byte sync marker between blocks is a
resynchronization point, so a reader can enter the byte stream at ANY
offset, scan forward to the next sync, and start decoding blocks from
there. Partitioning becomes pure arithmetic over file length:

- the driver parses only each file's HEADER (schema, codec, sync);
- each ``split_size``-byte range ``[s, e)`` owns every block whose
  start offset lies in ``[s, e)`` — block starts are the positions
  immediately after a sync, plus the end of the header;
- a false-positive sync match (the 16 marker bytes occurring inside
  block data) is detected and skipped: after a candidate sync the
  reader parses the two block varints, CLAMPS implausible sizes (a
  body that would run past EOF is provably garbage — without the
  clamp, garbage varints parsing as a huge n_bytes would stage the
  rest of the file in memory before rejection), and REQUIRES the
  block to be terminated by the sync again — a lone collision cannot
  satisfy all three (same trust model as Hadoop's splitter). Our
  writer derives the marker from (schema, partition, row count, body
  bytes) rather than a global constant, so an embedded avro-in-avro
  payload can never share the outer file's marker (the outer body is
  strictly larger than any file it embeds) and thus never carries
  self-consistent framing under it.

No ``pushFilters``: this reader backs long-lived relations too, and
Spark 4.1 pins the first pushdown's read info on the shared relation
(see ``sources/sqlite_ds.py``'s module docstring — same reuse trap).
Local-filesystem paths (the only kind this container can test); a
remote-FS deployment would swap ``open``/``os.path.getsize`` for the
filesystem client's ranged reads — the split arithmetic is unchanged.
"""

from __future__ import annotations

import glob as _glob
import os
from typing import TYPE_CHECKING, Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from pyblazing_spark.operators.avro_py import (
    _field_types,
    _read_long,
    decode_block_rows,
    decode_header,
)

if TYPE_CHECKING:  # pragma: no cover
    import pyarrow as pa

_DEFAULT_SPLIT = 32 * 1024 * 1024
_HEADER_PROBE = 1 << 20  # metadata map lives at the very front


def _list_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(_glob.glob(os.path.join(path, "*.avro")))
    if any(c in path for c in "*?["):
        return sorted(_glob.glob(path))
    return [path]


def _arrow_type(avro_type: str, logical_ts: bool):
    import pyarrow as pa

    if logical_ts:
        return pa.timestamp("us")
    return {
        "long": pa.int64(),
        "int": pa.int32(),
        "double": pa.float64(),
        "boolean": pa.bool_(),
        "string": pa.string(),
        "bytes": pa.binary(),
    }[avro_type]


def _schema_info(avro_schema: dict) -> tuple[list, list[str], set[str]]:
    """-> (ftypes, spark DDL fields, timestamp field names)."""
    ftypes = _field_types(avro_schema)
    ddl, ts_names = [], set()
    spark_t = {
        "long": "bigint",
        "int": "int",
        "double": "double",
        "boolean": "boolean",
        "string": "string",
        "bytes": "binary",
    }
    for f in avro_schema["fields"]:
        t = f["type"]
        base = (t[1] if t[0] == "null" else t[0]) if isinstance(t, list) else t
        if isinstance(base, dict) and base.get("logicalType") == "timestamp-micros":
            ddl.append(f"`{f['name']}` timestamp_ntz")
            ts_names.add(f["name"])
        else:
            ddl.append(f"`{f['name']}` {spark_t[base]}")
    return ftypes, ddl, ts_names


class AvroSplitReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("avro_split source needs a 'path' option")
        self.split_size = int(options.get("split_size", _DEFAULT_SPLIT))
        if self.split_size < 1 << 16:
            self.split_size = 1 << 16
        self.files: list[tuple[str, int, bytes, str, int]] = []
        first_schema: dict | None = None
        for p in _list_files(path):
            with open(p, "rb") as fh:
                head = fh.read(_HEADER_PROBE)
            schema, codec, sync, header_end = decode_header(head)
            if first_schema is None:
                first_schema = schema
            elif schema["fields"] != first_schema["fields"]:
                raise ValueError(
                    f"avro_split: {p} has a different schema than "
                    f"{self.files[0][0]}"
                )
            self.files.append(
                (p, os.path.getsize(p), sync, codec, header_end)
            )
        if first_schema is None:
            raise ValueError(f"avro_split: no .avro files under {path}")
        self.avro_schema = first_schema
        self.ftypes, self.ddl, self.ts_names = _schema_info(first_schema)

    # ------------------------------------------------------- partitions
    def partitions(self) -> list[InputPartition]:
        parts = []
        for path, size, sync, codec, header_end in self.files:
            s = header_end
            while s < size:
                e = min(size, s + self.split_size)
                parts.append(
                    InputPartition((path, s, e, sync, codec, header_end))
                )
                s = e
        return parts or [InputPartition(None)]

    # ------------------------------------------------------------- read
    def read(self, partition: InputPartition) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        if partition.value is None:
            return
        path, start, end, sync, codec, header_end = partition.value
        fields = [
            pa.field(
                name,
                _arrow_type(typ, name in self.ts_names),
                nullable=True,
            )
            for (name, typ, nullable) in self.ftypes
        ]
        arrow_schema = pa.schema(fields)
        file_size = os.path.getsize(path)
        with open(path, "rb") as fh:
            # anchor the buffer 16 bytes early: a sync ENDING exactly at
            # `start` marks a block start that belongs to this split
            anchor = header_end if start == header_end else max(
                header_end, start - 16
            )
            fh.seek(anchor)
            buf = bytearray(fh.read(min(end - anchor + (1 << 20), 1 << 62)))

            def ensure(n: int) -> None:
                # NOTE: callers must never hold a memoryview export of
                # `buf` across this call — extend() on an exported
                # bytearray raises BufferError. The loop below therefore
                # parses varints/sync straight off the bytearray and
                # copies each block body before decoding.
                while len(buf) < n:
                    chunk = fh.read(1 << 20)
                    if not chunk:
                        break
                    buf.extend(chunk)

            if start == header_end:
                pos = 0  # blocks start right after the header sync
            else:
                pos = _next_block_start(buf, ensure, sync, 0)
            while pos is not None and anchor + pos < end:
                ensure(pos + 20)
                try:
                    n_rows, p2 = _read_long(buf, pos)
                    n_bytes, p2 = _read_long(buf, p2)
                except IndexError:
                    break  # truncated tail: EOF
                if not _plausible_block(n_rows, n_bytes, anchor + p2, file_size):
                    # rescan from one past the FALSE MATCH's first byte
                    # (pos - 16): a real sync may overlap the false one.
                    # The file-size clamp matters: garbage varints from a
                    # false match can parse as a huge non-negative
                    # n_bytes, and ensure()-ing that would stage the rest
                    # of the file in memory before the terminating-sync
                    # check got a chance to reject it.
                    pos = _next_block_start(buf, ensure, sync, max(1, pos - 15))
                    continue
                ensure(p2 + n_bytes + 16)
                if bytes(buf[p2 + n_bytes : p2 + n_bytes + 16]) != sync:
                    # false-positive sync match inside block data: the
                    # varints parsed from garbage don't land on a sync
                    pos = _next_block_start(buf, ensure, sync, max(1, pos - 15))
                    continue
                # one copy, not two (a bytearray slice is already a
                # copy): export a memoryview just long enough to take
                # the bytes, released before any ensure() can grow buf
                mv = memoryview(buf)
                body = bytes(mv[p2 : p2 + n_bytes])
                mv.release()
                rows = decode_block_rows(body, n_rows, self.ftypes, codec)
                cols = list(zip(*rows)) if rows else [
                    () for _ in self.ftypes
                ]
                arrays = [
                    pa.array(cols[i], type=fields[i].type)
                    for i in range(len(fields))
                ]
                yield pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)
                pos = p2 + n_bytes + 16


def _plausible_block(
    n_rows: int, n_bytes: int, body_start: int, file_size: int
) -> bool:
    """Sanity gate on the two varints parsed after a candidate sync.
    A false sync match feeds garbage bytes to the varint decoder, which
    can yield a huge non-negative ``n_bytes``; blindly ensure()-ing
    ``n_bytes`` would read the remainder of the file into executor
    memory (an OOM on the 50 GB monoliths this source exists for)
    before the terminating-sync check rejects the match. Every real
    block's body + trailing sync fits inside the file, so anything
    larger is provably false and gets rescanned instead."""
    if n_rows < 0 or n_bytes < 0:
        return False
    return body_start + n_bytes + 16 <= file_size


def _next_block_start(buf: bytearray, ensure, sync: bytes, from_pos: int):
    """Offset (into buf) right after the next sync at/after from_pos,
    or None. Extends the buffer as needed while searching."""
    pos = from_pos
    while True:
        idx = buf.find(sync, pos)
        if idx >= 0:
            return idx + 16
        # not found in what we have: pull more, rescan the tail only
        pos = max(from_pos, len(buf) - 15)
        before = len(buf)
        ensure(len(buf) + (1 << 20))
        if len(buf) == before:
            return None


class AvroSplitDataSource(DataSource):
    """``spark.read.format("avro_split")`` — options: ``path`` (one
    ``.avro`` file, a glob, or a directory), ``split_size`` (bytes per
    input partition, default 32 MiB, floor 64 KiB)."""

    @classmethod
    def name(cls) -> str:
        return "avro_split"

    def schema(self) -> str:
        return ", ".join(AvroSplitReader(dict(self.options)).ddl)

    def reader(self, schema) -> AvroSplitReader:
        return AvroSplitReader(dict(self.options))


def read_avro_split(spark, path: str, split_size: int = _DEFAULT_SPLIT):
    """Read Avro container files with BYTE-RANGE parallelism: one Spark
    task per ``split_size`` bytes of container, independent of how many
    files there are — the scale path for monolithic containers."""
    if not getattr(spark, "_avro_split_registered", False):
        spark.dataSource.register(AvroSplitDataSource)
        spark._avro_split_registered = True
    return (
        spark.read.format("avro_split")
        .option("path", path)
        .option("split_size", str(split_size))
        .load()
    )
