"""Jar-free Avro source/sink: distributed Spark I/O over the
pure-Python Object Container codec
(:mod:`pyblazing_spark.operators.avro_py`).

- :func:`write_avro`: one Avro container file per partition via
  ``mapInArrow`` — encoding runs numpy-vectorized over Arrow
  RecordBatches on executors (no per-row Python, and int64 values
  never pass through pandas' nullable-int float64 detour, which
  silently loses exactness above 2**53), the driver only collects the
  (path, rows) manifest. Deterministic file names (partition id),
  deterministic bytes (sync marker derived from schema + partition
  id + content totals, not random), so a re-run of the same frame
  produces an identical tree.
- :func:`read_avro`: ``binaryFile`` scan (one task per container) +
  ``mapInPandas`` decode. File-level parallelism is the natural Avro
  split unit here (the writer emits many partition-sized files);
  block-level splitting within one huge file would need the sync-seek
  scan the spec describes, which this reader deliberately skips.

Type surface: long/int/double/boolean/string/bytes, nullable via
["null", T], timestamps as the ``timestamp-micros`` logical type on
long — enough for every fixture table.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from pyblazing_spark.operators.avro_py import (
    _field_types,
    container_header,
    decode_container,
    decode_header,
    encode_block_arrow,
    frame_block,
)

_SPARK_TO_AVRO = {
    T.LongType: "long",
    T.IntegerType: "int",
    T.DoubleType: "double",
    T.BooleanType: "boolean",
    T.StringType: "string",
    T.BinaryType: "bytes",
}
_AVRO_TO_SPARK = {
    "long": T.LongType(),
    "int": T.IntegerType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
}


def _avro_schema_of(df: DataFrame, name: str = "spark_record") -> dict:
    fields = []
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)):
            base: object = {"type": "long", "logicalType": "timestamp-micros"}
        else:
            try:
                base = _SPARK_TO_AVRO[type(f.dataType)]
            except KeyError:
                raise ValueError(
                    f"write_avro: unsupported Spark type {f.dataType} "
                    f"for field {f.name!r}"
                ) from None
        fields.append(
            {"name": f.name, "type": ["null", base] if f.nullable else base}
        )
    return {"type": "record", "name": name, "fields": fields}


def _file_sync(schema: dict, pid: int, n_rows: int, body_bytes: int) -> bytes:
    """Per-file sync marker derived from (schema, partition id, row
    count, total un-compressed body bytes): deterministic across
    re-runs of the same frame (byte-identical trees still diff
    cleanly), but never shared with an EMBEDDED container — the
    avro-in-avro case where a fixed (or schema-only) marker lets inner
    blocks carry self-consistent framing under the outer marker and
    silently surface inner rows through the split reader. Including
    the body size closes even the self-similar case (identical schema,
    same partition id, same row count): an outer partition that embeds
    an inner file as a payload has STRICTLY more body bytes than the
    inner file's own bodies (the wrapper adds at least the framing and
    other fields), so the two markers can never coincide."""
    import hashlib

    seed = (
        json.dumps(schema, separators=(",", ":"))
        + f"|{pid}|{n_rows}|{body_bytes}"
    )
    return hashlib.md5(b"pbsp-avro-sync:" + seed.encode()).digest()


def write_avro(df: DataFrame, path: str, codec: str = "deflate") -> int:
    """Write ``df`` as a directory of Avro container files (one per
    partition); returns the total row count from the write manifest.
    Each incoming Arrow batch becomes one Avro block, encoded with the
    vectorized numpy path (exact int64, no pandas float detour)."""
    schema = _avro_schema_of(df)
    ftypes = _field_types(schema)
    os.makedirs(path, exist_ok=True)

    def encode(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        out = f"{path}/part-{pid:05d}.avro"
        bodies: list[tuple[int, bytes]] = []
        n_total = 0
        for batch in batches:
            if batch.num_rows == 0:
                continue
            bodies.append((batch.num_rows, encode_block_arrow(ftypes, batch)))
            n_total += batch.num_rows
        if n_total:
            # sync derived from content totals (see _file_sync), so the
            # bodies are encoded first and framed after
            sync = _file_sync(
                schema, pid, n_total, sum(len(b) for _, b in bodies)
            )
            with open(out, "wb") as fh:
                fh.write(container_header(schema, codec, sync))
                for n_rows, body in bodies:
                    fh.write(frame_block(n_rows, body, codec, sync))
            yield pa.RecordBatch.from_pydict(
                {"path": [out], "n_rows": [n_total]}
            )

    manifest = df.mapInArrow(encode, schema="path string, n_rows long").collect()
    return sum(r.n_rows for r in manifest)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Read Avro container files written by :func:`write_avro` (or any
    OCF within the supported type surface). ``path`` may be a single
    ``.avro`` file, a glob ending in ``.avro``, or a directory of
    container files."""
    from pyspark.sql import functions as F

    pattern = path if path.rstrip("/").endswith(".avro") else f"{path}/*.avro"
    files = spark.read.format("binaryFile").load(pattern)
    # schema from ONE container's HEADER only — substring keeps the
    # driver transfer to a few KB instead of shipping a whole
    # partition-sized container; fall back to the full blob in the
    # (pathological) case of a metadata map longer than the probe
    first = (
        files.select(F.substring("content", 1, 65536).alias("head"))
        .limit(1)
        .collect()
    )
    if not first:
        raise ValueError(f"read_avro: no .avro files under {path}")
    try:
        avro_schema, _, _, _ = decode_header(bytes(first[0].head))
    except (ValueError, IndexError):
        whole = files.select("content").limit(1).collect()
        avro_schema, _, _, _ = decode_header(bytes(whole[0].content))
    out_fields = []
    ts_names = set()
    for f in avro_schema["fields"]:
        t = f["type"]
        nullable = isinstance(t, list)
        base = (t[1] if t[0] == "null" else t[0]) if nullable else t
        if isinstance(base, dict) and base.get("logicalType") == "timestamp-micros":
            dt: T.DataType = T.TimestampNTZType()
            ts_names.add(f["name"])
        else:
            dt = _AVRO_TO_SPARK[base]
        out_fields.append(T.StructField(f["name"], dt, nullable))
    out_schema = T.StructType(out_fields)
    col_names = [f.name for f in out_fields]

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            for blob in pdf["content"]:
                _, rows = decode_container(bytes(blob))
                out = pd.DataFrame(rows, columns=col_names)
                for c in ts_names:
                    out[c] = pd.to_datetime(out[c], unit="us")
                yield out

    return files.select("content").mapInPandas(decode, schema=out_schema)
