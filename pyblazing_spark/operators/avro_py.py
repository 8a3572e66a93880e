"""Pure-Python Avro Object Container File codec — jar-free Avro source
and sink for flat record schemas.

Spark's ``format("avro")`` lives in the external ``spark-avro`` module,
which (like every vendor JDBC jar) is not deployable in this container
(no network; only ``avro-*.jar`` core libraries ship with Spark, not
the connector — probed round 9, SCALE.md). Same answer as the r8
jar-free SQLite bridge: implement the FORMAT from its public spec and
keep the Spark side idiomatic — encode with a distributed
``mapInPandas`` sink (one container file per partition), decode by
parsing ``binaryFile``-loaded containers in Arrow-batched Python.

Implemented from the Apache Avro 1.11 specification, "Object Container
Files" + "Binary encoding":

- header: magic ``Obj\\x01``, a file-metadata map (``avro.schema`` JSON,
  ``avro.codec``), and a 16-byte sync marker;
- data blocks: record-count varint, byte-size varint, the serialized
  records (optionally deflate-compressed), then the sync marker;
- primitives: ``long``/``int`` as zigzag varints, ``double`` as 8-byte
  little-endian IEEE-754, ``string`` as length-prefixed UTF-8,
  ``boolean`` as one byte, ``null`` as zero bytes;
- nullable fields as the 2-branch union ``["null", T]`` — a zigzag
  branch index then the branch encoding.

Supported field types cover the engine's scalar surface: long, int,
double, boolean, string, bytes, each optionally nullable. Codecs:
``null`` and ``deflate`` (raw zlib, ``wbits=-15``, per spec).

No reference parity (BlazingSQL has no Avro support at all) — this is
superset surface, the third jar-free from-spec I/O path next to the
image/audio codecs and the sqlite bridge.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

_MAGIC = b"Obj\x01"
#: default sync marker for the row-wise codec (fixed: files are
#: reproducible byte-for-byte; content-addressed pipelines diff
#: cleanly). A FIXED marker weakens the split reader's 2^-128
#: false-match model — any payload that embeds bytes written with the
#: same marker (e.g. avro-in-avro) reproduces it verbatim, framing and
#: all. :func:`pyblazing_spark.sources.avro_files.write_avro` therefore
#: derives a per-(schema, partition) marker instead (still
#: deterministic across re-runs), and the split reader clamps
#: implausible block sizes so even a self-consistent false match costs
#: a rescan, never an OOM.
_SYNC = bytes(range(16))

_SIMPLE = {"long", "int", "double", "boolean", "string", "bytes", "null"}


# ------------------------------------------------------------ varints
def _write_long(out: io.BytesIO, n: int) -> None:
    z = (n << 1) ^ (n >> 63)  # arithmetic shift keeps the sign bit trick
    z &= (1 << 64) - 1
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            return


def _read_long(buf: memoryview, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


# ------------------------------------------------------- field codecs
def _encode_value(out: io.BytesIO, typ: str, v) -> None:
    if typ == "long" or typ == "int":
        _write_long(out, int(v))
    elif typ == "double":
        out.write(struct.pack("<d", float(v)))
    elif typ == "boolean":
        out.write(b"\x01" if v else b"\x00")
    elif typ == "string":
        raw = str(v).encode("utf-8")
        _write_long(out, len(raw))
        out.write(raw)
    elif typ == "bytes":
        raw = bytes(v)
        _write_long(out, len(raw))
        out.write(raw)
    elif typ == "null":
        pass
    else:  # pragma: no cover - schema validated at build time
        raise ValueError(f"unsupported avro type {typ!r}")


def _decode_value(buf: memoryview, pos: int, typ: str):
    if typ == "long" or typ == "int":
        return _read_long(buf, pos)
    if typ == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ == "boolean":
        return bool(buf[pos]), pos + 1
    if typ == "string":
        n, pos = _read_long(buf, pos)
        return str(buf[pos : pos + n], "utf-8"), pos + n
    if typ == "bytes":
        n, pos = _read_long(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    if typ == "null":
        return None, pos
    raise ValueError(f"unsupported avro type {typ!r}")


def _base_type(t) -> str:
    """Normalize a schema type node to its wire primitive: logical
    types ({'type': 'long', 'logicalType': 'timestamp-micros'}) encode
    exactly as their underlying primitive per the spec."""
    if isinstance(t, dict):
        t = t["type"]
    if not isinstance(t, str) or t not in _SIMPLE:
        raise ValueError(f"unsupported avro type {t!r}")
    return t


def _field_types(schema: dict) -> list[tuple[str, str, bool]]:
    """(name, wire primitive, nullable) per field, validating support."""
    out = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):
            if len(t) != 2 or "null" not in t:
                raise ValueError(f"only ['null', T] unions supported: {t}")
            branch = t[0] if t[1] == "null" else t[1]
            out.append((f["name"], _base_type(branch), True))
        else:
            out.append((f["name"], _base_type(t), False))
    return out


def make_schema(name: str, fields: list[tuple[str, str, bool]]) -> dict:
    """Record schema dict from (name, type, nullable) triples."""
    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": n, "type": ["null", t] if nullable else t}
            for n, t, nullable in fields
        ],
    }


# ----------------------------------------------------------- container
def container_header(schema: dict, codec: str, sync: bytes = _SYNC) -> bytes:
    """Magic + file-metadata map + sync marker (shared by the row-wise
    and the vectorized Arrow encoders so their bytes stay identical)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    if len(sync) != 16:
        raise ValueError("avro sync marker must be exactly 16 bytes")
    out = io.BytesIO()
    out.write(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    _write_long(out, len(meta))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        _write_long(out, len(kb))
        out.write(kb)
        _write_long(out, len(v))
        out.write(v)
    _write_long(out, 0)  # end of metadata map
    out.write(sync)
    return out.getvalue()


def frame_block(n_rows: int, body: bytes, codec: str, sync: bytes = _SYNC) -> bytes:
    """Frame one encoded block body: count varint, size varint,
    (optionally deflated) body, sync marker."""
    if codec == "deflate":
        body = zlib.compress(body, 6)[2:-4]  # raw deflate per spec
    out = io.BytesIO()
    _write_long(out, n_rows)
    _write_long(out, len(body))
    out.write(body)
    out.write(sync)
    return out.getvalue()


def encode_container(
    schema: dict,
    rows: list[tuple],
    codec: str = "null",
    block_rows: int = 4096,
) -> bytes:
    """Serialize rows (tuples in schema field order) as one Avro OCF."""
    ftypes = _field_types(schema)
    out = io.BytesIO()
    out.write(container_header(schema, codec))
    for start in range(0, len(rows), block_rows):
        chunk = rows[start : start + block_rows]
        body = io.BytesIO()
        for row in chunk:
            for (name, typ, nullable), v in zip(ftypes, row):
                if nullable:
                    if v is None:
                        _write_long(body, 0)  # union branch 0 = null
                        continue
                    _write_long(body, 1)
                elif v is None:
                    raise ValueError(f"NULL in non-nullable field {name!r}")
                _encode_value(body, typ, v)
        out.write(frame_block(len(chunk), body.getvalue(), codec))
    return out.getvalue()


# ------------------------------------------- vectorized Arrow encoder
def _varint_flat(z, valid):
    """Vectorized unsigned-varint encode of already-zigzagged uint64
    values -> (flat bytes in row order, per-value byte lengths);
    rows where ``valid`` is False contribute zero bytes."""
    import numpy as np

    nb = np.ones(len(z), dtype=np.int64)
    for k in range(1, 10):  # 64 bits / 7 -> at most 10 varint bytes
        nb += (z >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    nb[~valid] = 0
    shifts = np.uint64(7) * np.arange(10, dtype=np.uint64)
    mat = ((z[:, None] >> shifts[None, :]) & np.uint64(0x7F)).astype(np.uint8)
    cols = np.arange(10)
    mat |= (cols[None, :] < (nb - 1)[:, None]).astype(np.uint8) << 7
    keep = cols[None, :] < nb[:, None]
    return mat[keep], nb  # boolean-mask flatten is C-order = row order


def _zigzag_np(v):
    import numpy as np

    u = v.astype(np.uint64, copy=False)
    return (u << np.uint64(1)) ^ (v >> np.int64(63)).astype(np.uint64)


def _field_subchunks(arr, typ: str, nullable: bool, name: str) -> list[tuple]:
    """Per-field byte sub-chunks for the row-major scatter:
    ``(src_bytes uint8[], per-row lengths int64[], src_starts|None)``.
    ``src_starts is None`` means the source is contiguous in row order."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(arr)
    if pa.types.is_timestamp(arr.type) or pa.types.is_date(arr.type):
        # logical types encode as their underlying primitive (spec);
        # Spark's Arrow unit is already micros for timestamps
        arr = arr.cast(pa.int64())
    valid = np.ones(n, dtype=bool) if arr.null_count == 0 else np.asarray(
        pc.is_valid(arr)
    )
    if not nullable and not valid.all():
        raise ValueError(f"NULL in non-nullable field {name!r}")
    chunks: list[tuple] = []
    if nullable:
        # union branch varint: zigzag(0)=0x00 (null) / zigzag(1)=0x02
        chunks.append(
            (
                np.where(valid, np.uint8(2), np.uint8(0)),
                np.ones(n, dtype=np.int64),
                None,
            )
        )
    if typ in ("long", "int"):
        vals = pc.fill_null(arr.cast(pa.int64()), 0).to_numpy()
        src, nb = _varint_flat(_zigzag_np(vals), valid)
        chunks.append((src, nb, None))
    elif typ == "double":
        vals = pc.fill_null(arr.cast(pa.float64()), 0.0).to_numpy()
        mat = vals.astype("<f8", copy=False).view(np.uint8).reshape(n, 8)
        chunks.append(
            (mat[valid].ravel(), np.where(valid, 8, 0).astype(np.int64), None)
        )
    elif typ == "boolean":
        vals = pc.fill_null(arr, False).to_numpy(zero_copy_only=False)
        chunks.append(
            (vals[valid].astype(np.uint8), valid.astype(np.int64), None)
        )
    elif typ in ("string", "bytes"):
        b = arr.cast(pa.large_binary())
        off = np.frombuffer(b.buffers()[1], dtype=np.int64)[
            b.offset : b.offset + n + 1
        ]
        data_buf = b.buffers()[2]
        data = (
            np.frombuffer(data_buf, dtype=np.uint8)
            if data_buf is not None
            else np.empty(0, dtype=np.uint8)
        )
        lens = np.diff(off)
        lens[~valid] = 0
        pre, nb = _varint_flat(_zigzag_np(lens), valid)
        chunks.append((pre, nb, None))  # length prefix varints
        chunks.append((data, lens, off[:-1]))  # payload, gathered by offset
    elif typ == "null":
        pass
    else:  # pragma: no cover - schema validated at build time
        raise ValueError(f"unsupported avro type {typ!r}")
    return chunks


def encode_block_arrow(ftypes: list[tuple[str, str, bool]], batch) -> bytes:
    """Encode one Arrow RecordBatch as an Avro block body (no framing)
    with numpy scatter-gather — no per-row Python. Exactness: int64
    values never pass through floats (the pandas-nullable-int trap),
    and byte output is identical to the row-wise encoder."""
    import numpy as np

    n = batch.num_rows
    if n == 0:
        return b""
    subs: list[tuple] = []
    for i, (name, typ, nullable) in enumerate(ftypes):
        subs.extend(_field_subchunks(batch.column(i), typ, nullable, name))
    k = len(subs)
    lens_mat = np.stack([c[1] for c in subs], axis=1)  # (n, k) row-major
    dst = np.concatenate(
        ([0], np.cumsum(lens_mat.ravel(), dtype=np.int64))
    )
    out = np.empty(int(dst[-1]), dtype=np.uint8)
    dst_starts = dst[:-1].reshape(n, k)
    for j, (src, lens, starts) in enumerate(subs):
        total = int(lens.sum())
        if total == 0:
            continue
        ramp = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(lens[:-1]))), lens
        )
        pos = np.repeat(dst_starts[:, j], lens) + ramp
        if starts is None:
            out[pos] = src  # contiguous by construction
        else:
            out[pos] = src[np.repeat(starts, lens) + ramp]
    return out.tobytes()


def decode_header(data: bytes) -> tuple[dict, str, bytes, int]:
    """Parse just an OCF header -> (schema, codec, sync marker, offset
    of the first block).  Accepts a truncated prefix as long as the
    whole header is present — lets readers probe the schema from the
    first few KB instead of shipping a whole container to the driver."""
    buf = memoryview(data)
    if bytes(buf[:4]) != _MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _read_long(buf, pos)
        if n == 0:
            break
        if n < 0:  # spec: negative count precedes a byte size
            n = -n
            _, pos = _read_long(buf, pos)
        for _ in range(n):
            kl, pos = _read_long(buf, pos)
            k = str(buf[pos : pos + kl], "utf-8")
            pos += kl
            vl, pos = _read_long(buf, pos)
            meta[k] = bytes(buf[pos : pos + vl])
            pos += vl
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    sync = bytes(buf[pos : pos + 16])
    if len(sync) != 16:
        raise ValueError("truncated avro header (no sync marker)")
    return schema, codec, sync, pos + 16


def decode_block_rows(
    block: "memoryview | bytes",
    n_rows: int,
    ftypes: list[tuple[str, str, bool]],
    codec: str = "null",
) -> list[tuple]:
    """Decode one (possibly deflated) block body into row tuples."""
    if codec == "deflate":
        block = memoryview(zlib.decompress(bytes(block), wbits=-15))
    elif not isinstance(block, memoryview):
        block = memoryview(block)
    rows: list[tuple] = []
    bpos = 0
    for _ in range(n_rows):
        vals = []
        for name, typ, nullable in ftypes:
            if nullable:
                branch, bpos = _read_long(block, bpos)
                if branch == 0:
                    vals.append(None)
                    continue
            v, bpos = _decode_value(block, bpos, typ)
            vals.append(v)
        rows.append(tuple(vals))
    return rows


def decode_container(data: bytes) -> tuple[dict, list[tuple]]:
    """Parse one Avro OCF -> (schema dict, rows as tuples)."""
    buf = memoryview(data)
    schema, codec, sync, pos = decode_header(data)
    ftypes = _field_types(schema)
    rows: list[tuple] = []
    total = len(buf)
    while pos < total:
        n_rows, pos = _read_long(buf, pos)
        n_bytes, pos = _read_long(buf, pos)
        rows.extend(
            decode_block_rows(buf[pos : pos + n_bytes], n_rows, ftypes, codec)
        )
        pos += n_bytes
        if bytes(buf[pos : pos + 16]) != sync:
            raise ValueError("sync marker mismatch mid-file")
        pos += 16
    return schema, rows
