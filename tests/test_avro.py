"""Pure-Python Avro codec + jar-free Spark source/sink tests: spec
byte vectors, both codecs, corruption detection, type-surface
rejection, distributed roundtrip losslessness."""

from __future__ import annotations

import io

import pytest

from pyblazing_spark.operators import avro_py as A
from pyblazing_spark.operators.avro_py import (
    decode_container,
    encode_container,
    make_schema,
)


def _zz(n: int) -> bytes:
    out = io.BytesIO()
    A._write_long(out, n)
    return out.getvalue()


def test_zigzag_varint_spec_vectors():
    """The exact byte vectors from the Avro spec's binary-encoding
    table — the wire format, not just self-consistency."""
    assert _zz(0) == b"\x00"
    assert _zz(-1) == b"\x01"
    assert _zz(1) == b"\x02"
    assert _zz(-2) == b"\x03"
    assert _zz(2) == b"\x04"
    assert _zz(-64) == b"\x7f"
    assert _zz(64) == b"\x80\x01"
    for n in (0, 1, -1, 63, -64, 2**40, -(2**40), 2**62, -(2**62)):
        got, pos = A._read_long(memoryview(_zz(n)), 0)
        assert got == n and pos == len(_zz(n))


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip_all_types(codec):
    sch = make_schema(
        "r",
        [
            ("k", "long", False),
            ("i", "int", True),
            ("x", "double", False),
            ("b", "boolean", False),
            ("s", "string", True),
            ("raw", "bytes", True),
        ],
    )
    rows = [
        (1, 7, 1.5, True, "héllo", b"\x00\xff"),
        (-(2**62), None, -0.0, False, None, None),
        (0, -1, float("inf"), True, "", b""),
    ]
    data = encode_container(sch, rows, codec=codec, block_rows=2)
    s2, back = decode_container(data)
    assert back == rows
    assert s2["fields"][1]["type"] == ["null", "int"]


def test_container_corruption_detected():
    sch = make_schema("r", [("k", "long", False)])
    data = encode_container(sch, [(1,), (2,)])
    with pytest.raises(ValueError, match="magic"):
        decode_container(b"nope" + data[4:])
    # flip a byte inside the trailing sync marker
    broken = data[:-1] + bytes([data[-1] ^ 0xFF])
    with pytest.raises(ValueError, match="sync"):
        decode_container(broken)


def test_unsupported_shapes_rejected():
    with pytest.raises(ValueError, match="unsupported avro type"):
        encode_container(
            {"type": "record", "name": "r",
             "fields": [{"name": "a", "type": {"type": "array", "items": "long"}}]},
            [([1],)],
        )
    with pytest.raises(ValueError, match="union"):
        encode_container(
            {"type": "record", "name": "r",
             "fields": [{"name": "a", "type": ["long", "string"]}]},
            [(1,)],
        )
    sch = make_schema("r", [("k", "long", False)])
    with pytest.raises(ValueError, match="NULL in non-nullable"):
        encode_container(sch, [(None,)])
    with pytest.raises(ValueError, match="codec"):
        encode_container(sch, [(1,)], codec="snappy")


def test_arrow_encoder_byte_identical_to_rowwise():
    """The numpy scatter-gather block encoder must produce the exact
    bytes of the row-wise reference encoder, for every supported type,
    nullability, and the varint length boundaries (7-bit steps)."""
    import pyarrow as pa

    from pyblazing_spark.operators.avro_py import (
        _field_types,
        encode_block_arrow,
    )

    fields = [
        ("k", "long", False),
        ("nk", "long", True),
        ("i", "int", True),
        ("x", "double", True),
        ("b", "boolean", True),
        ("s", "string", True),
        ("raw", "bytes", True),
    ]
    sch = make_schema("r", fields)
    rows = [
        (2**53 + 1, -(2**62), 7, 1.5, True, "héllo", b"\x00\xff"),
        (0, None, None, None, None, None, None),
        (-1, 2**63 - 1, -(2**31), -0.0, False, "", b""),
    ]
    # varint byte-length boundaries both signs
    for e in range(0, 64, 7):
        v = 2**e
        rows.append((v - 1, -v, None, float(v), True, "x" * (e or 1), None))
    expected = encode_container(sch, rows, codec="null", block_rows=len(rows))
    # strip header + block framing (count, size) and trailing sync
    hdr = len(A.container_header(sch, "null"))
    body = expected[hdr:-16]
    pos = 0
    for _ in range(2):  # two varints: row count, byte size
        while body[pos] & 0x80:
            pos += 1
        pos += 1
    expected_body = body[pos:]

    cols = list(zip(*rows))
    batch = pa.record_batch(
        {
            "k": pa.array(cols[0], pa.int64()),
            "nk": pa.array(cols[1], pa.int64()),
            "i": pa.array(cols[2], pa.int32()),
            "x": pa.array(cols[3], pa.float64()),
            "b": pa.array(cols[4], pa.bool_()),
            "s": pa.array(cols[5], pa.string()),
            "raw": pa.array(cols[6], pa.binary()),
        }
    )
    got = encode_block_arrow(_field_types(sch), batch)
    assert got == expected_body


def test_write_avro_int64_above_2p53_exact(spark):
    """ADVICE r9 (medium): nullable BIGINT columns reach mapInPandas as
    float64 when nulls are present, and 2**53+1 silently round-trips to
    2**53.  The mapInArrow encoder must preserve int64 exactly."""
    import shutil
    import tempfile

    from pyblazing_spark.sources.avro_files import read_avro, write_avro

    d = tempfile.mkdtemp(prefix="avro_big_")
    try:
        big = 2**53 + 1
        src = spark.createDataFrame(
            [(1, big), (2, None), (3, -(2**62) - 3)], "k long, v long"
        )
        assert write_avro(src, d) == 3
        back = {r.k: r.v for r in read_avro(spark, d).collect()}
        assert back[1] == big  # the exact value, not 2**53
        assert back[2] is None
        assert back[3] == -(2**62) - 3
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_read_files_avro_rejects_options(spark, sf_dir):
    """ADVICE r9: unsupported reader options must raise, not silently
    drop (every other format forwards them)."""
    import shutil
    import tempfile

    from pyblazing_spark.sources.avro_files import write_avro
    from pyblazing_spark.sources.files import read_files
    from pyblazing_spark.sources.tables import load_table

    d = tempfile.mkdtemp(prefix="avro_opt_")
    try:
        write_avro(load_table(spark, sf_dir, "region"), d, codec="null")
        with pytest.raises(ValueError, match="avro reader options"):
            read_files(spark, [d], file_format="avro", names=["r"])
        df, fmt = read_files(spark, [d], file_format="avro")
        assert fmt == "avro" and df.count() > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_spark_avro_roundtrip_lossless(spark, sf_dir):
    """Distributed write (one container per partition) -> binaryFile
    decode must be row-for-row lossless incl. NULLs and timestamps."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from pyblazing_spark.sources.avro_files import read_avro, write_avro
    from pyblazing_spark.sources.tables import load_table

    d = tempfile.mkdtemp(prefix="avro_t_")
    try:
        src = load_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_totalprice",
            F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("st"),
            F.col("o_orderdate").cast("timestamp_ntz").alias("od"),
        )
        n = write_avro(src, d, codec="deflate")
        back = read_avro(spark, d)
        assert n == src.count() == back.count()
        assert set(map(tuple, src.collect())) == set(map(tuple, back.collect()))
        # schema carried through the wire format, not re-inferred
        assert back.schema["st"].dataType.simpleString() == "string"
        assert back.schema["od"].dataType.simpleString() == "timestamp_ntz"
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_write_avro_empty_frame(spark):
    """An all-filtered frame writes no files and the reader says so
    descriptively instead of inferring from nothing."""
    import shutil
    import tempfile

    from pyblazing_spark.sources.avro_files import read_avro, write_avro

    d = tempfile.mkdtemp(prefix="avro_e_")
    try:
        empty = spark.range(0).selectExpr("id AS k", "CAST(id AS DOUBLE) AS x")
        assert write_avro(empty, d) == 0
        with pytest.raises(Exception, match="no .avro files|PATH_NOT_FOUND"):
            read_avro(spark, d).collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_create_table_routes_avro(spark, sf_dir):
    """BlazingContext.create_table over an .avro tree routes through
    the jar-free reader (extension sniff + file_format kwarg)."""
    import shutil
    import tempfile

    from pyblazing_spark.context import BlazingContext
    from pyblazing_spark.sources.avro_files import write_avro
    from pyblazing_spark.sources.tables import load_table

    d = tempfile.mkdtemp(prefix="avro_ct_")
    try:
        na = load_table(spark, sf_dir, "nation")
        write_avro(na, d, codec="null")
        bc = BlazingContext(spark=spark)
        bc.create_table("nation_avro", d, file_format="avro")
        out = bc.sql("SELECT count(*) AS n, sum(n_nationkey) AS s FROM nation_avro", eager=True)
        assert int(out["n"].iloc[0]) == na.count()
        assert int(out["s"].iloc[0]) == 300  # 0+..+24
        # single-file path form works too
        import glob as _g

        one = _g.glob(f"{d}/*.avro")[0]
        bc.create_table("nation_avro1", one)
        assert bc.table("nation_avro1").count() > 0
        bc.drop_table("nation_avro")
        bc.drop_table("nation_avro1")
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_avro_split_reader_all_split_sizes(spark, sf_dir):
    """Byte-range partitioned scan of ONE monolithic container: every
    split size must see every block exactly once (row multiset equal to
    the file-per-task reader), and small splits must actually fan out
    into many input partitions."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from pyblazing_spark.sources.avro_files import write_avro
    from pyblazing_spark.sources.avro_split_ds import (
        AvroSplitReader,
        read_avro_split,
    )
    from pyblazing_spark.sources.tables import load_table

    d = tempfile.mkdtemp(prefix="avro_sp_")
    try:
        src = (
            load_table(spark, sf_dir, "orders")
            .select(
                "o_orderkey",
                "o_totalprice",
                F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("st"),
                F.col("o_orderdate").cast("timestamp_ntz").alias("od"),
            )
            .coalesce(1)  # ONE container file = the monolith case
        )
        assert write_avro(src, d, codec="deflate") == src.count()
        import glob as g

        (one,) = g.glob(f"{d}/*.avro")
        expect = sorted(map(tuple, src.collect()))
        import os

        fsize = os.path.getsize(one)
        for split in (1 << 16, fsize // 3 + 1, fsize * 2):
            back = read_avro_split(spark, one, split_size=split)
            assert sorted(map(tuple, back.collect())) == expect, split
        # partition arithmetic: 64 KiB splits on a >64 KiB file fan out
        rdr = AvroSplitReader({"path": one, "split_size": str(1 << 16)})
        n_parts = len(rdr.partitions())
        assert n_parts == -(-(fsize - rdr.files[0][4]) // (1 << 16))
        if fsize > 1 << 16:
            assert n_parts > 1
        # schema carried through, not inferred
        back = read_avro_split(spark, d)  # directory form
        assert back.schema["od"].dataType.simpleString() == "timestamp_ntz"
        assert back.schema["st"].dataType.simpleString() == "string"
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_avro_split_false_positive_sync_in_data(spark):
    """A bytes column containing the literal 16-byte sync marker (null
    codec: raw payload bytes hit the wire verbatim) must not derail the
    mid-file resynchronization scan — the reader requires the block
    varints to land back on a sync before trusting a match."""
    import shutil
    import tempfile

    import os

    import pyarrow as pa

    from pyblazing_spark.operators.avro_py import (
        _field_types,
        container_header,
        encode_block_arrow,
        frame_block,
        make_schema,
    )
    from pyblazing_spark.sources.avro_split_ds import read_avro_split

    # craft the container directly with a CHOSEN sync so the payloads
    # can embed the file's own marker (write_avro's marker is content-
    # derived now, which makes embedding it circular by construction)
    sync = bytes(range(32, 48))
    schema = make_schema("r", [("k", "long", False), ("raw", "bytes", False)])
    ftypes = _field_types(schema)
    rows = [
        (i, sync if i % 3 == 0 else b"x" * (i % 50)) for i in range(5000)
    ]
    cols = list(zip(*rows))
    d = tempfile.mkdtemp(prefix="avro_fp_")
    try:
        p = os.path.join(d, "fp.avro")
        with open(p, "wb") as fh:
            fh.write(container_header(schema, "null", sync))
            for lo in range(0, len(rows), 400):
                batch = pa.record_batch(
                    {
                        "k": pa.array(cols[0][lo : lo + 400], pa.int64()),
                        "raw": pa.array(cols[1][lo : lo + 400], pa.binary()),
                    }
                )
                fh.write(
                    frame_block(
                        batch.num_rows,
                        encode_block_arrow(ftypes, batch),
                        "null",
                        sync,
                    )
                )
        back = read_avro_split(spark, d, split_size=1 << 16)
        got = {r.k: bytes(r.raw) for r in back.collect()}
        assert len(got) == 5000
        assert got[0] == sync and got[1] == b"x"
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_write_avro_is_byte_deterministic(spark, sf_dir):
    """The writer's claim: re-running the same frame produces an
    identical tree (deterministic file names, fixed sync marker, stable
    block layout) — content-addressed pipelines diff cleanly."""
    import glob as g
    import shutil
    import tempfile

    from pyblazing_spark.sources.avro_files import write_avro
    from pyblazing_spark.sources.tables import load_table

    d1 = tempfile.mkdtemp(prefix="avro_d1_")
    d2 = tempfile.mkdtemp(prefix="avro_d2_")
    try:
        src = load_table(spark, sf_dir, "nation").coalesce(1)
        write_avro(src, d1, codec="deflate")
        write_avro(src, d2, codec="deflate")
        (f1,), (f2,) = g.glob(f"{d1}/*.avro"), g.glob(f"{d2}/*.avro")
        assert open(f1, "rb").read() == open(f2, "rb").read()
    finally:
        shutil.rmtree(d1, ignore_errors=True)
        shutil.rmtree(d2, ignore_errors=True)


def test_create_table_routes_avro_split(spark, sf_dir):
    """create_table(file_format='avro', split_size=...) routes through
    the byte-range split reader — the monolith-file scale path is
    reachable from the public lifecycle API, not just the internals."""
    import shutil
    import tempfile

    from pyblazing_spark.context import BlazingContext
    from pyblazing_spark.sources.avro_files import write_avro
    from pyblazing_spark.sources.tables import load_table

    d = tempfile.mkdtemp(prefix="avro_cts_")
    try:
        src = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        ).coalesce(1)
        n = write_avro(src, d, codec="null")
        bc = BlazingContext(spark=spark)
        bc.create_table("orders_avro_sp", d, file_format="avro",
                        split_size=1 << 16)
        df = bc.table("orders_avro_sp")
        assert df.count() == n
        assert df.rdd.getNumPartitions() >= 1
        out = bc.sql(
            "SELECT count(*) AS n, sum(o_orderkey) AS s FROM orders_avro_sp",
            eager=True,
        )
        assert int(out["n"].iloc[0]) == n
        bc.drop_table("orders_avro_sp")
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_nullable_timestamp_roundtrip(spark):
    """NaT must survive as NULL — astype(int64) on NaT silently yields
    INT64_MIN, the bug the writer's mask ordering guards against."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from pyblazing_spark.sources.avro_files import read_avro, write_avro

    d = tempfile.mkdtemp(prefix="avro_nt_")
    try:
        src = spark.createDataFrame(
            [(1, "2024-03-01 10:00:00"), (2, None), (3, "2024-03-02 00:00:01")],
            "k long, s string",
        ).select("k", F.col("s").cast("timestamp_ntz").alias("ts"))
        assert write_avro(src, d) == 3
        back = {r.k: r.ts for r in read_avro(spark, d).collect()}
        assert back[2] is None
        assert back[1].isoformat() == "2024-03-01T10:00:00"
        assert back[3].isoformat() == "2024-03-02T00:00:01"
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_avro_split_block_larger_than_prefetch(spark):
    """ADVICE r10 (high): a block extending >1 MB past the split's
    prefetch used to die with BufferError — ensure()/buf.extend() while
    a memoryview export of the buffer was alive. Write a container
    whose single block is ~3 MB (null codec, one Arrow batch) and read
    it with the 64 KiB floor split size: every partition's scan must
    cross the prefetch boundary."""
    import shutil
    import tempfile

    from pyblazing_spark.sources.avro_files import write_avro
    from pyblazing_spark.sources.avro_split_ds import read_avro_split

    d = tempfile.mkdtemp(prefix="avro_big_")
    try:
        rows = [(i, "y" * (3 << 20)) for i in range(3)]  # ~9 MB, 1 block
        src = spark.createDataFrame(rows, "k long, s string").coalesce(1)
        assert write_avro(src, d, codec="null") == 3
        back = read_avro_split(spark, d, split_size=1 << 16)
        got = sorted((r.k, len(r.s)) for r in back.collect())
        assert got == [(0, 3 << 20), (1, 3 << 20), (2, 3 << 20)]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_avro_split_huge_varint_false_match_clamped():
    """ADVICE r10 (medium): a false sync match whose garbage varints
    parse as a huge non-negative n_bytes must be rejected by the
    file-size clamp (rescanned), not ensure()'d — on a 50 GB monolith
    that read-to-EOF is an executor OOM. White-box the predicate, then
    prove end-to-end exactness on a crafted container that embeds
    sync + varint(plausible rows) + varint(huge bytes) in a payload."""
    import os
    import shutil
    import tempfile

    import pyarrow as pa

    from pyblazing_spark.operators.avro_py import (
        _write_long,
        container_header,
        encode_block_arrow,
        frame_block,
        make_schema,
        _field_types,
    )
    from pyblazing_spark.sources.avro_split_ds import (
        AvroSplitReader,
        _plausible_block,
    )

    # predicate: body past EOF is false; exactly-at-EOF (final block) ok
    assert _plausible_block(10, 100, body_start=884, file_size=1000)
    assert not _plausible_block(10, 2**40, body_start=884, file_size=1000)
    assert not _plausible_block(-1, 100, body_start=884, file_size=1000)
    assert _plausible_block(1, 0, body_start=984, file_size=1000)
    assert not _plausible_block(1, 1, body_start=984, file_size=1000)

    import io

    sync = bytes(range(16, 32))
    # payload = sync + varint(3) + varint(2**40): a self-consistent-
    # looking block header claiming a terabyte-scale body
    trap = io.BytesIO()
    trap.write(sync)
    _write_long(trap, 3)
    _write_long(trap, 2**40)
    schema = make_schema("r", [("k", "long", False), ("raw", "bytes", False)])
    ftypes = _field_types(schema)
    rows = [(i, trap.getvalue() if i % 7 == 0 else b"z" * (i % 40))
            for i in range(4000)]
    cols = list(zip(*rows))
    blob = io.BytesIO()
    blob.write(container_header(schema, "null", sync))
    for lo in range(0, len(rows), 500):
        batch = pa.record_batch(
            {"k": pa.array(cols[0][lo:lo + 500], pa.int64()),
             "raw": pa.array(cols[1][lo:lo + 500], pa.binary())}
        )
        blob.write(frame_block(
            batch.num_rows, encode_block_arrow(ftypes, batch), "null", sync
        ))
    d = tempfile.mkdtemp(prefix="avro_trap_")
    try:
        p = os.path.join(d, "trap.avro")
        with open(p, "wb") as fh:
            fh.write(blob.getvalue())
        reader = AvroSplitReader({"path": p, "split_size": str(1 << 16)})
        parts = reader.partitions()
        assert len(parts) > 1
        got = {}
        for part in parts:
            for rb in reader.read(part):
                tbl = rb.to_pydict()
                for k, raw in zip(tbl["k"], tbl["raw"]):
                    got[k] = raw
        assert len(got) == 4000
        assert got[0] == trap.getvalue() and got[1] == b"z"
    finally:
        shutil.rmtree(d, ignore_errors=True)
