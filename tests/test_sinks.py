"""Write paths: partitioned directory trees round-trip, and bucketed
tables join with NO exchange on either side (the co-located join that
makes recurring fact-fact joins shuffle-free at 100 TB)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from pyblazing_spark.sources import sinks
from pyblazing_spark.sources.tables import load_table


def test_write_files_partitioned_roundtrip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_by_status")
    sinks.write_files(src, out, partition_by=["o_orderstatus"])
    back = spark.read.parquet(out)
    assert back.count() == src.count()
    # partition column survives with values intact
    assert sorted(r.o_orderstatus for r in back.select("o_orderstatus").distinct().collect()) == sorted(
        r.o_orderstatus for r in src.select("o_orderstatus").distinct().collect()
    )


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """orders and lineitem bucketed on the join key: the join plan must
    contain no Exchange (shuffle) operators at all."""
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sinks.write_bucketed_table(od, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    sinks.write_bucketed_table(li, "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    try:
        bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey).groupBy("o_orderstatus").count()
        # disable broadcast so the test actually checks bucket co-location
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            buf = io.StringIO()
            with redirect_stdout(buf):
                joined.explain("formatted")
            plan = buf.getvalue()
            join_section = plan.split("HashAggregate")[0]
            assert "Exchange" not in join_section, f"bucketed join still shuffles:\n{join_section}"
            # and the result is right
            plain = (
                od.join(li, od.o_orderkey == li.l_orderkey).groupBy("o_orderstatus").count()
            )
            assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_ctas_through_sql(spark, sf_dir):
    """CREATE TABLE AS SELECT works through the SQL entry point (the
    reference had no DDL sinks at all)."""
    load_table(spark, sf_dir, "region").createOrReplaceTempView("region_v")
    spark.sql("DROP TABLE IF EXISTS ctas_regions")
    try:
        spark.sql(
            "CREATE TABLE ctas_regions USING parquet AS "
            "SELECT r_regionkey, upper(r_name) AS r_name FROM region_v"
        )
        assert spark.table("ctas_regions").count() == 5
    finally:
        spark.sql("DROP TABLE IF EXISTS ctas_regions")


def test_zorder_layout_zone_maps_are_tight(spark, sf_dir, tmp_path):
    """The physically Z-ordered tree (sink_zorder_layout's write shape)
    must produce parquet files whose zcode min/max footer statistics
    cover a SMALL slice of the global range each — the property that
    lets any engine prune most files for a 2-D predicate from zone maps
    alone. Asserted from the real footers via pyarrow, against an
    UNSORTED control write of the same rows."""
    import glob as _glob

    import pyarrow.parquet as pq

    from pyblazing_spark.plans.retrieval import _Z_EXPR

    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        f"CAST({_Z_EXPR} AS BIGINT) AS zcode", "l_quantity"
    )
    zdir, rdir = str(tmp_path / "zorder"), str(tmp_path / "random")
    (
        li.repartitionByRange(8, "zcode")
        .sortWithinPartitions("zcode")
        .write.parquet(zdir)
    )
    li.repartition(8).write.parquet(rdir)  # hash layout: no clustering

    def spans(d):
        out = []
        for f in _glob.glob(f"{d}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo = min(
                md.row_group(i).column(0).statistics.min for i in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(i).column(0).statistics.max for i in range(md.num_row_groups)
            )
            out.append(hi - lo)
        return out

    z_spans, r_spans = spans(zdir), spans(rdir)
    assert len(z_spans) >= 4  # range partitioner actually split the data
    lo, hi = li.agg(F.min("zcode"), F.max("zcode")).first()
    global_span = hi - lo  # the fixture's keys do not fill all 16 bits
    # every hash-layout file spans ~the whole observed domain; z-ordered
    # files must each cover a small fraction, and at least 4x tighter
    # on average than the control.
    assert max(r_spans) > 0.9 * global_span, (r_spans, global_span)
    assert sum(z_spans) / len(z_spans) < 0.3 * global_span, (z_spans, global_span)
    assert sum(z_spans) / len(z_spans) < sum(r_spans) / len(r_spans) / 4


def test_compact_files_csv_format(spark, sf_dir, tmp_path):
    """compact_files is format-generic: the same listing + ceil-bin-pack
    + coalesce path must work for CSV trees (the suffix filter and the
    reader/writer format all key off file_format)."""
    frag, packed = str(tmp_path / "frag"), str(tmp_path / "packed")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nat.repartition(8).write.format("csv").option("header", "true").save(frag)
    stats = sinks.compact_files(spark, frag, packed, target_bytes=1 << 20,
                                file_format="csv", options={"header": "true"})
    assert stats["n_files_before"] == 8, stats
    assert stats["n_files_after"] == 1, stats
    back = (
        spark.read.format("csv")
        .option("header", "true")
        .schema("n_nationkey int, n_name string")
        .load(packed)
    )
    got = sorted((r.n_nationkey, r.n_name) for r in back.collect())
    want = sorted((r.n_nationkey, r.n_name) for r in nat.collect())
    assert got == want
