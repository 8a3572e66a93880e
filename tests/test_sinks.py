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
