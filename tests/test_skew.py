"""Salted-join / two-phase-agg correctness: results must equal the
unsalted equivalents row-for-row, and the salted plans must actually
spread keys (distinct salt values per key > 1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyblazing_spark.operators import skew
from pyblazing_spark.sources.tables import load_table


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_salted_inner_join_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed("l_suppkey", "s_suppkey")
    su = load_table(spark, sf_dir, "supplier")
    plain = li.join(su, "s_suppkey")
    salted = skew.salted_join(li, su, on="s_suppkey", salts=8)
    cols = ["s_suppkey", "l_orderkey", "l_linenumber", "s_name"]
    assert _sorted_rows(salted, cols) == _sorted_rows(plain, cols)


def test_salted_left_join_keeps_unmatched(spark, sf_dir):
    cu = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    big = big.select(F.col("o_custkey").alias("c_custkey"), "o_orderkey")
    plain = cu.join(big, "c_custkey", "left")
    salted = skew.salted_join(cu, big, on="c_custkey", salts=8, how="left")
    assert salted.count() == plain.count()
    plain_null = plain.where(F.col("o_orderkey").isNull()).count()
    salted_null = salted.where(F.col("o_orderkey").isNull()).count()
    assert salted_null == plain_null


def test_salt_actually_spreads_hot_keys(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    salt = (F.rand(seed=42) * 8).cast("int")
    spread = (
        li.withColumn("__salt", salt)
        .groupBy("l_suppkey")
        .agg(F.countDistinct("__salt").alias("n_salts"), F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 8)
    )
    assert spread.where(F.col("n_salts") <= 1).count() == 0


def test_two_phase_agg_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        r.l_returnflag: r.s
        for r in li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s")).collect()
    }
    two = {
        r.l_returnflag: r.total_qty
        for r in skew.two_phase_agg(
            li, "l_returnflag", F.sum("l_quantity"), F.sum, out_col="total_qty"
        ).collect()
    }
    assert set(two) == set(plain)
    for k in plain:
        assert abs(two[k] - plain[k]) < 1e-6


def test_salted_distinct_count_matches_plain(spark, sf_dir):
    """Exact per-key distinct count via the two-phase salted form must
    equal COUNT(DISTINCT), and its plan must finish with a count over
    rows (no collect_list/flatten funneling sets into one reducer)."""
    ev = load_table(spark, sf_dir, "events")
    plain = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    out = skew.salted_distinct_count(ev, "event_type", "user_id", salts=8)
    got = {r.event_type: r.n_distinct for r in out.collect()}
    assert got == plain
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_list" not in plan and "flatten" not in plan, plan


def test_salted_join_rejects_unsupported_how(spark, sf_dir):
    import pytest

    cu = load_table(spark, sf_dir, "customer")
    with pytest.raises(ValueError):
        skew.salted_join(cu, cu, on="c_custkey", how="full")
