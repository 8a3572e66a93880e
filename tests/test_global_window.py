"""Two-phase global windows must be bit-identical to the
single-partition Window.orderBy forms while actually running on many
partitions."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from pyblazing_spark.operators import global_window as GW
from pyblazing_spark.sources.tables import load_table


def test_global_row_number_matches_single_partition(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    got = {
        r.event_id: r.rn
        for r in GW.global_row_number(ev, ["ts", "event_id"], partitions=8).collect()
    }
    exp = {
        r.event_id: r.rn
        for r in ev.withColumn(
            "rn", F.row_number().over(W.orderBy("ts", "event_id"))
        ).collect()
    }
    assert got == exp
    # numbering is contiguous 1..n
    assert sorted(got.values()) == list(range(1, len(got) + 1))


def test_global_row_number_window_is_partitioned(spark, sf_dir):
    """The heavy per-row window must be keyed on the range-partition id
    (never an empty partition spec, which would serialize onto one task
    — AQE may still coalesce tiny test data, so assert on the plan)."""
    import io
    from contextlib import redirect_stdout

    ev = load_table(spark, sf_dir, "events")
    out = GW.global_row_number(ev, ["ts", "event_id"], partitions=8)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "__pid" in plan
    # every row_number window spec carries the partition key
    for line in [ln for ln in plan.splitlines() if "row_number()" in ln]:
        assert "__pid" in line, line


def test_global_running_sum_matches_single_partition(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    got = {
        r.event_id: round(r.running_sum, 6)
        for r in GW.global_running_sum(ev, ["ts", "event_id"], "value", partitions=8).collect()
    }
    exp_w = W.orderBy("ts", "event_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    exp = {
        r.event_id: round(r.running_sum, 6)
        for r in ev.withColumn("running_sum", F.sum("value").over(exp_w)).collect()
    }
    assert set(got) == set(exp)
    for k in got:
        assert abs(got[k] - exp[k]) < 1e-4, k


def test_global_ntile_matches_single_partition(spark, sf_dir):
    """global_ntile must reproduce ntile's exact remainder split (the
    first n-mod-k buckets take one extra row) for awkward sizes: k does
    not divide n, n < k, and n == k."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    for k, limit in ((7, None), (16, 10), (5, 5)):
        sub = ev if limit is None else ev.orderBy("event_id").limit(limit)
        got = {
            r.event_id: r.bucket
            for r in GW.global_ntile(sub, ["ts", "event_id"], k, partitions=8).collect()
        }
        exp = {
            r.event_id: r.b
            for r in sub.withColumn(
                "b", F.ntile(k).over(W.orderBy("ts", "event_id"))
            ).collect()
        }
        assert got == exp, f"k={k} limit={limit}"


def test_global_two_phase_property(spark):
    """Property check over adversarial key distributions — duplicates,
    negatives, all-equal runs, sizes around the partition count — the
    exact shapes that stress deterministic boundary sampling: every
    two-phase helper must equal its serial single-window form."""
    import random

    rnd = random.Random(42)
    for trial in range(6):
        n = rnd.choice([1, 2, 7, 33, 64])
        # heavy duplication: keys drawn from a tiny domain half the time
        dom = rnd.choice([2, 3, 1000])
        rows = [
            (i, rnd.randrange(-dom, dom), rnd.uniform(-5, 5))
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "id long, k long, v double")
        parts = rnd.choice([2, 5, 32])
        order = ["k", "id"]

        serial_rn = {
            r.id: r.rn
            for r in df.withColumn(
                "rn", F.row_number().over(W.orderBy(*order))
            ).collect()
        }
        got_rn = {
            r.id: r.rn
            for r in GW.global_row_number(df, order, partitions=parts).collect()
        }
        assert got_rn == serial_rn, f"rn trial={trial} n={n} parts={parts}"

        k = rnd.choice([1, 3, 16])
        serial_nt = {
            r.id: r.b
            for r in df.withColumn("b", F.ntile(k).over(W.orderBy(*order))).collect()
        }
        got_nt = {
            r.id: r.bucket
            for r in GW.global_ntile(df, order, k, partitions=parts).collect()
        }
        assert got_nt == serial_nt, f"ntile trial={trial} n={n} k={k}"

        serial_sum = {
            r.id: round(r.s, 6)
            for r in df.withColumn(
                "s",
                F.sum("v").over(
                    W.orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
                ),
            ).collect()
        }
        got_sum = {
            r.id: round(r.running_sum, 6)
            for r in GW.global_running_sum(df, order, "v", partitions=parts).collect()
        }
        assert got_sum == serial_sum, f"sum trial={trial}"


def test_ranked_topk_matches_full_window(spark):
    """ranked_topk (orderBy.limit -> TakeOrderedAndProject + k-row rank
    window) must equal the row_number-then-filter pattern it replaced,
    for a deterministic total order with heavy ties on the lead key."""
    rows = [(i, (i * 7) % 5, float((i * 13) % 11)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, grp long, score double")
    order = [F.desc("score"), F.col("id")]
    for k in (1, 5, 20, 300):  # incl. k > n
        exp = {
            (r.id, r.rank)
            for r in df.withColumn(
                "rank", F.row_number().over(W.orderBy(F.desc("score"), "id")).cast("int")
            )
            .where(F.col("rank") <= k)
            .collect()
        }
        got = {(r.id, r.rank) for r in GW.ranked_topk(df, k, *order).collect()}
        assert got == exp, f"k={k}"


def test_ranked_topk_plans_as_take_ordered(spark):
    """The pre-rank cut must compile to TakeOrderedAndProject (per-
    partition top-k), never a full-input single-task window."""
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 17).alias("score")
    )
    out = GW.ranked_topk(df, 10, F.desc("score"), F.col("id"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_range_bucket_huge_int64_with_nulls(spark):
    """Boundary sampling must keep int64 keys EXACT when NULLs are
    present (ADVICE r5 #3: toPandas coerced nullable int64 to float64,
    losing precision above 2^53 and shifting boundary literals). The
    Arrow path keeps adjacent huge keys distinct, so global_row_number
    still matches the serial window exactly."""
    base = 2**60
    rows = [(i, base + i if i % 7 else None) for i in range(400)]
    df = spark.createDataFrame(rows, "id bigint, k bigint").repartition(8)
    serial = {
        r.id: r.rn
        for r in df.withColumn(
            "rn", F.row_number().over(W.orderBy("k", "id"))
        ).collect()
    }
    got = {
        r.id: r.rn
        for r in GW.global_row_number(df, ["k", "id"], partitions=8).collect()
    }
    assert got == serial
    # and the boundary literals themselves are exact integers > 2^53
    pid = GW._range_bucket(df, ["k", "id"], partitions=8)
    n_buckets = df.select(pid.alias("p")).distinct().count()
    assert n_buckets > 1  # sampling produced real, distinct boundaries
