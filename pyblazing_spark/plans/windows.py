"""Window-function suite — reference support (SURVEY.md §2.4):
ROW_NUMBER, LAG, LEAD, FIRST_VALUE, LAST_VALUE, MIN, MAX, COUNT, SUM, AVG
over ``PARTITION BY .. ORDER BY ..`` with ROWS frames
(``BatchWindowFunctionProcessing.cpp:33-400``), plus everything the
reference explicitly throws on and Spark gives free: RANK/DENSE_RANK
(TODO at ``BatchWindowFunctionProcessing.cpp:60``), RANGE frames
(``PhysicalPlanGenerator.h:304-306``), multiple different OVER clauses in
one SELECT (``:300-302``), NTILE/PERCENT_RANK/CUME_DIST.

E2E model: ``windowFunctionSuite.yaml``, ``windowNoPartitionSuite.yaml``.

Scale: partitioned windows shuffle once on the partition key then sort
within partitions. The unpartitioned variants collapse to a single
partition — correct but serial (same semantics the reference implemented
via overlap kernels); at 100 TB you restructure to a partitioned window or
a global agg join instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pyblazing_spark.plans.registry import register
from pyblazing_spark.plans.tpch import money, ratio
from pyblazing_spark.sources.tables import load_table as T


@register(
    "win_row_number_topk",
    tags=("window", "topk"),
    oracle="""
SELECT * FROM (
  SELECT c_mktsegment, c_custkey, round(c_acctbal, 2) AS bal,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer)
WHERE rn <= 3
ORDER BY c_mktsegment, rn
""",
)
def win_row_number_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per group via ROW_NUMBER — the canonical top-k-per-key plan
    (rank inside each hash partition; no global sort)."""
    cu = T(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.col("c_custkey"))
    return (
        cu.select(
            "c_mktsegment",
            "c_custkey",
            money(F.col("c_acctbal")).alias("bal"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
        .orderBy("c_mktsegment", "rn")
    )


@register(
    "win_rank_dense",
    tags=("window", "rank"),
    oracle="""
SELECT p_brand, p_partkey,
       rank()         OVER (PARTITION BY p_brand ORDER BY p_size)       AS rnk,
       dense_rank()   OVER (PARTITION BY p_brand ORDER BY p_size)       AS drnk,
       CAST(ntile(4)  OVER (PARTITION BY p_brand
                            ORDER BY p_size, p_partkey) AS INTEGER)     AS quartile,
       round(percent_rank() OVER (PARTITION BY p_brand ORDER BY p_size), 4) AS prnk
FROM part
ORDER BY p_brand, p_partkey
""",
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK / DENSE_RANK / NTILE / PERCENT_RANK — all unsupported in the
    reference (throws, ``BatchWindowFunctionProcessing.cpp:60``); Spark
    superset. Ties on p_size exercise rank-vs-dense-rank divergence."""
    pa = T(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy("p_size")
    wt = W.partitionBy("p_brand").orderBy("p_size", "p_partkey")
    return pa.select(
        "p_brand",
        "p_partkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(wt).alias("quartile"),
        ratio(F.percent_rank().over(w)).alias("prnk"),
    ).orderBy("p_brand", "p_partkey")


@register(
    "win_lag_lead",
    tags=("window", "lag"),
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       lag(o_orderkey)     OVER w AS prev_order,
       lead(o_orderkey)    OVER w AS next_order,
       lag(o_orderkey, 2)  OVER w AS prev2_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderdate, o_orderkey
LIMIT 500
""",
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD with offsets (reference window aggs
    ``expression_utils.hpp:204-214``)."""
    od = T(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        od.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.lag("o_orderkey").over(w).alias("prev_order"),
            F.lead("o_orderkey").over(w).alias("next_order"),
            F.lag("o_orderkey", 2).over(w).alias("prev2_order"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
        .limit(500)
    )


@register(
    "win_running_sum",
    bench=True,
    tags=("window", "frame"),
    oracle="""
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW), 2) AS running_spend,
       CAST(count(*) OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS nth_order
FROM orders
ORDER BY o_custkey, nth_order
LIMIT 500
""",
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative SUM/COUNT over a ROWS frame (reference
    ``cudf::grouped_rolling_window``,
    ``BatchWindowFunctionProcessing.cpp:136-143``)."""
    od = T(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        od.select(
            "o_custkey",
            "o_orderkey",
            money(F.sum("o_totalprice").over(w)).alias("running_spend"),
            F.count(F.lit(1)).over(w).alias("nth_order"),
        )
        .orderBy("o_custkey", "nth_order")
        .limit(500)
    )


@register(
    "win_sliding_frame",
    tags=("window", "frame"),
    oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber,
       round(avg(l_quantity) OVER (PARTITION BY l_suppkey
                                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
           AS avg_qty_3,
       round(min(l_quantity) OVER (PARTITION BY l_suppkey
                                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                                   ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 2)
           AS min_neighbor,
       round(max(l_quantity) OVER (PARTITION BY l_suppkey
                                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                                   ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 2)
           AS max_neighbor
FROM lineitem
WHERE l_suppkey <= 3
ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber
LIMIT 500
""",
)
def win_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded sliding ROWS frames, preceding and following (reference
    frame-bound parser ``expression_utils.cpp:773-822``)."""
    li = T(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 3)
    order = [F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber")]
    w3 = W.partitionBy("l_suppkey").orderBy(*order).rowsBetween(-2, 0)
    wn = W.partitionBy("l_suppkey").orderBy(*order).rowsBetween(-1, 1)
    return (
        li.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            ratio(F.avg("l_quantity").over(w3)).alias("avg_qty_3"),
            money(F.min("l_quantity").over(wn)).alias("min_neighbor"),
            money(F.max("l_quantity").over(wn)).alias("max_neighbor"),
        )
        .orderBy("l_suppkey", *order)
        .limit(500)
    )


@register(
    "win_first_last",
    tags=("window", "frame"),
    oracle="""
SELECT o_custkey, o_orderkey,
       first_value(o_orderkey) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND UNBOUNDED FOLLOWING) AS first_order,
       last_value(o_orderkey)  OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND UNBOUNDED FOLLOWING) AS last_order
FROM orders
ORDER BY o_custkey, o_orderkey
LIMIT 500
""",
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE/LAST_VALUE over the whole partition (the reference
    computed these via a groupby + join,
    ``BatchWindowFunctionProcessing.cpp:79-135``)."""
    od = T(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        od.select(
            "o_custkey",
            "o_orderkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(w).alias("last_order"),
        )
        .orderBy("o_custkey", "o_orderkey")
        .limit(500)
    )


@register(
    "win_range_frame",
    tags=("window", "range"),
    oracle="""
SELECT s_suppkey, round(s_acctbal, 2) AS bal,
       CAST(count(*) OVER (ORDER BY s_acctbal
                           RANGE BETWEEN 500 PRECEDING
                                AND 500 FOLLOWING) AS BIGINT) AS n_near
FROM supplier
ORDER BY s_suppkey
""",
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering — the reference throws on RANGE
    (``PhysicalPlanGenerator.h:304-306``); Spark supports value ranges."""
    su = T(spark, sf_dir, "supplier")
    w = W.orderBy("s_acctbal").rangeBetween(-500, 500)
    return su.select(
        "s_suppkey",
        money(F.col("s_acctbal")).alias("bal"),
        F.count(F.lit(1)).over(w).alias("n_near"),
    ).orderBy("s_suppkey")


@register(
    "win_no_partition",
    tags=("window", "unpartitioned"),
    oracle="""
SELECT event_id,
       row_number() OVER (ORDER BY ts, event_id) AS seq,
       round(sum(value) OVER (ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW), 2) AS running_value
FROM events
ORDER BY seq
LIMIT 300
""",
)
def win_no_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-less window — the case the reference built dedicated
    overlap kernels for (``LogicalGenerateOverlaps``,
    ``BatchWindowFunctionProcessing.h:81-141``). Spark runs it in a single
    partition: identical semantics; at scale, prefer a partitioned window.
    """
    ev = T(spark, sf_dir, "events")
    w = W.orderBy("ts", "event_id")
    wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        ev.select(
            "event_id",
            F.row_number().over(w).alias("seq"),
            money(F.sum("value").over(wsum)).alias("running_value"),
        )
        .orderBy("seq")
        .limit(300)
    )


@register(
    "win_global_scaled",
    tags=("window", "unpartitioned", "scale"),
    oracle="""
SELECT event_id,
       row_number() OVER (ORDER BY ts, event_id) AS seq,
       round(sum(value) OVER (ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW), 2) AS running_value
FROM events
ORDER BY seq
LIMIT 300
""",
)
def win_global_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME unpartitioned window as ``win_no_partition``, computed on
    the scale path: ONE fused two-phase pass producing range-bucketed row
    numbers and prefix sums together
    (:func:`pyblazing_spark.operators.global_window.global_prefix_stats`)
    — full parallelism, no single-task collapse. The oracle is identical
    to ``win_no_partition``'s, so the driver proves the parallel form
    equals the serial semantics."""
    from pyblazing_spark.operators.global_window import global_prefix_stats

    ev = T(spark, sf_dir, "events").select("event_id", "ts", "value")
    rs = global_prefix_stats(
        ev, ["ts", "event_id"], "value", rn_col="seq", sum_col="__rsum"
    )
    return (
        rs.select(
            "event_id",
            F.col("seq").cast("long").alias("seq"),
            money(F.col("__rsum")).alias("running_value"),
        )
        .orderBy("seq")
        .limit(300)
    )


@register(
    "win_multi_over",
    tags=("window", "multi"),
    oracle="""
SELECT c_custkey,
       row_number() OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal DESC, c_custkey) AS seg_rank,
       row_number() OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal DESC, c_custkey) AS nat_rank,
       round(avg(c_acctbal) OVER (PARTITION BY c_mktsegment), 4) AS seg_avg
FROM customer
ORDER BY c_custkey
LIMIT 300
""",
)
def win_multi_over(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple DIFFERENT window specs in one SELECT — the reference
    throws on this (``PhysicalPlanGenerator.h:300-302``); Spark plans one
    Window node per spec."""
    cu = T(spark, sf_dir, "customer")
    w_seg = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    w_nat = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    w_avg = W.partitionBy("c_mktsegment")
    return (
        cu.select(
            "c_custkey",
            F.row_number().over(w_seg).alias("seg_rank"),
            F.row_number().over(w_nat).alias("nat_rank"),
            ratio(F.avg("c_acctbal").over(w_avg)).alias("seg_avg"),
        )
        .orderBy("c_custkey")
        .limit(300)
    )


@register(
    "win_ntile_pct",
    tags=("window", "ranking"),
    oracle="""
SELECT o_orderkey,
       ntile(4) OVER w                        AS quartile,
       round(percent_rank() OVER w + 1e-9, 4) AS pct_rank,
       round(cume_dist() OVER w + 1e-9, 4)    AS cume
FROM orders
WHERE o_orderdate >= TIMESTAMP '1998-01-01'
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
ORDER BY o_orderkey
LIMIT 500
""",
)
def win_ntile_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE / PERCENT_RANK / CUME_DIST — all absent from the reference
    (SURVEY.md §2.4 limitations), native in Spark."""
    od = T(spark, sf_dir, "orders").where(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        od.select(
            "o_orderkey",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w) + 1e-9, 4).alias("pct_rank"),
            F.round(F.cume_dist().over(w) + 1e-9, 4).alias("cume"),
        )
        .orderBy("o_orderkey")
        .limit(500)
    )


@register(
    "win_ignore_nulls",
    tags=("window", "ignore-nulls", "events"),
    oracle="""
SELECT user_id, event_id, ts,
       round(coalesce(last_value(pval IGNORE NULLS) OVER w_upto, 0), 2)  AS carried_purchase,
       round(last_value(pval IGNORE NULLS) OVER w_before, 2)             AS prev_purchase
FROM (SELECT user_id, event_id, ts,
             CASE WHEN event_type = 'purchase' THEN value END AS pval
      FROM events)
WINDOW
  w_upto   AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
  w_before AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
ORDER BY user_id, ts, event_id
LIMIT 1000
""",
)
def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS carry-forward — the last-observation idiom (absent
    from the reference's window set, SURVEY.md §2.4): at every event,
    the user's most recent purchase value (including the current row)
    and the strictly-previous one (``lag .. IGNORE NULLS`` expressed as
    ``last(ignorenulls)`` over an UNBOUNDED..1-PRECEDING frame — the
    frame form is engine-portable). One shuffle on user_id."""
    ev = T(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts",
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("pval"),
    )
    base = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_upto = base.rowsBetween(W.unboundedPreceding, W.currentRow)
    w_before = base.rowsBetween(W.unboundedPreceding, -1)
    return (
        ev.select(
            "user_id", "event_id", "ts",
            F.round(
                F.coalesce(F.last("pval", ignorenulls=True).over(w_upto), F.lit(0.0)), 2
            ).alias("carried_purchase"),
            F.round(F.last("pval", ignorenulls=True).over(w_before), 2).alias(
                "prev_purchase"
            ),
        )
        .orderBy("user_id", "ts", "event_id")
        .limit(1000)
    )


@register(
    "win_cume_dist",
    tags=("window", "rank"),
    oracle="""
SELECT c_custkey,
       round(cume_dist() OVER w + 1e-9, 4)    AS cd,
       round(percent_rank() OVER w + 1e-9, 4) AS pr
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
ORDER BY c_custkey
LIMIT 500
""",
)
def win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUME_DIST alongside PERCENT_RANK (both absent from the reference,
    SURVEY.md §2.4) over a deterministic total order — the ratio
    convention (round 4dp, +1e-9 nudge) applies on both sides."""
    cu = T(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        cu.select(
            "c_custkey",
            F.round(F.cume_dist().over(w) + 1e-9, 4).alias("cd"),
            F.round(F.percent_rank().over(w) + 1e-9, 4).alias("pr"),
        )
        .orderBy("c_custkey")
        .limit(500)
    )


@register(
    "win_median_frame",
    tags=("window", "median", "frame"),
    oracle="""
SELECT o_custkey, o_orderkey,
       round(median(o_totalprice)
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) + 1e-9, 2)
         AS rolling_median
FROM orders
WHERE o_custkey < 20
ORDER BY o_custkey, o_orderkey
""",
)
def win_median_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEDIAN over a sliding 3-row frame per customer — an exact
    order-statistic window (robust rolling center, unlike avg which one
    outlier order drags). Spark refuses aggregate ``median`` with a
    window frame (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so the
    frame median is composed EXACTLY from two lags: for 3 values,
    median = sum - greatest - least; 2-value frames average; 1-value
    frames pass through. DuckDB runs the real framed ``median``, so the
    match proves the composition implements the order statistic.

    Scale: one shuffle on the partition key; the lags are O(1) per row —
    same plan budget as a rolling sum, and cheaper than a true framed
    median would be (no per-row sort)."""
    o = T(spark, sf_dir, "orders").where(F.col("o_custkey") < 20)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    v, l1, l2 = F.col("o_totalprice"), F.lag("o_totalprice", 1).over(w), F.lag(
        "o_totalprice", 2
    ).over(w)
    med3 = v + l1 + l2 - F.greatest(v, l1, l2) - F.least(v, l1, l2)
    rolling = (
        F.when(l1.isNull(), v)
        .when(l2.isNull(), (v + l1) / 2)
        .otherwise(med3)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round(rolling + 1e-9, 2).alias("rolling_median"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "win_range_interval",
    tags=("window", "range", "interval", "temporal"),
    oracle="""
WITH u AS (SELECT user_id, ts, event_id, value FROM events WHERE user_id < 15)
SELECT user_id, event_id,
       CAST(count(*) OVER w AS BIGINT)          AS n_last_hour,
       round(sum(value) OVER w + 1e-4, 2)       AS value_last_hour
FROM u
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
""",
)
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: per event, the count and value-sum of
    the same user's events in the trailing hour — the rolling-window
    telemetry shape where the frame is defined by EVENT TIME, not row
    position (two events a second apart share almost their whole frame;
    a gap empties it). The reference engine throws on all RANGE frames;
    Spark superset. Peer rows (equal ts) are included by RANGE
    semantics in both engines, so ties cannot diverge.

    Scale: one shuffle on user_id; Spark evaluates the interval frame
    with a sliding two-pointer over each partition — O(n) per
    partition, same budget as a rows frame."""
    from pyblazing_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        """
WITH u AS (SELECT user_id, ts, event_id, value FROM events WHERE user_id < 15)
SELECT user_id, event_id,
       count(*) OVER w                     AS n_last_hour,
       round(sum(value) OVER w + 1e-4, 2)  AS value_last_hour
FROM u
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""
    )


@register(
    "win_distinct_frame",
    tags=("window", "frame", "distinct"),
    oracle="""
SELECT o_orderkey, o_custkey,
       count(DISTINCT o_orderpriority) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS n_distinct_prio
FROM orders
ORDER BY o_orderkey
""",
)
def win_distinct_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregate over a sliding ROWS frame — per customer, how
    many distinct order priorities the trailing 5 orders span. Spark has
    no native ``count(DISTINCT) OVER``; the equivalent plan is
    ``size(array_distinct(collect_list(x) OVER frame))`` — collect_list
    and array_distinct are JVM built-ins (no interpreted lambda), and the
    frame bounds the per-row array at 5 elements, so window state stays
    O(frame), not O(partition). The reference throws on any DISTINCT
    window aggregate (BatchWindowFunctionProcessing.cpp's kernel list);
    DuckDB executes it natively, giving a full-equality oracle."""
    orders = T(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-4, 0)
    )
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.size(F.array_distinct(F.collect_list("o_orderpriority").over(w)))
            .cast("long")
            .alias("n_distinct_prio"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "win_running_distinct",
    tags=("window", "distinct", "cumulative", "scale"),
    oracle="""
WITH d AS (SELECT user_id, date_trunc('day', ts) AS day FROM events),
 f AS (SELECT user_id, min(day) AS first_day FROM d GROUP BY user_id),
 nu AS (SELECT first_day AS day, CAST(count(*) AS BIGINT) AS n_new
        FROM f GROUP BY first_day),
 days AS (SELECT DISTINCT day FROM d)
SELECT day,
       CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new_users,
       CAST(sum(COALESCE(n_new, 0)) OVER (
         ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS cum_distinct_users
FROM days LEFT JOIN nu USING (day)
ORDER BY day
""",
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative DISTINCT-user curve (running ``count(DISTINCT)`` over
    an ordered window) — the audience-growth query. Spark has no
    ``count(DISTINCT) OVER (ORDER BY ...)``, and the naive emulation
    (collect_set over an unbounded frame) holds O(|users|) state PER
    ROW; the scalable decomposition is first-occurrence marking:
    min(day) per user (ONE hash shuffle on user_id, partial-agg
    friendly), roll new-user counts to day grain, then a running sum
    over the DAY-GRAIN frame — the unpartitioned window runs over a
    metadata-sized table (one row per day), never the fact. Days with
    zero new users still appear (day spine left join), pinning the
    COALESCE(0) carry behavior. DuckDB executes the same decomposition,
    so the oracle is full-equality. The reference throws on every
    DISTINCT window aggregate (BatchWindowFunctionProcessing.cpp's
    kernel list has none)."""
    ev = T(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("fday"))
    new_per_day = first.groupBy(F.col("fday").alias("day")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    days = ev.select("day").distinct()
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        days.join(new_per_day, "day", "left")
        .select("day", F.coalesce(F.col("n_new"), F.lit(0)).alias("__n"))
        .select(
            "day",
            F.col("__n").cast("long").alias("n_new_users"),
            F.sum("__n").over(w).cast("long").alias("cum_distinct_users"),
        )
        .orderBy("day")
    )
