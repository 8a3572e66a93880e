"""Join operator matrix — every join type the reference executes
(``BatchJoinProcessing.h:17-21``: inner/left/right/full/cross; non-equi via
``split_inequality_join_into_join_and_filter`` ``BatchJoinProcessing.h:37``;
``IS NOT DISTINCT FROM`` via ``expression_utils.hpp:92``) plus the
semi/anti joins Spark adds natively (the reference only reached them through
Calcite decorrelation — SURVEY.md §2.2).

E2E model: ``innerJoinsSuite.yaml``, ``leftOuterJoinsSuite.yaml``,
``rightOuterJoinSuite.yaml``, ``fullOuterJoinsSuite.yaml``,
``crossJoinsSuite.yaml``, ``nonEquiJoinsSuite.yaml`` (18 queries).

Scale stance: dimension sides broadcast (explicit hint or AQE); fact-fact
joins shuffle on the join key only after filters prune; the pure-inequality
join keeps the small side broadcast so the cross product never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyblazing_spark.plans.registry import register
from pyblazing_spark.plans.tpch import money
from pyblazing_spark.sources.tables import load_table as T


@register(
    "join_inner",
    tags=("join",),
    oracle="""
SELECT n_name, r_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
ORDER BY n_name, r_name
""",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join chain through two broadcast dimensions."""
    cu = T(spark, sf_dir, "customer")
    na = F.broadcast(T(spark, sf_dir, "nation"))
    re = F.broadcast(T(spark, sf_dir, "region"))
    return (
        cu.join(na, cu.c_nationkey == na.n_nationkey)
        .join(re, na.n_regionkey == re.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(F.count(F.lit(1)).alias("n_cust"), money(F.sum("c_acctbal")).alias("bal"))
        .orderBy("n_name", "r_name")
    )


@register(
    "join_left",
    tags=("join", "outer"),
    oracle="""
SELECT c_custkey, c_name, o.o_orderkey, round(o.o_totalprice, 2) AS totalprice
FROM customer c
LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
       ON c.c_custkey = o.o_custkey
ORDER BY c_custkey, o_orderkey NULLS FIRST
LIMIT 200
""",
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join where the right side is filtered -> real NULL rows."""
    cu = T(spark, sf_dir, "customer")
    od = T(spark, sf_dir, "orders").where(F.col("o_totalprice") > 450000)
    return (
        cu.join(od, cu.c_custkey == od.o_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            money(F.col("o_totalprice")).alias("totalprice"),
        )
        .orderBy(F.col("c_custkey"), F.col("o_orderkey").asc_nulls_first())
        .limit(200)
    )


@register(
    "join_right",
    tags=("join", "outer"),
    oracle="""
SELECT s.s_suppkey, s.s_name, li.l_orderkey, li.l_linenumber
FROM (SELECT * FROM lineitem WHERE l_quantity >= 49) li
RIGHT JOIN supplier s ON li.l_suppkey = s.s_suppkey
ORDER BY s_suppkey, l_orderkey NULLS FIRST, l_linenumber NULLS FIRST
LIMIT 300
""",
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (reference executes as swapped left:
    ``BatchJoinProcessing.cpp:424-433``)."""
    li = T(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 49)
    su = T(spark, sf_dir, "supplier")
    return (
        li.join(su, li.l_suppkey == su.s_suppkey, "right")
        .select("s_suppkey", "s_name", "l_orderkey", "l_linenumber")
        .orderBy(
            F.col("s_suppkey"),
            F.col("l_orderkey").asc_nulls_first(),
            F.col("l_linenumber").asc_nulls_first(),
        )
        .limit(300)
    )


@register(
    "join_full",
    tags=("join", "outer"),
    oracle="""
SELECT a.k AS left_k, a.n_high_bal, b.k AS right_k, b.n_big_orders
FROM (SELECT c_nationkey AS k, count(*) AS n_high_bal
      FROM customer WHERE c_acctbal > 8000 GROUP BY c_nationkey) a
FULL JOIN (SELECT o_custkey % 25 AS k, count(*) AS n_big_orders
           FROM orders WHERE o_totalprice > 450000 GROUP BY o_custkey % 25) b
       ON a.k = b.k
ORDER BY left_k NULLS FIRST, right_k NULLS FIRST
""",
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregated sides with partial key overlap."""
    cu = T(spark, sf_dir, "customer")
    od = T(spark, sf_dir, "orders")
    a = (
        cu.where(F.col("c_acctbal") > 8000)
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_high_bal"))
    )
    b = (
        od.where(F.col("o_totalprice") > 450000)
        .groupBy((F.col("o_custkey") % 25).alias("k"))
        .agg(F.count(F.lit(1)).alias("n_big_orders"))
    )
    return (
        a.join(b, a.k == b.k, "full")
        .select(
            a.k.alias("left_k"),
            "n_high_bal",
            b.k.alias("right_k"),
            "n_big_orders",
        )
        .orderBy(F.col("left_k").asc_nulls_first(), F.col("right_k").asc_nulls_first())
    )


@register(
    "join_cross",
    tags=("join", "cross"),
    oracle="""
SELECT r_name, n_name
FROM region CROSS JOIN nation
ORDER BY r_name, n_name
""",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join (reference ``cudf::cross_join``,
    ``BatchJoinProcessing.cpp:397-445``). Broadcast-nested-loop in Spark."""
    re = T(spark, sf_dir, "region")
    na = T(spark, sf_dir, "nation")
    return re.crossJoin(na).select("r_name", "n_name").orderBy("r_name", "n_name")


@register(
    "join_semi",
    tags=("join", "semi"),
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
ORDER BY c_custkey
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join — native in Spark, only reachable via Calcite
    decorrelation in the reference (SURVEY.md §2.2)."""
    cu = T(spark, sf_dir, "customer")
    od = T(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return (
        cu.join(od, cu.c_custkey == od.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_anti",
    tags=("join", "anti"),
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
ORDER BY c_custkey
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS)."""
    cu = T(spark, sf_dir, "customer")
    od = T(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return (
        cu.join(od, cu.c_custkey == od.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_nonequi_mixed",
    tags=("join", "nonequi"),
    oracle="""
SELECT l_orderkey, l_linenumber, p_partkey, round(l_extendedprice, 2) AS price,
       round(p_retailprice, 2) AS retail
FROM lineitem JOIN part
  ON l_partkey = p_partkey AND l_extendedprice < 2 * p_retailprice
WHERE l_quantity <= 2
ORDER BY l_orderkey, l_linenumber
""",
)
def join_nonequi_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + inequality condition: the reference splits this into
    hash-join + post-filter (``split_inequality_join_into_join_and_filter``,
    examples ``BatchJoinProcessing.cpp:120-145``); Catalyst performs the
    same split automatically."""
    li = T(spark, sf_dir, "lineitem").where(F.col("l_quantity") <= 2)
    pa = F.broadcast(T(spark, sf_dir, "part"))
    return (
        li.join(
            pa,
            (li.l_partkey == pa.p_partkey)
            & (li.l_extendedprice < 2 * pa.p_retailprice),
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "p_partkey",
            money(F.col("l_extendedprice")).alias("price"),
            money(F.col("p_retailprice")).alias("retail"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "join_nonequi_pure",
    tags=("join", "nonequi", "cross"),
    oracle="""
SELECT a.r_regionkey AS lo, b.r_regionkey AS hi
FROM region a JOIN region b ON a.r_regionkey < b.r_regionkey
ORDER BY lo, hi
""",
)
def join_nonequi_pure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-inequality join — legal only as cross+filter in the reference
    (``BatchJoinProcessing.cpp:161,240``); Spark runs it as a
    broadcast-nested-loop join with the predicate inline."""
    a = T(spark, sf_dir, "region").alias("a")
    b = T(spark, sf_dir, "region").alias("b")
    return (
        a.join(b, F.col("a.r_regionkey") < F.col("b.r_regionkey"))
        .select(F.col("a.r_regionkey").alias("lo"), F.col("b.r_regionkey").alias("hi"))
        .orderBy("lo", "hi")
    )


@register(
    "join_null_safe",
    tags=("join", "nulls"),
    oracle="""
WITH a AS (SELECT n_nationkey, CASE WHEN n_regionkey = 2 THEN NULL
                                    ELSE n_regionkey END AS rk FROM nation),
     b AS (SELECT r_regionkey, CASE WHEN r_regionkey = 2 THEN NULL
                                    ELSE r_regionkey END AS rk FROM region)
SELECT n_nationkey, r_regionkey
FROM a JOIN b ON a.rk IS NOT DISTINCT FROM b.rk
ORDER BY n_nationkey, r_regionkey NULLS FIRST
""",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``IS NOT DISTINCT FROM`` equality (reference
    ``expression_utils.hpp:92``, ``FilterRemoveIsNotDistinctFromRule``) =
    Spark's null-safe ``<=>``. NULL keys synthesized so NULL<=>NULL rows
    actually appear."""
    na = T(spark, sf_dir, "nation").select(
        "n_nationkey",
        F.when(F.col("n_regionkey") == 2, None).otherwise(F.col("n_regionkey")).alias("rk"),
    )
    re = T(spark, sf_dir, "region").select(
        "r_regionkey",
        F.when(F.col("r_regionkey") == 2, None).otherwise(F.col("r_regionkey")).alias("rk"),
    )
    return (
        na.join(re, na.rk.eqNullSafe(re.rk))
        .select("n_nationkey", "r_regionkey")
        .orderBy(F.col("n_nationkey"), F.col("r_regionkey").asc_nulls_first())
    )
