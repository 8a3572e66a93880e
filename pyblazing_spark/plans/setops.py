"""Set operations + sorts/limits.

Reference surface (SURVEY.md §2.5-2.6): UNION ALL (concat kernel,
``BatchUnionProcessing.cpp:1-135``), UNION DISTINCT (union +
group-by-all-columns, ``PhysicalPlanGenerator.h:252-296``), distributed
sample-based range sort (``operators/OrderBy.cpp``), LIMIT / top-k
(``BatchOrderByProcessing.h:120``, ``has_limit_only`` OrderBy.h:50).
INTERSECT / EXCEPT are absent from the reference; Spark superset.

E2E model: ``unionSuite.yaml``, ``unifyTablesSuite.yaml``,
``orderbySuite.yaml``, ``limitSuite.yaml``, ``predicatesWithNulls``.

Scale: ``orderBy`` is Spark's RangePartitioner (sample -> range
exchange -> per-partition sort -> already-merged output) — the exact
strategy the reference hand-built as
SortAndSample/Partition/MergeStream. ``orderBy().limit(n)`` becomes
TakeOrderedAndProject (per-partition top-k, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyblazing_spark.plans.registry import register
from pyblazing_spark.plans.tpch import money
from pyblazing_spark.sources.tables import load_table as T


def _high_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        T(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 8000)
        .select(F.col("c_custkey").alias("key"), F.col("c_name").alias("name"))
    )


def _urgent_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    urgent = T(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    cu = T(spark, sf_dir, "customer")
    return cu.join(urgent, cu.c_custkey == urgent.o_custkey, "left_semi").select(
        F.col("c_custkey").alias("key"), F.col("c_name").alias("name")
    )


_HIGH_SQL = """SELECT c_custkey AS key, c_name AS name
               FROM customer WHERE c_acctbal > 8000"""
_URGENT_SQL = """SELECT c_custkey AS key, c_name AS name
                 FROM customer
                 WHERE c_custkey IN (SELECT o_custkey FROM orders
                                     WHERE o_orderpriority = '1-URGENT')"""


@register(
    "setop_union_all",
    tags=("setop",),
    oracle=f"""
SELECT key, name, count(*) AS n
FROM ({_HIGH_SQL} UNION ALL {_URGENT_SQL})
GROUP BY key, name ORDER BY key
""",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (duplicate-preserving concat) with a count to expose
    multiplicity."""
    u = _high_value(spark, sf_dir).unionAll(_urgent_buyers(spark, sf_dir))
    return (
        u.groupBy("key", "name").agg(F.count(F.lit(1)).alias("n")).orderBy("key")
    )


@register(
    "setop_union_distinct",
    tags=("setop",),
    oracle=f"""
{_HIGH_SQL} UNION {_URGENT_SQL} ORDER BY key
""",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT = union + dedup (the planner-injected group-by-all
    in the reference, ``PhysicalPlanGenerator.h:252-296``)."""
    return (
        _high_value(spark, sf_dir)
        .union(_urgent_buyers(spark, sf_dir))
        .distinct()
        .orderBy("key")
    )


@register(
    "setop_intersect",
    tags=("setop",),
    oracle=f"""
{_HIGH_SQL} INTERSECT {_URGENT_SQL} ORDER BY key
""",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — not implemented anywhere in the reference
    (SURVEY.md §2.6); Spark native."""
    return (
        _high_value(spark, sf_dir)
        .intersect(_urgent_buyers(spark, sf_dir))
        .orderBy("key")
    )


@register(
    "setop_except",
    tags=("setop",),
    oracle=f"""
{_HIGH_SQL} EXCEPT {_URGENT_SQL} ORDER BY key
""",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference) — also absent from the reference."""
    return (
        _high_value(spark, sf_dir)
        .subtract(_urgent_buyers(spark, sf_dir))
        .orderBy("key")
    )


@register(
    "setop_union_typed",
    tags=("setop", "cast"),
    oracle="""
SELECT k, v FROM (
  SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS v FROM nation
  UNION ALL
  SELECT s_suppkey AS k, s_name AS v FROM supplier)
ORDER BY k, v
""",
)
def setop_union_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union across inputs with different column types (int32 vs int64) —
    the reference normalizes types in the union kernel
    (``BatchUnionProcessing.cpp`` type unification); we cast explicitly.
    """
    na = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k"), F.col("n_name").alias("v")
    )
    su = T(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("k"), F.col("s_name").alias("v")
    )
    return na.unionAll(su).orderBy("k", "v")


@register(
    "sort_multi_key_nulls",
    tags=("sort", "nulls"),
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END AS status,
       round(o_totalprice, 2) AS price
FROM orders
ORDER BY status DESC NULLS LAST, price ASC, o_orderkey
LIMIT 400
""",
)
def sort_multi_key_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null ordering (reference parses
    null_order per key, ``operators/OrderBy.h:27``); NULLs synthesized."""
    od = T(spark, sf_dir, "orders")
    return (
        od.select(
            "o_orderkey",
            F.when(F.col("o_orderstatus") == "P", None)
            .otherwise(F.col("o_orderstatus"))
            .alias("status"),
            money(F.col("o_totalprice")).alias("price"),
        )
        .orderBy(
            F.col("status").desc_nulls_last(),
            F.col("price").asc(),
            F.col("o_orderkey"),
        )
        .limit(400)
    )


@register(
    "sort_limit_offset",
    tags=("sort", "limit", "offset"),
    oracle="""
SELECT p_partkey, p_name, p_size
FROM part
ORDER BY p_size DESC, p_partkey
LIMIT 50 OFFSET 25
""",
)
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT + OFFSET (offset is new surface vs the reference,
    whose LimitKernel has no offset)."""
    pa = T(spark, sf_dir, "part")
    return (
        pa.select("p_partkey", "p_name", "p_size")
        .orderBy(F.desc("p_size"), "p_partkey")
        .offset(25)
        .limit(50)
    )


@register(
    "limit_only",
    tags=("limit",),
    oracle="""
SELECT count(*) AS n, CAST(min(x) AS BIGINT) AS lo, CAST(max(x) AS BIGINT) AS hi
FROM (SELECT l_orderkey AS x FROM lineitem ORDER BY l_orderkey LIMIT 100)
""",
)
def limit_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT pushdown: the reference fuses LIMIT into the scan
    (``graph.cpp:303-338``); Spark's LocalLimit does the same. Wrapped in
    an aggregate so the comparison is deterministic."""
    li = T(spark, sf_dir, "lineitem")
    top = li.select(F.col("l_orderkey").alias("x")).orderBy("x").limit(100)
    return top.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("x").alias("lo"),
        F.max("x").alias("hi"),
    )


@register(
    "setop_bag_semantics",
    tags=("setop", "except_all", "intersect_all"),
    oracle="""
WITH a AS (SELECT o_custkey AS k FROM orders WHERE o_totalprice > 150000),
 b AS (SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'),
 ia AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b),
 ea AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
SELECT 'intersect_all' AS op,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT k) AS BIGINT) AS n_keys,
       CAST(sum(k) AS BIGINT) AS key_sum
FROM ia
UNION ALL
SELECT 'except_all', CAST(count(*) AS BIGINT),
       CAST(count(DISTINCT k) AS BIGINT), CAST(sum(k) AS BIGINT)
FROM ea
ORDER BY op
""",
)
def setop_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — bag (multiset) semantics, where a
    key occurring m times on the left and n on the right survives
    min(m,n) / max(0, m-n) times (the reference's Calcite surface has
    only the DISTINCT set forms; Spark superset). ``n_rows`` vs
    ``n_keys`` proves the multiplicities, not just membership.

    Scale: Spark plans both as a single hash aggregation computing
    per-key counts on each side then replicating — one shuffle per
    input, no join."""
    o = T(spark, sf_dir, "orders")
    a = o.where(F.col("o_totalprice") > 150000).select(F.col("o_custkey").alias("k"))
    b = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("k")
    )
    def roll(df: DataFrame, op: str) -> DataFrame:
        return df.agg(
            F.lit(op).alias("op"),
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("k").alias("n_keys"),
            F.sum("k").alias("key_sum"),
        ).select("op", "n_rows", "n_keys", "key_sum")
    return (
        roll(a.intersectAll(b), "intersect_all")
        .unionAll(roll(a.exceptAll(b), "except_all"))
        .orderBy("op")
    )
