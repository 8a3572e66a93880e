"""Nested-query and CTE parity suite, mirroring the reference's
``nestedQueriesSuite.yaml`` and ``commonTableExpressionsSuite.yaml``
(SURVEY.md §5). The reference relies on Calcite to decorrelate every
subquery into joins before its engine sees the plan (SURVEY.md §2.2);
Spark's Catalyst does the same (RewriteCorrelatedScalarSubquery,
RewritePredicateSubquery), so the DataFrame forms below spell out the
decorrelated plan explicitly while the oracle states the subquery form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyblazing_spark.plans.registry import register
from pyblazing_spark.plans.tpch import money, ratio, ts
from pyblazing_spark.sources.tables import load_table as T


@register(
    "nested_in",
    tags=("nested", "in", "semi"),
    oracle="""
SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
  AND o_orderdate >= TIMESTAMP '1997-01-01'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def nested_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) -> left_semi join (null-free key, so semantics are
    exactly semi-join)."""
    od = T(spark, sf_dir, "orders").where(F.col("o_orderdate") >= ts("1997-01-01"))
    cu = T(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    return (
        od.join(cu, od.o_custkey == cu.c_custkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), money(F.sum("o_totalprice")).alias("total"))
        .orderBy("o_orderpriority")
    )


@register(
    "nested_not_in",
    tags=("nested", "in", "anti"),
    oracle="""
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_totalprice > 300000)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def nested_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN (subquery) -> left_anti join. NOTE: o_custkey is non-null
    in this schema, so anti-join equals NOT IN; with nullable keys SQL
    NOT IN would need the null-aware variant (Spark plans
    NullAwareAntiJoin automatically for the SQL form)."""
    cu = T(spark, sf_dir, "customer")
    big = T(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return (
        cu.join(big, cu.c_custkey == big.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@register(
    "nested_scalar_select",
    tags=("nested", "scalar-subquery"),
    oracle="""
SELECT c_mktsegment,
       round(avg(c_acctbal), 4) AS seg_avg,
       round(avg(c_acctbal) - (SELECT avg(c_acctbal) FROM customer), 4)
           AS delta_vs_global
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def nested_scalar_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in the SELECT list -> one-row
    broadcast cross join."""
    cu = T(spark, sf_dir, "customer")
    glob = cu.agg(F.avg("c_acctbal").alias("g"))
    return (
        cu.groupBy("c_mktsegment")
        .agg(F.avg("c_acctbal").alias("a"))
        .crossJoin(F.broadcast(glob))
        .select(
            "c_mktsegment",
            ratio(F.col("a")).alias("seg_avg"),
            ratio(F.col("a") - F.col("g")).alias("delta_vs_global"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "nested_correlated_scalar",
    tags=("nested", "scalar-subquery", "correlated"),
    oracle="""
SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                   WHERE c2.c_nationkey = customer.c_nationkey)
ORDER BY c_custkey
""",
)
def nested_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (above-nation-average customers) ->
    decorrelated per-key aggregate joined back on the correlation key."""
    cu = T(spark, sf_dir, "customer")
    per_nation = cu.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.avg("c_acctbal").alias("nation_avg")
    )
    return (
        cu.join(F.broadcast(per_nation), cu.c_nationkey == F.col("nk"))
        .where(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_name", money(F.col("c_acctbal")).alias("acctbal"))
        .orderBy("c_custkey")
    )


@register(
    "nested_derived_table",
    tags=("nested", "from-subquery"),
    oracle="""
SELECT band, count(*) AS n_orders, round(avg(o_totalprice), 4) AS avg_price
FROM (SELECT o_totalprice,
             CASE WHEN o_totalprice < 50000 THEN 'low'
                  WHEN o_totalprice < 200000 THEN 'mid'
                  ELSE 'high' END AS band
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01') t
GROUP BY band
ORDER BY band
""",
)
def nested_derived_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation over a derived table (inline FROM subquery)."""
    od = T(spark, sf_dir, "orders").where(F.col("o_orderdate") >= ts("1996-01-01"))
    banded = od.select(
        "o_totalprice",
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 200000, "mid")
        .otherwise("high")
        .alias("band"),
    )
    return (
        banded.groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_orders"), ratio(F.avg("o_totalprice")).alias("avg_price"))
        .orderBy("band")
    )


@register(
    "nested_cte_chain",
    tags=("nested", "cte"),
    oracle="""
WITH seg AS (
  SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 0),
 big AS (
  SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 100000),
 joined AS (
  SELECT c_mktsegment, o_totalprice FROM seg JOIN big ON c_custkey = o_custkey)
SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM joined
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def nested_cte_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three chained CTEs (commonTableExpressionsSuite shape) — in the
    DataFrame API a CTE is simply a named intermediate DataFrame; Catalyst
    inlines and optimizes across the chain exactly like WITH."""
    seg = T(spark, sf_dir, "customer").where(F.col("c_acctbal") > 0).select(
        "c_custkey", "c_mktsegment"
    )
    big = T(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000).select(
        "o_custkey", "o_totalprice"
    )
    joined = seg.join(big, seg.c_custkey == big.o_custkey).select(
        "c_mktsegment", "o_totalprice"
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), money(F.sum("o_totalprice")).alias("total"))
        .orderBy("c_mktsegment")
    )


@register(
    "nested_sql_form",
    tags=("nested", "sql", "correlated"),
    oracle="""
SELECT o_orderpriority, count(*) AS n
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
  AND o_orderdate >= TIMESTAMP '1998-01-01'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def nested_sql_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same correlated EXISTS, but via ``spark.sql`` on registered
    views — proving the SQL entry point (BlazingContext.sql path) plans
    subqueries natively (RewritePredicateSubquery -> left semi)."""
    from pyblazing_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity > 45)
          AND o_orderdate >= TIMESTAMP '1998-01-01'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@register(
    "nested_lateral_topk",
    tags=("nested", "lateral", "sql"),
    oracle="""
SELECT n.n_name, o.o_orderkey, round(o.o_totalprice, 2) AS total
FROM nation n
JOIN LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders, customer
  WHERE o_custkey = c_custkey AND c_nationkey = n.n_nationkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2) o ON true
WHERE n.n_nationkey < 10
ORDER BY n.n_name, total DESC, o.o_orderkey
""",
)
def nested_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-2 orders per nation), run
    through Spark SQL's own LATERAL join syntax — the SQL-surface twin
    of the window top-k idiom. Catalyst decorrelates the lateral into
    a ranked join, so the executed plan is the same one-shuffle window
    shape a hand-written row_number() produces; the entry proves the
    dialect accepts the correlated form and the decorrelation preserves
    per-group LIMIT semantics (ties broken by key in BOTH engines —
    a nondeterministic LIMIT would hash-mismatch)."""
    from pyblazing_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("nation", "orders", "customer"))
    return spark.sql(
        """
SELECT n.n_name, o.o_orderkey, round(o.o_totalprice, 2) AS total
FROM nation n
JOIN LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_nationkey = n.n_nationkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2) o
WHERE n.n_nationkey < 10
ORDER BY n.n_name, total DESC, o.o_orderkey
"""
    )


@register(
    "nested_not_in_null_aware",
    tags=("nested", "not_in", "null", "anti-join"),
    oracle="""
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM customer
   WHERE c_custkey NOT IN
     (SELECT nullif(o_custkey, 7) FROM orders))      AS n_with_null_inner,
  (SELECT CAST(count(*) AS BIGINT) FROM customer
   WHERE c_custkey NOT IN
     (SELECT nullif(o_custkey, 7) FROM orders
      WHERE nullif(o_custkey, 7) IS NOT NULL))       AS n_null_free_inner
""",
)
def nested_not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with a NULL-bearing subquery — the classic three-valued-
    logic trap: one NULL in the inner set makes ``x NOT IN (...)``
    never-true, so the first count MUST be 0, while the null-filtered
    twin returns the real anti-join count. Spark plans the first as a
    null-aware anti join (a broadcast-only strategy at scale — exactly
    why production pipelines should write NOT EXISTS instead; this
    entry pins the semantics both engines agree on).

    The pair-in-one-row shape makes a wrong answer on EITHER variant a
    hash mismatch."""
    from pyblazing_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
SELECT
  (SELECT count(*) FROM customer
   WHERE c_custkey NOT IN
     (SELECT nullif(o_custkey, 7) FROM orders))      AS n_with_null_inner,
  (SELECT count(*) FROM customer
   WHERE c_custkey NOT IN
     (SELECT nullif(o_custkey, 7) FROM orders
      WHERE nullif(o_custkey, 7) IS NOT NULL))       AS n_null_free_inner
"""
    )


@register(
    "nested_not_exists",
    tags=("nested", "sql", "correlated", "anti"),
    oracle="""
SELECT c_mktsegment, count(*) AS n_small
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_totalprice > 400000)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def nested_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS via ``spark.sql`` — customers with no
    big-ticket order, counted per segment (the 400000 bar keeps the
    result non-empty at every fixture SF). Catalyst's
    RewritePredicateSubquery plans this as a LEFT ANTI join with the
    price filter pushed below it — the complement of
    ``nested_sql_form``'s EXISTS -> left-semi evidence (the filtering
    join pair SURVEY §2.2 calls the anti/semi superset)."""
    from pyblazing_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c_mktsegment, count(*) AS n_small
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_totalprice > 400000)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )


@register(
    "nested_recursive_cte",
    tags=("nested", "cte", "recursive", "sql"),
    oracle="""
WITH RECURSIVE anc(part, node) AS (
  SELECT p_partkey, p_partkey FROM part WHERE p_partkey BETWEEN 1 AND 63
  UNION ALL
  SELECT part, node // 2 FROM anc WHERE node > 1)
SELECT part,
       CAST(count(*) AS BIGINT) AS chain_len,
       CAST(sum(node) AS BIGINT) AS node_sum
FROM anc
GROUP BY part
ORDER BY part
""",
)
def nested_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE through ``spark.sql`` — ancestry chains in the
    implicit binary tree parent(n) = n div 2 over partkeys 1..63 (6
    levels), aggregated per starting part. Spark 4 executes recursive
    CTEs natively (UnionLoop iterations); DuckDB recurses the same
    UNION ALL. The reference has no recursion at all (Calcite parses
    it; the engine lacks an iteration operator) — this is modern-SQL
    surface beyond the §2.7 checklist. Halving terminates in
    O(log part) rounds; engine dialects differ only in the
    integer-divide spelling (DIV vs //)."""
    from pyblazing_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("part",))
    return spark.sql(
        """
        WITH RECURSIVE anc(part, node) AS (
          SELECT p_partkey, p_partkey FROM part
          WHERE p_partkey BETWEEN 1 AND 63
          UNION ALL
          SELECT part, node DIV 2 FROM anc WHERE node > 1)
        SELECT part,
               count(*)  AS chain_len,
               sum(node) AS node_sum
        FROM anc
        GROUP BY part
        ORDER BY part
        """
    )


_RECURSIVE_JOIN_SQL = """
WITH RECURSIVE edges AS (
  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS src,
         greatest(a.l_partkey, b.l_partkey) AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = 1 AND b.l_linenumber = 2
  WHERE a.l_partkey <> b.l_partkey),
 walk(src, cur, depth) AS (
  SELECT src, dst, 1 FROM edges WHERE src % 97 = 0
  UNION ALL
  SELECT w.src, e.dst, w.depth + 1
  FROM walk w JOIN edges e ON e.src = w.cur
  WHERE w.depth < 3)
SELECT src,
       CAST(count(*) AS BIGINT)      AS n_paths,
       CAST(max(depth) AS BIGINT)    AS max_depth,
       CAST(sum(cur) AS BIGINT)      AS dst_sum
FROM walk
GROUP BY src
ORDER BY src
"""


@register(
    "nested_recursive_join",
    tags=("nested", "cte", "recursive", "transitive-closure", "sql"),
    oracle=_RECURSIVE_JOIN_SQL,
)
def nested_recursive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure by native ``WITH RECURSIVE`` whose recursive
    term JOINS a base relation — the harder recursion shape
    (``nested_recursive_cte`` recurses on arithmetic alone): 3-hop
    path counting over real co-purchase edges (parts on line 1 and 2
    of the same order, oriented small->large so every walk strictly
    ascends and terminates even without the depth cap). The edge set
    is DISTINCT — path counting over a multigraph multiplies counts by
    the product of per-hop edge multiplicities (degree^depth growth:
    the 10x probe's replicated orders repeat every edge 10x and the
    raw walk blew Spark's 1M recursion row cap,
    RECURSION_ROW_LIMIT_EXCEEDED), while the distinct graph keeps the
    walk proportional to real connectivity at any scale. Spark 4
    executes this as a UnionLoop whose every iteration hash-joins the
    frontier against the edge relation; DuckDB recurses the IDENTICAL
    SQL text, so path multiplicities (UNION ALL keeps every distinct
    path) value-compare exactly. The iterative-DataFrame siblings
    (`graph_*`) hand-roll this loop with checkpoint hygiene; this is
    the declarative spelling the engine manages itself."""
    from pyblazing_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_RECURSIVE_JOIN_SQL)
