"""Scalar-expression parity suite — the reference's full expression
language (SURVEY.md §2.7; operator enum
``engine/src/parser/expression_utils.hpp:12-92``, execution
``LogicalProject.cpp:103-972`` + interops ``interpreter_cpp.cu``).

E2E model: ``simpleStringSuite``, ``substringSuite``, ``likeSuite``,
``stringCaseSuite``, ``castSuite``, ``roundSuite``, ``caseSuite``,
``coalesceSuite``, ``dateSuite``, ``timestampSuite``, ``intervalSuite``,
``timestampaddSuite``, ``timestampdiffSuite``, ``dayOfWeekSuite``,
``predicatesWithNulls``, ``jsonSuite``.

Dialect notes encoded in the oracles (dual-run on DuckDB):

- double -> int CAST truncates in Spark and in the reference (cuDF cast);
  DuckDB rounds — oracles spell ``trunc()`` explicitly.
- Spark ``dayofweek`` is 1=Sunday..7 (Calcite convention, what
  ``dayOfWeekSuite`` tests); DuckDB's is 0=Sunday..6 — oracle adds 1.
- ``to_date/to_timestamp`` format strings: Spark datetime patterns vs
  DuckDB strptime ``%`` codes.

Everything here is JVM-side / whole-stage-codegen — no Python UDFs —
matching the reference's fused interops interpreter in spirit but letting
Catalyst do the fusion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyblazing_spark.plans.registry import register
from pyblazing_spark.sources.tables import load_table as T


@register(
    "expr_strings",
    tags=("expression", "string"),
    oracle="""
SELECT p_partkey,
       upper(p_name)                                   AS up,
       lower(p_brand)                                  AS lo,
       substring(p_name, 3, 5)                         AS sub,
       concat(p_brand, '/', p_type)                    AS joined,
       replace(p_name, 'a', '@')                       AS repl,
       trim('  ' || p_name || ' ')                     AS trimmed,
       reverse(p_brand)                                AS rev,
       left(p_name, 4)                                 AS l4,
       right(p_name, 4)                                AS r4,
       CAST(length(p_name) AS INTEGER)                 AS len
FROM part
ORDER BY p_partkey
LIMIT 300
""",
)
def expr_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery (reference exec
    ``LogicalProject.cpp:112-355``)."""
    pa = T(spark, sf_dir, "part")
    return (
        pa.select(
            "p_partkey",
            F.upper("p_name").alias("up"),
            F.lower("p_brand").alias("lo"),
            F.substring("p_name", 3, 5).alias("sub"),
            F.concat_ws("/", "p_brand", "p_type").alias("joined"),
            F.replace(F.col("p_name"), F.lit("a"), F.lit("@")).alias("repl"),
            F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
            F.reverse("p_brand").alias("rev"),
            F.substring("p_name", 1, 4).alias("l4"),
            F.col("p_name").substr(F.length("p_name") - 3, F.lit(4)).alias("r4"),
            F.length("p_name").alias("len"),
        )
        .orderBy("p_partkey")
        .limit(300)
    )


@register(
    "expr_initcap_like",
    tags=("expression", "string", "like"),
    oracle="""
SELECT c_custkey,
       CASE WHEN lower(c_name) LIKE 'customer#%0' THEN 'ends0'
            WHEN lower(c_name) LIKE '%9'          THEN 'ends9'
            ELSE 'other' END AS bucket,
       c_name LIKE 'Customer#00000000_' AS is_tiny,
       c_mktsegment SIMILAR TO '[A-Z]+' AS seg_alpha
FROM customer
ORDER BY c_custkey
LIMIT 300
""",
)
def expr_initcap_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE patterns (incl. ``_`` wildcard) and regexp match (reference
    LIKE via cuDF strings; regexp via ``REGEXP_REPLACE`` family)."""
    cu = T(spark, sf_dir, "customer")
    lname = F.lower(F.col("c_name"))
    return (
        cu.select(
            "c_custkey",
            F.when(lname.like("customer#%0"), "ends0")
            .when(lname.like("%9"), "ends9")
            .otherwise("other")
            .alias("bucket"),
            F.col("c_name").like("Customer#00000000_").alias("is_tiny"),
            F.col("c_mktsegment").rlike("^[A-Z]+$").alias("seg_alpha"),
        )
        .orderBy("c_custkey")
        .limit(300)
    )


@register(
    "expr_regexp",
    tags=("expression", "regexp"),
    oracle="""
SELECT p_partkey,
       regexp_replace(p_name, '[aeiou]', '*', 'g')      AS starred,
       regexp_extract(p_name, '([0-9]+)', 1)            AS first_num,
       regexp_matches(p_name, '[0-9]')                  AS has_digit
FROM part
ORDER BY p_partkey
LIMIT 300
""",
)
def expr_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REGEXP_REPLACE (reference ``expression_utils.hpp:86``) + extract."""
    pa = T(spark, sf_dir, "part")
    return (
        pa.select(
            "p_partkey",
            F.regexp_replace("p_name", "[aeiou]", "*").alias("starred"),
            F.regexp_extract("p_name", "([0-9]+)", 1).alias("first_num"),
            F.col("p_name").rlike("[0-9]").alias("has_digit"),
        )
        .orderBy("p_partkey")
        .limit(300)
    )


@register(
    "expr_casts",
    tags=("expression", "cast"),
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(trunc(l_extendedprice) AS BIGINT)    AS price_int,
       CAST(trunc(l_quantity) AS TINYINT)        AS qty_i8,
       CAST(l_linenumber AS SMALLINT)            AS ln_i16,
       CAST(l_quantity AS DOUBLE)                AS qty_f64,
       CAST(CAST(l_quantity AS FLOAT) AS DOUBLE) AS qty_f32,
       CAST(l_orderkey AS VARCHAR)               AS key_str,
       CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_day,
       CAST('123' AS INTEGER)                    AS s2i,
       CAST('3.5' AS DOUBLE)                     AS s2d
FROM lineitem
ORDER BY l_orderkey, l_linenumber
LIMIT 300
""",
)
def expr_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CAST matrix (reference ``CAST_*`` ops
    ``expression_utils.hpp:43-54``, exec ``LogicalProject.cpp:356-509``).
    Spark's double->int truncation matches cuDF; DuckDB oracle spells
    trunc()."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_extendedprice").cast("long").alias("price_int"),
            F.col("l_quantity").cast("tinyint").alias("qty_i8"),
            F.col("l_linenumber").cast("smallint").alias("ln_i16"),
            F.col("l_quantity").cast("double").alias("qty_f64"),
            F.col("l_quantity").cast("float").cast("double").alias("qty_f32"),
            F.col("l_orderkey").cast("string").alias("key_str"),
            F.col("l_shipdate").cast("date").cast("string").alias("ship_day"),
            F.lit("123").cast("int").alias("s2i"),
            F.lit("3.5").cast("double").alias("s2d"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(300)
    )


@register(
    "expr_math",
    tags=("expression", "math"),
    oracle="""
SELECT o_orderkey,
       round(o_totalprice, 1)                          AS r1,
       round(abs(-o_totalprice), 2)                    AS ab,
       CAST(floor(o_totalprice) AS BIGINT)             AS fl,
       CAST(ceil(o_totalprice) AS BIGINT)              AS ce,
       round(sqrt(o_totalprice), 6)                    AS sq,
       round(ln(o_totalprice), 6)                      AS lg,
       round(log10(o_totalprice), 6)                   AS l10,
       round(power(o_totalprice / 100000, 2), 6)       AS pw,
       round(sin(o_totalprice / 100000), 6)            AS sn,
       round(cos(o_totalprice / 100000), 6)            AS cs,
       round(atan(o_totalprice / 100000), 6)           AS at,
       CAST(o_orderkey % 7 AS BIGINT)                  AS md
FROM orders
ORDER BY o_orderkey
LIMIT 300
""",
)
def expr_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery (reference ``expression_utils.hpp:15-30,62-68``:
    FLOOR CEIL SIN COS TAN ATAN LN LOG10 POWER ROUND ABS MOD)."""
    od = T(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return (
        od.select(
            "o_orderkey",
            F.round(p, 1).alias("r1"),
            F.round(F.abs(-p), 2).alias("ab"),
            F.floor(p).alias("fl"),
            F.ceil(p).alias("ce"),
            F.round(F.sqrt(p), 6).alias("sq"),
            F.round(F.log(p), 6).alias("lg"),
            F.round(F.log10(p), 6).alias("l10"),
            F.round(F.pow(p / 100000, 2), 6).alias("pw"),
            F.round(F.sin(p / 100000), 6).alias("sn"),
            F.round(F.cos(p / 100000), 6).alias("cs"),
            F.round(F.atan(p / 100000), 6).alias("at"),
            (F.col("o_orderkey") % 7).alias("md"),
        )
        .orderBy("o_orderkey")
        .limit(300)
    )


@register(
    "expr_datetime_extract",
    tags=("expression", "datetime"),
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER)            AS yr,
       CAST(month(o_orderdate) AS INTEGER)           AS mo,
       CAST(day(o_orderdate) AS INTEGER)             AS dy,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER)   AS dow,
       CAST(hour(o_orderdate) AS INTEGER)            AS hr,
       CAST(minute(o_orderdate) AS INTEGER)          AS mi,
       CAST(second(o_orderdate) AS INTEGER)          AS se,
       CAST(quarter(o_orderdate) AS INTEGER)         AS qt,
       CAST(dayofyear(o_orderdate) AS INTEGER)       AS doy,
       CAST(week(o_orderdate) AS INTEGER)            AS wk
FROM orders
ORDER BY o_orderkey
LIMIT 300
""",
)
def expr_datetime_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime extraction (reference ``BL_YEAR..BL_SECOND``
    ``expression_utils.hpp:31-37``). DOW: Spark/Calcite 1=Sunday vs
    DuckDB 0=Sunday (``dayOfWeekSuite`` is the reference's coverage)."""
    od = T(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        od.select(
            "o_orderkey",
            F.year(d).alias("yr"),
            F.month(d).alias("mo"),
            F.dayofmonth(d).alias("dy"),
            F.dayofweek(d).alias("dow"),
            F.hour(d).alias("hr"),
            F.minute(d).alias("mi"),
            F.second(d).alias("se"),
            F.quarter(d).alias("qt"),
            F.dayofyear(d).alias("doy"),
            F.weekofyear(d).alias("wk"),
        )
        .orderBy("o_orderkey")
        .limit(300)
    )


@register(
    "expr_date_arith",
    tags=("expression", "interval"),
    oracle="""
SELECT o_orderkey, o_orderdate,
       o_orderdate + INTERVAL 90 DAY                      AS due,
       o_orderdate - INTERVAL 3 MONTH                     AS back3m,
       o_orderdate + INTERVAL 36 HOUR                     AS plus36h,
       date_trunc('month', o_orderdate)                   AS mon,
       CAST(date_diff('day', o_orderdate,
                      TIMESTAMP '2000-01-01') AS INTEGER) AS days_to_y2k,
       CAST((2000 - year(o_orderdate)) * 12
            + (1 - month(o_orderdate)) AS BIGINT)         AS months_to_y2k
FROM orders
ORDER BY o_orderkey
LIMIT 300
""",
)
def expr_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic + truncation + diffs (reference interval units
    ``expression_utils.cpp:1341-1455``; ``timestampadd/timestampdiff``
    suites)."""
    od = T(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    y2k = F.lit("2000-01-01").cast("timestamp_ntz")
    return (
        od.select(
            "o_orderkey",
            "o_orderdate",
            (d + F.expr("INTERVAL 90 DAY")).alias("due"),
            (d - F.expr("INTERVAL 3 MONTH")).alias("back3m"),
            (d + F.expr("INTERVAL 36 HOUR")).alias("plus36h"),
            F.date_trunc("month", d).alias("mon"),
            F.datediff(y2k.cast("date"), d.cast("date")).alias("days_to_y2k"),
            # month-boundary crossings (DuckDB date_diff semantics; Spark's
            # timestampdiff counts *full* months, a dialect delta worth pinning)
            ((F.lit(2000) - F.year(d)) * 12 + (F.lit(1) - F.month(d)))
            .cast("long")
            .alias("months_to_y2k"),
        )
        .orderBy("o_orderkey")
        .limit(300)
    )


@register(
    "expr_to_date",
    tags=("expression", "datetime", "parse"),
    oracle="""
SELECT n_nationkey,
       strptime('2024-03-0' || CAST(n_nationkey % 9 + 1 AS VARCHAR),
                '%Y-%m-%d')                                    AS parsed_date,
       strptime('2024/03/15 12:34:56', '%Y/%m/%d %H:%M:%S')    AS parsed_ts,
       strftime(TIMESTAMP '1998-09-02 10:20:30', '%Y|%m|%d')   AS formatted
FROM nation
ORDER BY n_nationkey
""",
)
def expr_to_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TO_DATE / TO_TIMESTAMP with format strings (reference
    ``expression_utils.hpp:89-90``, exec ``LogicalProject.cpp:510-533``).
    Spark patterns vs DuckDB strptime codes — the dialect shim SURVEY.md
    §7.1 calls out."""
    na = T(spark, sf_dir, "nation")
    daystr = F.concat(
        F.lit("2024-03-0"), ((F.col("n_nationkey") % 9) + 1).cast("string")
    )
    return na.select(
        "n_nationkey",
        F.to_timestamp_ntz(daystr, F.lit("yyyy-MM-dd")).alias("parsed_date"),
        F.to_timestamp_ntz(
            F.lit("2024/03/15 12:34:56"), F.lit("yyyy/MM/dd HH:mm:ss")
        ).alias("parsed_ts"),
        F.date_format(
            F.lit("1998-09-02 10:20:30").cast("timestamp_ntz"), "yyyy|MM|dd"
        ).alias("formatted"),
    ).orderBy("n_nationkey")


@register(
    "expr_case_coalesce",
    tags=("expression", "conditional"),
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 400000 THEN 'high'
            WHEN o_totalprice > 200000 THEN 'mid'
            ELSE 'low' END                                   AS bucket,
       coalesce(nullif(o_orderstatus, 'P'), 'PENDING')       AS status_or,
       nullif(o_orderpriority, '4-NOT SPECIFIED')            AS prio_or_null,
       CASE o_orderstatus WHEN 'O' THEN 1 WHEN 'F' THEN 2
            ELSE 0 END                                       AS status_code,
       if(o_totalprice > 250000, 'big', 'small')             AS size_tag
FROM orders
ORDER BY o_orderkey
LIMIT 400
""",
)
def expr_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE / COALESCE / NULLIF / IF (reference rewrites CASE into the
    MAGIC_IF_NOT mask-scatter idiom, ``expression_tree.hpp:181-227``;
    suites ``caseSuite``, ``coalesceSuite``)."""
    od = T(spark, sf_dir, "orders")
    p, st = F.col("o_totalprice"), F.col("o_orderstatus")
    return (
        od.select(
            "o_orderkey",
            F.when(p > 400000, "high").when(p > 200000, "mid").otherwise("low").alias("bucket"),
            F.coalesce(F.nullif(st, F.lit("P")), F.lit("PENDING")).alias("status_or"),
            F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")).alias(
                "prio_or_null"
            ),
            F.when(st == "O", 1).when(st == "F", 2).otherwise(0).alias("status_code"),
            F.when(p > 250000, "big").otherwise("small").alias("size_tag"),
        )
        .orderBy("o_orderkey")
        .limit(400)
    )


@register(
    "expr_null_predicates",
    tags=("expression", "nulls"),
    oracle="""
WITH t AS (
  SELECT c_custkey,
         nullif(c_mktsegment, 'MACHINERY') AS seg,
         CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
  FROM customer)
SELECT c_custkey,
       seg IS NULL                        AS seg_null,
       seg IS NOT NULL                    AS seg_set,
       bal IS NOT DISTINCT FROM NULL      AS bal_nd_null,
       coalesce(bal >= 0, FALSE)          AS bal_nonneg_true,
       (bal >= 0) IS NULL                 AS bal_cmp_unknown
FROM t
ORDER BY c_custkey
LIMIT 400
""",
)
def expr_null_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL predicate set (reference ``IS_NULL/IS_NOT_NULL``
    ``expression_utils.hpp:69-74``, IS TRUE family :38-42; suite
    ``predicatesWithNulls``)."""
    cu = T(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY"))
    bal = F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal"))
    return (
        cu.select(
            "c_custkey",
            seg.isNull().alias("seg_null"),
            seg.isNotNull().alias("seg_set"),
            bal.eqNullSafe(F.lit(None).cast("double")).alias("bal_nd_null"),
            F.coalesce(bal >= 0, F.lit(False)).alias("bal_nonneg_true"),
            (bal >= 0).isNull().alias("bal_cmp_unknown"),
        )
        .orderBy("c_custkey")
        .limit(400)
    )


@register(
    "expr_json",
    tags=("expression", "json"),
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k')                    AS k_str,
       CAST(json_extract_string(props, '$.k') AS INTEGER)   AS k_int
FROM events
ORDER BY event_id
LIMIT 400
""",
)
def expr_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction — the reference only *scans* JSON files
    (``JSONParser.cpp``; ``jsonSuite`` tests scans, not functions); this is
    new surface via ``get_json_object``."""
    ev = T(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            F.get_json_object("props", "$.k").alias("k_str"),
            F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        )
        .orderBy("event_id")
        .limit(400)
    )


@register(
    "expr_arith_division",
    tags=("expression", "arithmetic"),
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice / l_quantity, 4)     AS unit_price,
       CAST(l_orderkey // 4 AS BIGINT)            AS int_div,
       round(l_extendedprice * l_tax, 4)          AS tax_amt,
       round(l_extendedprice - l_discount * l_extendedprice, 4) AS net,
       -l_linenumber                              AS neg
FROM lineitem
ORDER BY l_orderkey, l_linenumber
LIMIT 400
""",
)
def expr_arith_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic incl. the integer-division dialect delta (Spark ``div``
    = DuckDB ``//``; plain ``/`` on ints is float division in both —
    SURVEY.md §7.1 risk list)."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") / F.col("l_quantity"), 4).alias(
                "unit_price"
            ),
            F.expr("l_orderkey div 4").alias("int_div"),
            F.round(F.col("l_extendedprice") * F.col("l_tax"), 4).alias("tax_amt"),
            F.round(
                F.col("l_extendedprice") - F.col("l_discount") * F.col("l_extendedprice"),
                4,
            ).alias("net"),
            (-F.col("l_linenumber")).alias("neg"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(400)
    )


@register(
    "expr_array_ops",
    tags=("expression", "array", "nested-types"),
    oracle=r"""
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\s+'))  AS n_tokens,
       len(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+'))) AS n_uniq,
       array_to_string(
         list_slice(list_sort(list_distinct(
           regexp_split_to_array(lower(trim(text)), '\s+'))), 1, 3),
         ',')                                          AS first3,
       list_contains(regexp_split_to_array(lower(trim(text)), '\s+'), 'the') AS has_the
FROM documents
WHERE n_chars > 0
ORDER BY doc_id
LIMIT 500
""",
)
def expr_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ArrayType surface — absent from the reference's type system
    (LIST/STRUCT/MAP are not in its catalog enum,
    ``CatalogColumnDataType.java:19-47``; SURVEY.md §1.2 claims them as
    new Spark-native surface). Tokenize to array<string>, then size /
    distinct / sort / slice / contains — all codegen built-ins, no
    higher-order functions in the plan."""
    d = T(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    toks_lc = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    return (
        d.where(F.col("n_chars") > 0)
        .select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            F.size(F.array_distinct(toks_lc)).alias("n_uniq"),
            F.concat_ws(
                ",", F.slice(F.array_sort(F.array_distinct(toks_lc)), 1, 3)
            ).alias("first3"),
            F.array_contains(toks_lc, "the").alias("has_the"),
        )
        .orderBy("doc_id")
        .limit(500)
    )


@register(
    "expr_map_struct",
    tags=("expression", "map", "struct", "nested-types"),
    oracle="""
WITH per AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY user_id, event_type)
SELECT user_id,
       CAST(coalesce(MAP(list(event_type), list(n))['click'][1], 0) AS BIGINT) AS clicks,
       CAST(coalesce(MAP(list(event_type), list(n))['view'][1], 0) AS BIGINT)  AS views,
       CAST(coalesce(MAP(list(event_type), list(n))['purchase'][1], 0) AS BIGINT) AS purchases
FROM per
GROUP BY user_id
ORDER BY user_id
LIMIT 300
""",
)
def expr_map_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType/StructType surface (absent from the reference's catalog —
    SURVEY.md §1.2): pivot per-user event counts through a map built
    from collected (event_type, n) structs. ``try_element_at`` (not
    ``element_at``) so missing keys are NULL under ANSI mode, matching
    DuckDB's out-of-range list index."""
    ev = T(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    m = F.map_from_entries(F.collect_list(F.struct("event_type", "n")))

    def cnt(key: str):
        return F.coalesce(F.try_element_at(F.col("m"), F.lit(key)), F.lit(0)).cast("long")

    return (
        per.groupBy("user_id")
        .agg(m.alias("m"))
        .select(
            "user_id",
            cnt("click").alias("clicks"),
            cnt("view").alias("views"),
            cnt("purchase").alias("purchases"),
        )
        .orderBy("user_id")
        .limit(300)
    )


@register(
    "expr_timestampadd_diff",
    tags=("expression", "interval", "timestampadd"),
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate AS TIMESTAMP) + (4) * INTERVAL 1 DAY      AS add_day,
       CAST(o_orderdate AS TIMESTAMP) + (12) * INTERVAL 1 HOUR    AS add_hour,
       CAST(o_orderdate AS TIMESTAMP) + (42) * INTERVAL 1 MINUTE  AS add_min,
       CAST(trunc((epoch(TIMESTAMP '1996-12-01 12:00:01')
                   - epoch(CAST(o_orderdate AS TIMESTAMP))) / 86400) AS BIGINT) AS diff_day,
       CAST(trunc((epoch(TIMESTAMP '1996-12-01 12:00:01')
                   - epoch(CAST(o_orderdate AS TIMESTAMP))) / 3600) AS BIGINT)  AS diff_hour,
       CAST(trunc((epoch(CAST(o_orderdate AS TIMESTAMP))
                   - epoch(TIMESTAMP '1996-12-01 12:00:01')) / 60) AS BIGINT)   AS diff_min_neg
FROM orders
ORDER BY o_orderkey
LIMIT 400
""",
)
def expr_timestampadd_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMESTAMPADD / TIMESTAMPDIFF (reference suites
    ``TimestampaddSuite.yaml`` / ``timestampdiffSuite.yaml``;
    plan tokens in ``expression_utils.cpp:1341-1455``). Spark's
    TIMESTAMPDIFF counts COMPLETE units truncated toward zero — the
    oracle uses epoch math to pin exactly that (DuckDB's own date_diff
    counts boundary crossings instead, off by one on negative
    sub-unit remainders)."""
    od = T(spark, sf_dir, "orders")
    return (
        od.selectExpr(
            "o_orderkey",
            "timestampadd(DAY, 4, o_orderdate)      AS add_day",
            "timestampadd(HOUR, 12, o_orderdate)    AS add_hour",
            "timestampadd(MINUTE, 42, o_orderdate)  AS add_min",
            "timestampdiff(DAY, o_orderdate, TIMESTAMP'1996-12-01 12:00:01')    AS diff_day",
            "timestampdiff(HOUR, o_orderdate, TIMESTAMP'1996-12-01 12:00:01')   AS diff_hour",
            "timestampdiff(MINUTE, TIMESTAMP'1996-12-01 12:00:01', o_orderdate) AS diff_min_neg",
        )
        .orderBy("o_orderkey")
        .limit(400)
    )


@register(
    "expr_hash",
    tags=("expressions", "hash"),
    oracle="""
SELECT c_custkey,
       md5(c_name)                                   AS h_md5,
       sha256(c_name)                                AS h_sha256,
       substring(md5(c_name || CAST(c_custkey AS VARCHAR)), 1, 16) AS h_salted
FROM customer
WHERE c_custkey <= 50
ORDER BY c_custkey
""",
)
def expr_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hash battery (md5 / sha-256 / salted truncation) —
    the content-keying primitives every dedup/sampling operator in this
    repo builds on, exercised directly for cross-engine parity. Spark's
    sha2(col, 256) == DuckDB sha256; both hash the UTF-8 bytes."""
    cu = T(spark, sf_dir, "customer").where(F.col("c_custkey") <= 50)
    name_b = F.col("c_name").cast("binary")
    return (
        cu.select(
            "c_custkey",
            F.md5(name_b).alias("h_md5"),
            F.sha2(name_b, 256).alias("h_sha256"),
            F.substring(
                F.md5(
                    F.concat(F.col("c_name"), F.col("c_custkey").cast("string")).cast(
                        "binary"
                    )
                ),
                1,
                16,
            ).alias("h_salted"),
        )
        .orderBy("c_custkey")
    )


@register(
    "expr_decimal_exact",
    tags=("expr", "decimal", "types"),
    oracle="""
WITH amt AS (
  SELECT l_returnflag,
         CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
         CAST(l_discount AS DECIMAL(12,2))      AS disc
  FROM lineitem)
SELECT l_returnflag,
       CAST(count(*) AS BIGINT)                         AS n,
       CAST(sum(price) * 100 AS BIGINT)                 AS total_cents,
       CAST(sum(price * (1 - disc)) * 10000 AS BIGINT)  AS disc_total_e4,
       CAST(CAST(sum(price) * 100 AS BIGINT) // count(*) AS BIGINT)
         AS avg_cents
FROM amt
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def expr_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL arithmetic and aggregation — the catalog row for
    the reference's DECIMAL32/64 types, which its catalog declares but
    its runtime never produces (SURVEY §1.2); Spark supports them
    outright. Prices cast to DECIMAL(12,2), summed exactly (no binary
    float drift by construction — decimal sums are integer arithmetic
    under the hood), and the product price*(1-disc) carries the exact
    4-digit scale the decimal multiplication rules produce. Totals are
    emitted as penny/1e-4-unit BIGINTs, so the oracle compare is exact
    integer equality — no rounding convention involved at all, unlike
    every float-typed money entry.

    Scale notes: decimal aggregation is Tungsten-native (backed by long
    arithmetic for precision <= 18 and by Decimal128 above), partial
    aggregation and whole-stage codegen apply as for any numeric —
    exactness costs one extra multiply per row, not a different plan."""
    li = T(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(12,2)")
    return (
        li.select("l_returnflag", price.alias("price"), disc.alias("disc"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.col("price")) * 100).cast("long").alias("total_cents"),
            (F.sum(F.col("price") * (1 - F.col("disc"))) * 10000)
            .cast("long")
            .alias("disc_total_e4"),
        )
        .withColumn("avg_cents", F.expr("total_cents div n"))
        .select("l_returnflag", "n", "total_cents", "disc_total_e4", "avg_cents")
        .orderBy("l_returnflag")
    )


@register(
    "expr_regexp_position",
    tags=("expression", "regexp", "dialect"),
    oracle=r"""
SELECT c_custkey,
       regexp_replace(c_name, '([0-9])([0-9])', '\2\1', 'g') AS swapped,
       (substring(c_name, 1, 10 - 1) ||
        regexp_replace(substring(c_name, 10), '[0-9]', '#', 'g')) AS masked_from_10
FROM customer
WHERE c_custkey <= 200
ORDER BY c_custkey
""",
)
def expr_regexp_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replacement backreferences + POSITIONAL regexp_replace — the two
    REGEXP_REPLACE forms the reference's Calcite layer accepts
    (simpleStringSuite/TEST_17) beyond plain 3-arg: Spark expresses the
    backref with Java's ``$n`` (the dialect shim translates Calcite's
    ``\\n`` spelling — ``dialect.py``) and has a NATIVE 4-arg position
    form; the oracle composes position from substring + global replace,
    since DuckDB has none. Pure scan-stage codegen either way."""
    cu = T(spark, sf_dir, "customer")
    return (
        cu.where(F.col("c_custkey") <= 200)
        .select(
            "c_custkey",
            F.regexp_replace(F.col("c_name"), r"([0-9])([0-9])", r"$2$1").alias(
                "swapped"
            ),
            F.expr(r"regexp_replace(c_name, '[0-9]', '#', 10)").alias(
                "masked_from_10"
            ),
        )
        .orderBy("c_custkey")
    )


@register(
    "expr_url_parse",
    tags=("expr", "url", "strings", "crawl"),
    oracle="""
WITH u AS (
  SELECT o_orderkey,
         'https://Shop' || CAST(o_orderkey % 7 AS VARCHAR)
           || '.Example.COM/' || lower(o_orderstatus) || '/item?id='
           || CAST(o_orderkey AS VARCHAR)
           || '&utm_source=news&ref=a#sec' || CAST(o_orderkey % 3 AS VARCHAR)
           AS url
  FROM orders WHERE o_orderkey <= 2000),
 parts AS (
  SELECT o_orderkey,
         lower(regexp_extract(url, 'https?://([^/?#]+)', 1)) AS host,
         regexp_extract(url, 'https?://[^/?#]+([^?#]*)', 1)  AS path,
         regexp_extract(url, '[?&]id=([^&#]*)', 1)           AS id_param
  FROM u)
SELECT host,
       CAST(count(*) AS BIGINT)                    AS n,
       CAST(sum(CAST(id_param AS BIGINT)) AS BIGINT) AS id_sum,
       CAST(count(DISTINCT path) AS BIGINT)        AS n_paths,
       min(host || path || '?id=' || id_param)     AS sample_canonical
FROM parts
GROUP BY host
ORDER BY host
""",
)
def expr_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing + canonicalization — the first transform every
    crawl-derived training corpus applies (host lowercase, fragment and
    tracking params dropped, stable query-param extraction). URLs are
    built deterministically from orders keys so both engines see
    identical inputs; Spark parses with its NATIVE ``parse_url``
    (HOST / PATH / QUERY-with-key modes, JVM codegen), while the
    oracle recomputes each component with regexes (DuckDB has no URL
    parser) — so a component-boundary bug (fragment leaking into the
    query param, port/userinfo mishandling, case-fold misses) fails
    the compare. Grouping by canonical host with id sums pins WHICH
    rows landed under which host.

    Scale: pure scan-stage string expressions, no Python, one
    host-keyed aggregation exchange."""
    od = T(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2000)
    u = od.select(
        "o_orderkey",
        F.concat(
            F.lit("https://Shop"),
            (F.col("o_orderkey") % 7).cast("string"),
            F.lit(".Example.COM/"),
            F.lower("o_orderstatus"),
            F.lit("/item?id="),
            F.col("o_orderkey").cast("string"),
            F.lit("&utm_source=news&ref=a#sec"),
            (F.col("o_orderkey") % 3).cast("string"),
        ).alias("url"),
    )
    parts = u.select(
        "o_orderkey",
        F.lower(F.parse_url("url", F.lit("HOST"))).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("id")).alias("id_param"),
    )
    return (
        parts.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("id_param").cast("long")).alias("id_sum"),
            F.countDistinct("path").alias("n_paths"),
            F.min(
                F.concat(F.col("host"), F.col("path"), F.lit("?id="), F.col("id_param"))
            ).alias("sample_canonical"),
        )
        .orderBy("host")
    )


@register(
    "expr_variant_json",
    tags=("expression", "json", "variant"),
    oracle="""
WITH built AS (
  SELECT event_id,
         '{"meta": {"k": ' || json_extract_string(props, '$.k')
           || ', "type": "' || event_type || '"}, "vals": ['
           || CAST(event_id % 7 AS VARCHAR) || ', '
           || CAST(event_id % 3 AS VARCHAR) || ']}' AS j
  FROM events WHERE event_id < 500),
 ext AS (
  SELECT event_id,
         CAST(json_extract_string(j, '$.meta.k') AS BIGINT)  AS meta_k,
         json_extract_string(j, '$.meta.type')               AS meta_type,
         CAST(json_extract_string(j, '$.vals[1]') AS BIGINT) AS val1,
         json_extract_string(j, '$.meta.missing')            AS missing
  FROM built)
SELECT meta_type,
       CAST(count(*) AS BIGINT)                  AS n,
       CAST(sum(meta_k) AS BIGINT)               AS k_sum,
       CAST(sum(val1) AS BIGINT)                 AS val1_sum,
       CAST(count(missing) AS BIGINT)            AS n_missing_nonnull
FROM ext
GROUP BY meta_type
ORDER BY meta_type
""",
)
def expr_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT type (Spark 4 ``parse_json`` /
    ``variant_get`` / ``try_variant_get``) — the open-lakehouse
    semi-structured column the reference's type system lacks entirely
    (SURVEY.md §1.2; ``expr_json`` covers only string-path
    ``get_json_object``). A nested JSON document (object-in-object +
    array) is constructed identically on both engines from events
    columns, parsed ONCE into a VARIANT, and fields are extracted with
    typed paths: ``$.meta.k`` as bigint, ``$.meta.type`` as string, an
    array subscript ``$.vals[1]``, and a missing path through
    ``try_variant_get`` (must be NULL, pinned by the count).

    Scale: parse_json + variant_get are JVM codegen expressions over the
    scan — the VARIANT binary encoding is parsed once per row and
    field extraction is offset-based (no re-tokenizing per path), which
    is the point of VARIANT vs repeated get_json_object at 100 TB.
    Oracle: DuckDB rebuilds the same document and extracts via
    json_extract_string with identical casts."""
    ev = T(spark, sf_dir, "events").where(F.col("event_id") < 500)
    built = ev.select(
        "event_id",
        F.concat(
            F.lit('{"meta": {"k": '),
            F.get_json_object("props", "$.k"),
            F.lit(', "type": "'),
            F.col("event_type"),
            F.lit('"}, "vals": ['),
            (F.col("event_id") % 7).cast("string"),
            F.lit(", "),
            (F.col("event_id") % 3).cast("string"),
            F.lit("]}"),
        ).alias("j"),
    )
    v = built.select(
        "event_id", F.parse_json("j").alias("vt")
    )
    ext = v.select(
        "event_id",
        F.variant_get("vt", "$.meta.k", "bigint").alias("meta_k"),
        F.variant_get("vt", "$.meta.type", "string").alias("meta_type"),
        F.variant_get("vt", "$.vals[1]", "bigint").alias("val1"),
        F.try_variant_get("vt", "$.meta.missing", "string").alias("missing"),
    )
    return (
        ext.groupBy("meta_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("meta_k").alias("k_sum"),
            F.sum("val1").alias("val1_sum"),
            F.count("missing").alias("n_missing_nonnull"),
        )
        .orderBy("meta_type")
    )


@register(
    "expr_collation",
    tags=("expression", "collation", "string"),
    oracle="""
WITH mixed AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END AS s,
         n_chars
  FROM documents),
 grouped AS (
  SELECT lower(s)                          AS key_ci,
         CAST(count(*) AS BIGINT)          AS n_docs,
         CAST(count(DISTINCT s) AS BIGINT) AS n_raw_forms,
         min(s)                            AS min_raw,
         CAST(sum(n_chars) AS BIGINT)      AS chars_sum
  FROM mixed GROUP BY lower(s))
SELECT key_ci, n_docs, n_raw_forms, min_raw, chars_sum
FROM grouped
ORDER BY key_ci
""",
)
def expr_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 string COLLATIONS — grouping under ``UTF8_LCASE`` merges
    case variants ('SRC3' and 'src3') in the GROUP BY itself, the way a
    collated lakehouse column behaves, instead of wrapping every
    reference in lower() (which defeats dictionary/statistics reuse on
    a real table). The fixture's sources are case-mixed deterministically
    (even doc_ids uppercased); ``n_raw_forms = 2`` per group proves the
    collation actually merged distinct binary strings, and the
    deterministic binary ``min`` + lower()ed key keep the output
    engine-comparable (the collated group's representative value is
    partition-order-dependent, so it is never emitted raw).

    Oracle: DuckDB 1.0 has no per-expression collation — it groups by
    lower(s), which is semantically identical for ASCII fixtures.

    Scale: a collated group-by hashes the collation KEY, so it
    partitions exactly like any other group-by (one exchange); the
    collation is evaluated scan-side in codegen."""
    docs = T(spark, sf_dir, "documents")
    mixed = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.upper("source"))
        .otherwise(F.col("source"))
        .alias("s"),
        "n_chars",
    )
    return (
        mixed.groupBy(F.collate(F.col("s"), "UTF8_LCASE").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(F.collate(F.col("s"), "UTF8_BINARY")).alias("n_raw_forms"),
            F.min(F.collate(F.col("s"), "UTF8_BINARY")).alias("min_raw"),
            F.sum("n_chars").alias("chars_sum"),
        )
        .select(
            F.lower(F.col("k")).cast("string").alias("key_ci"),
            "n_docs",
            "n_raw_forms",
            F.col("min_raw").cast("string").alias("min_raw"),
            "chars_sum",
        )
        .orderBy("key_ci")
    )


@register(
    "expr_higher_order",
    tags=("expression", "array", "lambda", "higher-order"),
    oracle=r"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents WHERE n_chars > 0 AND doc_id < 300)
SELECT doc_id,
       CAST(len(toks) AS BIGINT)                                AS n_tokens,
       CAST(len(list_filter(toks, x -> strlen(x) > 6)) AS BIGINT) AS n_long,
       CAST(list_aggregate(list_transform(toks, x -> strlen(x)), 'sum')
            AS BIGINT)                                           AS sum_len,
       len(list_filter(toks, x -> regexp_matches(x, '^[aeiou]'))) > 0
                                                                 AS has_vowel_start
FROM d
ORDER BY doc_id
""",
)
def expr_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lambda higher-order-function surface — ``transform`` / ``filter``
    / ``aggregate`` / ``exists`` with real lambdas, value-compared
    against DuckDB's ``list_transform`` / ``list_filter`` /
    ``list_aggregate`` twins. The reference has no array type at all
    (LIST is absent from its catalog enum); this pins the API surface
    of Spark's lambda expressions as a superset capability.

    Scale caveat (why this entry is BOUNDED by doc_id and every hot
    path in the repo avoids these): lambda HOFs evaluate INTERPRETED —
    outside whole-stage codegen — and Catalyst can clone the whole
    array expression into per-row filters (see CLAUDE.md, the measured
    ~100x explode-vs-transform gap in ``_hashed_shingle_rows``). They
    are the right tool for OCCASIONAL array massaging on bounded data,
    which is exactly how this entry exercises them."""
    d = T(spark, sf_dir, "documents").where(
        (F.col("n_chars") > 0) & (F.col("doc_id") < 300)
    )
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return (
        d.select("doc_id", toks.alias("__t"))
        .select(
            "doc_id",
            F.size("__t").cast("long").alias("n_tokens"),
            F.size(F.filter("__t", lambda x: F.length(x) > 6))
            .cast("long")
            .alias("n_long"),
            F.aggregate(
                F.transform("__t", lambda x: F.length(x).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("sum_len"),
            F.exists("__t", lambda x: x.rlike("^[aeiou]")).alias(
                "has_vowel_start"
            ),
        )
        .orderBy("doc_id")
    )


@register(
    "expr_unpivot",
    tags=("expression", "unpivot", "melt", "reshape"),
    oracle="""
WITH base AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
  FROM lineitem WHERE l_orderkey % 997 = 0)
SELECT l_orderkey, l_linenumber, measure, round(value + 1e-9, 4) AS value
FROM (
  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
         l_quantity AS value FROM base
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM base
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM base)
ORDER BY l_orderkey, l_linenumber, measure
""",
)
def expr_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshaping via the native ``DataFrame.unpivot``
    (melt) operator — three lineitem measures become (measure, value)
    rows. The reference has no UNPIVOT (Calcite parses it but the
    engine has no kernel); Spark plans it as a single Expand node —
    ONE scan emitting 3 rows per input row in the scan stage, exactly
    the multi-distinct Expand machinery, with NO join or shuffle (the
    oracle's 3-way UNION ALL over one CTE is the relational spelling
    of the same thing, and DuckDB reads the base once too). At 100 TB
    unpivot is therefore scan-bound: output rows = k x input rows,
    nothing wide ever exchanges."""
    li = T(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 997 == 0)
    return (
        li.select(
            "l_orderkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount",
        )
        .unpivot(
            ids=["l_orderkey", "l_linenumber"],
            values=["l_quantity", "l_extendedprice", "l_discount"],
            variableColumnName="measure",
            valueColumnName="__v",
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "measure",
            F.round(F.col("__v") + 1e-9, 4).alias("value"),
        )
        .orderBy("l_orderkey", "l_linenumber", "measure")
    )


@register(
    "expr_udtf_lateral",
    tags=("expression", "udtf", "lateral", "python"),
    oracle=r"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents WHERE doc_id < 50 AND trim(text) <> '')
SELECT doc_id,
       CAST(generate_subscripts(toks, 1) AS INTEGER) AS pos,
       unnest(toks) AS word
FROM d
ORDER BY doc_id, pos
""",
)
def expr_udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python user-defined TABLE function (Spark 4 ``@udtf``) applied
    per-row via ``LATERAL`` — the one UDF surface the repo had not yet
    exercised (pandas_udf / mapInPandas / cogroup-applyInPandas /
    applyInPandasWithState all are). The UDTF re-implements word
    positions so DuckDB's ``unnest + generate_subscripts`` can
    value-compare every emitted row.

    Scale caveat, same class as ``expr_higher_order``: a row-at-a-time
    Python UDTF is the SLOW path (per-row Python dispatch, no Arrow
    batching in this form) — every hot-path tokenizer in the repo is
    codegen ``explode``/``split`` instead. The entry is bounded by
    design and exists to pin the API's semantics: per-row lateral
    correlation, multi-row emission, ordered output."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, word string")
    class _SplitWords:
        def eval(self, doc_id, text):
            for i, w in enumerate(re.split(r"\s+", text.strip()), start=1):
                yield (doc_id, i, w)

    spark.udtf.register("split_words", _SplitWords)
    docs = T(spark, sf_dir, "documents").where(
        (F.col("doc_id") < 50) & (F.trim(F.col("text")) != "")
    )
    return spark.sql(
        """
SELECT t.doc_id, t.pos, t.word
FROM {d} AS d, LATERAL split_words(d.doc_id, d.text) AS t
ORDER BY t.doc_id, t.pos
""",
        d=docs,
    )


@register(
    "expr_try_arithmetic",
    tags=("expression", "ansi", "try", "error-safe"),
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderkey > 7
            THEN NULL ELSE o_orderkey + 9223372036854775800 END AS t_add,
       round(o_totalprice / NULLIF(o_orderkey % 3, 0) + 1e-9, 4) AS t_div,
       TRY_CAST(o_orderpriority AS INTEGER)                      AS t_bad_cast,
       TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER)     AS t_ok_cast
FROM orders WHERE o_orderkey < 200
ORDER BY o_orderkey
""",
)
def expr_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error-safe ``try_*`` family — ``try_add`` (BIGINT
    overflow -> NULL instead of ARITHMETIC_OVERFLOW), ``try_divide``
    (/0 -> NULL), ``try_cast`` (malformed -> NULL). The reference
    predates ANSI SQL error semantics entirely (cudf kernels wrap
    silently); under Spark ANSI mode the un-prefixed forms RAISE, so
    the try_* battery is the dataframe-native way to keep a 100 TB job
    alive past a single poisoned row — per-row NULL, not job abort.
    Oracle: DuckDB's own semantics are the try-flavored ones natively
    (x/0 IS NULL, TRY_CAST) with the overflow case spelled as a CASE
    guard, so every NULL is value-compared, not just type-checked."""
    od = T(spark, sf_dir, "orders").where(F.col("o_orderkey") < 200)
    return (
        od.select(
            "o_orderkey",
            F.expr("try_add(o_orderkey, 9223372036854775800)").alias("t_add"),
            F.round(
                F.expr("try_divide(o_totalprice, o_orderkey % 3)") + 1e-9, 4
            ).alias("t_div"),
            F.expr("try_cast(o_orderpriority AS INT)").alias("t_bad_cast"),
            F.expr(
                "try_cast(substring(o_orderpriority, 1, 1) AS INT)"
            ).alias("t_ok_cast"),
        )
        .orderBy("o_orderkey")
    )
