"""Dialect shim: reference (Calcite/MySQL-lex) constructs through
BlazingContext.sql. Most of the corpus parses unchanged in Spark SQL
(probed below); TO_DATE/TO_TIMESTAMP format strings are rewritten."""

from __future__ import annotations

import datetime

import pytest

from pyblazing_spark.context import BlazingContext
from pyblazing_spark.dialect import prepare, translate_format


@pytest.fixture(scope="module")
def bc(spark):
    return BlazingContext(spark=spark)


def test_format_token_translation():
    assert translate_format("YYYY-MM-DD") == "yyyy-MM-dd"
    assert translate_format("YYYY-MM-DD HH24:MI:SS") == "yyyy-MM-dd HH:mm:ss"
    assert translate_format("%Y/%m/%d %H:%M:%S") == "yyyy/MM/dd HH:mm:ss"
    # Spark-style patterns pass through untouched
    assert translate_format("yyyy-MM-dd") == "yyyy-MM-dd"


def test_prepare_rewrites_only_datetime_formats():
    q = "SELECT TO_DATE(col1, 'YYYY-MM-DD') FROM t WHERE s = 'YYYY-MM-DD'"
    out = prepare(q)
    assert "TO_DATE(col1, 'yyyy-MM-dd')" in out
    assert "s = 'YYYY-MM-DD'" in out  # plain literals untouched
    plain = "SELECT a, b FROM t WHERE c LIKE '%Y%'"
    assert prepare(plain) == plain


def test_calcite_to_date_through_sql(bc):
    row = bc.sql(
        "SELECT TO_DATE('2024-03-05', 'YYYY-MM-DD') AS d, "
        "TO_TIMESTAMP('2024/03/05 12:34:56', '%Y/%m/%d %H:%M:%S') AS ts"
    ).collect()[0]
    assert row.d == datetime.date(2024, 3, 5)
    assert row.ts.hour == 12 and row.ts.second == 56


def test_reference_constructs_parse_natively(bc):
    """The constructs SURVEY.md §7.1 flags as dialect risks — all parse
    and evaluate in Spark SQL without shimming."""
    row = bc.sql(
        """
        SELECT SUBSTRING('hello world' FROM 2 FOR 3)                    AS sub,
               TRIM(BOTH 'x' FROM 'xxhixx')                             AS tb,
               TRIM(LEADING 'x' FROM 'xxhi')                            AS tl,
               MOD(7, 3)                                                AS m,
               LOG10(100.0)                                             AS lg,
               DAYOFWEEK(DATE '2024-01-07')                             AS dow,
               TIMESTAMPADD(DAY, 3, TIMESTAMP '2024-01-01')             AS ta,
               TIMESTAMPDIFF(DAY, TIMESTAMP '2024-01-01',
                             TIMESTAMP '2024-02-01')                    AS td,
               TIMESTAMP '2024-01-01' + INTERVAL '3' DAY                AS il,
               CAST(42 AS VARCHAR(10))                                  AS vc,
               CHAR_LENGTH('abc')                                       AS cl,
               INITCAP('hello world')                                   AS ic
        """
    ).collect()[0]
    assert row.sub == "ell" and row.tb == "hi" and row.tl == "hi"
    assert row.m == 1 and row.lg == 2.0
    assert row.dow == 1  # Calcite numbering: Sunday = 1 — matches
    assert row.td == 31 and row.cl == 3 and row.ic == "Hello World"
    assert row.vc == "42"


def test_integer_division_follows_oracle_not_calcite(bc):
    """Documented delta: Calcite truncates 7/2 to 3; Spark AND the DuckDB
    correctness oracle both return 3.5, so we follow them; DIV gives the
    truncating form."""
    row = bc.sql("SELECT 7/2 AS frac, 7 DIV 2 AS trunc").collect()[0]
    assert row.frac == 3.5 and row.trunc == 3


def test_bare_varchar_cast_rewrite():
    q = "select cast(c_custkey as VARCHAR) from customer"
    assert "AS STRING)" in prepare(q)
    # length-qualified forms parse natively in Spark - untouched
    q2 = "select cast(c_custkey as VARCHAR(10)) from customer"
    assert prepare(q2) == q2


def test_slash_date_literal_rewrite():
    q = "select CAST('1997/05/02' as date) as my_date from region"
    assert "DATE '1997-05-02'" in prepare(q)


def test_eager_mode_uses_reference_arithmetic(bc):
    """Reference (Calcite/cuDF) semantics: runtime arithmetic never
    raises - division by zero yields NULL (dirSuite/TEST_14 divides by
    an orderkey domain that includes 0). Eager mode must honor that even
    when the session default is ANSI."""
    pdf = bc.sql("SELECT 1.0 / 0 AS d", eager=True)
    assert pdf["d"].isna().all()
    # and the session conf is restored afterwards
    assert bc.spark.conf.get("spark.sql.ansi.enabled", None) != "false"


def test_regexp_replace_backrefs_and_position(spark):
    """Calcite '\\1' replacement backrefs -> Spark '$1', scoped to
    REGEXP_REPLACE calls; the 4-arg position form must equal DuckDB's
    substring composition (the oracle shim) on a concrete value."""
    import duckdb

    from pyblazing_spark.dialect import prepare
    from scripts.reference_replay import oracle_translate

    sql = (
        r"SELECT REGEXP_REPLACE(x, '(b)(c)', '\2--\1') AS a, "
        r"REGEXP_REPLACE(x, 'e|a', 'Z', 4) AS b, '\1 untouched' AS c FROM t"
    )
    prepared = prepare(sql)
    assert "'$2--$1'" in prepared
    assert r"'\1 untouched'" in prepared  # literals outside the call keep \1
    spark_df = spark.sql(
        prepare(
            r"SELECT REGEXP_REPLACE('abcdefa', '(b)(c)', '\2--\1') AS a, "
            r"REGEXP_REPLACE('abcdefa', 'e|a', 'Z', 4) AS b"
        )
    ).collect()[0]
    duck = duckdb.sql(
        oracle_translate(
            r"SELECT REGEXP_REPLACE('abcdefa', '(b)(c)', '\2--\1') AS a, "
            r"REGEXP_REPLACE('abcdefa', 'e|a', 'Z', 4) AS b"
        )
    ).fetchone()
    assert (spark_df.a, spark_df.b) == duck


def test_regexp_replace_pattern_backmatch_preserved(spark):
    """A back-match like '(a)\\1' in the PATTERN argument must survive
    verbatim (ADVICE r5 #2: the old rewrite corrupted every literal in
    the call, turning the pattern into '(a)$1'). Only the replacement
    (and trailing args) get the '\\1' -> '$1' rewrite; nested calls in
    the subject argument are still reached."""
    from pyblazing_spark.dialect import prepare

    sql = r"SELECT REGEXP_REPLACE(x, '(a)\1', '<\1>') AS a FROM t"
    prepared = prepare(sql)
    assert r"'(a)\1'" in prepared  # pattern untouched
    assert "'<$1>'" in prepared  # replacement rewritten
    # end-to-end: doubled 'a' collapses via the back-match pattern
    # (backslash doubled for Spark's escape-processing string literals —
    # prepare() must pass it through untouched)
    e2e = prepare(r"SELECT REGEXP_REPLACE('xaayb', '(a)\\1', '<\1>') AS a")
    assert r"'(a)\\1'" in e2e and "'<$1>'" in e2e
    row = spark.sql(e2e).collect()[0]
    assert row.a == "x<a>yb"
    # nested REGEXP_REPLACE in the subject argument still rewritten
    nested = prepare(
        r"SELECT REGEXP_REPLACE(REGEXP_REPLACE(x, '(b)', '[\1]'), '(c)', '{\1}') FROM t"
    )
    assert "'[$1]'" in nested and "'{$1}'" in nested


def test_regexp_replace_name_inside_literal_not_a_call(spark):
    """'regexp_replace(' appearing as TEXT inside a string literal is not
    a nested call (ADVICE r7 #1): the scan must skip it, and backrefs
    later in that same literal must still be rewritten."""
    from pyblazing_spark.dialect import prepare

    sql = r"SELECT REGEXP_REPLACE(x, '(b)(c)', 'see regexp_replace( docs \2\1') AS a FROM t"
    prepared = prepare(sql)
    assert "'see regexp_replace( docs $2$1'" in prepared
    # and end-to-end through Spark
    e2e = prepare(
        r"SELECT REGEXP_REPLACE('abc', '(b)(c)', 'regexp_replace( \2\1') AS a"
    )
    row = spark.sql(e2e).collect()[0]
    assert row.a == "aregexp_replace( cb"
