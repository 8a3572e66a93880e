"""Input routing + file readers with reference-kwarg translation.

Mirrors reference ``create_table`` routing (context.py:2079-2577) and the
CSV/JSON/Parquet/ORC kwarg surface (context.py:884-940). Spark's readers
subsume the reference's C++ parsers (``engine/src/io/data_parser/*``);
Hive-partitioned folder discovery is built into Spark's FileIndex
(reference needed ``hive.py:96-295`` + partition filtering
``context.py:476-627``).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: reference CSV kwargs (context.py:890-930) -> Spark csv reader options.
#: ``thousands`` / ``true_values`` / ``false_values`` / ``dayfirst`` have
#: no reader option and are honored with post-read column rewrites below.
_CSV_KWARG_MAP: dict[str, str] = {
    "delimiter": "sep",
    "sep": "sep",
    "header": "header",
    "skiprows": "skipRows",
    "skipinitialspace": "ignoreLeadingWhiteSpace",
    "skip_blank_lines": "mode",  # handled specially below
    "quotechar": "quote",
    "escapechar": "escape",
    "lineterminator": "lineSep",
    "comment": "comment",
    "na_values": "nullValue",
    "compression": "compression",
}

_NUMERIC_TYPES: frozenset[str] = frozenset(
    {"tinyint", "smallint", "int", "bigint", "float", "double", "decimal(20,0)"}
)


def _spark_type(dtype: str) -> str:
    """Translate reference/pandas dtype names to Spark SQL type names.

    The reference accepts cudf dtype strings for CSV ``dtype`` kwargs; we
    widen unsigned ints per SURVEY.md §1.2."""
    mapping = {
        "int8": "tinyint",
        "int16": "smallint",
        "int32": "int",
        "int64": "bigint",
        "uint8": "smallint",
        "uint16": "int",
        "uint32": "bigint",
        "uint64": "decimal(20,0)",
        "float32": "float",
        "float64": "double",
        "float": "double",
        "str": "string",
        "object": "string",
        "bool": "boolean",
        "date32": "date",
        "date64": "timestamp_ntz",
        "datetime64[s]": "timestamp_ntz",
        "datetime64[ms]": "timestamp_ntz",
        "datetime64[us]": "timestamp_ntz",
        "datetime64[ns]": "timestamp_ntz",
    }
    return mapping.get(dtype, dtype)


def _infer_format(path: str, kwargs: dict[str, Any]) -> str:
    if "file_format" in kwargs:
        return str(kwargs["file_format"]).lower()
    lowered = path.rstrip("/*").lower()
    for ext, fmt in (
        (".parquet", "parquet"),
        (".orc", "orc"),
        (".csv", "csv"),
        (".psv", "csv"),
        (".tbl", "csv"),
        (".txt", "csv"),
        (".json", "json"),
        (".xml", "xml"),
        (".avro", "avro"),
    ):
        if lowered.endswith(ext):
            return fmt
    return "parquet"


def read_files(
    spark: SparkSession, paths: list[str], **kwargs: Any
) -> tuple[DataFrame, str]:
    fmt = _infer_format(paths[0], kwargs)
    reader = spark.read
    if fmt == "csv":
        options: dict[str, Any] = {"inferSchema": "true", "header": "false"}
        for ref_key, spark_key in _CSV_KWARG_MAP.items():
            if ref_key in kwargs and spark_key:
                options[spark_key] = kwargs[ref_key]
        if ".psv" in paths[0] or ".tbl" in paths[0]:
            options.setdefault("sep", "|")
        if kwargs.get("dayfirst"):
            # pandas-style day-first parsing: no Spark reader flag. On the
            # schema-inference path only a single pattern can be given to
            # the reader (slash-separated, the common case); when dtypes
            # are DECLARED, date/timestamp columns are instead read as
            # string and parsed against the separator variants pandas'
            # dayfirst accepts (/, -, .) — see post_dayfirst below.
            options.setdefault("dateFormat", "d/M/yyyy")
            options.setdefault("timestampFormat", "d/M/yyyy H:m:s")
        names = kwargs.get("names")
        dtypes = kwargs.get("dtype")
        thousands = kwargs.get("thousands")
        true_values = [str(v) for v in kwargs.get("true_values") or []]
        false_values = [str(v) for v in kwargs.get("false_values") or []]
        # columns whose declared type can't be parsed directly because the
        # raw text carries a thousands separator or custom bool spellings:
        # read them as string, rewrite after the scan.
        post_numeric: list[tuple[str, str]] = []
        post_bool: list[str] = []
        post_dayfirst: list[tuple[str, str]] = []
        if names and dtypes:
            parts = []
            for n, t in zip(names, dtypes):
                st = _spark_type(str(t))
                if thousands and st in _NUMERIC_TYPES:
                    post_numeric.append((n, st))
                    st = "string"
                elif (true_values or false_values) and st == "boolean":
                    post_bool.append(n)
                    st = "string"
                elif kwargs.get("dayfirst") and st in (
                    "date",
                    "timestamp",
                    "timestamp_ntz",
                ):
                    post_dayfirst.append((n, st))
                    st = "string"
                parts.append(f"`{n}` {st}")
            reader = reader.schema(", ".join(parts))
            options.pop("inferSchema", None)
        elif names:
            options["header"] = "false"
        df = reader.options(**options).csv(paths)
        if names and not dtypes:
            df = df.toDF(*names)
        for n, st in post_numeric:
            df = df.withColumn(
                n, F.replace(F.col(n), F.lit(str(thousands)), F.lit("")).cast(st)
            )
        for n in post_bool:
            col = F.col(n)
            expr = F.when(col.isin(true_values), F.lit(True)) if true_values else None
            if false_values:
                base = expr if expr is not None else F.when(F.lit(False), F.lit(True))
                expr = base.when(col.isin(false_values), F.lit(False))
            df = df.withColumn(n, expr.otherwise(col.try_cast("boolean")).alias(n))
        for n, st in post_dayfirst:
            # pandas dayfirst accepts any common separator; try each
            # day-leading pattern and take the first that parses.
            if st == "date":
                pats = ("d/M/yyyy", "d-M-yyyy", "d.M.yyyy")
                attempts = [F.expr(f"try_to_date(`{n}`, '{p}')") for p in pats]
            else:
                pats = ("d/M/yyyy H:m:s", "d-M-yyyy H:m:s", "d.M.yyyy H:m:s")
                attempts = [F.expr(f"try_to_timestamp(`{n}`, '{p}')") for p in pats]
            df = df.withColumn(n, F.coalesce(*attempts).cast(st))
        return df, "csv"
    if fmt == "json":
        options = {"multiLine": "false" if kwargs.get("lines", True) else "true"}
        names = kwargs.get("names")
        dtypes = kwargs.get("dtype")
        if names and dtypes:
            # declared schema (same cudf-style kwargs the CSV path takes):
            # skips the inference pass, and an empty-input write — only
            # _SUCCESS in the dir — still reads back as an empty frame
            # instead of throwing UNABLE_TO_INFER_SCHEMA.
            reader = reader.schema(
                ", ".join(
                    f"`{n}` {_spark_type(str(t))}" for n, t in zip(names, dtypes)
                )
            )
        return reader.options(**options).json(paths), "json"
    if fmt == "orc":
        return reader.orc(*paths), "orc"
    if fmt == "xml":
        # Built-in since Spark 4.0 (no reference counterpart — format-
        # matrix superset).  rowTag is the one mandatory option; schema
        # declaration mirrors the CSV/JSON kwarg surface.
        options = {"rowTag": kwargs.get("row_tag", "row")}
        names = kwargs.get("names")
        dtypes = kwargs.get("dtype")
        if names and dtypes:
            reader = reader.schema(
                ", ".join(
                    f"`{n}` {_spark_type(str(t))}" for n, t in zip(names, dtypes)
                )
            )
        return reader.options(**options).format("xml").load(paths), "xml"
    if fmt == "avro":
        # jar-free from-spec path (sources/avro_files.py) — the
        # spark-avro connector module is not deployable here; the
        # reference has no Avro support at all (format-matrix superset).
        extra = {k for k in kwargs if k not in ("file_format", "split_size")}
        if extra:
            # every other format forwards reader kwargs; this reader
            # takes only split_size — dropping the rest silently would
            # be a lie
            raise ValueError(
                "avro reader options are not supported by the jar-free "
                f"from-spec path: {sorted(extra)}"
            )
        if "split_size" in kwargs:
            # byte-range parallelism WITHIN containers (monolithic-file
            # scale path) — sources/avro_split_ds.py
            from pyblazing_spark.sources.avro_split_ds import read_avro_split

            frames = [
                read_avro_split(spark, p, split_size=int(kwargs["split_size"]))
                for p in paths
            ]
            df = frames[0]
            for extra_df in frames[1:]:
                df = df.unionByName(extra_df)
            return df, "avro"
        from pyblazing_spark.sources.avro_files import read_avro

        frames = [read_avro(spark, p) for p in paths]
        df = frames[0]
        for extra in frames[1:]:
            df = df.unionByName(extra)
        return df, "avro"
    return reader.parquet(*paths), "parquet"


def widen_unsigned(table: "Any") -> "Any":
    """Losslessly widen unsigned Arrow columns to the signed/decimal
    types Spark can hold (SURVEY §1.2; the reference reads and tests
    unsigned columns — ``unsignedTypeTest.py``, catalog enum
    ``CatalogColumnDataType.java:19-47``): uint8→int16, uint16→int32,
    uint32→int64, uint64→decimal(20,0).  This matches what Spark's own
    parquet reader does for unsigned LOGICAL types, so in-memory ingest
    (pandas/Arrow ``create_table``) agrees with file ingest."""
    import pyarrow as pa

    widening = {
        pa.uint8(): pa.int16(),
        pa.uint16(): pa.int32(),
        pa.uint32(): pa.int64(),
        pa.uint64(): pa.decimal128(20, 0),
    }
    for i, f in enumerate(table.schema):
        target = widening.get(f.type)
        if target is not None:
            table = table.set_column(
                i, pa.field(f.name, target, f.nullable), table.column(i).cast(target)
            )
    return table


def _jdbc_driver_present(spark: SparkSession, klass: str) -> bool:
    """True when the JDBC driver class is loadable in the session JVM."""
    try:
        spark._jvm.java.lang.Class.forName(klass)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def read_jdbc(spark: SparkSession, table_name: str, **kwargs: Any) -> DataFrame:
    """``from_sql``-style kwargs (reference context.py:930-938) -> JDBC read.

    Predicate pushdown + partitioned reads are built into Spark's JDBC
    source (the reference hand-implemented both:
    ``AbstractSQLDataProvider.cpp:42-86``, ``MySQLDataProvider.cpp:206``).
    """
    backend = kwargs.get("from_sql", "postgresql")
    host = kwargs.get("hostname", "localhost")
    port = kwargs.get("port", {"mysql": 3306, "postgresql": 5432}.get(backend, 5432))
    database = kwargs.get("database", "")
    if backend == "sqlite" and not _jdbc_driver_present(spark, "org.sqlite.JDBC"):
        # Jar-free executable path (reference SQLiteDataProvider.cpp:1-80):
        # stdlib-sqlite3 Python DataSource with Catalyst filter pushdown
        # and rowid-range partitioned reads — see sources/sqlite_ds.py.
        from pyblazing_spark.sources.sqlite_ds import register_sqlite_source

        register_sqlite_source(spark)
        reader = (
            spark.read.format("pysqlite")
            .option("path", database)
            .option("dbtable", kwargs.get("table", table_name))
        )
        # Catalyst pushdown is only safe for one-query (ephemeral)
        # relations: Spark 4.1 pins the first pushdown's read info on
        # the shared relation (see sqlite_ds module docstring), so
        # create_table routes here with pushdown=False and can use the
        # static `predicate` option instead.
        if not kwargs.get("pushdown", True):
            reader = reader.option("pushdown", "false")
        for opt in ("columns", "numPartitions", "predicate"):
            if opt in kwargs:
                reader = reader.option(opt, str(kwargs[opt]))
        return reader.load()
    if backend in ("sqlite", "derby"):
        # file-backed engines: `database` is a filesystem path. Derby's
        # embedded driver ships with Spark, so the derby path is
        # executable end-to-end in any deployment (tests/test_sources.py
        # drives it with pushdown asserted); sqlite/mysql/postgresql
        # need their driver jar on the classpath (--jars / --packages).
        url = f"jdbc:{backend}:{database}"
    else:
        url = f"jdbc:{backend}://{host}:{port}/{database}"
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", kwargs.get("table", table_name))
    )
    if "username" in kwargs:
        reader = reader.option("user", kwargs["username"])
    if "password" in kwargs:
        reader = reader.option("password", kwargs["password"])
    for opt in ("partitionColumn", "lowerBound", "upperBound", "numPartitions"):
        if opt in kwargs:
            reader = reader.option(opt, str(kwargs[opt]))
    return reader.load()


def read_source(
    spark: SparkSession, input: Any, **kwargs: Any
) -> tuple[DataFrame, str, list[str]]:
    """Route ``create_table`` input to a DataFrame (reference :2079-2577)."""
    table_default = kwargs.pop("_table_name", "")
    if kwargs.get("from_sql"):
        # Catalog tables are long-lived, many-query relations: default
        # the sqlite bridge to its reuse-safe reader (no dynamic
        # pushdown) unless the caller opted in explicitly.
        kwargs.setdefault("pushdown", False)
        return read_jdbc(spark, str(input), **kwargs), "jdbc", []
    from pyblazing_spark.sources.hive import looks_like_hive_cursor, read_hive_cursor

    if looks_like_hive_cursor(input):
        return read_hive_cursor(spark, input, table_default, **kwargs)
    if isinstance(input, DataFrame):
        return input, "dataframe", []
    if isinstance(input, str):
        input = [input]
    if isinstance(input, (list, tuple)) and input and isinstance(input[0], str):
        paths = [str(p) for p in input]
        df, fmt = read_files(spark, paths, **kwargs)
        return df, fmt, paths
    # pandas / pyarrow / anything createDataFrame accepts
    try:
        import pandas as pd

        if isinstance(input, pd.DataFrame):
            if any(str(dt).startswith("uint") for dt in input.dtypes):
                # pandas uintN dtypes silently overflow through the
                # default conversion (uint64 near 2**64 -> NULL bigint):
                # detour through Arrow, which preserves them, then widen.
                import pyarrow as pa

                return (
                    spark.createDataFrame(
                        widen_unsigned(pa.Table.from_pandas(input, preserve_index=False))
                    ),
                    "pandas",
                    [],
                )
            return spark.createDataFrame(input), "pandas", []
    except ImportError:  # pragma: no cover
        pass
    try:
        import pyarrow as pa

        if isinstance(input, pa.Table):
            if any(pa.types.is_unsigned_integer(f.type) for f in input.schema):
                return spark.createDataFrame(widen_unsigned(input)), "arrow", []
            return spark.createDataFrame(input.to_pandas()), "arrow", []
    except ImportError:  # pragma: no cover
        pass
    return spark.createDataFrame(input), "rows", []
