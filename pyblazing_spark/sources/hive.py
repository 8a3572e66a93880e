"""Hive-cursor table registration (reference parity:
``pyblazing/pyblazing/apiv2/hive.py:96-295``, ``context.py:2212-2298``).

The reference accepts a live pyhive cursor in ``create_table``, runs
``DESCRIBE FORMATTED`` / ``SHOW PARTITIONS``, parses location + schema +
partition columns, expands partition folders by hand, and feeds the file
list to its own parsers. Spark-first, almost all of that collapses: we
still read the metadata through the cursor (duck-typed — anything with
``.execute()`` / ``.fetchall()``), but then hand the LOCATION to Spark
with ``basePath`` set; Spark's FileIndex discovers ``k=v`` partition
directories, types the virtual partition columns, and prunes partitions
from query predicates natively. ``partitions=`` pre-filters become a
``.where()`` that partition pruning pushes into the scan.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Hive type name -> Spark SQL type name (identical except the aliases).
_HIVE_TO_SPARK_TYPE: dict[str, str] = {
    "integer": "int",
    "long": "bigint",
    "short": "smallint",
    "byte": "tinyint",
    "real": "float",
    "string": "string",
}


def _spark_type_name(hive_type: str) -> str:
    t = hive_type.strip().lower()
    return _HIVE_TO_SPARK_TYPE.get(t, t)


def parse_describe_formatted(rows: list[tuple]) -> dict[str, Any]:
    """Parse pyhive ``DESCRIBE FORMATTED`` triples into a schema dict:
    ``{columns: [(name, type, is_partition)], location, file_type,
    delimiter}`` (the same facts the reference extracts,
    ``hive.py:181-232``)."""
    schema: dict[str, Any] = {
        "columns": [],
        "location": None,
        "file_type": "parquet",
        "delimiter": None,
    }
    section = "columns"  # DESCRIBE output leads with the data columns
    skip_header = False
    for row in rows:
        first = (row[0] or "").strip() if row and row[0] is not None else ""
        second = row[1] if len(row) > 1 else None
        if first == "# col_name":
            skip_header = False
            continue
        if first == "# Partition Information":
            section = "partitions"
            skip_header = True
            continue
        if first == "# Detailed Table Information":
            section = "detail"
            continue
        if section in ("columns", "partitions"):
            if not first:
                continue
            if skip_header:
                skip_header = False
            schema["columns"].append(
                (first, _spark_type_name(str(second or "string")), section == "partitions")
            )
        elif section == "detail":
            if first.startswith("Location:") and second:
                loc = str(second)
                schema["location"] = loc[5:] if loc.startswith("file:") else loc
            elif first.startswith("InputFormat:") and second:
                fmt_src = str(second)
                for marker, fmt in (
                    ("TextInputFormat", "csv"),
                    ("ParquetInputFormat", "parquet"),
                    ("OrcInputFormat", "orc"),
                    ("JsonInputFormat", "json"),
                ):
                    if marker in fmt_src:
                        schema["file_type"] = fmt
            elif second is not None and str(second).startswith("field.delim"):
                schema["delimiter"] = str(row[2])[0] if len(row) > 2 and row[2] else None
    return schema


def read_hive_cursor(
    spark: SparkSession,
    cursor: Any,
    table_name: str,
    hive_table_name: str | None = None,
    hive_database_name: str = "default",
    partitions: dict[str, list[Any]] | None = None,
    **_: Any,
) -> tuple[DataFrame, str, list[str]]:
    """Build a DataFrame for a Hive table via its metastore cursor.

    Returns (df, file_type, [location]) — the ``read_source`` contract.
    """
    hive_table = hive_table_name or table_name
    cursor.execute(f"use {hive_database_name}")
    cursor.execute(f"describe formatted {hive_table}")
    schema = parse_describe_formatted(list(cursor.fetchall()))
    if not schema["location"]:
        raise ValueError(
            f"Hive cursor returned no Location: for table {hive_table!r}"
        )
    location = schema["location"]
    part_cols = [c for c in schema["columns"] if c[2]]
    fmt = schema["file_type"]

    reader = spark.read.option("basePath", location)
    if fmt == "csv":
        # CSV carries no embedded schema: type the data columns from the
        # cursor metadata (partition columns stay virtual — Spark types
        # them from the directory names).
        data_cols = [(n, t) for n, t, is_p in schema["columns"] if not is_p]
        ddl = ", ".join(f"`{n}` {t}" for n, t in data_cols)
        reader = reader.schema(ddl).option("header", "false")
        if schema["delimiter"]:
            reader = reader.option("sep", schema["delimiter"])
        df = reader.csv(location)
    elif fmt == "json":
        df = reader.json(location)
    elif fmt == "orc":
        df = reader.orc(location)
    else:
        df = reader.parquet(location)

    if partitions:
        unknown = set(partitions) - {c[0] for c in part_cols}
        if unknown:
            raise ValueError(
                f"partitions= names non-partition columns {sorted(unknown)}; "
                f"partition columns are {[c[0] for c in part_cols]}"
            )
        for col, values in partitions.items():
            # Catalyst partition pruning turns this into directory
            # selection — the Spark-native form of the reference's
            # folder-list filtering (hive.py:113-129).
            df = df.where(F.col(col).isin(list(values)))
    return df, fmt, [location]


def looks_like_hive_cursor(obj: Any) -> bool:
    """Duck-typing matching the reference's TypeVar check
    (``context.py:2206-2210`` accepts pyhive ``Cursor``): any object with
    execute/fetchall and no DataFrame-ish surface."""
    return (
        callable(getattr(obj, "execute", None))
        and callable(getattr(obj, "fetchall", None))
        and not hasattr(obj, "createOrReplaceTempView")
    )
