"""Jar-free SQLite source: a PySpark Python DataSource over stdlib
``sqlite3``.

The reference ships a native SQLite provider with hand-implemented
column pruning and predicate pushdown
(``engine/src/io/data_provider/sql/SQLiteDataProvider.cpp:1-80``; the
WHERE-clause transpile lives in ``AbstractSQLDataProvider.cpp:42-86``).
Spark's own JDBC source covers that surface — but only with a driver
jar on the classpath.  This module is the executable fallback when no
``org.sqlite.JDBC`` jar exists: Spark 4's Python DataSource API gives
us Catalyst-driven filter pushdown (``DataSourceReader.pushFilters``)
and partitioned parallel reads, and stdlib ``sqlite3`` does the actual
scanning, so the path works in ANY Python deployment with zero extra
dependencies.

Scale shape (mirrors the reference's provider, re-expressed Spark-
first):

- **partitioned by rowid ranges** — ``partitions()`` splits
  ``[min(rowid), max(rowid)]`` into N contiguous ranges, one SQLite
  cursor per executor task (the reference used byte-offset batches);
- **predicate pushdown** — supported Catalyst filters are transpiled
  into the emitted ``WHERE`` clause so SQLite's B-tree does the
  filtering before a single row crosses into Python; unsupported
  filters are handed back to Spark (fail-safe semantics);
- **column pruning** — the emitted SELECT names only the requested
  columns (``columns`` option), never ``*``;
- rows stream out as **Arrow RecordBatches** (1024-row chunks), not
  per-row tuples.

**Pushdown-vs-reuse caveat (upstream behavior, pinned empirically):**
Spark 4.1's ``PythonDataSourceV2`` caches the read info (partitions +
read function) produced by the FIRST filter-pushdown planning in a
mutable field on the shared relation (``getOrCreateReadInfo`` /
``setReadInfo``), so a DataFrame scanned once with pushed filters
replays those filters for every LATER scan of the same relation —
``df.where(p).count(); df.count()`` returns the filtered count twice.
Therefore: the Catalyst-pushdown reader is used for EPHEMERAL reads
(one ``load()`` per query — how :func:`read_jdbc` is used directly),
while long-lived ``create_table`` relations get a reader WITHOUT
``pushFilters`` (Spark filters after the scan — always correct) plus
an optional static ``predicate`` option that bakes a WHERE into every
emitted SELECT (the reference's create-time pushdown shape).
"""

from __future__ import annotations

import sqlite3
from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualNullSafe,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)
from pyspark.sql.types import StructType

if TYPE_CHECKING:  # pragma: no cover
    import pyarrow as pa

#: sqlite declared-type fragment -> Spark DDL type.  SQLite's affinity
#: rules key off substrings (https://www.sqlite.org/datatype3.html §3.1);
#: first match wins, scan order matters (INT before ...).
_AFFINITY = (
    ("INT", "bigint"),
    ("CHAR", "string"),
    ("CLOB", "string"),
    ("TEXT", "string"),
    ("BLOB", "binary"),
    ("REAL", "double"),
    ("FLOA", "double"),
    ("DOUB", "double"),
    ("BOOL", "boolean"),
    ("DATETIME", "timestamp_ntz"),
    ("TIMESTAMP", "timestamp_ntz"),
    ("DATE", "date"),
    ("DEC", "double"),
    ("NUM", "double"),
)


def _spark_type(decltype: str) -> str:
    up = (decltype or "").upper()
    for frag, spark_t in _AFFINITY:
        if frag in up:
            return spark_t
    return "string"  # sqlite's own fallback affinity is NUMERIC; with no
    #                  declared type the stored value is dynamically typed,
    #                  and string is the lossless carrier


def _connect_ro(database: str) -> sqlite3.Connection:
    """Read-only connection: a plain connect() CREATES a missing db file
    (a silent empty-result trap for a typo'd path) — mode=ro raises."""
    return sqlite3.connect(f"file:{database}?mode=ro", uri=True)


def probe_schema(database: str, table: str) -> str:
    """DDL schema string for ``table`` via ``PRAGMA table_info``."""
    with _connect_ro(database) as con:
        cols = con.execute(f'PRAGMA table_info("{_ident(table)}")').fetchall()
    if not cols:
        raise ValueError(f"sqlite table not found: {table!r} in {database}")
    return ", ".join(f"`{c[1]}` {_spark_type(c[2])}" for c in cols)


def _ident(name: str) -> str:
    """Escape a double-quoted sqlite identifier."""
    return name.replace('"', '""')


def _sql_literal(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, (int, float)):
        return repr(v)
    s = str(v).replace("'", "''")
    return f"'{s}'"


def _startswith_sql(col: str, value: str) -> str:
    """Case-SENSITIVE prefix test.  sqlite ``LIKE`` is ASCII-case-
    insensitive by default (PRAGMA case_sensitive_like is connection
    state we don't own), so a pushed-down ``LIKE 'a%'`` would keep
    'AB' rows that Spark's StringStartsWith drops — found by the
    hypothesis property suite.  ``substr`` comparison is exact and
    character-based on both engines.

    The empty-needle case must stay NULL-PROPAGATING (``substr(col, 1,
    0) = ''`` is true for non-null, NULL for NULL) rather than ``IS NOT
    NULL``, whose inversion under a wrapping Not() would wrongly keep
    NULL rows Spark drops."""
    if value == "":
        return f"substr({col}, 1, 0) = ''"
    return f"substr({col}, 1, {len(value)}) = {_sql_literal(value)}"


def _endswith_sql(col: str, value: str) -> str:
    if value == "":
        return f"substr({col}, 1, 0) = ''"
    return f"substr({col}, -{len(value)}) = {_sql_literal(value)}"


def _contains_sql(col: str, value: str) -> str:
    # instr is case-sensitive; instr(X, '') = 1 so the empty-needle
    # case degenerates to IS NOT NULL semantics for free (NULL col
    # propagates NULL, which WHERE drops — matching Spark).
    return f"instr({col}, {_sql_literal(value)}) > 0"


def _compile_filter(f: Filter) -> str | None:
    """One Catalyst filter -> a sqlite WHERE fragment, or None when the
    filter cannot be expressed (it is then handed back to Spark).  The
    supported set mirrors the reference's transpile
    (``AbstractSQLDataProvider.cpp:42-86``: comparison, IN, NULL tests,
    LIKE-able string predicates)."""
    attr = getattr(f, "attribute", None)
    if attr is not None and len(attr) != 1:
        return None  # nested field: not addressable in a flat sqlite row
    col = f'"{_ident(attr[0])}"' if attr is not None else None
    if isinstance(f, EqualTo):
        return f"{col} = {_sql_literal(f.value)}"
    if isinstance(f, EqualNullSafe):
        return f"{col} IS {_sql_literal(f.value)}"
    if isinstance(f, GreaterThan):
        return f"{col} > {_sql_literal(f.value)}"
    if isinstance(f, GreaterThanOrEqual):
        return f"{col} >= {_sql_literal(f.value)}"
    if isinstance(f, LessThan):
        return f"{col} < {_sql_literal(f.value)}"
    if isinstance(f, LessThanOrEqual):
        return f"{col} <= {_sql_literal(f.value)}"
    if isinstance(f, In):
        if not f.value:
            # NULL-PROPAGATING false, not literal FALSE: Spark's
            # In(col, ()) is false for non-null col but NULL for a NULL
            # col, and a wrapping Not() must stay NULL (dropped) there —
            # 'NOT (1 = 0)' would wrongly keep NULL rows.
            return f"{col} <> {col}"
        return f"{col} IN ({', '.join(_sql_literal(v) for v in f.value)})"
    if isinstance(f, IsNull):
        return f"{col} IS NULL"
    if isinstance(f, IsNotNull):
        return f"{col} IS NOT NULL"
    if isinstance(f, StringStartsWith):
        return _startswith_sql(col, f.value)
    if isinstance(f, StringEndsWith):
        return _endswith_sql(col, f.value)
    if isinstance(f, StringContains):
        return _contains_sql(col, f.value)
    if isinstance(f, Not):
        inner = _compile_filter(f.child)
        return None if inner is None else f"NOT ({inner})"
    return None


class SQLiteReaderBase(DataSourceReader):
    """Reader WITHOUT dynamic pushdown — safe for long-lived relations
    (see module docstring).  A static ``predicate`` option still lands
    in every emitted WHERE."""

    def __init__(self, options: dict, schema: StructType) -> None:
        self.database = options.get("path") or options.get("database")
        if not self.database:
            raise ValueError("sqlite source needs a 'path' (database file) option")
        self.table = options.get("dbtable")
        if not self.table:
            raise ValueError("sqlite source needs a 'dbtable' option")
        self.num_partitions = int(options.get("numpartitions", 4))
        self.schema = schema
        self.where: list[str] = []
        if options.get("predicate"):
            self.where.append(str(options["predicate"]))

    # ------------------------------------------------------- partitions
    def partitions(self) -> list[InputPartition]:
        with _connect_ro(self.database) as con:
            lo, hi = con.execute(
                f'SELECT min(rowid), max(rowid) FROM "{_ident(self.table)}"'
            ).fetchone()
        if lo is None:  # empty table: one no-op partition
            return [InputPartition((None, None))]
        n = max(1, min(self.num_partitions, hi - lo + 1))
        step = (hi - lo + 1 + n - 1) // n
        return [
            InputPartition((lo + i * step, min(hi, lo + (i + 1) * step - 1)))
            for i in range(n)
            if lo + i * step <= hi
        ]

    # ------------------------------------------------------------ query
    def build_select(self, bounds: tuple[int | None, int | None]) -> str:
        """The exact SQL a partition executes — exposed so tests can
        assert pruning (unrequested columns absent) and pushdown (the
        WHERE carries the transpiled predicates)."""
        cols = ", ".join(f'"{_ident(f.name)}"' for f in self.schema.fields)
        sql = f'SELECT {cols} FROM "{_ident(self.table)}"'
        preds = list(self.where)
        lo, hi = bounds
        if lo is not None:
            preds.append(f"rowid BETWEEN {lo} AND {hi}")
        if preds:
            sql += " WHERE " + " AND ".join(f"({p})" for p in preds)
        return sql

    def read(self, partition: InputPartition) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        from pyspark.sql.pandas.types import to_arrow_schema

        bounds = partition.value
        if bounds == (None, None):
            return
        arrow_schema = to_arrow_schema(self.schema)
        with _connect_ro(self.database) as con:
            cur = con.execute(self.build_select(bounds))
            while True:
                rows = cur.fetchmany(1024)
                if not rows:
                    break
                columns = list(zip(*rows))
                # Two-step build: infer from the Python values, then cast
                # to the declared field type.  SQLite is dynamically typed
                # — DATE/DATETIME columns come back as ISO TEXT, and an
                # integer can legally sit in a REAL column — so a direct
                # typed pa.array() would throw where an Arrow cast
                # (string->timestamp, int->float) converts cleanly.
                arrays = []
                for i in range(len(arrow_schema)):
                    arr = pa.array(columns[i])
                    if arr.type != arrow_schema.field(i).type:
                        arr = arr.cast(arrow_schema.field(i).type)
                    arrays.append(arr)
                yield pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)


class SQLiteReader(SQLiteReaderBase):
    """Catalyst-pushdown reader for EPHEMERAL (one-query) relations."""

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            frag = _compile_filter(f)
            if frag is None:
                yield f  # Spark re-applies it after the scan
            else:
                self.where.append(frag)


class SQLiteDataSource(DataSource):
    """``spark.read.format("pysqlite")`` — options: ``path`` (db file),
    ``dbtable``, optional ``columns`` (comma list: prune the SELECT to a
    subset), ``numPartitions`` (rowid-range parallelism, default 4),
    ``predicate`` (static WHERE fragment), ``pushdown`` ("false" picks
    the reuse-safe reader; see module docstring)."""

    @classmethod
    def name(cls) -> str:
        return "pysqlite"

    def schema(self) -> str:
        full = probe_schema(
            self.options.get("path") or self.options.get("database"),
            self.options.get("dbtable"),
        )
        wanted = self.options.get("columns")
        if not wanted:
            return full
        keep = [c.strip() for c in wanted.split(",")]
        by_name = {}
        for part in full.split(", "):
            name, typ = part.split(" ", 1)
            by_name[name.strip("`")] = part
        missing = [c for c in keep if c not in by_name]
        if missing:
            raise ValueError(f"sqlite table has no column(s): {missing}")
        return ", ".join(by_name[c] for c in keep)

    def reader(self, schema: StructType) -> SQLiteReaderBase:
        opts = dict(self.options)
        if str(opts.get("pushdown", "true")).lower() == "false":
            return SQLiteReaderBase(opts, schema)
        return SQLiteReader(opts, schema)


def register_sqlite_source(spark) -> None:
    """Idempotently register the source and allow Catalyst to call
    ``pushFilters``.  The conf is REQUIRED, not an optimization: with it
    off, Spark's read planner raises on any reader that overrides
    ``pushFilters`` ("do not silently ignore pushFilters when pushdown
    is disabled", pyspark worker plan_data_source_read.py)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    if not getattr(spark, "_pysqlite_registered", False):
        spark.dataSource.register(SQLiteDataSource)
        spark._pysqlite_registered = True
