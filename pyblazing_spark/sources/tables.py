"""Loaders for the driver's synthetic TPC-H-ish tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under an ``sf_dir``.

Scan strategy notes (100 TB stance): plain ``spark.read.parquet`` gives
Catalyst predicate pushdown, column pruning, and partition discovery for
free — the reference needed a whole skip-data subsystem for the same effect
(``engine/src/skip_data/SkipDataProcessor.cpp:49-120``). We deliberately do
NOT eagerly cache or collect: every loader returns a lazy DataFrame so the
optimizer sees the full plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyblazing_spark.session import ensure_runtime_confs

#: All tables the driver materializes (TESTDATA.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables that should always be broadcast in joins.
BROADCAST_DIMS: frozenset[str] = frozenset({"region", "nation", "supplier"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a lazy DataFrame.

    ``events.ts`` is physically TIMESTAMP(NANOS) parquet, which Spark reads
    (under ``spark.sql.legacy.parquet.nanosAsLong``) as int64 nanoseconds;
    we convert to TIMESTAMP_NTZ microseconds — the same ns->us truncation
    DuckDB applies, so oracle comparisons line up exactly.
    """
    ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # Integer `div`, NOT floor(x/1000): ns epoch values (~1.7e18)
        # exceed double's 2^53 integer range, so float division is off
        # by up to a few microseconds.
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    return df


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Register each table as a temp view (for the SQL entry points)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
