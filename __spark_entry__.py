"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the full catalog from
:mod:`pyblazing_spark.plans` (one entry per operator in SURVEY.md §2,
each paired with DuckDB oracle SQL where SQL-expressible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyblazing_spark import plans  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    return plans.REGISTRY["tpch_q1"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    return plans.oracle_sql()
