"""Data sources: testdata tables, file readers, JDBC, in-memory DataFrames."""

from pyblazing_spark.sources.tables import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views"]
