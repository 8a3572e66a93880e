"""Column-level function libraries (text analysis, vectors, multimodal).

All pure-expression helpers return ``pyspark.sql.Column`` built from
JVM-side builtins — no Python UDFs in the hot path."""

from pyblazing_spark.functions import text, vectors  # noqa: F401
