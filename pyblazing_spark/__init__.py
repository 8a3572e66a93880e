"""pyblazing_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of BlazingSQL (BlazingDB/pyBlazing).

The reference (``/root/reference``) is a three-layer GPU engine:
Python ``BlazingContext`` API -> Calcite relational algebra -> C++ kernel DAG
(``pyblazing/pyblazing/apiv2/context.py``,
``engine/src/execution_kernels/kernel_type.h:8-30``). Here, layers 2 and 3
are Spark SQL / Catalyst / Tungsten; this package provides:

- :class:`pyblazing_spark.context.BlazingContext` — the user-facing API
  (``create_table`` / ``sql`` / ``explain`` / ``describe_table`` ...).
- :mod:`pyblazing_spark.plans` — the query catalog covering the reference's
  full operator inventory (SURVEY.md §2), each with a DuckDB oracle.
- :mod:`pyblazing_spark.operators` — dedup / similarity / join helpers
  beyond stock Spark.
- :mod:`pyblazing_spark.functions` — text-analysis / vector / multimodal
  column functions for LLM-data pipelines.
- :mod:`pyblazing_spark.streaming` — Structured-Streaming extensions
  (the reference has no streaming; SURVEY.md §2.9).
"""

from pyblazing_spark.context import BlazingContext
from pyblazing_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["BlazingContext", "get_spark", "__version__"]
