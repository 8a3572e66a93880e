"""DataFrame-level operators beyond stock Spark: deduplication families,
similarity search. Each is a function DataFrame -> DataFrame, designed for
100 TB inputs (no collect, no cross join without a pre-filter)."""

from pyblazing_spark.operators import (  # noqa: F401
    dedup,
    global_window,
    multimodal,
    similarity,
    skew,
    temporal,
)
