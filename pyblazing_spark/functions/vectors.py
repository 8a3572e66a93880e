"""Vector math over ``array<float>`` embedding columns — JVM-side only.

``F.zip_with`` + ``F.aggregate`` keep the arithmetic inside whole-stage
codegen; no Arrow round-trip, no Python. At 100 TB this matters: a Pandas
UDF dot product moves every vector through Arrow; these expressions don't
move anything.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two float-array columns (double result)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    """L2 norm."""
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL if either vector has zero norm."""
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    """Euclidean distance."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def scale(a: Column, s: Column) -> Column:
    """Multiply every element by a scalar column."""
    return F.transform(a, lambda x: x * s)


def unit(a: Column) -> Column:
    """Normalize to unit length (element type becomes double)."""
    n = norm(a)
    return F.transform(a, lambda x: x / n)
