"""Skew-mitigation utilities for joins and aggregations at 100 TB.

First line of defense is AQE (``spark.sql.adaptive.skewJoin.enabled``,
on by default in :mod:`pyblazing_spark.session`), which splits skewed
SHUFFLE partitions at runtime. AQE cannot help when one JOIN KEY alone
exceeds an executor (runtime splitting still sends the whole key to one
task on the build side) — for that, explicit salting:

- :func:`salted_join`: replicate the small side R times, salt the big
  side uniformly in [0, R) — each hot key's rows spread over R tasks.
  Cost: R copies of the small side through the shuffle, so use after
  broadcast stops being possible and AQE still spills.
- :func:`two_phase_agg`: pre-aggregate on (key, salt) then finish on
  key — bounds any single reducer's group size for high-cardinality-
  value aggregations (the classic hot-key count/sum fix; Spark's partial
  aggregation already does this for algebraic aggs, the helper is for
  when the planner can't, e.g. collect_set / exact distinct counting).

Both are pure DataFrame rewrites — no RDDs, no custom partitioners.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    ``big`` gets a uniform random salt in [0, salts); ``small`` is
    exploded to every salt value; the join key becomes (key, salt). The
    result equals ``big.join(small, on, how)`` row-for-row, but each hot
    key now occupies ``salts`` shuffle partitions instead of one.

    ``how`` supports inner/left (the replicated side must be the
    match-only side for outer semantics to hold).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    salt = (F.rand(seed=42) * salts).cast("int")
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    out = big_s.join(small_s, [on, "__salt"], how)
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    agg_col: Column,
    final_agg,
    out_col: str = "value",
    salts: int = 64,
) -> DataFrame:
    """Aggregate ``agg_col`` per ``key`` in two phases via a salt column.

    Phase 1 groups on (key, salt) producing a partial; phase 2 groups on
    key applying ``final_agg`` (a function Column -> Column, e.g.
    ``F.sum``) over the partials into ``out_col``. Correct for
    decomposable aggregates (sum/count/min/max/set-union)."""
    salt = (F.rand(seed=42) * salts).cast("int")
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(agg_col.alias("__partial"))
    )
    return phase1.groupBy(key).agg(final_agg(F.col("__partial")).alias(out_col))
