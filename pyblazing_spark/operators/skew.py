"""Skew-mitigation utilities for joins and aggregations at 100 TB.

First line of defense is AQE (``spark.sql.adaptive.skewJoin.enabled``,
on by default in :mod:`pyblazing_spark.session`), which splits skewed
SHUFFLE partitions at runtime. Two limits, both probed on a real
Zipf(1.2) corpus (round 10, SCALE.md "Zipf-skew corpus probe"):

- AQE cannot help when one JOIN KEY alone exceeds an executor
  (runtime splitting still sends the whole key to one task on the
  build side);
- AQE splits a skewed partition along MAP-OUTPUT boundaries only: a
  hot key CLUSTERED in few input files (the natural layout of
  per-key-arriving logs) is silently unsplittable — the partition is
  flagged over threshold yet no ``skew=true`` rewrite appears, even
  under ``forceOptimizeSkewedJoin``. The identical rows round-robin
  spread across mappers DO get split.

Explicit salting has neither limit — the salt re-keys BEFORE the
shuffle, so layout and per-key volume are both irrelevant:

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


def salted_distinct_count(
    df: DataFrame,
    key: str,
    value: str,
    out_col: str = "n_distinct",
    salts: int = 64,
) -> DataFrame:
    """Exact distinct count per key where NO reducer ever materializes a
    key's full value set (the failure mode of finishing a salted
    ``collect_set`` with ``flatten(collect_list(...))`` — that funnels
    every distinct value of a hot key back into one phase-2 row).

    Phase 1 bounds partial state: per-(key, salt) ``collect_set`` holds
    at most 1/salts of a hot key's values. Phase 2 explodes the partials
    back to (key, value) ROWS and counts via distinct -> count: the
    dedup shuffle hashes on (key, value), so a hot key's values spread
    across the whole cluster, and the final count per key aggregates
    longs, not sets."""
    salt = (F.rand(seed=42) * salts).cast("int")
    partials = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(F.collect_set(value).alias("__set"))
    )
    return (
        partials.select(key, F.explode("__set").alias("__v"))
        .distinct()
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias(out_col))
    )
