"""Scalable global (unpartitioned) window computations.

``Window.orderBy(...)`` with no partition key collapses to ONE task —
correct but serial (the reference hit the same wall and built overlap
kernels for it, SURVEY.md §2.1 #16-17). These helpers compute the two
most common global windows at full parallelism with the standard
two-phase trick:

1. bucket rows by a DETERMINISTIC range id derived from the data (a
   seeded driver-side sample picks boundary keys, shipped back as
   literals — a few KB). NOT ``repartitionByRange``: its boundary
   sampling re-randomizes on every re-evaluation, so the two plan
   branches that must agree on the bucket id (the per-row window and
   the per-bucket offsets) would disagree;
2. compute the window LOCALLY per bucket
   (``Window.partitionBy(bucket)``),
3. broadcast tiny per-bucket aggregates (row counts / partial sums)
   and add each bucket's prefix offset.

Shuffle cost equals a plain ``orderBy``; the window itself never
serializes onto one executor. Results are identical to the
single-partition form (asserted in tests/test_global_window.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _range_bucket(
    df: DataFrame, order_cols: list[str], partitions: int, sample_rows: int = 100_000
) -> Column:
    """Deterministic range-bucket id for the ordering-key tuple.

    A seeded Arrow-collected sample of the FIRST ordering column picks
    ``partitions - 1`` boundary values; the bucket id is how many
    boundaries the row's leading key exceeds. Bucketing on the leading
    column alone is sufficient for every two-phase consumer here: rows
    that tie on it land in one bucket, so a row in an earlier bucket is
    STRICTLY smaller on the leading column and therefore strictly
    precedes every later-bucket row in the full lexicographic order —
    the invariant the cross-bucket offsets rely on. (The previous
    full-tuple form compared an n-field struct against each boundary
    per row and shipped the sample over py4j; scalar compares + Arrow
    are measurably cheaper at ~sf1.) Same data -> same boundaries ->
    every re-evaluation of every branch agrees.

    The sample is collected with ``toArrow()`` (not ``toPandas()``):
    pandas coerces an int64 column containing NULLs to float64, which
    loses exactness above 2^53 — boundary literals could shift and skew
    the buckets (bucket-id CORRECTNESS is unaffected: boundaries are
    fixed literals applied uniformly).  Arrow keeps nullable int64
    exact; NULL keys are additionally filtered Spark-side so they never
    occupy sample slots.

    100 TB cost note: the ``fraction=0.05`` sample is a full column
    scan of the leading key before the LIMIT.  Parquet column pruning
    makes that a single-column read, so at 100 TB it reads ~1 column x
    all row groups once per helper call — bounded but not free.  A
    per-partition reservoir (``mapInPandas`` emitting <=k rows per
    partition) would read the same bytes; a genuinely bounded variant
    needs scan-level TABLESAMPLE pushdown Spark's parquet source does
    not expose.  The deterministic-literals contract (same data -> same
    boundaries across plan branches) is load-bearing — do not swap in
    ``repartitionByRange``-style randomized sampling (SCALE.md
    §"_range_bucket sample scan")."""
    key0 = order_cols[0]
    nonnull = df.select(key0).where(F.col(key0).isNotNull())
    tbl = nonnull.sample(fraction=0.05, seed=42).limit(sample_rows).toArrow()
    if tbl.num_rows == 0:  # tiny input where the 5% sample came back empty
        tbl = nonnull.limit(sample_rows).toArrow()
    sample = sorted(tbl.column(0).drop_null().to_pylist())
    if len(sample) < 2 or partitions < 2:
        return F.lit(0)
    step = max(1, len(sample) // partitions)
    boundaries = []
    for i in range(step, len(sample), step):
        if len(boundaries) >= partitions - 1:
            break
        if not boundaries or sample[i] != boundaries[-1]:
            boundaries.append(sample[i])
    # cast each literal to the column's exact type (a pandas Timestamp
    # otherwise lands as TIMESTAMP vs a TIMESTAMP_NTZ column). NULL
    # leading keys compare false against every boundary -> bucket 0,
    # matching NULLS-FIRST ascending order.
    key_type = df.schema[key0].dataType
    pid: Column = F.lit(0)
    for b in boundaries:
        pid = pid + F.when(F.col(key0) > F.lit(b).cast(key_type), 1).otherwise(0)
    return pid


def global_row_number(
    df: DataFrame, order_cols: list[str], out_col: str = "rn", partitions: int = 32
) -> DataFrame:
    """Contiguous 1-based global row numbers in ``order_cols`` order.

    (``monotonically_increasing_id`` is NOT contiguous; a bare
    ``row_number().over(orderBy)`` is single-task. This is both.)"""
    tagged = df.withColumn("__pid", _range_bucket(df, order_cols, partitions))
    local_w = W.partitionBy("__pid").orderBy(*order_cols)
    local = tagged.withColumn("__local_rn", F.row_number().over(local_w))
    counts = tagged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    offsets = counts.select(
        "__pid",
        (
            F.sum("__n").over(W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1))
        ).alias("__offset"),
    ).fillna({"__offset": 0})
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__offset") + F.col("__local_rn")).cast("long"))
        .drop("__pid", "__local_rn", "__offset")
    )


def global_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str | Column,
    out_col: str = "running_sum",
    partitions: int = 32,
) -> DataFrame:
    """Global prefix sum of ``value_col`` in ``order_cols`` order —
    the unpartitioned ``sum().over(orderBy.rowsBetween(unbounded, 0))``
    without the single-task collapse."""
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    tagged = df.withColumn("__pid", _range_bucket(df, order_cols, partitions))
    local_w = W.partitionBy("__pid").orderBy(*order_cols).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    local = tagged.withColumn("__local_sum", F.sum(value).over(local_w))
    totals = tagged.groupBy("__pid").agg(F.sum(value).alias("__total"))
    offsets = totals.select(
        "__pid",
        (
            F.sum("__total").over(W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1))
        ).alias("__offset"),
    ).fillna({"__offset": 0.0})
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.col("__offset") + F.col("__local_sum"))
        .drop("__pid", "__local_sum", "__offset")
    )


def global_prefix_stats(
    df: DataFrame,
    order_cols: list[str],
    value_col: str | Column,
    rn_col: str = "rn",
    sum_col: str = "running_sum",
    partitions: int = 32,
) -> DataFrame:
    """Global row number AND global prefix sum in ONE two-phase pass.

    Fuses :func:`global_row_number` + :func:`global_running_sum`: one
    boundary sample, one bucket expression, one local window stage
    computing both functions over the same (bucket, order) spec, one
    per-bucket aggregate carrying (count, sum) together, one broadcast
    join. Composing the two single-function helpers instead would pay
    each of those twice — measured 3.3 s -> ~1.5 s at sf0.01 for the
    ``win_global_scaled`` entry, and at 100 TB it is one data pass
    instead of two."""
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    tagged = df.withColumn("__pid", _range_bucket(df, order_cols, partitions))
    rank_w = W.partitionBy("__pid").orderBy(*order_cols)
    sum_w = rank_w.rowsBetween(W.unboundedPreceding, W.currentRow)
    local = tagged.withColumn("__lrn", F.row_number().over(rank_w)).withColumn(
        "__lsum", F.sum(value).over(sum_w)
    )
    agg = tagged.groupBy("__pid").agg(
        F.count(F.lit(1)).alias("__n"), F.sum(value).alias("__t")
    )
    off_w = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = agg.select(
        "__pid",
        F.sum("__n").over(off_w).alias("__noff"),
        F.sum("__t").over(off_w).alias("__toff"),
    ).fillna({"__noff": 0, "__toff": 0.0})
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(rn_col, (F.col("__noff") + F.col("__lrn")).cast("long"))
        .withColumn(sum_col, F.col("__toff") + F.col("__lsum"))
        .drop("__pid", "__lrn", "__lsum", "__noff", "__toff")
    )


def global_ntile(
    df: DataFrame,
    order_cols: list[str],
    n_buckets: int,
    out_col: str = "bucket",
    partitions: int = 32,
) -> DataFrame:
    """``ntile(n_buckets) OVER (ORDER BY order_cols)`` without the
    single-task collapse of an unpartitioned window.

    Two-phase: a global contiguous rank (same machinery as
    :func:`global_row_number`) plus the closed-form ntile bucket
    assignment — with ``n`` rows, ``q = n div k`` and ``r = n mod k``,
    the first ``r`` buckets take ``q + 1`` rows and the rest take ``q``:

        bucket(i) = (i - 1) div (q + 1) + 1                 if i <= (q+1)*r
                    r + (i - (q+1)*r - 1) div q + 1         otherwise

    which is exactly how ntile splits remainders (verified against
    DuckDB/Spark ntile in the sort_zorder_cluster oracle). The total
    ``n`` rides in the same ≤``partitions``-row broadcast as the prefix
    offsets, so no extra scan and no driver round-trip: the data path
    is one range-style shuffle plus a per-bucket local window."""
    tagged = df.withColumn("__pid", _range_bucket(df, order_cols, partitions))
    local_w = W.partitionBy("__pid").orderBy(*order_cols)
    local = tagged.withColumn("__lrn", F.row_number().over(local_w))
    # Per-bucket counts are a SECOND aggregation over ``tagged`` (scan +
    # map-side partial + a 32-row shuffle), not max(__lrn) over the
    # windowed branch: the latter was measured — Catalyst does not
    # ReusedExchange across the Window here, so it paid the full
    # shuffle+sort+window twice, while this branch's shuffle carries
    # only ``partitions`` pre-aggregated rows.
    counts = tagged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    off_w = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
    tot_w = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    offsets = counts.select(
        "__pid",
        F.sum("__n").over(off_w).alias("__offset"),
        F.sum("__n").over(tot_w).alias("__total"),
    ).fillna({"__offset": 0})
    k = int(n_buckets)
    ranked = local.join(F.broadcast(offsets), "__pid").withColumn(
        "__rank", F.col("__offset") + F.col("__lrn")
    )
    q = F.expr(f"__total div {k}")
    r = F.col("__total") % k
    head = (q + 1) * r  # rows living in the (q+1)-sized buckets
    bucket = (
        F.when(F.col("__rank") <= head, F.expr(f"(__rank - 1) div (__total div {k} + 1) + 1"))
        # CASE evaluates lazily, so the `div q` here never sees q = 0
        # (q = 0 implies every row ranks <= head = n).
        .otherwise(r + F.expr(f"(__rank - (__total div {k} + 1) * (__total % {k}) - 1) div (__total div {k}) + 1"))
    )
    return ranked.withColumn(out_col, bucket.cast("int")).drop(
        "__pid", "__lrn", "__offset", "__total", "__rank"
    )
