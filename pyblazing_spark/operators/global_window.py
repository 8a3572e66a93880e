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
3. collect the tiny per-bucket aggregates (row counts / partial sums —
   bounded: one row per bucket) to the driver and fold each bucket's
   prefix offset into the plan as a LITERAL array lookup (r14: this
   replaced a second scan + 32-row window + broadcast hash join that
   every fact row probed — see :func:`_pid_offsets`).

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


def _pid_offsets(
    tagged: DataFrame, *aggs: Column
) -> list[tuple]:
    """Collect the per-bucket aggregates (count / sum) to the DRIVER and
    return ``[(pid, agg0, agg1, ...), ...]`` sorted by pid.

    Bounded by construction: one row per range bucket (≤ ``partitions``,
    default 32) — the same cost class as the boundary-literal sample.
    r14 optimization (guide §1.2 "don't compute things twice", §7.2
    duplicated subtrees): the previous shape kept the counts as a PLAN
    BRANCH — a second full scan + boundary-CASE evaluation + partial
    aggregation feeding a 32-row window and a broadcast hash join that
    every fact row then probed. Catalyst cannot share the exchange
    between the two branches (column pruning narrows the counts branch's
    exchange, and there is no ReusedExchange across a Window), so the
    branch always re-read the input. Collecting the ≤32-row aggregate
    once and folding the offsets into LITERALS removes the second
    window, the broadcast exchange, and the per-row join probe — the
    fact-side plan becomes exchange → sort → window → project.
    Cross-engine float note: offsets are accumulated in ascending pid
    order, exactly the order the old single-task unbounded-preceding
    window summed them in, so double results are bit-identical."""
    rows = tagged.groupBy("__pid").agg(*aggs).collect()
    return sorted((tuple(r) for r in rows), key=lambda t: t[0])


def _offset_lit(per_pid: dict[int, object], max_pid: int, zero):
    """Array literal ``offsets[pid + 1]`` lookup column (pids are dense
    0..max_pid by construction; buckets with no rows never probe it)."""
    return F.lit([per_pid.get(p, zero) for p in range(max_pid + 1)])


def global_row_number(
    df: DataFrame, order_cols: list[str], out_col: str = "rn", partitions: int = 32
) -> DataFrame:
    """Contiguous 1-based global row numbers in ``order_cols`` order.

    (``monotonically_increasing_id`` is NOT contiguous; a bare
    ``row_number().over(orderBy)`` is single-task. This is both.)"""
    tagged = df.withColumn("__pid", _range_bucket(df, order_cols, partitions))
    counts = _pid_offsets(tagged, F.count(F.lit(1)).alias("__n"))
    offs: dict[int, int] = {}
    acc = 0
    for pid, n in counts:
        offs[pid] = acc
        acc += n
    max_pid = counts[-1][0] if counts else 0
    local_w = W.partitionBy("__pid").orderBy(*order_cols)
    return (
        tagged.withColumn("__local_rn", F.row_number().over(local_w))
        .withColumn(
            out_col,
            (
                F.element_at(_offset_lit(offs, max_pid, 0), F.col("__pid") + 1)
                + F.col("__local_rn")
            ).cast("long"),
        )
        .drop("__pid", "__local_rn")
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
    totals = _pid_offsets(tagged, F.sum(value).alias("__total"))
    offs: dict[int, float] = {}
    acc = 0.0
    for pid, t in totals:
        offs[pid] = acc
        if t is not None:  # SQL window sum skips NULL totals too
            acc += t
    max_pid = totals[-1][0] if totals else 0
    local_w = W.partitionBy("__pid").orderBy(*order_cols).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        tagged.withColumn("__local_sum", F.sum(value).over(local_w))
        .withColumn(
            out_col,
            F.element_at(_offset_lit(offs, max_pid, 0.0), F.col("__pid") + 1)
            + F.col("__local_sum"),
        )
        .drop("__pid", "__local_sum")
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
    agg = _pid_offsets(
        tagged, F.count(F.lit(1)).alias("__n"), F.sum(value).alias("__t")
    )
    noffs: dict[int, int] = {}
    toffs: dict[int, float] = {}
    nacc, tacc = 0, 0.0
    for pid, n, t in agg:
        noffs[pid], toffs[pid] = nacc, tacc
        nacc += n
        if t is not None:
            tacc += t
    max_pid = agg[-1][0] if agg else 0
    rank_w = W.partitionBy("__pid").orderBy(*order_cols)
    sum_w = rank_w.rowsBetween(W.unboundedPreceding, W.currentRow)
    local = tagged.withColumn("__lrn", F.row_number().over(rank_w)).withColumn(
        "__lsum", F.sum(value).over(sum_w)
    )
    return (
        local.withColumn(
            rn_col,
            (
                F.element_at(_offset_lit(noffs, max_pid, 0), F.col("__pid") + 1)
                + F.col("__lrn")
            ).cast("long"),
        )
        .withColumn(
            sum_col,
            F.element_at(_offset_lit(toffs, max_pid, 0.0), F.col("__pid") + 1)
            + F.col("__lsum"),
        )
        .drop("__pid", "__lrn", "__lsum")
    )


def ranked_topk(df: DataFrame, k: int, *order, out_col: str = "rank") -> DataFrame:
    """Top-``k`` rows of the global ``order`` with a contiguous 1-based
    ``out_col`` rank (int).

    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject
    (per-partition top-k, driver merge of k rows per partition), so the
    unpartitioned rank window only ever sees k rows. The pattern it
    replaces — ``row_number().over(W.orderBy(...))`` then
    ``where(rank <= k)`` — collapsed the ENTIRE input (vocab token
    stats, per-doc BM25/cosine scores: bounded but potentially
    millions of rows) onto one window task before throwing away all
    but k rows (r14 optimization; guide §2 top-k doctrine). ``order``
    must be a deterministic total order so limit and rank agree."""
    top = df.orderBy(*order).limit(k)
    return top.withColumn(
        out_col, F.row_number().over(W.orderBy(*order)).cast("int")
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
    DuckDB/Spark ntile in the sort_zorder_cluster oracle). Counts,
    offsets, ``n``, ``q``, ``r`` all fold into literals via the bounded
    ≤``partitions``-row driver collect (see :func:`_pid_offsets`), so
    the data path is one range-style shuffle plus a per-bucket local
    window — no broadcast join, no per-row remainder arithmetic on
    anything but the rank itself."""
    tagged = df.withColumn("__pid", _range_bucket(df, order_cols, partitions))
    counts = _pid_offsets(tagged, F.count(F.lit(1)).alias("__n"))
    offs: dict[int, int] = {}
    total = 0
    for pid, n in counts:
        offs[pid] = total
        total += n
    max_pid = counts[-1][0] if counts else 0
    k = int(n_buckets)
    q, r = total // k, total % k
    head = (q + 1) * r  # rows living in the (q+1)-sized buckets
    local_w = W.partitionBy("__pid").orderBy(*order_cols)
    ranked = tagged.withColumn("__lrn", F.row_number().over(local_w)).withColumn(
        "__rank",
        F.element_at(_offset_lit(offs, max_pid, 0), F.col("__pid") + 1)
        + F.col("__lrn"),
    )
    bucket = F.when(
        F.col("__rank") <= F.lit(head), F.expr(f"(__rank - 1) div {q + 1} + 1")
    ).otherwise(
        # q = 0 implies every row ranks <= head = n, so the lazy CASE
        # never divides by zero — max(q, 1) keeps the printed plan
        # well-formed anyway.
        F.lit(r) + F.expr(f"(__rank - {(q + 1) * r} - 1) div {max(q, 1)} + 1")
    )
    return ranked.withColumn(out_col, bucket.cast("int")).drop(
        "__pid", "__lrn", "__rank"
    )
