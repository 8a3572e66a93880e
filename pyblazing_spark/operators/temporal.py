"""Temporal joins Spark lacks as primitives: as-of (point-in-time) join
and interval range join — expressed as compositions of exchange-friendly
DataFrame ops (no reference equivalent; the build brief names both as
required custom operators).

- **as-of join**: for every left row, the latest right row with
  ``right.ts <= left.ts`` per key. Implemented with the union + window
  trick: tag both sides, union, one window per key ordered by
  (ts, side) carrying the last non-null right payload forward, keep the
  left rows. ONE shuffle on the key — the same cost as a plain equi
  join, with none of the per-row subquery explosion a naive
  formulation has. (DuckDB's native ASOF JOIN is the oracle.)
- **range join**: ``left.point BETWEEN right.start AND right.end`` with
  optional equi keys. Naive Spark plans this as BroadcastNestedLoop
  when no equi key exists; the bucketed form maps each interval to the
  fixed-width buckets it covers and each point to its single bucket, so
  the join is equi on (keys..., bucket) and the range predicate only
  filters in-bucket candidates.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _contains_map(dt: "T.DataType") -> bool:
    """True if the type has a MapType anywhere — ``xxhash64`` raises on
    maps (spark.sql.legacy.allowHashOnMapType defaults off), so such
    fields enter the tie-break hash via ``to_json`` instead."""
    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def _assert_no_bucket_col(*dfs: DataFrame) -> None:
    """The bucketed joins stage candidates through a ``__bucket``
    column; silently overwriting a caller column of that name would
    corrupt the caller's data (r8 advice) — fail loudly instead."""
    for df in dfs:
        if "__bucket" in df.columns:
            raise ValueError(
                "input already has a '__bucket' column; rename it before "
                "calling the bucketed temporal joins"
            )


def _asof_union_window(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str,
    forward: bool,
) -> DataFrame:
    """Shared union + one-window as-of engine.

    The whole right payload (requested columns + the right timestamp)
    rides in ONE struct column, so every output field provably comes
    from the SAME right row — carrying columns independently with
    first/last(ignorenulls) would stitch fields from different right
    rows whenever a payload value is legitimately NULL.  Equal right
    timestamps per key are tie-broken by ``xxhash64`` of ALL payload
    fields (map-typed fields enter via ``to_json``, since xxhash64
    raises on MapType), which is deterministic across
    runs/partitionings (both directions resolve a tie to the payload
    with the SMALLEST hash)."""
    payload_names = [f"{c}{suffix}" for c in right_cols] + [f"{right_ts}{suffix}"]
    left_only = [c for c in left.columns if c not in (on, left_ts)]

    r_payload = F.struct(
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
    )
    # A NULL struct (not a struct of NULL fields): WHEN false THEN ...
    # with no ELSE yields NULL of the branch's struct type, which
    # first/last(ignorenulls) skips wholesale.
    l_payload = F.when(
        F.lit(False),
        F.struct(
            *[
                F.lit(None).cast(dict(right.dtypes)[c]).alias(f"{c}{suffix}")
                for c in right_cols
            ],
            F.lit(None).cast(dict(right.dtypes)[right_ts]).alias(f"{right_ts}{suffix}"),
        ),
    )
    # Side tags: the visible-tie side sorts first.  Backward (<=): right
    # rows sort BEFORE left rows at equal timestamps so an exact tie is
    # visible to last() over [unbounded preceding, current].  Forward
    # (>=): left rows sort BEFORE right rows so the tie is visible to
    # first() over [current, unbounded following].
    l_side, r_side = (0, 1) if forward else (1, 0)
    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("__t"),
        F.lit(l_side).alias("__side"),
        *[F.col(c) for c in left_only],
        l_payload.alias("__payload"),
    )
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("__t"),
        F.lit(r_side).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_only],
        r_payload.alias("__payload"),
    )
    # Tie hash over ALL payload fields: xxhash64 raises an
    # AnalysisException on MapType anywhere in its input, and map-valued
    # right payloads are legal (the pre-r6 column-wise carrier accepted
    # them) — those fields enter the hash through their to_json
    # serialization instead, which is deterministic per row (Spark never
    # reorders map entries), so two right rows that differ ONLY in a map
    # column still get distinct tie hashes and the as-of pick stays
    # deterministic across runs/partitionings.
    right_types = dict(zip(right.schema.names, [f.dataType for f in right.schema.fields]))
    tie_inputs = []
    for c in right_cols:
        fld = F.col("__payload").getField(f"{c}{suffix}")
        tie_inputs.append(F.to_json(fld) if _contains_map(right_types[c]) else fld)
    tie_inputs.append(F.col("__payload").getField(f"{right_ts}{suffix}"))
    unioned = l_tagged.unionByName(r_tagged).withColumn(
        "__tie",
        F.coalesce(F.xxhash64(*tie_inputs), F.lit(0)),
    )
    if forward:
        order = [F.col("__t"), F.col("__side"), F.col("__tie")]
        frame = (W.currentRow, W.unboundedFollowing)
        pick = F.first
    else:
        # Descending tie: last() over ascending order picks the final
        # right row among equal timestamps — descending hash order makes
        # that the SMALLEST hash, matching the forward direction.
        order = [F.col("__t"), F.col("__side"), F.col("__tie").desc()]
        frame = (W.unboundedPreceding, W.currentRow)
        pick = F.last
    w = W.partitionBy(on).orderBy(*order).rowsBetween(*frame)
    carried = unioned.select(
        on,
        "__t",
        "__side",
        *left_only,
        pick("__payload", ignorenulls=True).over(w).alias("__payload"),
    )
    return (
        carried.where(F.col("__side") == l_side)
        .select(
            on,
            F.col("__t").alias(left_ts),
            *left_only,
            *[F.col("__payload").getField(p).alias(p) for p in payload_names],
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: latest right row at-or-before each left row.

    Result: every left row + ``{right_ts}{suffix}`` + the requested
    right payload columns (NULL when no right row precedes).  All
    payload fields come from the same right row (struct-carried), and
    equal right timestamps tie-break deterministically."""
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    return _asof_union_window(
        left, right, on, left_ts, right_ts, right_cols, suffix, forward=False
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    equi_keys: list[str] | None = None,
    bucket: Column | None = None,
) -> DataFrame:
    """Interval join: left rows matched to right rows whose
    [start, end] contains the left point.

    ``bucket`` is a Column function input -> bucket id (defaults to
    1-hour buckets for timestamps via unix seconds // 3600). Intervals
    longer than one bucket explode into one row per covered bucket —
    keep bucket width >= the typical interval length."""
    equi_keys = equi_keys or []
    _assert_no_bucket_col(left, right)

    def default_bucket(c: Column) -> Column:
        return (F.unix_timestamp(c) / F.lit(3600)).cast("long")

    bucketize = (lambda c: bucket(c)) if bucket is not None else default_bucket  # type: ignore[misc]

    # Inverted intervals (end < start) are EMPTY: the containment
    # predicate `point >= start AND point <= end` is unsatisfiable for
    # them, but Spark's sequence(hi, lo) goes DESCENDING (not empty) and
    # would explode bogus bucket rows — drop them before exploding.
    r_bucketed = right.where(F.col(right_end) >= F.col(right_start)).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                bucketize(F.col(right_start)), bucketize(F.col(right_end))
            )
        ),
    )
    l_bucketed = left.withColumn("__bucket", bucketize(F.col(left_point)))
    joined = l_bucketed.join(r_bucketed, [*equi_keys, "__bucket"]).where(
        (F.col(left_point) >= F.col(right_start))
        & (F.col(left_point) <= F.col(right_end))
    )
    return joined.drop("__bucket")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Forward as-of join: EARLIEST right row at-or-after each left row
    (the "time-to-next-event" direction — next purchase after a click,
    next error after a deploy). Same union + one-window shape as
    :func:`asof_join`, mirrored: left rows sort BEFORE right rows at
    equal timestamps (so an exact tie is visible), and a
    ``first(ignorenulls)`` over ``[CURRENT ROW, UNBOUNDED FOLLOWING]``
    carries the next right payload backward. ONE shuffle on the key.
    All payload fields come from the same right row (struct-carried),
    and equal right timestamps tie-break deterministically."""
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    return _asof_union_window(
        left, right, on, left_ts, right_ts, right_cols, suffix, forward=True
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket: "Callable[[Column], Column]",
    equi_keys: list[str] | None = None,
) -> DataFrame:
    """Interval × interval OVERLAP join (``l_start <= r_end AND
    r_start <= l_end``) via bucketing — the companion to
    :func:`range_join` (point-in-interval).

    Both sides explode to one row per covered bucket and equi-join on
    the bucket id, turning Spark's cross-product/inequality plan into a
    plain hash join that scales linearly. Each overlapping pair shares
    at least the bucket containing ``greatest(l_start, r_start)`` (the
    overlap's first instant), and ONLY that bucket emits the pair —
    the standard duplicate-free formulation, so no distinct pass is
    needed afterwards.

    ``bucket`` maps a boundary column to an integer bucket id; keep the
    bucket width on the order of the typical interval length (an
    interval spanning B buckets produces B join rows).

    Inverted intervals (end < start) denote the EMPTY interval and
    never match: they are dropped before exploding, both because that
    is the standard temporal-algebra semantics and because Spark's
    ``sequence(hi, lo)`` goes DESCENDING (not empty) and would emit
    bogus bucket rows."""
    equi_keys = equi_keys or []
    _assert_no_bucket_col(left, right)
    l_b = left.where(F.col(left_end) >= F.col(left_start)).withColumn(
        "__bucket",
        F.explode(F.sequence(bucket(F.col(left_start)), bucket(F.col(left_end)))),
    )
    r_b = right.where(F.col(right_end) >= F.col(right_start)).withColumn(
        "__bucket",
        F.explode(F.sequence(bucket(F.col(right_start)), bucket(F.col(right_end)))),
    )
    joined = l_b.join(r_b, [*equi_keys, "__bucket"]).where(
        (F.col(left_start) <= F.col(right_end))
        & (F.col(right_start) <= F.col(left_end))
        & (
            F.col("__bucket")
            == bucket(F.greatest(F.col(left_start), F.col(right_start)))
        )
    )
    return joined.drop("__bucket")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """NEAREST as-of join (pandas ``merge_asof(direction='nearest')``):
    for every left row, the right row minimizing |right.ts - left.ts|
    per key; equal distances break toward the EARLIER (backward) right
    row. NULL payload when the key has no right rows at all.

    Single pass — ONE union, ONE shuffle on the key, one sort, two
    frames over it: the backward candidate is ``last(ignorenulls)``
    over ``(-inf, current]`` and the forward candidate
    ``first(ignorenulls)`` over ``[current, +inf)``. Right rows sort
    BEFORE left rows at equal timestamps, so an exact-timestamp match
    is captured by the backward candidate with distance 0 — which can
    never lose the nearest comparison — and the forward frame only
    needs strictly-later rows, which is exactly what it sees. Equal
    right timestamps per key resolve deterministically via the payload
    tie-hash (for exact pandas parity feed right rows unique per
    (key, ts) — e.g. pre-aggregate with ``min_by``)."""
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    payload_names = [f"{c}{suffix}" for c in right_cols] + [f"{right_ts}{suffix}"]
    left_only = [c for c in left.columns if c not in (on, left_ts)]

    r_payload = F.struct(
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
    )
    l_payload = F.when(
        F.lit(False),
        F.struct(
            *[
                F.lit(None).cast(dict(right.dtypes)[c]).alias(f"{c}{suffix}")
                for c in right_cols
            ],
            F.lit(None).cast(dict(right.dtypes)[right_ts]).alias(f"{right_ts}{suffix}"),
        ),
    )
    # backward-style side tags: right (0) before left (1) at equal t
    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_only],
        l_payload.alias("__payload"),
    )
    right_types = dict(zip(right.schema.names, [f.dataType for f in right.schema.fields]))
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_only],
        r_payload.alias("__payload"),
    )
    # map-typed payload fields make xxhash64 raise (same trap as
    # _asof_union_window): hash the struct's json then — deterministic
    # per row, Spark never reorders map entries.
    any_map = any(_contains_map(right_types[c]) for c in right_cols)
    tie_src = F.to_json("__payload") if any_map else F.col("__payload")
    unioned = l_tagged.unionByName(r_tagged).withColumn(
        "__tie", F.coalesce(F.xxhash64(tie_src), F.lit(0))
    )
    order = [F.col("__t"), F.col("__side"), F.col("__tie")]
    w_back = W.partitionBy(on).orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    w_fwd = W.partitionBy(on).orderBy(*order).rowsBetween(W.currentRow, W.unboundedFollowing)
    t_dtype = dict(left.dtypes)[left_ts]

    def _num(c: Column) -> Column:
        if t_dtype.startswith("timestamp"):
            return F.unix_micros(c.cast("timestamp"))
        return c.cast("double")

    carried = unioned.select(
        on,
        "__t",
        "__side",
        *left_only,
        F.last("__payload", ignorenulls=True).over(w_back).alias("__b"),
        F.first("__payload", ignorenulls=True).over(w_fwd).alias("__f"),
    ).where(F.col("__side") == 1)
    b_ts = F.col("__b").getField(f"{right_ts}{suffix}")
    f_ts = F.col("__f").getField(f"{right_ts}{suffix}")
    d_back = _num(F.col("__t")) - _num(b_ts)
    d_fwd = _num(f_ts) - _num(F.col("__t"))
    chosen = (
        F.when(F.col("__b").isNull(), F.col("__f"))
        .when(F.col("__f").isNull(), F.col("__b"))
        .when(d_back <= d_fwd, F.col("__b"))
        .otherwise(F.col("__f"))
    )
    return carried.select(
        on,
        F.col("__t").alias(left_ts),
        *left_only,
        *[chosen.getField(p).alias(p) for p in payload_names],
    )
