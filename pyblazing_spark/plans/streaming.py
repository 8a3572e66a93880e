"""Streaming queries, drained to completion for the batch-oriented
correctness harness (Trigger.AvailableNow -> memory sink -> DataFrame).

The reference has no streaming surface at all (SURVEY.md §2.9); these
register Spark Structured Streaming capabilities — tumbling event-time
windows with watermarks, session windows, arbitrary stateful
processing — with DuckDB oracles over the same events table, so the
driver's gate checks streaming results value-for-value like any batch
query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyblazing_spark.plans.registry import register
from pyblazing_spark.streaming import (
    read_events_stream,
    run_available_now,
    session_counts_stream,
    stateful_user_totals,
    windowed_counts_stream,
)


@register(
    "stream_window_counts",
    tags=("streaming", "window", "watermark"),
    oracle="""
SELECT date_trunc('hour', ts) AS hour_bucket, event_type,
       count(*) AS n, round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY hour_bucket, event_type
""",
)
def stream_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked 1-hour tumbling windows over the event stream; on a
    bounded input the drained result must equal the batch group-by."""
    stream = read_events_stream(spark, sf_dir)
    out = run_available_now(windowed_counts_stream(stream), output_mode="complete")
    return out.withColumn(
        "hour_bucket", F.col("hour_bucket").cast("timestamp_ntz")
    ).orderBy("hour_bucket", "event_type")


@register(
    "stream_sessionize",
    tags=("streaming", "session_window", "watermark"),
    oracle="""
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
 s AS (
  SELECT user_id, ts,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS BIGINT) AS sid
  FROM g)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM s
GROUP BY user_id, sid
ORDER BY user_id, session_start
""",
)
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` gap sessionization (30 min). Note the
    boundary semantics: a gap of exactly 30:00 starts a NEW session
    (session extends to last_ts + gap, exclusive) — the oracle uses
    ``>=`` to mirror that."""
    stream = read_events_stream(spark, sf_dir)
    out = run_available_now(session_counts_stream(stream), output_mode="complete")
    return out.withColumn(
        "session_start", F.col("session_start").cast("timestamp_ntz")
    ).orderBy("user_id", "session_start")


@register(
    "stream_stateful_totals",
    tags=("streaming", "applyInPandasWithState"),
    oracle="""
SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user running
    totals. Update mode emits one row per key per micro-batch; the final
    state per key is the row with the highest n_events."""
    stream = read_events_stream(spark, sf_dir)
    out = run_available_now(stateful_user_totals(stream), output_mode="update")
    final = out.groupBy("user_id").agg(
        F.max_by("total_value", "n_events").alias("total_value"),
        F.max("n_events").alias("n_events"),
    )
    return final.select("user_id", "n_events", "total_value").orderBy("user_id")


@register(
    "stream_dedup",
    tags=("streaming", "dedup", "watermark"),
    oracle="""
WITH d AS (SELECT DISTINCT user_id, ts, event_type FROM events)
SELECT event_type, count(*) AS n
FROM d GROUP BY event_type ORDER BY event_type
""",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (watermark-bounded state) drained to
    completion; per-type counts of the deduped stream must equal batch
    SELECT DISTINCT. See
    :func:`pyblazing_spark.streaming.ops.dedup_stream`."""
    from pyblazing_spark.streaming import dedup_stream

    stream = read_events_stream(spark, sf_dir)
    drained = run_available_now(
        dedup_stream(stream, ["user_id", "ts", "event_type"]),
        output_mode="append",
    )
    return (
        drained.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


@register(
    "stream_enrich_join",
    tags=("streaming", "join"),
    oracle="""
SELECT c_mktsegment, event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2)     AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment, event_type
ORDER BY c_mktsegment, event_type
""",
)
def stream_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the event stream joins the static
    customer dimension on user_id, then aggregates per (segment, type) —
    the canonical streaming-ETL enrich-then-rollup. Spark plans the
    static side as a broadcast per micro-batch (dimension tables are
    small by contract); state is bounded by the aggregation keys, not
    the stream. Drained with AvailableNow, the result must equal the
    batch join + group-by the oracle runs."""
    from pyblazing_spark.sources.tables import load_table as T

    stream = read_events_stream(spark, sf_dir)
    dim = T(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = stream.join(dim, "user_id").groupBy(
        "c_mktsegment", "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    out = run_available_now(enriched, output_mode="complete")
    return out.orderBy("c_mktsegment", "event_type")


@register(
    "stream_hopping_window",
    tags=("streaming", "window", "hopping", "watermark"),
    oracle="""
SELECT date_trunc('hour', ts) - i * INTERVAL 1 HOUR AS win_start,
       event_type, CAST(count(*) AS BIGINT) AS n
FROM events JOIN generate_series(0, 1) t(i) ON true
GROUP BY 1, 2
ORDER BY win_start, event_type
LIMIT 500
""",
)
def stream_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked HOPPING (overlapping) event-time windows on the
    stream: 2-hour windows sliding every hour, so each event lands in
    exactly two open windows — the streaming twin of
    ``events_hopping_window`` with the same oracle. State is bounded by
    (open windows x types); the watermark finalizes and evicts windows
    as event time advances, which is what keeps overlap factor x state
    finite on an unbounded stream."""
    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "4 hours")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("win_start"),
            "event_type",
            "n",
        )
    )
    out = run_available_now(agg, output_mode="complete")
    return out.orderBy("win_start", "event_type").limit(500)


@register(
    "stream_stream_join",
    tags=("streaming", "join", "stream_stream", "watermark"),
    oracle="""
SELECT CAST(v.user_id % 10 AS INTEGER) AS cohort,
       CAST(count(*) AS BIGINT)        AS n_pairs,
       round(sum(p.value) + 1e-4, 2)   AS total_value
FROM events v
JOIN events p
  ON v.user_id = p.user_id
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
WHERE v.event_type = 'view' AND p.event_type = 'purchase'
GROUP BY 1 ORDER BY 1
""",
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM watermarked interval join (the attribution shape:
    each view paired with the same user's purchases within the next
    hour), drained and rolled up per user cohort. The two-sided
    event-time bound is what lets Spark evict join state as watermarks
    advance — the capability that distinguishes a real streaming join
    from buffering both streams forever. On bounded input the drained
    pairs must equal the batch interval self-join the oracle runs.
    See :func:`pyblazing_spark.streaming.ops.interval_join_streams`."""
    from pyblazing_spark.streaming.ops import interval_join_streams

    stream = read_events_stream(spark, sf_dir)
    pairs = run_available_now(
        interval_join_streams(
            stream, left_type="view", right_type="purchase", within="1 hour"
        ),
        output_mode="append",
    )
    return (
        pairs.groupBy((F.col("v_user") % 10).cast("int").alias("cohort"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum("p_value") + 1e-4, 2).alias("total_value"),
        )
        .orderBy("cohort")
    )


@register(
    "stream_left_outer_join",
    tags=("streaming", "join", "stream_stream", "outer", "watermark"),
    oracle="""
WITH wm AS MATERIALIZED (
  SELECT least(
    (SELECT max(ts) FROM events
      WHERE event_type = 'view' AND ts < TIMESTAMP '2024-01-20 00:00:00'),
    (SELECT max(ts) FROM events
      WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-20 00:00:00')
  ) - INTERVAL 2 HOUR AS w),
 v AS (
  SELECT user_id, ts AS v_ts FROM events
  WHERE event_type = 'view'
    AND ts + INTERVAL 1 HOUR < (SELECT w FROM wm)),
 p AS (
  SELECT user_id, ts AS p_ts, value FROM events
  WHERE event_type = 'purchase'),
 j AS (
  SELECT v.user_id, v.v_ts, p.p_ts, p.value
  FROM v LEFT JOIN p
    ON p.user_id = v.user_id
   AND p.p_ts >= v.v_ts AND p.p_ts <= v.v_ts + INTERVAL 1 HOUR)
SELECT CAST(user_id % 10 AS INTEGER) AS cohort,
       CAST(sum(CASE WHEN p_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pairs,
       CAST(sum(CASE WHEN p_ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unmatched,
       round(sum(CASE WHEN p_ts IS NOT NULL THEN value ELSE 0 END) + 1e-4, 2)
         AS matched_value
FROM j GROUP BY 1 ORDER BY 1
""",
)
def stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM LEFT OUTER interval join — the abandoned-view
    shape (views that never converted within the hour emit NULL-padded
    rows), the outer half of the streaming-join surface
    ``stream_stream_join`` doesn't touch. Outer semantics are
    watermark-driven: a NULL row can only emit once the watermark
    passes the view's join horizon (only then is "no future match"
    provable), so the drain needs real MULTI-batch watermark
    progression — three deterministic landing batches split at
    2024-01-12 / 2024-01-20 — and rows whose horizon the final
    watermark never passed are legitimately withheld at drain end.
    Both the drained output and the batch-LEFT-JOIN oracle are
    therefore restricted to the watermark-CLOSED region: views with
    ``v_ts + 1h < wm2``, where wm2 = min(per-side max ts over the
    first two batches) - 2h — the eviction watermark in effect while
    batch 3 is processed (eviction lags one batch, the r7
    two-watermark finding). Inside that region the stream MUST have
    emitted every match and every NULL row, so the compare proves both
    emission paths, match-now and evict-later."""
    import glob
    import os
    import shutil
    import tempfile

    from pyblazing_spark.sources.tables import load_table
    from pyblazing_spark.streaming.ops import (
        interval_join_streams,
        read_landing_stream,
    )

    base = tempfile.mkdtemp(prefix="stream_loj_")
    landing = os.path.join(base, "landing")
    os.makedirs(landing)
    try:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        t12 = F.lit("2024-01-12 00:00:00").cast("timestamp")
        t20 = F.lit("2024-01-20 00:00:00").cast("timestamp")
        arrivals = (
            ("0_early", ev.where(F.col("ts") < t12)),
            ("1_mid", ev.where((F.col("ts") >= t12) & (F.col("ts") < t20))),
            ("2_fresh", ev.where(F.col("ts") >= t20)),
        )
        for i, (tag, df) in enumerate(arrivals):
            tmp = os.path.join(base, tag)
            df.coalesce(1).write.parquet(tmp)
            dst = os.path.join(landing, f"{tag}.parquet")
            shutil.copyfile(glob.glob(f"{tmp}/part-*.parquet")[0], dst)
            os.utime(dst, (1_700_000_000 + 100 * i,) * 2)
        drained = run_available_now(
            interval_join_streams(
                read_landing_stream(spark, landing),
                left_type="view",
                right_type="purchase",
                within="1 hour",
                how="leftOuter",
            ),
            output_mode="append",
        )
        # the watermark-closed horizon, recomputed from the batch table
        # exactly as the oracle does (bounded: two scalar maxes)
        wm2 = (
            ev.where(F.col("ts") < t20)
            .where(F.col("event_type").isin("view", "purchase"))
            .groupBy("event_type")
            .agg(F.max("ts").alias("m"))
            .agg(F.min("m").alias("wm"))
            .collect()[0]["wm"]
        )
        if wm2 is None:
            # no watermark exists (no view/purchase event before the
            # third batch): the oracle's NULL-comparison filter yields
            # zero rows, so mirror that with an empty frame — the drain
            # itself is NOT guaranteed empty (a corpus whose events all
            # land in batch 3 still emits inner matches), and a typed-
            # void literal in the filter would fail analysis (ADVICE r10)
            closed = drained.where(F.lit(False))
        else:
            closed = drained.where(
                F.col("v_ts") + F.expr("INTERVAL 1 HOUR")
                < F.lit(wm2) - F.expr("INTERVAL 2 HOURS")
            )
        return (
            closed.groupBy((F.col("v_user") % 10).cast("int").alias("cohort"))
            .agg(
                F.sum(
                    F.when(F.col("p_ts").isNotNull(), 1).otherwise(0)
                )
                .cast("long")
                .alias("n_pairs"),
                F.sum(F.when(F.col("p_ts").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_unmatched"),
                F.round(
                    F.sum(
                        F.when(
                            F.col("p_ts").isNotNull(), F.col("p_value")
                        ).otherwise(0.0)
                    )
                    + 1e-4,
                    2,
                ).alias("matched_value"),
            )
            .orderBy("cohort")
            # materialize BEFORE the landing dir disappears
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "stream_window_topk",
    tags=("streaming", "window", "topk"),
    oracle="""
WITH c AS (
  SELECT date_trunc('hour', ts) AS hour_bucket, event_type,
         count(*) AS n
  FROM events GROUP BY 1, 2),
 r AS (
  SELECT hour_bucket, event_type, n,
         CAST(row_number() OVER (PARTITION BY hour_bucket
                                 ORDER BY n DESC, event_type) AS INTEGER) AS rn
  FROM c)
SELECT hour_bucket, event_type, n, rn
FROM r WHERE rn <= 3
ORDER BY hour_bucket, rn
""",
)
def stream_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous top-k: the stateful half (watermarked tumbling-window
    counts) runs IN the stream; the rank-and-keep-3 half runs as a batch
    window over the drained sink — the standard streaming-top-k split,
    since streaming aggregation cannot host a rank function. State in
    the streaming half is (open windows x event types); the sink the
    rank pass reads is already aggregate-sized (windows x types, not
    events), so the downstream top-k is cheap at any stream rate."""
    from pyspark.sql import Window as W

    stream = read_events_stream(spark, sf_dir)
    drained = run_available_now(
        windowed_counts_stream(stream), output_mode="complete"
    )
    w = W.partitionBy("hour_bucket").orderBy(F.desc("n"), "event_type")
    return (
        drained.select(
            F.col("hour_bucket").cast("timestamp_ntz").alias("hour_bucket"),
            "event_type",
            "n",
        )
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= 3)
        .orderBy("hour_bucket", "rn")
    )


@register(
    "stream_late_data_drop",
    tags=("streaming", "watermark", "late-data", "append"),
    oracle="""
WITH arrived AS MATERIALIZED (
  SELECT ts, event_type, value FROM events
  WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'),
 wm AS MATERIALIZED (
  SELECT max(ts) - INTERVAL 2 HOUR AS wm FROM events
  WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'),
 dropped AS MATERIALIZED (
  -- the engine's drop counter ticks on post-shuffle MERGED group rows
  -- (partial agg + exchange + merge run before the state operator),
  -- i.e. one per distinct (window, event_type) straggler group
  SELECT count(*) AS n_late FROM (
    SELECT DISTINCT date_trunc('hour', ts), event_type FROM events
    WHERE ts < TIMESTAMP '2024-01-10 00:00:00'))
SELECT date_trunc('hour', a.ts)            AS hour_bucket,
       a.event_type,
       CAST(count(*) AS BIGINT)            AS n,
       round(sum(a.value), 2)              AS total_value,
       CAST(d.n_late AS BIGINT)            AS n_late_dropped
FROM arrived a, wm w, dropped d
WHERE date_trunc('hour', a.ts) + INTERVAL 1 HOUR <= w.wm
GROUP BY 1, 2, d.n_late
ORDER BY hour_bucket, event_type
""",
)
def stream_late_data_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark LATE-DATA accounting — the append-mode semantics no
    other stream entry exercises (their single-file drains collapse to
    one batch, so the watermark never advances between arrivals). Three
    deterministic micro-batches via a controlled landing dir
    (:func:`pyblazing_spark.streaming.ops.read_landing_stream`, one
    file per batch in mtime order):

    1. events with ``ts >= 2024-01-20`` (the fresh arrivals; their max
       fixes the watermark at ``max_ts - 2h``),
    2. events in ``[2024-01-15, 2024-01-20)`` (older but admitted:
       Spark's late filter lags one batch — the plan carries a
       late-events watermark and a STRICTER eviction watermark,
       ``StateStoreSave ... <late_wm>, <eviction_wm>`` — so batch 2's
       filter still sees the initial 0 while its eviction uses batch
       1's max),
    3. events with ``ts < 2024-01-10`` — stragglers arriving 5+ days
       past the watermark: every row is DROPPED by the late filter.

    The result is the append-mode emission (windows finalized by the
    watermark: ``window.end <= max_ts - 2h``; later windows stay open
    and are correctly withheld) over the ADMITTED batches only, plus
    ``n_late_dropped`` — Spark's own per-batch
    ``numRowsDroppedByWatermark`` counter summed across the drain —
    which the oracle recomputes independently, so the engine's internal
    accounting is value-compared, not trusted. (The counter ticks on
    post-shuffle MERGED rows — partial aggregate + exchange + merge run
    before the state operator — so its deterministic recompute is the
    DISTINCT straggler (window, event_type) group count, not the raw
    straggler row count.)

    Scale: the watermark is what bounds state on an unbounded stream —
    this entry pins both halves of that contract (drop late input,
    finalize+evict closed windows) against a batch recompute; at
    100 TB/day the same plan holds with the landing dir swapped for
    Kafka."""
    import glob
    import os
    import shutil
    import tempfile

    from pyblazing_spark.sources.tables import load_table
    from pyblazing_spark.streaming.ops import read_landing_stream

    base = tempfile.mkdtemp(prefix="stream_late_")
    landing = os.path.join(base, "landing")
    os.makedirs(landing)
    try:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        t15 = F.lit("2024-01-15 00:00:00").cast("timestamp")
        t20 = F.lit("2024-01-20 00:00:00").cast("timestamp")
        t10 = F.lit("2024-01-10 00:00:00").cast("timestamp")
        arrivals = (
            ("0_fresh", ev.where(F.col("ts") >= t20)),
            ("1_recent", ev.where((F.col("ts") >= t15) & (F.col("ts") < t20))),
            ("2_straggler", ev.where(F.col("ts") < t10)),
        )
        for i, (tag, df) in enumerate(arrivals):
            tmp = os.path.join(base, tag)
            df.coalesce(1).write.parquet(tmp)
            dst = os.path.join(landing, f"{tag}.parquet")
            shutil.copyfile(glob.glob(f"{tmp}/part-*.parquet")[0], dst)
            # distinct mtimes pin the batch order (file source sorts
            # oldest-first under latestFirst=false)
            os.utime(dst, (1_700_000_000 + 100 * i,) * 2)
        progress: list = []
        out = run_available_now(
            windowed_counts_stream(read_landing_stream(spark, landing)),
            output_mode="append",
            progress_out=progress,
        )
        n_dropped = sum(
            s["numRowsDroppedByWatermark"]
            for p in progress
            for s in p["stateOperators"]
        )
        return (
            out.withColumn("hour_bucket", F.col("hour_bucket").cast("timestamp_ntz"))
            .withColumn("n_late_dropped", F.lit(n_dropped).cast("long"))
            .orderBy("hour_bucket", "event_type")
            # materialize BEFORE the landing dir disappears
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "stream_checkpoint_recovery",
    tags=("streaming", "checkpoint", "exactly-once", "fault-tolerance"),
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT)        AS n,
       CAST(sum(event_id) AS BIGINT)   AS id_sum,
       round(sum(value) + 1e-4, 2)     AS total_value
FROM events
WHERE event_type <> 'view'
GROUP BY event_type
ORDER BY event_type
""",
)
def stream_checkpoint_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once RECOVERY — the fault-tolerance half of the streaming
    contract no other entry exercises: a three-micro-batch drain into a
    fault-tolerant PARQUET sink is STOPPED as soon as its first batch
    commits, then a second query restarts from the same
    ``checkpointLocation`` and finishes the remainder. The sink is read
    back through its ``_spark_metadata`` manifest (which hides any
    files from uncommitted in-flight batches) and aggregated; the
    oracle recomputes from the source table, so a single lost OR
    duplicated row anywhere across the interruption fails the value
    compare with ``n``/``id_sum`` both sensitive to which rows landed.

    The interruption point is deliberately racy (stop lands wherever
    the drain happens to be — possibly even after it finished on a fast
    machine); the RESULT is deterministic regardless, which is
    precisely the exactly-once property under test: source offset
    tracking (WAL) + idempotent manifest commit make the outcome
    independent of where the failure hits. At 100 TB/day this is the
    property that lets an executor-loss or driver restart resume a
    pipeline without reconciliation."""
    import glob
    import os
    import shutil
    import tempfile
    import time

    from pyblazing_spark.sources.tables import load_table
    from pyblazing_spark.streaming.ops import read_landing_stream

    base = tempfile.mkdtemp(prefix="stream_ckpt_")
    landing = os.path.join(base, "landing")
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(landing)
    try:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        for i in range(3):
            tmp = os.path.join(base, f"b{i}")
            ev.where(F.col("event_id") % 3 == i).coalesce(1).write.parquet(tmp)
            dst = os.path.join(landing, f"{i}.parquet")
            shutil.copyfile(glob.glob(f"{tmp}/part-*.parquet")[0], dst)
            os.utime(dst, (1_700_000_000 + 100 * i,) * 2)

        def start_drain():
            xform = (
                read_landing_stream(spark, landing)
                .where(F.col("event_type") != "view")
                .select("event_id", "event_type", "value")
            )
            return (
                xform.writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        q1 = start_drain()
        deadline = time.time() + 120
        while time.time() < deadline and q1.isActive and not q1.recentProgress:
            time.sleep(0.05)
        q1.stop()  # interrupt mid-drain (wherever the drain happens to be)
        q1.awaitTermination(60)

        q2 = start_drain()  # restart from the SAME checkpoint
        if not q2.awaitTermination(300):
            q2.stop()
            raise TimeoutError("checkpoint-recovery drain did not finish")

        # read back THROUGH the sink manifest (exactly-once read path)
        back = spark.read.parquet(out_dir)
        return (
            back.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("event_id").alias("id_sum"),
                F.round(F.sum("value") + 1e-4, 2).alias("total_value"),
            )
            .orderBy("event_type")
            # materialize BEFORE the temp sink dir disappears
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "stream_foreachbatch_upsert",
    tags=("streaming", "foreachbatch", "upsert", "cdc"),
    oracle="""
WITH latest AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE event_type = 'purchase')
SELECT CAST(user_id % 4 AS BIGINT)    AS cohort,
       CAST(count(*) AS BIGINT)      AS n_users,
       CAST(sum(event_id) AS BIGINT) AS latest_id_sum,
       round(sum(value) + 1e-4, 2)   AS value_sum
FROM latest WHERE rn = 1
GROUP BY cohort
ORDER BY cohort
""",
)
def stream_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MERGE/upsert via ``foreachBatch`` — the production CDC
    sink pattern (Kafka -> keyed table) none of the other stream
    entries cover: each micro-batch upserts purchase records into a
    keyed target where the LATEST record per user wins (ordered by
    ts, event_id — a total order, so per-batch merging is associative
    and the outcome is batch-split independent). Three deterministic
    micro-batches (landing-dir harness, one file per batch); the final
    target must equal the batch recompute of "latest purchase per
    user" over the whole table — one stale or lost key fails the
    value compare.

    The target here is a parquet directory swapped atomically per
    batch (read current + merge + write new + rename) — the
    no-transactional-format fallback; with Delta/Iceberg the
    foreachBatch body becomes a MERGE INTO and everything else is
    unchanged. Scale: each upsert shuffles only the BATCH plus the
    per-key latest state on user_id; a transactional format would
    prune the rewrite to touched files."""
    import glob
    import os
    import shutil
    import tempfile

    from pyspark.sql import Window
    from pyblazing_spark.sources.tables import load_table
    from pyblazing_spark.streaming.ops import read_landing_stream

    base = tempfile.mkdtemp(prefix="stream_upsert_")
    landing = os.path.join(base, "landing")
    target = os.path.join(base, "target")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(landing)
    try:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        for i in range(3):
            tmp = os.path.join(base, f"b{i}")
            ev.where(F.col("event_id") % 3 == i).coalesce(1).write.parquet(tmp)
            dst = os.path.join(landing, f"{i}.parquet")
            shutil.copyfile(glob.glob(f"{tmp}/part-*.parquet")[0], dst)
            os.utime(dst, (1_700_000_000 + 100 * i,) * 2)

        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )

        def upsert(batch_df, epoch_id):
            batch = (
                batch_df.where(F.col("event_type") == "purchase")
                .select("user_id", "event_id", "ts", "value")
            )
            if os.path.isdir(target):
                current = batch.sparkSession.read.parquet(target)
                merged = current.unionByName(batch)
            else:
                merged = batch
            latest = (
                merged.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") == 1)
                .drop("__rn")
            )
            staged = target + f".stage{epoch_id}"
            latest.write.mode("overwrite").parquet(staged)
            old = target + f".old{epoch_id}"
            if os.path.isdir(target):
                os.rename(target, old)
            os.rename(staged, target)
            shutil.rmtree(old, ignore_errors=True)

        q = (
            read_landing_stream(spark, landing)
            .writeStream.foreachBatch(upsert)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("foreachBatch upsert drain did not finish")

        back = spark.read.parquet(target)
        return (
            back.groupBy((F.col("user_id") % 4).alias("cohort"))
            .agg(
                F.count(F.lit(1)).alias("n_users"),
                F.sum("event_id").alias("latest_id_sum"),
                F.round(F.sum("value") + 1e-4, 2).alias("value_sum"),
            )
            .orderBy("cohort")
            .localCheckpoint(eager=True)  # materialize BEFORE temp cleanup
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "stream_txn_upsert",
    tags=("streaming", "foreachbatch", "txn", "upsert", "time-travel"),
    oracle="""
WITH p AS (
  SELECT user_id, event_id, ts, value, event_id % 3 AS b
  FROM events WHERE event_type = 'purchase'),
 vers AS (SELECT v FROM (VALUES (1), (2), (3)) t(v)),
 ranked AS (
  SELECT v, user_id, event_id, value,
         row_number() OVER (PARTITION BY v, user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM p JOIN vers ON p.b < v)
SELECT CAST(v AS INTEGER)             AS version,
       CAST(user_id % 4 AS BIGINT)    AS cohort,
       CAST(count(*) AS BIGINT)       AS n_users,
       CAST(sum(event_id) AS BIGINT)  AS latest_id_sum,
       round(sum(value) + 1e-4, 2)    AS value_sum
FROM ranked WHERE rn = 1
GROUP BY v, user_id % 4
ORDER BY version, cohort
""",
)
def stream_txn_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC upsert INTO the transactional table format — the
    composition ``stream_foreachbatch_upsert``'s docstring promised
    ("with Delta/Iceberg the foreachBatch body becomes a MERGE INTO"):
    each micro-batch reduces to its latest purchase per user, keeps only
    rows NEWER than the table's current row for that key ((ts, event_id)
    total order), and MERGEs into a :class:`TxnTable` — so every
    micro-batch is one snapshot commit and the whole CDC history is
    TIME-TRAVELABLE. The output reads ALL THREE snapshot versions and
    rolls each into user_id%4 cohorts; the oracle recomputes version k
    as "latest purchase per user over batches < k" — a stale overwrite
    (older row replacing newer), a lost key, OR a merge leaking into an
    earlier snapshot all flip a row. Exactly-once: each merge commits
    with ``app_txn_id=f"stream_txn_upsert:{epoch_id}"`` so a REPLAYED
    micro-batch skips instead of double-applying (the Delta
    txnAppId/txnVersion idempotent-writes pattern;
    test_app_txn_id_makes_replays_idempotent pins the primitive).

    Scale: per batch, one shuffle of the BATCH on user_id (the
    within-batch latest), one broadcast-size join against current keys,
    and a file-skipped merge rewrite; the commit log is O(batches)
    JSON."""
    import glob
    import os
    import shutil
    import tempfile

    from pyspark.sql import Window
    from pyblazing_spark.sources.tables import load_table
    from pyblazing_spark.sources.txn_table import TxnTable
    from pyblazing_spark.streaming.ops import read_landing_stream

    base = tempfile.mkdtemp(prefix="stream_txn_upsert_")
    landing = os.path.join(base, "landing")
    tpath = os.path.join(base, "table")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(landing)
    try:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        for i in range(3):
            tmp = os.path.join(base, f"b{i}")
            ev.where(F.col("event_id") % 3 == i).coalesce(1).write.parquet(tmp)
            dst = os.path.join(landing, f"{i}.parquet")
            shutil.copyfile(glob.glob(f"{tmp}/part-*.parquet")[0], dst)
            os.utime(dst, (1_700_000_000 + 100 * i,) * 2)

        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        state: dict[str, TxnTable | None] = {"t": None}

        def upsert(batch_df, epoch_id):
            batch = (
                batch_df.where(F.col("event_type") == "purchase")
                .select("user_id", "event_id", "ts", "value")
                .withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") == 1)
                .drop("__rn")
            )
            t = state["t"]
            if t is None:
                state["t"] = TxnTable.create(
                    batch.sparkSession, tpath, batch, key="user_id"
                )
                return
            cur = t.read().select(
                "user_id",
                F.col("ts").alias("__cur_ts"),
                F.col("event_id").alias("__cur_eid"),
            )
            newer = (
                batch.join(cur, "user_id", "left")
                .where(
                    F.col("__cur_ts").isNull()
                    | (F.col("ts") > F.col("__cur_ts"))
                    | (
                        (F.col("ts") == F.col("__cur_ts"))
                        & (F.col("event_id") > F.col("__cur_eid"))
                    )
                )
                .select("user_id", "event_id", "ts", "value")
            )
            # exactly-once: a replayed epoch is a committed app_txn_id
            # and skips (TxnTable.committed_app_txn_ids — the Delta
            # txnAppId/txnVersion idempotent-writes pattern)
            t.merge(newer, app_txn_id=f"stream_txn_upsert:{epoch_id}")

        q = (
            read_landing_stream(spark, landing)
            .writeStream.foreachBatch(upsert)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("txn upsert drain did not finish")

        t = state["t"]
        assert t is not None and t.latest_version() == 3
        frames = []
        for v in (1, 2, 3):
            frames.append(
                t.read(version=v)
                .groupBy((F.col("user_id") % 4).alias("cohort"))
                .agg(
                    F.count(F.lit(1)).alias("n_users"),
                    F.sum("event_id").alias("latest_id_sum"),
                    F.round(F.sum("value") + 1e-4, 2).alias("value_sum"),
                )
                .select(
                    F.lit(v).cast("int").alias("version"),
                    "cohort",
                    "n_users",
                    "latest_id_sum",
                    "value_sum",
                )
            )
        out = frames[0]
        for fdf in frames[1:]:
            out = out.unionByName(fdf)
        return out.orderBy("version", "cohort").localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "stream_txn_source",
    tags=("streaming", "txn", "source", "datasource", "superset"),
    oracle="""
WITH rows_ AS (
  SELECT CAST(o_orderkey % 3 + 1 AS INTEGER) AS version,
         o_orderkey AS k,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders)
SELECT version,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       COALESCE(bit_xor(CAST(('0x' || substring(
           md5(CAST(k AS VARCHAR) || ':' || CAST(cents AS VARCHAR)),
           3, 15))::BIGINT AS BIGINT)), 0) AS key_xor
FROM rows_ GROUP BY version ORDER BY version
""",
)
def stream_txn_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING READ FROM the transactional table — the commit log as
    a Structured Streaming source (:mod:`sources/txn_stream`, a Spark 4
    Python ``DataSourceStreamReader``): offsets are commit versions,
    partitions are each commit's added parquet files (one executor task
    per file; the driver lists only the JSON log), rows arrive tagged
    ``_commit_version``/``_commit_action``. An append-only three-commit
    history built from ``orders`` (mod-3 split) streams through a
    per-version aggregation; the oracle recomputes each version's row
    set from scratch, so a dropped file, a version misattribution, or a
    double-read flips the checksum. Merge/overwrite commits follow
    Delta's documented ignoreChanges caveat (rewritten rows re-emit);
    update-heavy consumers use ``TxnTable.change_feed`` instead."""
    import os
    import shutil
    import tempfile

    from pyblazing_spark.sources.tables import load_table
    from pyblazing_spark.sources.txn_table import TxnTable
    from pyblazing_spark.sources.txn_stream import TxnStreamDataSource
    from pyblazing_spark.streaming.ops import run_available_now

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    base = tempfile.mkdtemp(prefix="stream_txn_source_")
    try:
        path = os.path.join(base, "t")
        t = TxnTable.create(
            spark, path, orders.where(F.col("o_orderkey") % 3 == 0),
            key="o_orderkey",
        )
        t.append(orders.where(F.col("o_orderkey") % 3 == 1))
        t.append(orders.where(F.col("o_orderkey") % 3 == 2))
        spark.dataSource.register(TxnStreamDataSource)
        sdf = (
            spark.readStream.format("txn_table_stream")
            .option("path", path)
            .load()
        )
        cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        h60 = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("o_orderkey").cast("string"),
                        F.col("cents").cast("string"),
                    ).cast("binary")
                ),
                3,
                15,
            ),
            16,
            10,
        ).cast("long")
        agg = (
            sdf.select("o_orderkey", "_commit_version", cents.alias("cents"))
            .groupBy(F.col("_commit_version").alias("version"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("cents").cast("long").alias("total_cents"),
                F.coalesce(F.bit_xor(h60), F.lit(0))
                .cast("long")
                .alias("key_xor"),
            )
        )
        out = run_available_now(agg, output_mode="complete")
        return out.orderBy("version").localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "stream_session_timer",
    tags=("streaming", "applyInPandasWithState", "timer", "sessionize"),
    oracle="""
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events),
 s AS (
  SELECT user_id, ts,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS BIGINT) AS sid
  FROM g),
 sess AS (
  SELECT user_id, sid, min(ts) AS session_start, max(ts) AS session_end,
         CAST(count(*) AS BIGINT) AS n_events
  FROM s GROUP BY user_id, sid),
 closed AS (
  SELECT * FROM sess
  WHERE sid < (SELECT max(sid) FROM sess s2 WHERE s2.user_id = sess.user_id))
SELECT user_id, session_start, session_end, n_events
FROM closed
ORDER BY user_id, session_start
""",
)
def stream_session_timer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timer-driven sessionization drained over the fixture
    (:func:`pyblazing_spark.streaming.ops.session_timeout_stream`) —
    per-user 30-minute-gap sessions closed EITHER by a later event
    (gap) or by an event-time TIMER. The single-file fixture read is
    one micro-batch, during which the watermark is still 0, so no
    timer can fire: the drained output is EXACTLY the sessions whose
    closure is proven by data — every session except each user's last.
    The oracle computes the same gaps-and-islands sessions and drops
    each user's final one; the timer path itself is pinned by the
    three-batch landing-dir test
    (``test_session_timeout_stream_timer_and_gap_paths``)."""
    from pyblazing_spark.streaming.ops import (
        read_events_stream,
        run_available_now,
        session_timeout_stream,
    )

    stream = read_events_stream(spark, sf_dir)
    out = run_available_now(session_timeout_stream(stream), output_mode="append")
    return (
        out.where(F.col("closed_by") == "gap")
        .select(
            "user_id",
            F.col("session_start").cast("timestamp_ntz").alias("session_start"),
            F.col("session_end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "stream_session_timer_bucketed",
    tags=("streaming", "applyInPandasWithState", "timer", "sessionize",
          "bucketed"),
    oracle="""
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events),
 s AS (
  SELECT user_id, ts,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS BIGINT) AS sid
  FROM g),
 sess AS (
  SELECT user_id, sid, min(ts) AS session_start, max(ts) AS session_end,
         CAST(count(*) AS BIGINT) AS n_events
  FROM s GROUP BY user_id, sid),
 closed AS (
  SELECT * FROM sess
  WHERE sid < (SELECT max(sid) FROM sess s2 WHERE s2.user_id = sess.user_id))
SELECT user_id, session_start, session_end, n_events
FROM closed
ORDER BY user_id, session_start
""",
)
def stream_session_timer_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``stream_session_timer`` through the HASH-BUCKETED state operator
    (:func:`pyblazing_spark.streaming.ops.session_timeout_stream_bucketed`)
    — users share ``n_buckets`` dict-state keys, which lifted the
    50k-tiny-groups worst case from ~2.0k to ~21.3k rows/s (10.4x,
    scripts/stream_state_probe.py, SCALE.md r12) while emitting the
    EXACT per-user session set (bucket-sweep timers; equivalence pinned
    by ``test_session_bucketed_matches_per_user``). Identical oracle as
    the per-user entry: the one-batch fixture drain closes exactly the
    data-proven (gap) sessions."""
    from pyblazing_spark.streaming.ops import (
        read_events_stream,
        run_available_now,
        session_timeout_stream_bucketed,
    )

    stream = read_events_stream(spark, sf_dir)
    out = run_available_now(
        session_timeout_stream_bucketed(stream), output_mode="append"
    )
    return (
        out.where(F.col("closed_by") == "gap")
        .select(
            "user_id",
            F.col("session_start").cast("timestamp_ntz").alias("session_start"),
            F.col("session_end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )
