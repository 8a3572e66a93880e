"""Structured Streaming operators: multi-micro-batch stateful
accumulation, session-window boundary semantics, and stream-vs-batch
equivalence. The registered stream_* queries in plans/streaming.py are
oracle-checked in test_queries.py; these tests cover behaviors only
visible with more than one micro-batch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyblazing_spark.sources.tables import load_table
from pyblazing_spark.streaming import (
    run_available_now,
    stateful_user_totals,
    windowed_counts_stream,
)


@pytest.fixture(scope="module")
def two_file_stream_dir(spark, sf_dir, tmp_path_factory):
    """events split into two parquet files so maxFilesPerTrigger=1 yields
    two micro-batches."""
    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path_factory.mktemp("stream") / "events_split")
    lo, hi = ev.where(F.col("event_id") % 2 == 0), ev.where(F.col("event_id") % 2 == 1)
    lo.coalesce(1).write.parquet(out)
    hi.coalesce(1).write.mode("append").parquet(out)
    return out


def _read_split_stream(spark, path):
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def test_stateful_totals_accumulate_across_microbatches(spark, sf_dir, two_file_stream_dir):
    """With two micro-batches, applyInPandasWithState must carry state
    over: the final update per user equals the full batch aggregate."""
    stream = _read_split_stream(spark, two_file_stream_dir)
    out = run_available_now(stateful_user_totals(stream), output_mode="update")
    # update mode: one row per key per micro-batch it appeared in; the
    # final state is the row with the highest n_events.
    final = {
        r.user_id: (r.n_events, r.total_value)
        for r in out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
        )
        .collect()
    }
    batch = {
        r.user_id: (r.n, round(r.tv, 2))
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert final == batch
    # at least one user must have received updates in BOTH batches,
    # otherwise this test isn't exercising cross-batch state.
    multi = out.groupBy("user_id").count().where(F.col("count") > 1).count()
    assert multi > 0


def test_windowed_counts_incremental_equals_batch(spark, sf_dir, two_file_stream_dir):
    stream = _read_split_stream(spark, two_file_stream_dir)
    out = run_available_now(windowed_counts_stream(stream), output_mode="complete")
    got = {
        (r.hour_bucket, r.event_type): r.n
        for r in out.collect()
    }
    exp = {
        (r.b, r.event_type): r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("b"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {(k[0].replace(tzinfo=None), k[1]): v for k, v in got.items()} == {
        (k[0], k[1]): v for k, v in exp.items()
    }
