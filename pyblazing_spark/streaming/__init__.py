"""Structured Streaming extensions (SURVEY.md §2.9: the reference has NO
streaming operators — these are Spark-native capability additions, per
the build plan's north-star)."""

from pyblazing_spark.streaming.ops import (  # noqa: F401
    dedup_stream,
    read_events_stream,
    read_landing_stream,
    run_available_now,
    session_counts_stream,
    stateful_user_totals,
    windowed_counts_stream,
)
