"""Write paths (sinks). The reference has NO sinks at all — results only
return to Python (SURVEY.md §2.8) — so everything here is capability
beyond parity, expressed through Spark's native writers:

- :func:`write_files`: partitioned parquet/orc/csv/json directory trees
  (the partition columns become Hive-style directories that partition
  pruning later exploits).
- :func:`write_bucketed_table`: catalog tables bucketed + sorted on a
  key. Two tables bucketed the same way join WITHOUT any exchange — at
  100 TB this turns every recurring fact-fact join on the bucket key
  into a zero-shuffle operation (tested by asserting the absence of
  Exchange operators in the join plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_files(
    df: DataFrame,
    path: str,
    file_format: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Write a directory tree, optionally Hive-partitioned.

    ``max_records_per_file`` bounds output file sizes (the write-side
    half of the 128 MiB read-split target in SCALE.md)."""
    writer = df.write.format(file_format).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.save(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    file_format: str = "parquet",
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist as a catalog table bucketed (and optionally sorted) on
    ``bucket_cols``. ``path`` makes it an EXTERNAL table at that
    location (needed when the session's warehouse dir — CWD-relative by
    default — may not be writable).

    Joins/aggregations between tables bucketed identically on the join
    key read co-located buckets directly — no exchange on either side.
    The sort makes the per-bucket merge join zero-sort too."""
    writer = (
        df.write.format(file_format)
        .mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)
