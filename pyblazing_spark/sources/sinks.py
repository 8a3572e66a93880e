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
- :func:`compact_files`: small-file compaction (the OPTIMIZE half of
  table maintenance) — bin-packs a fragmented directory into
  target-size files with ``coalesce``, i.e. WITHOUT a shuffle: at
  100 TB every byte moves exactly twice (read + write) and never
  through an Exchange.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def _list_data_files(spark: SparkSession, path: str, suffix: str) -> list[tuple[str, int]]:
    """(name, bytes) for every data file directly under ``path``, via the
    Hadoop FileSystem API so the same call works on HDFS/S3/local. This
    is driver-side METADATA only — one listing RPC per directory, never
    row data (at 100 TB a table is ~10^5-10^6 files; a listing of that
    size is megabytes)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return [
        (st.getPath().getName(), int(st.getLen()))
        for st in fs.listStatus(jpath)
        if st.isFile() and st.getPath().getName().endswith(suffix)
    ]


def compact_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_bytes: int = 128 << 20,
    file_format: str = "parquet",
    options: dict | None = None,
) -> dict:
    """Compact a fragmented directory into ~``target_bytes`` files.

    The small-file problem is the canonical 100 TB table-maintenance
    task (streaming ingest and fine-grained partitioned writes both
    leave thousands of KB-size files; every later scan then pays one
    task + one open per file). This is the computational core of
    Delta/Iceberg ``OPTIMIZE`` expressed on plain parquet:

    1. list the data files (driver-side metadata only),
    2. derive the target file count ``ceil(bytes_on_disk /
       target_bytes)``,
    3. rewrite through ``coalesce(n)`` — coalesce only MERGES input
       partitions, so the rewrite is shuffle-free: no Exchange appears
       in the plan (plan-audited) and no row is ever hash-routed.

    Returns ``{n_files_before, bytes_before, n_files_after,
    bytes_after, target_files}``. The rewrite lands in ``dst_path``;
    swapping it over the source atomically is the metastore's job (out
    of scope here, as is compacting a LIVE table under concurrent
    writers — that needs a table format with snapshot isolation).
    """
    suffix = "." + file_format
    before = _list_data_files(spark, src_path, suffix)
    bytes_before = sum(b for _, b in before)
    n_target = max(1, math.ceil(bytes_before / target_bytes))
    # `options` applies to BOTH sides so text formats round-trip
    # faithfully (e.g. {"header": "true"} for CSV — without it the
    # per-fragment header lines would be replayed as data rows)
    df = spark.read.format(file_format).options(**(options or {})).load(src_path)
    (
        df.coalesce(n_target)
        .write.format(file_format)
        .options(**(options or {}))
        .mode("overwrite")
        .save(dst_path)
    )
    after = _list_data_files(spark, dst_path, suffix)
    return {
        "n_files_before": len(before),
        "bytes_before": bytes_before,
        "n_files_after": len(after),
        "bytes_after": sum(b for _, b in after),
        "target_files": n_target,
    }


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
