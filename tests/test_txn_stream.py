"""Streaming source over the TxnTable commit log (sources/txn_stream):
schema, per-commit tagging, and the property that makes it a real
source — OFFSET RESUME across a checkpointed restart (new commits
stream, already-streamed versions do not repeat)."""

from __future__ import annotations

import os

from pyblazing_spark.sources.txn_stream import TxnStreamDataSource
from pyblazing_spark.sources.txn_table import TxnTable


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _drain_to_parquet(spark, table_path, out_dir, ckpt_dir):
    """availableNow drain of the txn stream into a parquet sink (the
    sink that survives restarts — CLAUDE.md streaming note)."""
    spark.dataSource.register(TxnStreamDataSource)
    q = (
        spark.readStream.format("txn_table_stream")
        .option("path", table_path)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "drain did not finish"


def test_offset_resume_streams_only_new_commits(spark, tmp_path):
    tpath = str(tmp_path / "t")
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    t = TxnTable.create(spark, tpath, _mk(spark, [(1, "a"), (2, "b")]), key="k")
    t.append(_mk(spark, [(3, "c")]))

    _drain_to_parquet(spark, tpath, out, ckpt)
    got1 = {
        (r["k"], r["v"], r["_commit_version"], r["_commit_action"])
        for r in spark.read.parquet(out).collect()
    }
    assert got1 == {
        (1, "a", 1, "create"),
        (2, "b", 1, "create"),
        (3, "c", 2, "append"),
    }

    # two more commits AFTER the first drain; restart from the SAME
    # checkpoint — only versions 3..4 may arrive, no repeats of 1..2
    t.append(_mk(spark, [(4, "d")]))
    t.append(_mk(spark, [(5, "e")]))
    _drain_to_parquet(spark, tpath, out, ckpt)
    got2 = {
        (r["k"], r["_commit_version"]) for r in spark.read.parquet(out).collect()
    }
    assert got2 == {(1, 1), (2, 1), (3, 2), (4, 3), (5, 4)}
    # exactly-once at the row level: no key appears twice
    rows = spark.read.parquet(out).count()
    assert rows == 5


def test_from_version_option_skips_history(spark, tmp_path):
    tpath = str(tmp_path / "t")
    t = TxnTable.create(spark, tpath, _mk(spark, [(1, "a")]), key="k")
    t.append(_mk(spark, [(2, "b")]))
    t.append(_mk(spark, [(3, "c")]))
    spark.dataSource.register(TxnStreamDataSource)
    q = (
        spark.readStream.format("txn_table_stream")
        .option("path", tpath)
        .option("fromVersion", "2")  # start AFTER version 2
        .load()
        .writeStream.format("memory")
        .queryName("txn_from_v")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = {
        (r["k"], r["_commit_version"])
        for r in spark.sql("SELECT * FROM txn_from_v").collect()
    }
    assert got == {(3, 3)}


def test_merge_commit_emits_rewritten_files(spark, tmp_path):
    """The documented ignoreChanges caveat: a merge commit's added
    files re-emit kept rows alongside new ones — pinned so the
    semantics stay explicit, not accidental."""
    tpath = str(tmp_path / "t")
    t = TxnTable.create(
        spark, tpath, _mk(spark, [(1, "a"), (2, "b")]).coalesce(1), key="k"
    )
    t.merge(_mk(spark, [(2, "B"), (9, "z")]).coalesce(1))
    spark.dataSource.register(TxnStreamDataSource)
    q = (
        spark.readStream.format("txn_table_stream")
        .option("path", tpath)
        .load()
        .writeStream.format("memory")
        .queryName("txn_merge_sem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = {
        (r["k"], r["v"], r["_commit_version"], r["_commit_action"])
        for r in spark.sql("SELECT * FROM txn_merge_sem").collect()
    }
    # v1 creates both; v2's merge file carries kept row 1 + upsert 2 + new 9
    assert got == {
        (1, "a", 1, "create"),
        (2, "b", 1, "create"),
        (1, "a", 2, "merge"),
        (2, "B", 2, "merge"),
        (9, "z", 2, "merge"),
    }
