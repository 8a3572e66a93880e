"""Driver-style verification: plain SparkSession + side-by-side DuckDB
compare of every queries()/oracle_sql() entry at a given SF.

Usage: python scripts/driver_check.py [sf_dir] [name_prefix ...]
With name prefixes given, only matching entries run (fast iteration on
new entries). A prefix of the form ``--head=N`` instead runs the FIRST
N entries of queries() iteration order — exactly the slice the per-round
driver samples under the coverage rotation (plans/registry.py).
Mirrors the correctness gate (CORRECTNESS_r{N}.json): row
count, column names, order-insensitive value compare.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from tests.oracle_utils import assert_frames_match

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = tuple(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, osql = E.queries(), E.oracle_sql()
    head = 0
    for p in prefixes:
        if p.startswith("--head="):
            head = int(p.split("=", 1)[1])
    prefixes = tuple(p for p in prefixes if not p.startswith("--head="))
    names = list(qs)[:head] if head else sorted(qs)
    n_ok = n_bad = 0
    for name in names:
        if prefixes and not name.startswith(prefixes):
            continue
        t0 = time.time()
        try:
            spdf = qs[name](spark, sf_dir).toPandas()
            if name not in osql:
                print(f"  {name:28s} rows-only rows={len(spdf)} ({time.time()-t0:.1f}s)")
                n_ok += 1
                continue
            ddf = con.execute(osql[name]).df()
            assert_frames_match(spdf, ddf, name=name)
            print(f"  {name:28s} OK rows={len(spdf)} ({time.time()-t0:.1f}s)")
            n_ok += 1
        except Exception as exc:
            n_bad += 1
            print(f"  {name:28s} FAIL: {str(exc).splitlines()[0][:150]}")
    print(f"{n_ok} ok, {n_bad} failed @ {sf_dir}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
