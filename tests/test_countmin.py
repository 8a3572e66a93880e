"""Count-Min-Sketch rollup mechanics (agg_countmin_rollup).

The entry's scale claim is that per-group sketches MERGE into the same
state one global sketch would have built — CMS counter arrays are
additive, and with identical (eps, conf, seed) every sketch uses the
same hash functions, so merged-estimate == global-estimate EXACTLY (not
approximately).  This test pins that contract through the same JVM
classes the entry uses.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pyblazing_spark.plans.aggregates import (
    _CMS_CONF,
    _CMS_EPS,
    _CMS_PROBE_KEYS,
    _CMS_SEED,
)
from pyblazing_spark.sources.tables import load_table as T


def _read_sketch(spark, raw: bytes):
    jvm = spark._jvm
    return jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(raw))
    )


def test_merged_group_sketches_equal_global_sketch(spark, sf_dir):
    fact = T(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    cms = lambda: F.count_min_sketch(  # noqa: E731
        "o_custkey", F.lit(_CMS_EPS), F.lit(_CMS_CONF), F.lit(_CMS_SEED)
    ).alias("sk")
    per_rows = fact.groupBy("o_orderpriority").agg(cms()).collect()
    global_row = fact.agg(cms()).collect()[0]

    merged = None
    for r in per_rows:
        s = _read_sketch(spark, r["sk"])
        merged = s if merged is None else merged.mergeInPlace(s)
    glob = _read_sketch(spark, global_row["sk"])

    assert merged.totalCount() == glob.totalCount()
    for k in _CMS_PROBE_KEYS:
        assert merged.estimateCount(k) == glob.estimateCount(k), k
    # and the bound the entry asserts: never undercounts the true count
    exact = {
        r["o_custkey"]: r["n"]
        for r in fact.where(F.col("o_custkey").isin(*_CMS_PROBE_KEYS))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for k in _CMS_PROBE_KEYS:
        assert merged.estimateCount(k) >= exact.get(k, 0), k
