"""Structural plan-shape regression guard for the 12 headline bench
queries: pins the FINAL adaptive plan's shuffle count, parquet scan
count, Python-boundary count, and sort-merge-join count to the shapes
shipped in round 5.

Complements tests/test_plan_audits.py (which asserts specific
properties like pushdown and broadcast): this file catches the silent
regressions those targeted audits don't cover — an accidental extra
shuffle, a scan that stopped being shared, a Python boundary creeping
into a JVM-only pipeline, or a broadcast join degrading to
sort-merge. Bounds are UPPER bounds (<=) so AQE run-to-run variance
can only make plans better, never quietly worse.

``ann_cosine_topk`` records zeros because the entry returns a
``materialize_bounded`` result (LocalTableScan); its kernel plan is
audited separately in test_plan_audits.py.
"""

from __future__ import annotations

import pytest

import pyblazing_spark.plans as plans

#: name -> ceilings observed for the shipped plans (round 5, Spark 4.1).
EXPECTED_SHAPES: dict[str, dict[str, int]] = {
    "tpch_q1": dict(exch=2, scans=1, py=0, smj=0),
    "tpch_q3": dict(exch=3, scans=3, py=0, smj=0),
    "tpch_q5": dict(exch=7, scans=6, py=0, smj=0),
    "tpch_q6": dict(exch=1, scans=1, py=0, smj=0),
    "tpch_q19": dict(exch=2, scans=2, py=0, smj=0),
    "agg_count_distinct": dict(exch=3, scans=1, py=0, smj=0),
    "events_sessionize": dict(exch=1, scans=1, py=0, smj=0),
    "text_stats": dict(exch=2, scans=1, py=0, smj=0),
    "dedup_minhash_lsh": dict(exch=8, scans=2, py=0, smj=0),
    "ann_cosine_topk": dict(exch=0, scans=0, py=0, smj=0),
    "multimodal_features": dict(exch=1, scans=1, py=0, smj=0),
    "win_running_sum": dict(exch=1, scans=1, py=0, smj=0),
    # round-8 bench additions (r7 verdict #8): shapes recorded at entry
    "join_bloom_prune": dict(exch=3, scans=2, py=0, smj=0),
    "pipeline_snapshot_diff": dict(exch=3, scans=2, py=0, smj=1),
    # round-8 continuation bench additions: shapes recorded at entry.
    # dedup_paragraph: one fact scan; exchanges = first-occurrence
    # window hash + per-doc agg + per-source agg + final sort.
    "dedup_paragraph": dict(exch=4, scans=1, py=0, smj=0),
    # join_interval_overlap: two slice scans, bucket equi join (hash or
    # broadcast under AQE) + month agg + final sort; never a nested loop
    # (separately asserted in test_plan_audits).
    "join_interval_overlap": dict(exch=3, scans=2, py=0, smj=0),
    # round-9 bench additions: shapes recorded at entry.
    # join_asof_nearest: two slice scans -> union -> ONE logical shuffle
    # on user_id (both union children exchange) + the final sort.
    "join_asof_nearest": dict(exch=3, scans=2, py=0, smj=0),
    # agg_equidepth_histogram: two-phase global_ntile (range-bucket ids
    # + local ranks + broadcast offsets) then the bucket rollup.
    "agg_equidepth_histogram": dict(exch=6, scans=2, py=0, smj=0),
    # source_avro_roundtrip materializes via localCheckpoint
    # (LocalTableScan) like ann_cosine_topk; the I/O path is audited by
    # its oracle + tests/test_avro.py instead.
    "source_avro_roundtrip": dict(exch=0, scans=0, py=0, smj=0),
    # round-10 bench additions: both materialize via localCheckpoint
    # (bpe: materialize_bounded; avro split: checkpoint before the temp
    # dir disappears) — I/O and kernel shapes are audited by their
    # oracles, tests/test_avro.py, and test_plan_audits instead.
    "text_bpe_encode": dict(exch=0, scans=0, py=0, smj=0),
    "source_avro_split_scan": dict(exch=0, scans=0, py=0, smj=0),
    # round-11 bench addition: materializes via materialize_bounded; the
    # one-pass Aho-Corasick scan shape is covered by the operator tests
    # and the oracle instead.
    "text_multi_keyword_tag": dict(exch=0, scans=0, py=0, smj=0),
    # round-12 bench addition: materializes via materialize_bounded; the
    # vocab pass / piece aggregation / Viterbi kernel shapes are covered
    # by the oracle and tests/test_unigram.py instead.
    "text_unigram_tokenize": dict(exch=0, scans=0, py=0, smj=0),
    # round-14 bench addition (txn-family perf tracker): materializes
    # via materialize_bounded; the property that matters — manifest
    # prune actually skipping files — is asserted INSIDE the entry
    # (raises on a no-skip read) and in tests/test_txn_table.py.
    "txn_data_skipping": dict(exch=0, scans=0, py=0, smj=0),
}


def _final_plan(df) -> str:
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan prints "== Final Plan ==" then "== Initial Plan ==";
    # only the final section reflects what actually ran.
    return p.split("== Initial Plan ==")[0]


def test_expected_shapes_covers_exactly_the_bench_set():
    bench = {n for n, s in plans.REGISTRY.items() if s.bench}
    assert bench == set(EXPECTED_SHAPES), (
        "bench set changed — record the new entry's plan shape here"
    )


@pytest.mark.parametrize("name", sorted(EXPECTED_SHAPES))
def test_bench_plan_shape_has_not_regressed(spark, sf_dir, name):
    exp = EXPECTED_SHAPES[name]
    p = _final_plan(plans.REGISTRY[name].fn(spark, sf_dir))
    got = dict(
        exch=p.count("Exchange") - p.count("ReusedExchange"),
        scans=p.count("Scan parquet"),
        py=p.count("EvalPython"),
        smj=p.count("SortMergeJoin"),
    )
    for key, ceiling in exp.items():
        assert got[key] <= ceiling, (
            f"{name}: {key}={got[key]} exceeds shipped ceiling {ceiling}\n{p}"
        )
