"""Physical-plan audits for scale-critical properties: these assert the
SHAPE of the plan (what would matter at 100 TB), not just the result."""

from __future__ import annotations

import pyblazing_spark.plans as plans


def _executed_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_bernoulli_sample_is_a_scan_stage_filter(spark, sf_dir):
    """The hash-sample predicate must evaluate pre-shuffle (a narrow
    filter over the scan) and the scan must prune to the 3 used columns —
    at 100 TB this is the difference between reading 3 columns of 10% of
    row groups' rows and materializing the table."""
    df = plans.REGISTRY["sample_hash_bernoulli"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    scan = plan[plan.index("(1) Scan parquet") :].split("\n\n")[0]
    assert "o_orderkey" in scan and "o_orderstatus" in scan and "o_totalprice" in scan
    assert "o_orderdate" not in scan  # pruned
    # the md5-bucket predicate sits in the pre-exchange Filter operator
    filter_block = plan[plan.index("(2) Filter") :].split("\n\n")[0]
    assert "md5" in filter_block


def test_minhash_reuses_shingle_exchange(spark, sf_dir):
    """Signature and Jaccard-verify branches must share ONE pass over the
    exploded shingles (AQE ReusedExchange); two passes doubles the
    dominant stage at corpus scale."""
    from pyblazing_spark.operators.dedup import minhash_lsh_pairs
    from pyblazing_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = _executed_plan(minhash_lsh_pairs(docs))
    assert "ReusedExchange" in plan


def test_tpch_q5_broadcasts_every_dimension(spark, sf_dir):
    """At this scale factor every dimension join should be broadcast —
    no shuffle until the final aggregation."""
    plan = _optimized_plan(plans.REGISTRY["tpch_q5"].fn(spark, sf_dir))
    assert "SortMergeJoin" not in plan


def test_decontam_never_shuffles_text(spark, sf_dir):
    """The decontamination semi-join must move only (id, shingle-hash)
    longs: no Exchange in the plan may carry the text column. At 100 TB
    the text is the table's bulk — shuffling it is the difference
    between a cheap hash join and re-materializing the corpus."""
    df = plans.REGISTRY["decontam_overlap"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line


def test_repetition_shuffles_hashes_not_bigrams(spark, sf_dir):
    """text_repetition groups on xxhash64(bigram) — bigram STRINGS must
    never appear in an Exchange (the hash is 8 bytes; the strings are
    the corpus)."""
    df = plans.REGISTRY["text_repetition"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line and "__tk" not in line, line


def test_pii_redaction_is_a_narrow_map(spark, sf_dir):
    """PII scrubbing must run in the scan stage: apart from the final
    presentation sort, the plan holds no Exchange at all — at 100 TB
    a redaction pass that shuffles the corpus is unusable."""
    df = plans.REGISTRY["text_pii_redaction"].fn(spark, sf_dir)
    plan = _optimized_plan(df)
    # the only Sort-induced exchange is for the ORDER BY presentation;
    # no Exchange may appear below it in the optimized plan string.
    assert "Join" not in plan and "Aggregate" not in plan, plan


def test_incremental_dedup_exchanges_only_keys(spark, sf_dir):
    """The snapshot anti-join must move only 16-byte content keys and
    ids: no Exchange may carry the text column."""
    df = plans.REGISTRY["dedup_incremental"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line


def test_top_tokens_partial_aggregates_before_shuffle(spark, sf_dir):
    """The vocab count must map-side combine: a partial_count over the
    token must appear BEFORE the exchange, and no Exchange may carry
    the text column (only tokens/partial counts shuffle)."""
    df = plans.REGISTRY["text_top_tokens"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "partial_count" in plan, plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line


def test_seq_packing_window_is_bucketed(spark, sf_dir):
    """Sequence packing must run the prefix sum on the two-phase bucketed
    path: the big Window node partitions by the range-bucket id, never an
    empty partitionBy over the full data."""
    df = plans.REGISTRY["pipeline_seq_packing"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    windows = [l for l in plan.splitlines() if "Window" in l and "windowspecdefinition" in l]
    data_windows = [l for l in windows if "__tok" in l]
    assert data_windows, "expected a prefix-sum window over __tok"
    for line in data_windows:
        assert "__pid" in line, f"data window is not bucket-partitioned: {line}"
