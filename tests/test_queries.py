"""Run every registered query against the DuckDB oracle — the local
equivalent of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

import pyblazing_spark.plans as plans
from tests.oracle_utils import assert_frames_match


def _all_names():
    return sorted(plans.REGISTRY)


@pytest.mark.parametrize("name", _all_names())
def test_query_vs_oracle(name, spark, sf_dir, oracle_con):
    spec = plans.REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if spec.oracle is None:
        # Non-SQL-expressible op: the driver records a rows-only check;
        # dedicated unit tests cover semantics.
        assert spark_pdf is not None
        return
    oracle_pdf = oracle_con.execute(spec.oracle).df()
    assert_frames_match(spark_pdf, oracle_pdf, name=name)
    # Guard against vacuous comparisons: flag unexpectedly empty results.
    if name not in plans.ALLOWED_EMPTY:
        assert len(spark_pdf) > 0, f"{name}: empty result at {sf_dir}"


def test_every_entry_carries_an_oracle():
    """Lint (VERDICT r12 #1 closeout): every catalog entry must register
    a value-compared DuckDB oracle. The last rows-only entry
    (text_unigram_em_learn) gained a full-replay EM oracle in r13 —
    keep the invariant: a new non-SQL-expressible op needs either an
    unrolled-replay oracle (precedents: bpe_encode_k64, kmeans_iter2,
    unigram EM) or an explicit entry in this allowlist with a comment
    saying why the driver's hard signal genuinely cannot apply."""
    allowed_rows_only: set[str] = set()
    offenders = [
        name
        for name, spec in plans.REGISTRY.items()
        if spec.oracle is None and name not in allowed_rows_only
    ]
    assert not offenders, offenders


def test_vector_oracles_carry_tie_nudge():
    """Lint: every rounded float-distance/score expression in an oracle
    (cosine or dot-product based) must carry the repo-standard +1e-9
    tie-nudge (functions/vectors.py TIE_NUDGE) — numpy/DuckDB/Spark
    disagree on exact decimal half boundaries, so an un-nudged rounded
    score is a latent hash mismatch waiting for the right fixture."""
    offenders = []
    for name, spec in plans.REGISTRY.items():
        if not spec.oracle:
            continue
        for line in spec.oracle.splitlines():
            if "round(" in line and (
                "cosine_similarity" in line or "dot_product" in line
            ):
                if "1e-9" not in line:
                    offenders.append((name, line.strip()))
    assert not offenders, offenders
