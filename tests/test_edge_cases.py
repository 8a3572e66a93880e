"""Edge cases: empty inputs through every operator family, single-row
inputs, and property-based checks (hypothesis) for the pure functions
— the reference had no property testing at all (SURVEY.md §5.5)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pyblazing_spark.dialect import prepare, translate_format
from pyblazing_spark.operators import dedup as DD
from pyblazing_spark.operators import multimodal as MM
from pyblazing_spark.operators import similarity as SIM
from pyblazing_spark.sources.tables import load_table


# ------------------------------------------------------------ empty inputs
def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id bigint, text string")


def _empty_vecs(spark):
    return spark.createDataFrame([], "vec_id bigint, embedding array<float>")


def test_dedup_ops_on_empty(spark):
    docs = _empty_docs(spark)
    assert DD.minhash_lsh_pairs(docs).count() == 0
    assert DD.simhash_pairs(docs).count() == 0
    assert DD.ngram_jaccard_pairs(docs).count() == 0
    assert DD.exact_dedup(docs).count() == 0


def test_similarity_on_empty(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.limit(2).select(F.col("vec_id").alias("query_id"), "embedding")
    # empty corpus
    assert SIM.cosine_topk(_empty_vecs(spark), queries).count() == 0
    # empty queries -> empty result with the right schema
    out = SIM.cosine_topk(emb, _empty_vecs(spark).select(
        F.col("vec_id").alias("query_id"), "embedding"))
    assert out.count() == 0
    assert set(out.columns) == {"query_id", "neighbor_id", "cos", "rank"}


def test_multimodal_on_empty(spark):
    blobs = MM.attach_blob(_empty_docs(spark))
    assert MM.extract_features(blobs).count() == 0
    assert MM.frame_sample(blobs).count() == 0


def test_single_doc_has_no_pairs(spark, sf_dir):
    one = load_table(spark, sf_dir, "documents").limit(1)
    assert DD.minhash_lsh_pairs(one).count() == 0
    assert DD.simhash_pairs(one).count() == 0


def test_whitespace_only_text(spark):
    docs = spark.createDataFrame(
        [(1, "   "), (2, ""), (3, "real text here three words")],
        "doc_id bigint, text string",
    )
    # must not throw; blank docs may pair with each other but not with text
    pairs = DD.minhash_lsh_pairs(docs, threshold=0.5).collect()
    assert all({p.id_a, p.id_b} <= {1, 2} for p in pairs)


# ------------------------------------------------------- property tests
@given(st.text(alphabet=st.characters(codec="ascii"), max_size=200))
@settings(max_examples=50, deadline=None)
def test_prepare_identity_without_datetime_fns(sql_text):
    """prepare() is the identity on anything without TO_DATE/TO_TIMESTAMP
    format literals."""
    if "TO_DATE" in sql_text.upper() or "TO_TIMESTAMP" in sql_text.upper():
        return
    assert prepare(sql_text) == sql_text


@given(st.sampled_from(["YYYY", "YY", "DD", "MI", "SS", "HH24", "HH12"]))
def test_translate_format_is_idempotent(tok):
    once = translate_format(tok)
    assert translate_format(once) == once


import pytest


@pytest.mark.parametrize("n", [2, 3, 5, 20])
def test_bucket_pairs_yields_all_ordered_pairs(spark, n):
    """_bucket_pairs yields exactly C(n,2) ordered (id_a < id_b) pairs."""
    ids = list(range(0, 10 * n, 10))
    df = spark.createDataFrame([(ids,)], "ids array<bigint>")
    out = df.select(F.explode(DD._bucket_pairs(F.col("ids"))).alias("p")).collect()
    assert len(out) == n * (n - 1) // 2
    assert all(r.p.id_a < r.p.id_b for r in out)
    assert len({(r.p.id_a, r.p.id_b) for r in out}) == len(out)
