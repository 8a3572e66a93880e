"""LLM-data-pipeline queries over ``documents`` / ``embeddings`` (driver
extensions; BASELINE.json north-star: dedup, similarity search, text
analysis — no reference equivalent).

Oracle policy: every entry here is oracle-checked against DuckDB. The
approximate operators get there three ways (plus unit tests asserting
recall/precision at production parameters in ``tests/test_llm_ops.py``):

- **MinHash-LSH**: the verify step's exact Jaccard is recomputed by
  DuckDB over word-shingle *strings*; hashed-shingle sets and string
  sets are bijective (xxhash64 collisions aside), so values match and
  the LSH band parameters give deterministic full recall on the planted
  near-dup pairs (similarity gap: >=0.9 vs <0.4 — measured, both SFs).
- **SimHash**: the catalog entry runs the md5-derived 60-bit token hash
  (:func:`pyblazing_spark.operators.dedup.md5_hash60`), which DuckDB
  recomputes digit-by-digit — the ENTIRE signature + banding + hamming
  pipeline is equality-checked, not a property proxy. Production default
  stays xxhash64/64-bit (faster).
- **ANN (LSH / IVF)**: catalog entries run at exhaustive-recall settings
  (width-1 bands / full nprobe) so the result provably equals the brute
  force oracle — this verifies the bucketing/join/re-rank machinery end
  to end; pruning recall at production settings is what the unit tests
  cover.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyblazing_spark.functions import text as TXT
from pyblazing_spark.operators import dedup as DD
from pyblazing_spark.operators import similarity as SIM
from pyblazing_spark.plans.registry import register
from pyblazing_spark.plans.tpch import ratio
from pyblazing_spark.session import materialize_bounded
from pyblazing_spark.sources.tables import load_table as T


from pyblazing_spark.operators.global_window import ranked_topk as _ranked_topk

# Shared SQL fragments mirroring functions/text.py (kept in lockstep).
_SQL_NORM = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),"
    " ' +', ' ', 'g'))"
)
_SQL_TOKN = "len(regexp_split_to_array(trim(text), '\\s+'))"


def _sql_occ(expr: str, word: str) -> str:
    padded = f"(' ' || {expr} || ' ')"
    needle = f" {word} "
    return (
        f"CAST((length({padded}) - length(replace({padded}, '{needle}', '')))"
        f" / {len(needle)} AS INTEGER)"
    )


def _sql_stop(lang: str) -> str:
    return " + ".join(_sql_occ("lower(text)", w) for w in TXT.LANG_STOPWORDS[lang])


@register(
    "text_stats",
    bench=True,
    tags=("llm", "text"),
    oracle=f"""
SELECT source,
       count(*)                                             AS n_docs,
       CAST(sum({_SQL_TOKN}) AS BIGINT)                     AS total_tokens,
       round(avg({_SQL_TOKN}) + 1e-9, 4)                    AS avg_tokens,
       round(avg(length(text)) + 1e-9, 4)                   AS avg_chars,
       round(avg(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                 * 1.0 / length(text)) + 1e-9, 4)           AS alpha_ratio
FROM documents
GROUP BY source
ORDER BY source
""",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token/char statistics — pure JVM expressions; the
    shuffle carries only (source, partial sums)."""
    docs = T(spark, sf_dir, "documents")
    tok = TXT.token_count(F.col("text"))
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(tok).cast("long").alias("total_tokens"),
            F.round(F.avg(tok) + 1e-9, 4).alias("avg_tokens"),
            F.round(F.avg(F.length("text")) + 1e-9, 4).alias("avg_chars"),
            F.round(F.avg(TXT.alpha_ratio(F.col("text"))) + 1e-9, 4).alias("alpha_ratio"),
        )
        .orderBy("source")
    )


@register(
    "text_langid",
    tags=("llm", "text", "langid"),
    oracle=f"""
WITH scored AS (
  SELECT lang AS tagged_lang,
         {_sql_stop('en')} AS s_en, {_sql_stop('es')} AS s_es,
         {_sql_stop('fr')} AS s_fr, {_sql_stop('de')} AS s_de
  FROM documents),
 pred AS (
  SELECT tagged_lang,
         CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en > 0 THEN 'en'
              WHEN s_es >= s_fr AND s_es >= s_de AND s_es > 0 THEN 'es'
              WHEN s_fr >= s_de AND s_fr > 0 THEN 'fr'
              WHEN s_de > 0 THEN 'de'
              ELSE 'und' END AS predicted_lang
  FROM scored)
SELECT tagged_lang, predicted_lang, count(*) AS n
FROM pred
GROUP BY tagged_lang, predicted_lang
ORDER BY tagged_lang, predicted_lang
""",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-heuristic language ID, confusion-matrix style against the
    tagged ``lang`` column."""
    docs = T(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("tagged_lang"),
            TXT.lang_id(F.col("text")).alias("predicted_lang"),
        )
        .groupBy("tagged_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("tagged_lang", "predicted_lang")
    )


@register(
    "text_fingerprint",
    tags=("llm", "text", "dedup"),
    oracle=f"""
SELECT lang,
       count(*)                       AS n_docs,
       count(DISTINCT md5({_SQL_NORM})) AS n_unique,
       count(*) - count(DISTINCT md5({_SQL_NORM})) AS n_dups
FROM documents
GROUP BY lang
ORDER BY lang
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-md5 document fingerprinting (the exact-dedup key)."""
    docs = T(spark, sf_dir, "documents")
    fp = TXT.fingerprint(F.col("text"))
    return (
        docs.select("lang", fp.alias("fp"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_unique"),
            (F.count(F.lit(1)) - F.countDistinct("fp")).alias("n_dups"),
        )
        .orderBy("lang")
    )


@register(
    "text_quality_filter",
    tags=("llm", "text", "quality"),
    oracle=f"""
WITH q AS (
  SELECT doc_id, source,
         round(least(1.0, {_SQL_TOKN} / 100.0) * 0.3
               + (length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                  * 1.0 / length(lower(text))) * 0.4
               + least(1.0, ({_sql_stop('en')}) / 5.0) * 0.3
               - (length(regexp_replace(text, '[^0-9]', '', 'g'))
                  * 1.0 / length(text)) * 0.2, 4) AS score
  FROM documents)
SELECT source, count(*) AS n_docs,
       CAST(sum(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       round(avg(score) + 1e-9, 4) AS avg_score
FROM q
GROUP BY source
ORDER BY source
""",
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring + keep-rate per source (the filter stage of a
    training-data pipeline)."""
    docs = T(spark, sf_dir, "documents")
    score = TXT.quality_score(F.col("text"))
    return (
        docs.select("source", score.alias("score"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("score") >= 0.5, 1).otherwise(0)).cast("long").alias("n_keep"),
            F.round(F.avg("score") + 1e-9, 4).alias("avg_score"),
        )
        .orderBy("source")
    )


@register(
    "dedup_exact",
    tags=("llm", "dedup"),
    oracle=f"""
WITH fp AS (SELECT md5({_SQL_NORM}) AS f, doc_id FROM documents),
 g AS (SELECT f, count(*) AS n_docs, min(doc_id) AS keep_id FROM fp GROUP BY f)
SELECT count(*)                        AS n_groups,
       CAST(sum(n_docs) AS BIGINT)     AS n_docs,
       CAST(sum(n_docs) - count(*) AS BIGINT) AS n_removed,
       CAST(min(keep_id) AS BIGINT)    AS first_keep
FROM g
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup summary via normalized-hash clusters
    (:func:`pyblazing_spark.operators.dedup.duplicate_clusters`)."""
    docs = T(spark, sf_dir, "documents")
    clusters = DD.duplicate_clusters(docs)
    return clusters.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        (F.sum("n_docs") - F.count(F.lit(1))).cast("long").alias("n_removed"),
        F.min("keep_id").alias("first_keep"),
    )


@register(
    "dedup_ngram_jaccard",
    tags=("llm", "dedup", "jaccard"),
    oracle="""
WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 500),
 idx AS (SELECT doc_id, text, unnest(generate_series(1, length(text)-7)) AS i
         FROM docs),
 sh AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 8) AS s
        FROM idx),
 sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
 pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
SELECT id_a, id_b,
       round(inter * 1.0 / (sa.n + sb.n - inter), 4) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5
ORDER BY id_a, id_b
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 8-gram Jaccard near-duplicate pairs (inverted-index join),
    bounded to doc_id < 500 — the exact-verification baseline the MinHash
    unit tests measure recall against."""
    docs = T(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    return materialize_bounded(
        DD.ngram_jaccard_pairs(docs, threshold=0.5).orderBy("id_a", "id_b")
    )


@register(
    "dedup_minhash_lsh",
    bench=True,
    tags=("llm", "dedup", "minhash"),
    oracle=r"""
WITH docs AS (SELECT doc_id, trim(text) AS t FROM documents),
 toks AS (SELECT doc_id, string_split_regex(t, '\s+') AS tk FROM docs),
 idx AS (SELECT doc_id, tk,
         unnest(generate_series(1, greatest(1, len(tk)-2))) AS i FROM toks),
 sh AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS s FROM idx),
 sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
 pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
SELECT id_a, id_b, round(inter * 1.0 / (sa.n + sb.n - inter), 4) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5
ORDER BY id_a, id_b
""",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32) + LSH(8 bands) near-dup pairs with exact-Jaccard
    verification — the 100 TB dedup path.

    Oracle-checked for full equality: DuckDB computes exact all-pairs
    word-shingle Jaccard >= 0.5. Hashed-shingle sets are bijective with
    string-shingle sets, so the verify step's values match exactly, and
    the corpus' similarity gap (planted pairs >= 0.9, noise < 0.4) makes
    LSH recall deterministically complete — measured identical at sf0.01
    (25 pairs) and sf0.1 (256 pairs)."""
    docs = T(spark, sf_dir, "documents")
    return DD.minhash_lsh_pairs(docs, threshold=0.5).orderBy("id_a", "id_b")


# md5-hex -> 60-bit integer, digit by digit (mirrors dedup.md5_hash60's
# `conv(substr(md5(tok),1,15),16,10)` exactly; 16^14 * 15 < 2^63).
_SQL_MD5_60 = " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(tok), {i + 1}, 1)) - 1) * {16 ** (14 - i)}"
    for i in range(15)
)


@register(
    "dedup_simhash",
    tags=("llm", "dedup", "simhash"),
    oracle=rf"""
WITH docs AS (SELECT doc_id, trim(text) AS t FROM documents),
 toks AS (SELECT DISTINCT doc_id,
          unnest(string_split_regex(t, '\s+')) AS tok FROM docs),
 h AS (SELECT doc_id, ({_SQL_MD5_60}) AS hv FROM toks),
 bits AS (SELECT doc_id, j,
          CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END AS v
          FROM h CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS j) js),
 maj AS (SELECT doc_id, j, sum(v) AS s FROM bits GROUP BY doc_id, j),
 sig AS (SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j)
                       ELSE 0 END) AS BIGINT) AS sg
         FROM maj GROUP BY doc_id)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sg, b.sg)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sg, b.sg)) <= 3
ORDER BY id_a, id_b
""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at hamming <= 3 via banded pigeonhole.

    The catalog entry runs the md5-derived 60-bit token hash
    (:func:`pyblazing_spark.operators.dedup.md5_hash60`) so DuckDB can
    recompute the ENTIRE pipeline — per-token hash, bit-majority
    signature, pigeonhole banding, exact xor-bit_count hamming — and the
    oracle checks full result equality, not a property proxy. Production
    callers default to xxhash64/64-bit (faster; same plan shape)."""
    docs = T(spark, sf_dir, "documents")
    return materialize_bounded(
        DD.simhash_pairs(
            docs, max_hamming=3, bits=60, token_hash=DD.md5_hash60
        ).orderBy("id_a", "id_b")
    )


@register(
    "dedup_embedding",
    tags=("llm", "dedup", "embedding"),
    oracle="""
WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 500)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding, b.embedding) + 1e-9, 4) AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
ORDER BY id_a, id_b
""",
)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (bounded brute force; LSH-bucketed
    variant is the scale path)."""
    emb = T(spark, sf_dir, "embeddings").where(F.col("vec_id") < 500)
    return materialize_bounded(
        DD.embedding_pairs(emb, threshold=0.4).orderBy("id_a", "id_b")
    )


#: Exact brute-force top-5 — the oracle for ann_cosine_topk AND for the
#: LSH/IVF entries, which run at exhaustive-recall settings so their
#: output is provably identical (verifies the bucketing machinery).
_SQL_ANN_TOPK = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id < 5),
 c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings
       WHERE vec_id >= 5),
 scored AS (
  SELECT query_id, neighbor_id,
         round(list_cosine_similarity(qv, cv) + 1e-9, 4) AS cos
  FROM q CROSS JOIN c),
 ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, cos, rank
FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
"""


@register(
    "dedup_embedding_lsh",
    tags=("llm", "dedup", "embedding", "lsh"),
    oracle="""
WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 500)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding, b.embedding) + 1e-9, 4) AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
ORDER BY id_a, id_b
""",
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed embedding near-dup — the scale path ``dedup_embedding``
    documents. The catalog entry runs 16 width-1 bands (candidate recall
    deterministically complete at cos >= 0.4 on this corpus), so the
    oracle proves bucket-join + exact-verify equals the brute-force
    pairs; pruned production settings are covered by the ANN recall
    unit tests over the same hyperplane machinery."""
    emb = T(spark, sf_dir, "embeddings").where(F.col("vec_id") < 500)
    return materialize_bounded(
        DD.embedding_pairs_lsh(
            emb, threshold=0.4, n_bits=16, bands=16
        ).orderBy("id_a", "id_b")
    )


#: Shared by dedup_components / dedup_components_star: both algorithms
#: must produce the SAME clusters the recursive-CTE oracle computes.
_COMPONENTS_ORACLE = r"""
WITH docs AS (SELECT doc_id, trim(text) AS t FROM documents),
 toks AS (SELECT doc_id, string_split_regex(t, '\s+') AS tk FROM docs),
 idx AS (SELECT doc_id, tk,
         unnest(generate_series(1, greatest(1, len(tk)-2))) AS i FROM toks),
 sh AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS s FROM idx),
 sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
 pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
 edges0 AS (SELECT id_a, id_b FROM pairs
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5),
 edges AS (SELECT id_a AS u, id_b AS v FROM edges0
           UNION ALL SELECT id_b, id_a FROM edges0),
 reach AS (
   WITH RECURSIVE r(id, label) AS (
     SELECT u, u FROM edges
     UNION
     SELECT e.u, r.label FROM edges e JOIN r ON r.id = e.v)
   SELECT id, min(label) AS component FROM r GROUP BY id)
SELECT component,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(max(id) AS BIGINT)  AS max_id
FROM reach
GROUP BY component
ORDER BY component
"""


@register(
    "dedup_substring_coverage",
    tags=("llm", "dedup", "substring"),
    oracle=f"""
WITH base AS (SELECT doc_id, source, text, length(text) AS len
          FROM documents WHERE doc_id < 250),
 le AS (SELECT * FROM base WHERE len >= 24),
 grams AS (SELECT doc_id, unnest(generate_series(1, len - 23, 1)) AS pos, text
           FROM le),
 g0 AS (SELECT doc_id, pos,
        substr(text, CAST(pos AS INTEGER), 24) AS tok FROM grams),
 g AS (SELECT doc_id, pos, ({_SQL_MD5_60}) AS hv FROM g0),
 sel AS (SELECT doc_id, pos, hv FROM g WHERE hv % 4 = 0),
 dup AS (SELECT hv FROM sel GROUP BY hv HAVING count(DISTINCT doc_id) >= 2),
 marks AS (SELECT doc_id, pos FROM sel WHERE hv IN (SELECT hv FROM dup)),
 cov AS (SELECT doc_id, pos,
         max(pos + 24) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS pe
         FROM marks),
 per AS (SELECT doc_id,
         CAST(sum(greatest(0, (pos + 24) - greatest(pos, coalesce(pe, 0))))
              AS BIGINT) AS dc
         FROM cov GROUP BY doc_id),
 docs AS (SELECT b.doc_id, b.source, b.len, coalesce(p.dc, 0) AS dc,
          round(coalesce(p.dc, 0) * 1.0 / b.len + 1e-9, 4) AS r
          FROM base b LEFT JOIN per p USING (doc_id))
SELECT source,
       CAST(count(*) AS BIGINT)                              AS n_docs,
       CAST(sum(CASE WHEN r >= 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       CAST(sum(dc) AS BIGINT)                               AS dup_chars,
       round(avg(r) + 1e-9, 4)                               AS avg_dup_ratio
FROM docs GROUP BY source ORDER BY source
""",
)
def dedup_substring_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup signal (Lee et al. 2022): per-source count
    of docs whose cross-document duplicated-span coverage exceeds 20%,
    plus total duplicated chars and mean coverage.
    :func:`pyblazing_spark.operators.dedup.duplicated_span_coverage`
    hashes every 24-char window, keeps CONTENT-DEFINED samples
    (hash % 4 == 0 — alignment-robust, unlike a stride grid), finds
    grams shared by >=2 docs, and takes an EXACT interval union of the
    marked spans per doc in one window pass. The oracle replays the
    md5-derived gram hash digit-by-digit, the selection, duplicate
    detection, and the interval union in SQL, so an off-by-one in the
    window math or a wrong merge of overlapping spans cannot pass.
    Complementary to MinHash whole-doc dedup: this catches
    boilerplate/template spans inside otherwise-unique documents.
    Entry bounded to doc_id < 250 (identically both sides): the
    md5-digit oracle replay is the cost driver, not the operator —
    production uses the xxhash64 gram hash."""
    docs = T(spark, sf_dir, "documents").where(F.col("doc_id") < 250)
    cov = DD.duplicated_span_coverage(docs, k=24, sample_mod=4)
    out = (
        cov.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("dup_ratio") >= 0.2, 1).otherwise(0))
            .cast("long")
            .alias("n_flagged"),
            F.sum("dup_chars").cast("long").alias("dup_chars"),
            F.round(F.avg("dup_ratio") + 1e-9, 4).alias("avg_dup_ratio"),
        )
        .orderBy("source")
    )
    return materialize_bounded(out)


@register(
    "dedup_components",
    tags=("llm", "dedup", "graph"),
    oracle=_COMPONENTS_ORACLE,
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clustering: connected components over the
    MinHash-LSH pair graph via distributed min-label propagation
    (:mod:`pyblazing_spark.operators.graph` — O(diameter) rounds, each
    one (node,label)-long shuffle). Greedy pair-dropping under-merges
    chains; components are the correct dedup primitive. The oracle
    recomputes the same clusters with a recursive CTE over the exact
    word-shingle Jaccard edges."""
    from pyblazing_spark.operators.graph import connected_components

    return _components_rollup(spark, sf_dir, connected_components)


def _pair_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash-LSH pair graph both components entries cluster — a
    DETERMINISTIC intermediate, so it is computed once per (session,
    sf_dir) and kept as a materialized localCheckpoint: the
    materialized-intermediate pattern a production pipeline uses (write
    the pair graph once, run clustering variants against it) rather than
    re-running the full shingle->signature->band->verify pipeline per
    consumer. Keyed on the SparkContext like _ship_package's flag, so a
    fresh session recomputes."""
    sc = spark.sparkContext
    cache = getattr(sc, "_pbs_pair_graph", None)
    if cache is None:
        cache = {}
        sc._pbs_pair_graph = cache
    if sf_dir not in cache:
        docs = T(spark, sf_dir, "documents")
        cache[sf_dir] = materialize_bounded(
            DD.minhash_lsh_pairs(docs, threshold=0.5)
        )
    return cache[sf_dir]


def _components_rollup(spark: SparkSession, sf_dir: str, cc_fn) -> DataFrame:
    """Shared pipeline for both components entries: same pair graph,
    same rollup — ONLY the components algorithm differs, so the shared
    oracle genuinely proves algorithm equivalence."""
    pairs = _pair_graph(spark, sf_dir)
    comp = cc_fn(pairs)
    return materialize_bounded(
        comp.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("id").cast("long").alias("max_id"),
        )
        .orderBy("component")
    )


@register(
    "dedup_components_reliable",
    tags=("llm", "dedup", "graph", "fault-tolerance"),
    oracle=_COMPONENTS_ORACLE,
)
def dedup_components_reliable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME transitive clustering as ``dedup_components``, with the
    loop's lineage truncation in RELIABLE checkpoint mode
    (:func:`pyblazing_spark.session.make_ckpt` with a filesystem
    ``checkpoint_dir``): every checkpointed round is written to a
    fault-tolerant path instead of executor-memory blocks, so a lost
    executor mid-loop recovers from the FS with no lineage at all —
    the production configuration for 1000-executor churn, where
    ``localCheckpoint`` recovery fails once the parent handle is
    unpersisted (probed under real executor SIGKILL with parent
    lineage evicted: scripts/cluster_probe.py --kill-deep, SCALE.md).
    Identical oracle as ``dedup_components`` — the driver proves the
    fault-tolerant mode computes identical components."""
    import shutil
    import tempfile

    from pyblazing_spark.operators.graph import connected_components

    ckpt_dir = tempfile.mkdtemp(prefix="pbs_reliable_ckpt_")
    try:
        return _components_rollup(
            spark,
            sf_dir,
            lambda pairs: connected_components(pairs, checkpoint_dir=ckpt_dir),
        )
    finally:
        # _components_rollup returns an eagerly materialized frame, so
        # the round snapshots are consumed by now; a real deployment
        # points checkpoint_dir at a managed path and reaps by job id.
        # NOTE: setCheckpointDir is process-global and still points at
        # the removed path after this — any df.checkpoint() call MUST
        # flow through make_ckpt (which re-sets the dir per call); no
        # code path in this package calls df.checkpoint() directly.
        shutil.rmtree(ckpt_dir, ignore_errors=True)


@register(
    "dedup_components_star",
    tags=("llm", "dedup", "graph"),
    oracle=_COMPONENTS_ORACLE,
)
def dedup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME transitive clustering as ``dedup_components``, computed
    by the alternating large-star/small-star algorithm
    (:func:`pyblazing_spark.operators.graph.connected_components_star` —
    O(log d) rounds instead of O(d), the right variant for long chain
    topologies). Identical oracle: the driver proves both algorithms
    converge to the min-label components."""
    from pyblazing_spark.operators.graph import connected_components_star

    return _components_rollup(spark, sf_dir, connected_components_star)


@register(
    "ann_cosine_topk",
    bench=True,
    tags=("llm", "ann"),
    oracle=_SQL_ANN_TOPK,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 5 query vectors — the exact baseline
    for similarity search (queries broadcast, corpus streams)."""
    emb = T(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.where(F.col("vec_id") >= 5)
    return materialize_bounded(
        SIM.cosine_topk(corpus, queries, k=5, query_id_col="query_id")
    )


@register(
    "ann_lsh",
    tags=("llm", "ann", "lsh"),
    oracle=_SQL_ANN_TOPK,
)
def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN top-5 (banded buckets + exact re-rank) — the
    scale path for similarity search.

    The catalog entry runs 16 width-1 bands: on this corpus (true top-5
    cos in [0.25, 0.42]) that makes candidate recall deterministically
    complete, so the result equals brute force and the oracle checks the
    bucket-assign / band-join / re-rank machinery for full equality.
    Production pruning settings (16 bits / 4 bands) and their recall are
    what ``tests/test_llm_ops.py`` asserts."""
    emb = T(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.where(F.col("vec_id") >= 5)
    return materialize_bounded(
        SIM.lsh_ann_topk(
            corpus, queries, k=5, query_id_col="query_id", n_bits=16, bands=16
        )
    )


@register(
    "ann_ivf",
    tags=("llm", "ann", "ivf"),
    oracle=_SQL_ANN_TOPK,
)
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-5 (k-means coarse quantizer, exact cosine re-rank) —
    the data-adaptive scale path for similarity search.

    The catalog entry probes all 16 lists (nprobe = n_centroids), which
    is exact by construction — the oracle then checks that the k-means
    assignment, list join, and re-rank lose or duplicate no rows vs
    brute force. Pruned-probe recall (nprobe=4) is unit-tested."""
    emb = T(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.where(F.col("vec_id") >= 5)
    return materialize_bounded(
        SIM.ivf_ann_topk(corpus, queries, k=5, n_centroids=16, nprobe=16)
    )


#: Axis-aligned 8-bit sign bucket shared by ann_recall_eval's engine and
#: oracle: bit i set when dim i is non-negative.  Deliberately the
#: SIMPLEST real LSH so the ORACLE can recompute the approximate method
#: end-to-end — the entry's point is the recall-evaluation harness, not
#: the hash family.
def _sign_bucket_col(vec: str):
    bits = [
        F.when(F.col(vec).getItem(i) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(8)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


_SIGN_BUCKET_SQL = " + ".join(
    f"(CASE WHEN {{v}}[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)" for i in range(8)
)


@register(
    "ann_recall_eval",
    tags=("llm", "ann", "eval", "recall"),
    oracle=f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id < 5),
 c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings
       WHERE vec_id >= 5),
 qb AS (SELECT query_id, qv, {_SIGN_BUCKET_SQL.format(v='qv')} AS bucket FROM q),
 cb AS (SELECT neighbor_id, cv, {_SIGN_BUCKET_SQL.format(v='cv')} AS bucket FROM c),
 exact AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
           ORDER BY round(list_cosine_similarity(qv, cv) + 1e-9, 4) DESC,
                    neighbor_id) AS rank
  FROM q CROSS JOIN c),
 ex5 AS (SELECT query_id, neighbor_id FROM exact WHERE rank <= 5),
 ap AS (
  SELECT qb.query_id, cb.neighbor_id,
         row_number() OVER (PARTITION BY qb.query_id
           ORDER BY round(list_cosine_similarity(qb.qv, cb.cv) + 1e-9, 4) DESC,
                    cb.neighbor_id) AS rank
  FROM qb JOIN cb ON qb.bucket = cb.bucket),
 ap5 AS (SELECT query_id, neighbor_id FROM ap WHERE rank <= 5),
 napprox AS (SELECT query_id, count(*) AS n_approx FROM ap5 GROUP BY 1),
 hits AS (SELECT a.query_id, count(*) AS n_hits
          FROM ap5 a JOIN ex5 e USING (query_id, neighbor_id) GROUP BY 1)
SELECT q.query_id,
       CAST(coalesce(n_approx, 0) AS BIGINT) AS n_approx,
       CAST(coalesce(n_hits, 0) AS BIGINT)   AS n_hits,
       round(coalesce(n_hits, 0) / 5.0 + 1e-9, 4) AS recall_at_5
FROM q LEFT JOIN napprox ON napprox.query_id = q.query_id
       LEFT JOIN hits ON hits.query_id = q.query_id
ORDER BY q.query_id
""",
)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality EVALUATION harness — the missing half of shipping an
    approximate index: measure recall@k of a pruned method against the
    exact brute-force ranking, per query, on-engine. The approximate
    method here is an 8-bit axis-aligned sign LSH (candidates share the
    query's sign pattern on the first 8 dims), chosen because the
    ORACLE can recompute it bit-for-bit — so bucket assignment, the
    bucket-restricted re-rank, the exact ranking, and the recall join
    are ALL verified end to end (production LSH/IVF recall is
    unit-tested over the same machinery, tests/test_llm_ops.py).

    recall@5 uses a fixed denominator of 5 even when a sparse bucket
    returns fewer candidates (n_approx < 5) — the standard definition.

    Scale: exact ranking streams the corpus once (queries broadcast in
    the kernel closure, per-batch top-k prune); the approximate side
    touches only the query's bucket (~corpus/256); the recall join is
    k-by-k per query. Nothing vector-sized shuffles."""
    from pyspark.sql import Window as W

    from pyblazing_spark.functions.vectors import cosine_udf, nudge_round

    emb = T(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.where(F.col("vec_id") >= 5)
    exact5 = SIM.cosine_topk(corpus, queries, k=5, query_id_col="query_id").select(
        "query_id", "neighbor_id"
    )
    qb = queries.select(
        "query_id",
        F.col("embedding").alias("qv"),
        _sign_bucket_col("embedding").alias("bucket"),
    )
    cb = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        "embedding",
        _sign_bucket_col("embedding").alias("bucket"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    ap5 = (
        cb.join(F.broadcast(qb), "bucket")
        .select(
            "query_id",
            "neighbor_id",
            nudge_round(cosine_udf(F.col("embedding"), F.col("qv")), 4).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("query_id", "neighbor_id")
    )
    napprox = ap5.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_approx"))
    hits = ap5.join(exact5, ["query_id", "neighbor_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return materialize_bounded(
        queries.select("query_id")
        .join(napprox, "query_id", "left")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_approx", F.lit(0)).alias("n_approx"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.round(F.coalesce("n_hits", F.lit(0)) / 5.0 + 1e-9, 4).alias(
                "recall_at_5"
            ),
        )
        .orderBy("query_id")
    )


@register(
    "sink_partitioned_roundtrip",
    tags=("sink", "write", "roundtrip"),
    oracle="""
SELECT CAST(o_orderpriority AS VARCHAR) AS o_orderpriority,
       CAST(count(*) AS BIGINT)         AS n,
       round(sum(o_totalprice) + 1e-4, 2) AS total
FROM orders
WHERE o_orderstatus = 'O'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def sink_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sink round-trip (beyond reference — it has NO write path at all,
    SURVEY.md §2.8): write the filtered orders as a Hive-partitioned
    parquet tree (:func:`pyblazing_spark.sources.sinks.write_files`),
    read it BACK through partition discovery, and aggregate. The oracle
    computes the same result from the source table, so a row lost,
    duplicated, or mistyped anywhere in the write->discover->read cycle
    fails the equality."""
    import shutil
    import tempfile

    from pyblazing_spark.sources.sinks import write_files

    out_dir = tempfile.mkdtemp(prefix="sink_rt_")
    try:
        od = T(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
        write_files(
            od.select("o_orderkey", "o_totalprice", "o_orderpriority"),
            out_dir,
            partition_by=["o_orderpriority"],
        )
        # explicit schema: an all-rows-filtered write leaves only
        # _SUCCESS in the tree, and schema inference on zero files
        # throws — empty input must round-trip to an empty result.
        back = spark.read.schema(
            "o_orderkey bigint, o_totalprice double, o_orderpriority string"
        ).parquet(out_dir)
        return (
            back.groupBy(F.col("o_orderpriority").cast("string").alias("o_orderpriority"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("o_totalprice") + 1e-4, 2).alias("total"),
            )
            .orderBy("o_orderpriority")
            # materialize BEFORE the temp dir disappears
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


@register(
    "join_salted_skew",
    tags=("join", "skew", "scale"),
    oracle="""
SELECT n.n_name,
       CAST(count(*) AS BIGINT)                 AS n_events,
       round(sum(e.value) + 1e-4, 2)            AS total_value
FROM events e
JOIN nation n ON n.n_nationkey = e.user_id % 25
GROUP BY n.n_name
ORDER BY n.n_name
""",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe salted join (:func:`pyblazing_spark.operators.skew.
    salted_join`): the fact side is salted into 16 sub-keys and the
    dimension replicated, so a single hot join key spreads over 16
    shuffle partitions instead of one executor. The oracle is the plain
    SQL join — salting must be result-invariant."""
    from pyblazing_spark.operators.skew import salted_join

    ev = T(spark, sf_dir, "events").withColumn(
        "n_nationkey", (F.col("user_id") % 25).cast("int")
    )
    na = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = salted_join(ev, na, on="n_nationkey", salts=16)
    return (
        joined.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value") + 1e-4, 2).alias("total_value"),
        )
        .orderBy("n_name")
    )


@register(
    "agg_two_phase_skew",
    tags=("aggregate", "skew", "scale"),
    oracle="""
SELECT e.event_type,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM events e
GROUP BY e.event_type
ORDER BY e.event_type
""",
)
def agg_two_phase_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe exact distinct count
    (:func:`pyblazing_spark.operators.skew.salted_distinct_count`):
    phase 1 bounds per-(key, salt) partial sets; phase 2 explodes the
    partials back to rows and dedups on a (key, value) shuffle — no
    single reducer ever holds a hot key's full value set in EITHER
    phase. Oracle: plain COUNT(DISTINCT)."""
    from pyblazing_spark.operators.skew import salted_distinct_count

    ev = T(spark, sf_dir, "events")
    out = salted_distinct_count(
        ev, key="event_type", value="user_id", out_col="n_users", salts=16
    )
    return out.select(
        "event_type", F.col("n_users").cast("long").alias("n_users")
    ).orderBy("event_type")


@register(
    "decontam_overlap",
    tags=("llm", "decontam", "pipeline"),
    oracle=r"""
WITH corpus AS (SELECT doc_id, trim(text) AS t FROM documents WHERE doc_id >= 50),
 bench AS (SELECT trim(text) AS t FROM documents WHERE doc_id < 50),
 ctoks AS (SELECT doc_id, string_split_regex(t, '\s+') AS tk FROM corpus),
 cidx AS (SELECT doc_id, tk,
          unnest(generate_series(1, greatest(1, len(tk)-4))) AS i FROM ctoks),
 csh AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+4], ' ') AS s FROM cidx),
 btoks AS (SELECT string_split_regex(t, '\s+') AS tk FROM bench),
 bidx AS (SELECT tk, unnest(generate_series(1, greatest(1, len(tk)-4))) AS i
          FROM btoks),
 bsh AS (SELECT DISTINCT array_to_string(tk[i:i+4], ' ') AS s FROM bidx)
SELECT DISTINCT doc_id AS contaminated_id
FROM csh WHERE s IN (SELECT s FROM bsh)
ORDER BY contaminated_id
""",
)
def decontam_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs (doc_id >= 50) sharing any
    5-token shingle with the held-out set (doc_id < 50) are flagged —
    the standard eval-leakage guard in pretraining pipelines
    (:mod:`pyblazing_spark.operators.decontam`). Hashed shingles are
    bijective with the oracle's string shingles, so the id sets match
    exactly."""
    from pyblazing_spark.operators.decontam import contaminated_ids

    docs = T(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") >= 50)
    bench = docs.where(F.col("doc_id") < 50)
    return (
        contaminated_ids(corpus, bench, shingle_words=5)
        .select(F.col("doc_id").alias("contaminated_id"))
        .orderBy("contaminated_id")
    )


@register(
    "text_repetition",
    tags=("llm", "text", "quality"),
    oracle=r"""
WITH docs AS (SELECT doc_id, trim(text) AS t FROM documents),
 toks AS (SELECT doc_id, string_split_regex(t, '\s+') AS tk FROM docs),
 ok AS (SELECT doc_id, tk FROM toks WHERE len(tk) >= 2),
 idx AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk)-1)) AS i FROM ok),
 bg AS (SELECT doc_id, array_to_string(tk[i:i+1], ' ') AS g FROM idx),
 counts AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
 agg AS (SELECT doc_id, max(c) AS top_c, CAST(sum(c) AS BIGINT) AS total
         FROM counts GROUP BY doc_id)
SELECT doc_id, total AS n_bigrams,
       round(top_c * 1.0 / total + 1e-9, 4) AS top_bigram_ratio
FROM agg
ORDER BY doc_id
""",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition scoring: the most frequent word bigram's
    share of all bigrams per document (high ratio = boilerplate/spam).

    Bigrams are produced row-wise (explode positions, scalar hash) per
    the no-HOF policy; the groupBy shuffles only (doc_id, xxhash64)
    longs — bigram TEXT never shuffles. The oracle counts string bigrams;
    hash and string bigrams are bijective."""
    docs = T(spark, sf_dir, "documents")
    toks = docs.select("doc_id", TXT.tokens(F.col("text")).alias("__tk")).where(
        F.size("__tk") >= 2
    )
    pos = toks.select(
        "doc_id",
        "__tk",
        F.explode(F.sequence(F.lit(1), F.size("__tk") - F.lit(1))).alias("__i"),
    )
    grams = pos.select(
        "doc_id",
        F.xxhash64(
            F.element_at("__tk", F.col("__i").cast("int")),
            F.element_at("__tk", (F.col("__i") + 1).cast("int")),
        ).alias("__g"),
    )
    counts = grams.groupBy("doc_id", "__g").agg(F.count(F.lit(1)).alias("__c"))
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("__c").cast("long").alias("n_bigrams"),
            F.max("__c").alias("__top"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round(F.col("__top") / F.col("n_bigrams") + 1e-9, 4).alias(
                "top_bigram_ratio"
            ),
        )
        .orderBy("doc_id")
    )


@register(
    "pipeline_seq_packing",
    tags=("llm", "pipeline", "packing"),
    oracle=f"""
WITH t AS (SELECT doc_id, {_SQL_TOKN} AS tok FROM documents),
 c AS (SELECT doc_id, tok,
       sum(tok) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       - tok AS prev_cum
       FROM t),
 b AS (SELECT CAST(prev_cum // 512 AS BIGINT) AS bin_id, doc_id, tok FROM c)
SELECT bin_id, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS bin_tokens
FROM b
GROUP BY bin_id
ORDER BY bin_id
""",
)
def pipeline_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training batches: documents are packed in
    doc_id order into contiguous ~512-token bins (bin = prefix-sum
    BEFORE the doc, integer-divided by the window size — deterministic
    and engine-independent).

    The prefix sum runs on the SCALE path
    (:func:`pyblazing_spark.operators.global_window.global_running_sum`,
    two-phase range-bucketed) — packing 100 TB of documents never
    serializes into one task. The oracle computes the same spec with a
    serial SQL window."""
    from pyblazing_spark.operators.global_window import global_running_sum

    docs = T(spark, sf_dir, "documents")
    t = docs.select("doc_id", TXT.token_count(F.col("text")).alias("__tok"))
    c = global_running_sum(t, ["doc_id"], "__tok", out_col="__cum")
    return (
        c.select(
            "doc_id",
            "__tok",
            # integer div, not float-div-then-cast: DuckDB CAST(float AS
            # BIGINT) rounds half-away while Spark's cast truncates.
            F.expr("CAST((__cum - __tok) AS BIGINT) div 512").alias("bin_id"),
        )
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__tok").cast("long").alias("bin_tokens"),
        )
        .orderBy("bin_id")
    )


@register(
    "text_char_entropy",
    tags=("llm", "text", "quality"),
    oracle="""
WITH chars AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch
  FROM documents WHERE doc_id < 200),
 e AS (SELECT doc_id, round(entropy(ch) + 1e-9, 4) AS char_entropy
       FROM chars GROUP BY doc_id)
SELECT doc_id, char_entropy FROM e ORDER BY doc_id
""",
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon character entropy per document (bits) — a classic cheap
    quality/noise signal (low entropy = repeated boilerplate, high =
    random noise). Spark has no entropy aggregate: explode chars,
    map-side-combined count per (doc, char) — the shuffle carries at
    most alphabet-size rows per doc — then -sum(p log2 p). DuckDB's
    native ``entropy()`` (base 2) is the oracle."""
    docs = T(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    chars = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("__ch")
    )
    counts = chars.groupBy("doc_id", "__ch").agg(F.count(F.lit(1)).alias("__c"))
    return (
        counts.groupBy("doc_id")
        .agg(
            F.round(
                (
                    F.log2(F.sum("__c"))
                    - F.sum(F.col("__c") * F.log2("__c")) / F.sum("__c")
                )
                + 1e-9,
                4,
            ).alias("char_entropy")
        )
        .orderBy("doc_id")
    )


@register(
    "pipeline_curation_funnel",
    tags=("llm", "pipeline", "dedup", "quality"),
    oracle=f"""
WITH base AS (SELECT doc_id, text, lang FROM documents),
 en AS (SELECT * FROM base WHERE lang = 'en'),
 q AS (
  SELECT * FROM en
  WHERE least(1.0, {_SQL_TOKN} / 100.0) * 0.3
        + (length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
           * 1.0 / length(lower(text))) * 0.4
        + least(1.0, ({_sql_stop('en')}) / 5.0) * 0.3
        - (length(regexp_replace(text, '[^0-9]', '', 'g'))
           * 1.0 / length(text)) * 0.2 >= 0.5),
 d AS (SELECT min(doc_id) AS keep FROM q GROUP BY md5({_SQL_NORM}))
SELECT 'total' AS stage, CAST((SELECT count(*) FROM base) AS BIGINT) AS n_docs, 0 AS stage_no
UNION ALL SELECT 'lang_en', (SELECT count(*) FROM en), 1
UNION ALL SELECT 'quality', (SELECT count(*) FROM q), 2
UNION ALL SELECT 'exact_dedup', (SELECT count(*) FROM d), 3
ORDER BY stage_no
""",
)
def pipeline_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone curation pipeline as one lazy plan: language filter ->
    quality filter -> exact dedup, reporting survivors per stage.

    At 100 TB this is the shape of a real pretraining-data job: every
    stage is a narrow filter or one hash-keyed shuffle, composed lazily
    so Catalyst fuses the filters into the scan. (The near-dup MinHash
    stage continues from here via
    :func:`pyblazing_spark.operators.dedup.minhash_dedup` — excluded
    from the funnel so the whole query stays oracle-checkable.)
    """
    docs = T(spark, sf_dir, "documents")
    en = docs.where(F.col("lang") == "en")
    q = en.where(TXT.quality_score(F.col("text")) >= 0.5)
    d = DD.exact_dedup(q)

    def stage(name: str, df: DataFrame, no: int) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.lit(no).alias("stage_no"),
        )

    return (
        stage("total", docs, 0)
        .unionAll(stage("lang_en", en, 1))
        .unionAll(stage("quality", q, 2))
        .unionAll(stage("exact_dedup", d, 3))
        .orderBy("stage_no")
    )


_SQL_SCORE = f"""round(least(1.0, {_SQL_TOKN} / 100.0) * 0.3
               + (length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                  * 1.0 / length(lower(text))) * 0.4
               + least(1.0, ({_sql_stop('en')}) / 5.0) * 0.3
               - (length(regexp_replace(text, '[^0-9]', '', 'g'))
                  * 1.0 / length(text)) * 0.2, 4)"""


@register(
    "pipeline_token_budget",
    tags=("llm", "pipeline", "sampling", "window"),
    oracle=f"""
WITH s AS (
  SELECT source, doc_id, {_SQL_TOKN} AS tok, {_SQL_SCORE} AS score
  FROM documents),
 r AS (
  SELECT *, sum(tok) OVER (PARTITION BY source
                           ORDER BY score DESC, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum
  FROM s)
SELECT source,
       count(*) AS n_kept,
       CAST(sum(tok) AS BIGINT) AS tokens_kept,
       round(min(score) + 1e-9, 4) AS min_score
FROM r WHERE cum <= 5000
GROUP BY source
ORDER BY source
""",
)
def pipeline_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill a per-source token budget with the best documents first —
    the "assemble a training mix" operator: rank by quality within each
    source, admit docs until the cumulative token count hits the budget.

    Scale: one shuffle on source, then a window running-sum and filter —
    no driver-side iteration; budgets per source apply independently so
    skewed sources don't serialize the rest."""
    docs = T(spark, sf_dir, "documents")
    tok = TXT.token_count(F.col("text"))
    score = TXT.quality_score(F.col("text"))
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("source")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ranked = docs.select(
        "source", "doc_id", tok.alias("tok"), score.alias("score")
    ).withColumn("cum", F.sum("tok").over(w))
    return (
        ranked.where(F.col("cum") <= 5000)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("tok").cast("long").alias("tokens_kept"),
            F.round(F.min("score") + 1e-9, 4).alias("min_score"),
        )
        .orderBy("source")
    )


@register(
    "text_hash_classifier",
    tags=("llm", "text", "scoring", "classifier"),
    oracle=rf"""
WITH tk AS (
  SELECT doc_id, source,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
  FROM documents),
 t2 AS (SELECT doc_id, source, tok FROM tk WHERE tok <> ''),
 h AS (SELECT doc_id, source, ({_SQL_MD5_60}) % 1024 AS b FROM t2),
 wt AS (SELECT doc_id, source,
        ((b * 2654435761) % 2001 - 1000) / 1000.0 AS w FROM h),
 scored AS (
  SELECT doc_id, source,
         round(0.05 + avg(w) + 1e-9, 4) AS score
  FROM wt GROUP BY doc_id, source)
SELECT source,
       CAST(count(*) AS BIGINT)                                   AS n_docs,
       CAST(sum(CASE WHEN score >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       round(avg(score) + 1e-9, 4)                                AS avg_score
FROM scored GROUP BY source ORDER BY source
""",
)
def text_hash_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear classifier inference (the fastText-style
    quality-filter pattern: token -> hash bucket -> weight lookup ->
    mean + bias -> threshold). Weights here are a deterministic formula
    of the bucket id (a Knuth-multiplicative pseudo-model in [-1, 1]),
    standing in for trained parameters so DuckDB can replay the ENTIRE
    inference — md5-digit token hash, bucket modulo, weight, mean,
    threshold — value-for-value; a real deployment swaps the formula
    for a broadcast weight table (identical plan shape: scan-stage
    math, zero joins, one doc-key shuffle).

    Scale: classification is pure codegen arithmetic in the scan stage
    — at 100 TB the quality filter costs one pass and shuffles only
    (doc, partial sums); no model server, no Python. The linear score
    (no sigmoid) keeps cross-engine math in exact-rational territory."""
    docs = T(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    b = DD.md5_hash60(F.col("tok")) % 1024
    w = ((b * F.lit(2654435761)) % 2001 - 1000) / 1000.0
    scored = (
        tok.select("doc_id", "source", w.alias("w"))
        .groupBy("doc_id", "source")
        .agg(F.round(F.lit(0.05) + F.avg("w") + 1e-9, 4).alias("score"))
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("score") >= 0, 1).otherwise(0))
            .cast("long")
            .alias("n_keep"),
            F.round(F.avg("score") + 1e-9, 4).alias("avg_score"),
        )
        .orderBy("source")
    )


@register(
    "text_lm_unigram",
    tags=("llm", "text", "scoring"),
    oracle=r"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
  FROM documents),
 t2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
 freq AS (SELECT token, count(*) AS n FROM t2 GROUP BY token),
 tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM freq)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(ln(n / tot)) + 1e-9, 4) AS avg_logp
FROM t2 JOIN freq USING (token) CROSS JOIN tot
GROUP BY doc_id
ORDER BY doc_id
""",
)
def text_lm_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram LM scoring: per-document mean token
    log-probability under the corpus's own empirical unigram
    distribution — the classic cheap perplexity proxy for quality
    filtering (low avg_logp = rare-token gibberish; suspiciously high =
    boilerplate).

    Scale: token frequencies are the word-count shape (partial agg
    before the shuffle, only (token, count) pairs cross the wire); the
    score pass joins tokens to the frequency table. This entry PINS the
    broadcast (plan-audited) because the corpus vocabulary is small by
    construction; the hint is a hard pin, not an adaptive fallback — at
    a scale where the distinct-token set outgrows driver/executor
    memory, drop the explicit ``F.broadcast`` and Spark plans a hash
    join keyed on token. The corpus total is a one-row broadcast scalar.
    ln(n/tot) is exact-rational input -> double, identical across
    engines; avg is rounded to 4 dp to absorb summation order."""
    docs = T(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token"),
    ).where(F.col("token") != "")
    # freq feeds the corpus total AND the scoring probe: materialize the
    # vocabulary-sized frame once or the corpus explode plans and runs
    # 3x per invocation (r14).
    from pyblazing_spark.session import materialize_bounded

    freq = materialize_bounded(
        tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    )
    # bounded driver collect: one row, the corpus token total
    tot = freq.agg(F.sum("n").alias("tot")).collect()[0]["tot"]
    scored = tok.join(F.broadcast(freq), "token").withColumn(
        "tot", F.lit(tot).cast("long")
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(F.log(F.col("n") / F.col("tot"))) + 1e-9, 4).alias("avg_logp"),
        )
        .orderBy("doc_id")
    )


@register(
    "sink_bucketed_join",
    tags=("sink", "bucketing", "join"),
    oracle="""
SELECT o_orderstatus, l_returnflag,
       CAST(count(*) AS BIGINT)                 AS n,
       round(sum(l_extendedprice) + 1e-4, 2)    AS total_price
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderstatus, l_returnflag
ORDER BY o_orderstatus, l_returnflag
""",
)
def sink_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join, driver-proven end-to-end: both sides
    are written as catalog tables bucketed + sorted on the join key
    (external location in a temp dir — the driver's CWD-relative
    warehouse may not be writable), then joined WITHOUT any exchange on
    either side (plan-audited in tests/test_plan_audits.py). At 100 TB
    this is the lever that turns every recurring fact-fact join on a
    stable key into a zero-shuffle operation: pay the layout once at
    ingest, join for free forever after. Results must equal the plain
    oracle join over the original parquet."""
    import shutil
    import tempfile

    from pyblazing_spark.sources.sinks import write_bucketed_table

    od = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    base = tempfile.mkdtemp(prefix="pbs_bucketed_")
    # A dedicated database with an explicit temp LOCATION: saving into
    # the default database would mkdir the session's CWD-relative
    # spark-warehouse dir, which may not be writable where the driver
    # runs. Everything this entry touches lives under the temp dir.
    # Repeat invocations in one session must not accumulate state: drop
    # the previous run's database (CASCADE takes the tables with it —
    # otherwise CREATE DATABASE IF NOT EXISTS would pin the LOCATION to
    # the FIRST call's temp dir forever) and remove its temp root,
    # tracked on the SparkContext like _ship_package's shipped flag.
    sc = spark.sparkContext
    prev = getattr(sc, "_pbs_bucket_base", None)
    spark.sql("DROP DATABASE IF EXISTS pbs_bucket_db CASCADE")
    if prev is not None:
        shutil.rmtree(prev, ignore_errors=True)
    sc._pbs_bucket_base = base
    spark.sql(f"CREATE DATABASE pbs_bucket_db LOCATION '{base}/db'")
    write_bucketed_table(
        od, "pbs_bucket_db.pbs_b_orders", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"], path=f"{base}/orders",
    )
    write_bucketed_table(
        li, "pbs_bucket_db.pbs_b_lineitem", ["l_orderkey"], 8,
        sort_cols=["l_orderkey"], path=f"{base}/lineitem",
    )
    bo = spark.table("pbs_bucket_db.pbs_b_orders")
    bl = spark.table("pbs_bucket_db.pbs_b_lineitem")
    return (
        bo.join(bl, bo["o_orderkey"] == bl["l_orderkey"])
        .groupBy("o_orderstatus", "l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice") + 1e-4, 2).alias("total_price"),
        )
        .orderBy("o_orderstatus", "l_returnflag")
    )


@register(
    "source_jdbc_roundtrip",
    tags=("source", "jdbc"),
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT)              AS n,
       round(sum(o_totalprice) + 1e-4, 2)    AS total_price
FROM orders
WHERE o_orderkey < 1000 AND o_totalprice > 50000
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def source_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Executable external-DB path, driver-proven end-to-end: an orders
    slice is WRITTEN into an embedded Derby database over JDBC (the
    Derby driver ships with Spark — no network, no extra jar), then read
    back through the package's ``from_sql``-style
    :func:`pyblazing_spark.sources.files.read_jdbc` route, filtered
    (predicate pushes into the JDBC scan — asserted in
    tests/test_sources.py), and aggregated; the result must equal the
    same query over the original parquet. mysql/postgresql/sqlite build
    the identical reader with only a different URL/driver jar
    (reference parity: AbstractSQLDataProvider.cpp:42-86)."""
    import tempfile

    from pyblazing_spark.sources.files import read_jdbc

    db = tempfile.mkdtemp(prefix="pbs_derby_") + "/db"
    url = f"jdbc:derby:{db};create=true"
    od = (
        T(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 1000)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    (
        od.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "ORDERS_RT")
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .mode("overwrite")
        .save()
    )
    back = read_jdbc(spark, "ORDERS_RT", from_sql="derby", database=db, table="ORDERS_RT")
    return (
        back.where(F.col("o_totalprice") > 50000)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice") + 1e-4, 2).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "source_sqlite_roundtrip",
    tags=("source", "sqlite", "pushdown"),
    oracle="""
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT)        AS n,
       CAST(sum(c_custkey) AS BIGINT)  AS key_sum,
       round(sum(c_acctbal) + 1e-4, 2) AS bal_total
FROM customer
WHERE c_custkey < 1000 AND c_acctbal > 100
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def source_sqlite_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Executable SQLite path with ZERO extra jars: a customer slice is
    written into a real SQLite database file (stdlib ``sqlite3``), then
    read back through :func:`pyblazing_spark.sources.files.read_jdbc`'s
    ``from_sql="sqlite"`` route — which, with no ``org.sqlite.JDBC`` on
    the classpath, resolves to the Python DataSource bridge
    (:mod:`pyblazing_spark.sources.sqlite_ds`): column-pruned SELECT
    (only the four queried columns are named — asserted in
    tests/test_sources.py), Catalyst filters transpiled into the
    emitted WHERE (``AbstractSQLDataProvider.cpp:42-86`` parity;
    ``SQLiteDataProvider.cpp:1-80``), and rowid-range partitioned
    parallel reads. The aggregate must equal the same query over the
    original parquet, so a type-mapping, pruning, pushdown, or
    partition-boundary bug (dropped/duplicated rowid range) fails the
    value compare; ``key_sum`` pins WHICH rows survived.

    Scale: the external-DB ingest pattern — the DB does the filtering
    B-tree-side, N cursors stream disjoint rowid ranges in parallel,
    and only Arrow batches cross into the JVM. The seed slice is
    bounded (<1000 keys) by contract, mirroring source_jdbc_roundtrip's
    Derby write."""
    import sqlite3
    import tempfile

    from pyblazing_spark.sources.files import read_jdbc

    cust = (
        T(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < 1000)
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        .toPandas()
    )
    db = tempfile.mkdtemp(prefix="pbs_sqlite_") + "/rt.db"
    with sqlite3.connect(db) as con:
        con.execute(
            "CREATE TABLE customer_rt (c_custkey INTEGER, c_name TEXT,"
            " c_acctbal REAL, c_mktsegment TEXT)"
        )
        # sqlite3 binds only native Python scalars (numpy.int64 is not
        # an int subclass) — convert explicitly.
        con.executemany(
            "INSERT INTO customer_rt VALUES (?,?,?,?)",
            zip(
                (int(v) for v in cust["c_custkey"]),
                (str(v) for v in cust["c_name"]),
                (float(v) for v in cust["c_acctbal"]),
                (str(v) for v in cust["c_mktsegment"]),
            ),
        )
    try:
        back = read_jdbc(
            spark,
            "customer_rt",
            from_sql="sqlite",
            database=db,
            table="customer_rt",
            columns="c_custkey,c_acctbal,c_mktsegment",
            numPartitions=4,
        )
        return (
            back.where(F.col("c_acctbal") > 100)
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("c_custkey").alias("key_sum"),
                F.round(F.sum("c_acctbal") + 1e-4, 2).alias("bal_total"),
            )
            .orderBy("c_mktsegment")
            # materialize BEFORE the temp db disappears
            .localCheckpoint(eager=True)
        )
    finally:
        import os
        import shutil

        shutil.rmtree(os.path.dirname(db), ignore_errors=True)


@register(
    "source_unsigned_widening",
    tags=("source", "parquet", "unsigned", "types"),
    oracle="""
SELECT CAST(count(*) AS BIGINT)                  AS n,
       CAST(sum(n_nationkey * 10) AS BIGINT)     AS u8_sum,
       CAST(sum(n_nationkey * 2600) AS BIGINT)   AS u16_sum,
       CAST(sum(n_nationkey * CAST(171798691 AS BIGINT)) AS BIGINT) AS u32_sum,
       CAST(max(n_nationkey * CAST(171798691 AS BIGINT)) AS BIGINT) AS u32_max,
       -- u64 rides as VARCHAR: DuckDB's pandas conversion flattens
       -- DECIMAL(20,0) to float64 (precision loss + dtype skew); the
       -- string is exact on both engines.  The widened decimal dtype
       -- itself is pinned by the in-entry assert.
       CAST('18446744073709551615'::DECIMAL(20,0) - min(n_nationkey)
            AS VARCHAR)                          AS u64_max,
       CAST('18446744073709551615'::DECIMAL(20,0) - max(n_nationkey)
            AS VARCHAR)                          AS u64_min
FROM nation
""",
)
def source_unsigned_widening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unsigned-type ingest, end to end (SURVEY §1.2; reference
    ``unsignedTypeTest.py`` + catalog enum
    ``CatalogColumnDataType.java:19-47``): a parquet file with REAL
    uint8/uint16/uint32/uint64 logical types — values deterministically
    derived from nation keys, deliberately ABOVE each signed type's max
    (u32 rows exceed INT32_MAX; u64 rows sit at 2^64-1-k) — is read
    back through :func:`pyblazing_spark.sources.files.read_source` and
    must land in the widened Spark types (uint8→smallint, uint16→int,
    uint32→bigint, uint64→decimal(20,0)) with exact values. The oracle
    recomputes every aggregate from nation with the same arithmetic, so
    a narrowing overflow (the failure mode of naive uint handling:
    2^64-1 → NULL bigint) cannot pass; ``u64_max``/``u64_min`` carrying
    DECIMAL(20,0) pins the widened dtype family itself.

    Scale: widening is a pure metadata/cast concern at the scan — no
    shuffle, no Python; the same parquet footer logic handles a 100 TB
    unsigned-column corpus."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyblazing_spark.sources.files import read_source

    keys = sorted(
        int(r.n_nationkey)
        for r in T(spark, sf_dir, "nation").select("n_nationkey").collect()
    )
    t = pa.table(
        {
            "u8": pa.array([k * 10 for k in keys], pa.uint8()),
            "u16": pa.array([k * 2600 for k in keys], pa.uint16()),
            "u32": pa.array([k * 171798691 for k in keys], pa.uint32()),
            "u64": pa.array([(1 << 64) - 1 - k for k in keys], pa.uint64()),
        }
    )
    path = tempfile.mkdtemp(prefix="pbs_uint_") + "/u.parquet"
    pq.write_table(t, path)
    try:
        back, _fmt, _paths = read_source(spark, path)
        widened = dict(back.dtypes)
        assert widened == {
            "u8": "smallint", "u16": "int", "u32": "bigint",
            "u64": "decimal(20,0)",
        }, f"unsigned widening broke: {widened}"
        return back.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("u8").alias("u8_sum"),
            F.sum("u16").alias("u16_sum"),
            F.sum("u32").alias("u32_sum"),
            F.max("u32").alias("u32_max"),
            F.max("u64").cast("string").alias("u64_max"),
            F.min("u64").cast("string").alias("u64_min"),
        ).localCheckpoint(eager=True)
    finally:
        import shutil

        shutil.rmtree(os.path.dirname(path), ignore_errors=True)


@register(
    "text_lm_bigram",
    tags=("llm", "text", "scoring", "lm"),
    oracle=r"""
WITH v AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS arr
  FROM documents
  WHERE array_length(regexp_split_to_array(trim(lower(text)), '\s+')) >= 2),
 idx AS (
  SELECT doc_id, arr,
         unnest(generate_series(1, array_length(arr) - 1)) AS i
  FROM v),
 bg AS (
  SELECT doc_id, arr[i] AS w1, arr[i + 1] AS w2
  FROM idx
  WHERE arr[i] <> '' AND arr[i + 1] <> ''),
 c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n12 FROM bg GROUP BY w1, w2),
 c1 AS (SELECT w1, CAST(sum(n12) AS BIGINT) AS n1 FROM c12 GROUP BY w1),
 vocab AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS vsz FROM c12)
SELECT bg.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(ln((n12 + 1.0) / (n1 + vsz))) + 1e-9, 4) AS avg_logp
FROM bg
JOIN c12 USING (w1, w2)
JOIN c1 USING (w1)
CROSS JOIN vocab
GROUP BY bg.doc_id
ORDER BY bg.doc_id
""",
)
def text_lm_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained BIGRAM LM scoring with add-one smoothing: each
    document's mean log P(w_i | w_{i-1}) under the corpus's own bigram
    counts — the next step up from :func:`text_lm_unigram` as a
    perplexity-proxy quality filter (catches token-level repetition and
    unnatural word order that unigram frequency cannot).

    Scale: bigram construction is a NARROW map (zip the token array
    against its own tail — no window, no shuffle); counts are the
    word-count shape with map-side partials. The count tables are
    broadcast-pinned like the unigram entry (vocabulary-sized by
    construction; at open-web scale drop the pin and Spark hash-joins
    on the bigram key). Smoothed probabilities are exact rationals in
    both engines; the per-doc average is rounded to 4 dp."""
    docs = T(spark, sf_dir, "documents")
    arr = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    v = docs.select("doc_id", arr.alias("arr")).where(F.size("arr") >= 2)
    zipped = F.arrays_zip(
        F.slice(F.col("arr"), 1, F.size("arr") - 1),
        F.slice(F.col("arr"), 2, F.size("arr") - 1),
    )
    bg = (
        v.select("doc_id", F.explode(zipped).alias("z"))
        .select("doc_id", F.col("z.0").alias("w1"), F.col("z.1").alias("w2"))
        .where((F.col("w1") != "") & (F.col("w2") != ""))
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    c1 = c12.groupBy("w1").agg(F.sum("n12").alias("n1"))
    vocab = c12.agg(F.countDistinct("w2").alias("vsz"))
    scored = (
        bg.join(F.broadcast(c12), ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(vocab))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(F.log((F.col("n12") + 1.0) / (F.col("n1") + F.col("vsz"))))
                + 1e-9,
                4,
            ).alias("avg_logp"),
        )
        .orderBy("doc_id")
    )


_DEDUP_E2E_ORACLE = r"""
WITH docs AS (SELECT doc_id, source, trim(text) AS t FROM documents),
 toks AS (SELECT doc_id, string_split_regex(t, '\s+') AS tk FROM docs),
 idx AS (SELECT doc_id, tk,
         unnest(generate_series(1, greatest(1, len(tk)-2))) AS i FROM toks),
 sh AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS s FROM idx),
 sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
 pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
 edges0 AS (SELECT id_a, id_b FROM pairs
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5),
 edges AS (SELECT id_a AS u, id_b AS v FROM edges0
           UNION ALL SELECT id_b, id_a FROM edges0),
 reach AS (
   WITH RECURSIVE r(id, label) AS (
     SELECT u, u FROM edges
     UNION
     SELECT e.u, r.label FROM edges e JOIN r ON r.id = e.v)
   SELECT id, min(label) AS component FROM r GROUP BY id),
 decided AS (
   SELECT d.doc_id, d.source,
          coalesce(reach.component, d.doc_id) AS canonical
   FROM docs d LEFT JOIN reach ON reach.id = d.doc_id)
SELECT source,
       CAST(count(*) AS BIGINT)                                    AS n_docs,
       CAST(sum(CASE WHEN doc_id = canonical THEN 1 ELSE 0 END)
            AS BIGINT)                                             AS n_kept,
       CAST(sum(CASE WHEN doc_id <> canonical THEN 1 ELSE 0 END)
            AS BIGINT)                                             AS n_dropped,
       CAST(sum(CASE WHEN doc_id <> canonical THEN doc_id END)
            AS BIGINT)                                             AS dropped_id_sum
FROM decided
GROUP BY source
ORDER BY source
"""


@register(
    "pipeline_dedup_e2e",
    tags=("llm", "dedup", "pipeline", "graph"),
    oracle=_DEDUP_E2E_ORACLE,
)
def pipeline_dedup_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE near-dedup pipeline as one artifact: MinHash-LSH
    candidate pairs -> connected components -> canonical winner per
    cluster (min doc_id) -> per-source keep/drop ledger. This is the
    decision table a production corpus build actually writes: every
    document mapped to its canonical representative, singletons keeping
    themselves, with ``dropped_id_sum`` making the oracle sensitive to
    exactly WHICH documents were dropped.

    Scale: composes three already-audited stages — the shared
    materialized pair graph (ONE shingle exchange, signatures-not-text),
    O(diameter) label propagation on the pair graph (checkpointed
    rounds), and a dimension-sized left join back to the corpus (the
    components table is cluster-member-sized, far smaller than the
    corpus, so it broadcasts at any scale)."""
    from pyblazing_spark.operators.graph import connected_components

    docs = T(spark, sf_dir, "documents").select("doc_id", "source")
    comp = connected_components(_pair_graph(spark, sf_dir))
    decided = docs.join(
        F.broadcast(comp), docs.doc_id == comp.id, "left"
    ).select(
        "doc_id",
        "source",
        F.coalesce("component", "doc_id").alias("canonical"),
    )
    kept = F.when(F.col("doc_id") == F.col("canonical"), 1).otherwise(0)
    return materialize_bounded(
        decided.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept).alias("n_kept"),
            F.sum(1 - kept).alias("n_dropped"),
            F.sum(
                F.when(F.col("doc_id") != F.col("canonical"), F.col("doc_id"))
            ).alias("dropped_id_sum"),
        )
        .orderBy("source")
    )


@register(
    "dedup_containment",
    tags=("llm", "dedup", "containment"),
    oracle="""
WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 500),
 idx AS (SELECT doc_id, text, unnest(generate_series(1, length(text)-7)) AS i
         FROM docs),
 sh AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 8) AS s
        FROM idx),
 sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
 pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
 sized AS (SELECT id_a, id_b, inter, sa.n AS na, sb.n AS nb
           FROM pairs
           JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b),
 directed AS (
   SELECT id_a AS contained_id, id_b AS container_id,
          inter * 1.0 / na AS c FROM sized
   UNION ALL
   SELECT id_b, id_a, inter * 1.0 / nb FROM sized)
SELECT contained_id, container_id, round(c, 4) AS containment
FROM directed
WHERE c >= 0.6
ORDER BY contained_id, container_id
""",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed n-gram containment near-dup detection
    (:func:`pyblazing_spark.operators.dedup.containment_pairs`):
    C(A→B) = |sh(A)∩sh(B)| / |sh(A)| ≥ 0.6 flags documents mostly
    contained in another — the boilerplate / quoted-subset signal that
    symmetric Jaccard structurally misses (a doc embedded verbatim in a
    longer one has Jaccard ≈ |A|/|B| but containment ≈ 1). Bounded to
    doc_id < 500 like the other exact-pair baselines; the LSH pipeline
    is the candidate generator at 100 TB."""
    docs = T(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    return materialize_bounded(
        DD.containment_pairs(docs, threshold=0.6).orderBy(
            "contained_id", "container_id"
        )
    )


_SEM_K = 8  # SemDeDup cluster count at catalog scale (production: ~sqrt(n))
_SEM_THR = 0.35  # within-cluster cosine threshold


def _sql_sem_d2(p: str, c: str) -> str:
    from pyblazing_spark.functions.vectors import nudge_round_sql

    return nudge_round_sql(
        f"list_dot_product({p}.v, {p}.v)"
        f" - 2 * list_dot_product({p}.v, {c}.cv)"
        f" + list_dot_product({c}.cv, {c}.cv)",
        3,
    )


@register(
    "dedup_semantic",
    tags=("llm", "dedup", "embedding", "semantic"),
    oracle=f"""
WITH init AS (
  SELECT vec_id, embedding, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         CAST(vec_id % {_SEM_K} AS INTEGER) AS c0
  FROM embeddings WHERE vec_id < 2000),
 cent AS (
  SELECT c0, i, avg(v[i]) AS m
  FROM init JOIN generate_series(1, 64) t(i) ON true
  GROUP BY c0, i),
 cl AS (
  SELECT c0 AS cand, list(m ORDER BY i) AS cv FROM cent GROUP BY c0),
 dist AS (
  SELECT v.vec_id, v.embedding, c.cand, {{d2}} AS d2
  FROM init v CROSS JOIN cl c),
 assigned AS (
  SELECT vec_id, embedding, cand AS cluster FROM (
    SELECT vec_id, embedding, cand, d2,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cand) AS rn
    FROM dist) x WHERE rn = 1),
 pairs AS (
  SELECT a.cluster, a.vec_id AS id_a, b.vec_id AS id_b,
         list_cosine_similarity(a.embedding, b.embedding) AS cos
  FROM assigned a JOIN assigned b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= {_SEM_THR}),
 dropped AS (
  SELECT cluster, id_b FROM pairs GROUP BY cluster, id_b)
SELECT p.cluster,
       CAST(n.n_vecs AS BIGINT)                 AS n_vecs,
       CAST(count(*) AS BIGINT)                 AS n_dup_pairs,
       CAST(d.n_dropped AS BIGINT)              AS n_dropped,
       CAST(d.drop_id_sum AS BIGINT)            AS drop_id_sum,
       round(max(p.cos) + 1e-9, 4)              AS max_cos
FROM pairs p
JOIN (SELECT cluster, count(*) AS n_vecs FROM assigned GROUP BY cluster) n
  USING (cluster)
JOIN (SELECT cluster, count(*) AS n_dropped, sum(id_b) AS drop_id_sum
      FROM dropped GROUP BY cluster) d
  USING (cluster)
GROUP BY p.cluster, n.n_vecs, d.n_dropped, d.drop_id_sum
ORDER BY p.cluster
""".replace("{d2}", _sql_sem_d2("v", "c")),
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings with one deterministic k-means
    assignment (the ``vector_kmeans`` contract — init ``vec_id % k``,
    per-cluster means, nearest-centroid argmin with the repo tie-nudge),
    then compare pairs ONLY within a cluster; cosine >= threshold marks
    the higher id as a semantic duplicate. Per cluster: member count,
    duplicate pairs, dropped docs (distinct higher ids + checksum), max
    similarity.

    Scale shape: clustering turns the O(n^2) corpus comparison into
    sum over clusters of O(|c|^2) — with k ~ sqrt(n) clusters this is
    the SemDeDup trick that made 100 TB semantic dedup tractable. The
    assignment is a broadcast-closure numpy kernel (corpus vectors
    never shuffle for it); only the within-cluster self-join shuffles,
    keyed on the cluster id, and at production k each cluster is
    executor-sized. Bounded here to vec_id < 2000 like the other
    exact-pair baselines."""
    from pyblazing_spark.functions import vectors as VEC
    from pyblazing_spark.operators.similarity import (
        centroid_assign_with_dist,
        centroid_means,
    )
    from pyblazing_spark.session import loop_shuffle_confs, scoped_conf

    emb = T(spark, sf_dir, "embeddings").where(F.col("vec_id") < 2000)
    init = emb.select(
        "vec_id", "embedding", (F.col("vec_id") % _SEM_K).cast("int").alias("c0")
    )
    with scoped_conf(spark, loop_shuffle_confs(spark)):
        ids, C = centroid_means(init, "embedding", "c0")
    a = centroid_assign_with_dist(F.col("embedding"), C, cluster_ids=ids)
    assigned = init.select(
        "vec_id", "embedding", a.getField("cluster").alias("cluster")
    )
    lhs = assigned.select(
        "cluster", F.col("vec_id").alias("id_a"), F.col("embedding").alias("__ea")
    )
    rhs = assigned.select(
        "cluster", F.col("vec_id").alias("id_b"), F.col("embedding").alias("__eb")
    )
    pairs = (
        lhs.join(rhs, ["cluster"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", VEC.cosine_udf(F.col("__ea"), F.col("__eb")))
        .where(F.col("cos") >= _SEM_THR)
        .select("cluster", "id_a", "id_b", "cos")
    )
    sizes = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_vecs"))
    dropped = (
        pairs.select("cluster", "id_b")
        .distinct()
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_dropped"),
            F.sum("id_b").alias("drop_id_sum"),
        )
    )
    summary = (
        pairs.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_dup_pairs"),
            VEC.nudge_round(F.max("cos"), 4).alias("max_cos"),
        )
        .join(F.broadcast(sizes), "cluster")
        .join(F.broadcast(dropped), "cluster")
        .select(
            "cluster",
            "n_vecs",
            "n_dup_pairs",
            "n_dropped",
            "drop_id_sum",
            "max_cos",
        )
        .orderBy("cluster")
    )
    return materialize_bounded(summary)


#: Shared oracle fragments for the BPE entry: wrap each character of a
#: word as "(c)" so symbol boundaries are explicit — string replace of
#: "(p1)(p2)" can then never consume a shared separator, making greedy
#: left-to-right merging identical in Spark and DuckDB (probed: both
#: engines' replace() scans left-to-right without rescanning output).
_BPE_VOCAB_SQL = """
  SELECT word, CAST(count(*) AS BIGINT) AS w,
         regexp_replace(word, '(.)', '(\\1)', 'g') AS s
  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
        FROM documents)
  WHERE regexp_matches(word, '^[a-z]+$')
  GROUP BY word
"""


def _bpe_pairs_sql(vocab: str) -> str:
    """Adjacent-symbol pair counts over a (word, w, s) vocab CTE."""
    return f"""
  SELECT sym[i] AS p1, sym[i + 1] AS p2, CAST(sum(w) AS BIGINT) AS weight
  FROM (SELECT w, string_split(trim(s, '()'), ')(') AS sym FROM {vocab}),
       unnest(generate_series(1, len(sym) - 1)) t(i)
  WHERE len(sym) >= 2
  GROUP BY p1, p2
"""


def _bpe_pair_counts(v: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts over a (w, s) vocab frame — the
    Spark twin of :func:`_bpe_pairs_sql`."""
    syms = v.select(
        "w", F.split(F.expr("trim(BOTH '()' FROM s)"), r"\)\(").alias("sym")
    ).where(F.size("sym") >= 2)
    return (
        syms.select(
            "w",
            "sym",
            F.explode(F.sequence(F.lit(1), F.size("sym") - 1)).alias("i"),
        )
        .select(
            F.expr("sym[i - 1]").alias("p1"),  # Spark arrays are 0-based
            F.expr("sym[i]").alias("p2"),
            "w",
        )
        .groupBy("p1", "p2")
        .agg(F.sum("w").alias("weight"))
    )


def _bpe_learn_rounds_sql(k: int, vocab_sql: str = _BPE_VOCAB_SQL) -> str:
    """CTE chain learning ``k`` greedy merges: vocab1 .. vocab{k+1}.
    Every vocab CTE is referenced twice (its pairs + the next round),
    so AS MATERIALIZED throughout — DuckDB inlines plain CTEs and the
    corpus subtree would replicate per round (CLAUDE.md, graph_kcore)."""
    parts = [f" vocab1 AS MATERIALIZED ({vocab_sql})"]
    for i in range(1, k + 1):
        parts.append(
            f" pairs{i} AS MATERIALIZED ({_bpe_pairs_sql(f'vocab{i}')})"
        )
        parts.append(
            f""" best{i} AS (
  SELECT p1, p2 FROM pairs{i} ORDER BY weight DESC, p1, p2 LIMIT 1)"""
        )
        parts.append(
            # LEFT JOIN ON TRUE, not CROSS JOIN: when a learn round runs
            # dry (pairs{i} empty -> best{i} empty) the merge must be a
            # no-op, matching the Spark side's `break` — a cross join
            # against an empty best{i} would wipe the vocab to zero rows
            # and silently empty every later round (ADVICE r10).
            f""" vocab{i + 1} AS MATERIALIZED (
  SELECT word, w,
         CASE WHEN b.p1 IS NULL THEN s
              ELSE replace(s, '(' || b.p1 || ')(' || b.p2 || ')',
                           '(' || b.p1 || b.p2 || ')') END AS s
  FROM vocab{i} LEFT JOIN best{i} b ON TRUE)"""
        )
    return ",\n".join(parts)


@register(
    "text_bpe_merges",
    tags=("llm", "text", "tokenizer", "bpe"),
    oracle=f"""
WITH vocab1 AS ({_BPE_VOCAB_SQL}),
 pairs1 AS ({_bpe_pairs_sql('vocab1')}),
 best1 AS (
  SELECT p1, p2 FROM pairs1
  ORDER BY weight DESC, p1, p2 LIMIT 1),
 vocab2 AS (
  SELECT word, w,
         replace(s, '(' || b.p1 || ')(' || b.p2 || ')',
                 '(' || b.p1 || b.p2 || ')') AS s
  FROM vocab1 CROSS JOIN best1 b),
 pairs2 AS ({_bpe_pairs_sql('vocab2')}),
 ranked AS (
  SELECT 1 AS round, p1, p2, weight,
         row_number() OVER (ORDER BY weight DESC, p1, p2) AS rank
  FROM pairs1
  UNION ALL
  SELECT 2, p1, p2, weight,
         row_number() OVER (ORDER BY weight DESC, p1, p2)
  FROM pairs2)
SELECT CAST(round AS INTEGER) AS round, CAST(rank AS INTEGER) AS rank,
       p1, p2, weight
FROM ranked WHERE rank <= 5
ORDER BY round, rank
""",
)
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer-training statistics: two merge rounds
    over the corpus vocabulary. Round 1 counts adjacent character-pair
    frequencies (weighted by word frequency); the top pair merges into
    one symbol across the vocabulary (greedy left-to-right, the classic
    BPE step); round 2 recounts over the merged symbols. Emits the
    top-5 pairs of each round.

    Scale shape: the only corpus-scale work is the word-count pass
    (map-side partials; text never shuffles) — everything after runs on
    the DISTINCT vocabulary, which is Zipf-bounded and tiny relative to
    the corpus (the reason corpus-scale BPE training is feasible at
    all). Symbols are boundary-wrapped as ``(c)`` so the merge is a
    plain string replace with identical greedy semantics in both
    engines — no lookbehind regex (RE2 has none) and no per-symbol
    Python. The chosen pair is a 2-scalar bounded collect, same
    contract as the runtime-filter bounds."""
    docs = T(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word")
        )
        .where(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("w"))
        .withColumn("s", F.regexp_replace("word", r"(.)", r"($1)"))
    )

    pair_counts = _bpe_pair_counts
    pairs1 = pair_counts(vocab).localCheckpoint(eager=True)
    best = pairs1.orderBy(F.desc("weight"), "p1", "p2").select("p1", "p2").first()
    if best is None:  # empty corpus: no pairs, round 2 == round 1 == empty
        vocab2 = vocab
    else:
        b1, b2 = best
        vocab2 = vocab.withColumn(
            "s", F.replace(F.col("s"), F.lit(f"({b1})({b2})"), F.lit(f"({b1}{b2})"))
        )
    pairs2 = pair_counts(vocab2)

    def ranked(p: DataFrame, rnd: int) -> DataFrame:
        return _ranked_topk(p, 5, F.desc("weight"), "p1", "p2").select(
            F.lit(rnd).cast("int").alias("round"), "rank", "p1", "p2", "weight"
        )

    return materialize_bounded(
        ranked(pairs1, 1).unionAll(ranked(pairs2, 2)).orderBy("round", "rank")
    )


def _bpe_learn_inprocess(
    rows: list[tuple[str, int]], k: int, unit: int = 1
) -> list[tuple[str, str]]:
    """Driver-side greedy BPE learn over the collected vocabulary: ``k``
    merge rounds with a lazy max-heap and incremental pair-count
    updates touching only the words that contain the merged pair — the
    production shape (VERDICT r10 #3). The distributed alternative is
    one Spark job per merge round (fine at k=4, 50k sequential jobs at
    a production vocab); here the ONLY cluster work is the word-count
    aggregation that produced ``rows``, and the learn loop is
    O(total updates × log) in-process, independent of corpus size and
    sublinear in k wall-time (the heap amortizes across rounds).

    Exactly replicates the unrolled-SQL oracle's greedy step: best pair
    = max total weight, ties broken by lexicographically smallest
    (p1, p2); the merge is the left-to-right non-overlapping adjacent
    replace (same semantics as one global ``replace`` on the
    boundary-wrapped form). A dry round (no positive pair left) stops
    early, matching the oracle's LEFT-JOIN no-op rounds.

    ``rows`` is a |vocab|-bounded collect — distinct lowercase words
    with counts, the same boundedness contract as the sketch/codebook
    collects (a 10M-word production vocab is ~100 MB on the driver; the
    corpus itself never leaves the cluster).

    ``unit`` sets the initial symbol width in characters: 1 =
    character-level (the classic entry), 2 = byte-level over the
    hex-encoded word (each 2-hex-char chunk IS one raw byte — the
    GPT-2-style byte alphabet, engine-portable because both Spark and
    DuckDB produce identical uppercase ``hex()``)."""
    import heapq

    words: dict[str, list[str]] = {}
    weight: dict[str, int] = {}
    pair_w: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[str]] = {}
    for word, w in rows:
        syms = (
            list(word)
            if unit == 1
            else [word[i : i + unit] for i in range(0, len(word), unit)]
        )
        words[word] = syms
        weight[word] = w
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_w[p] = pair_w.get(p, 0) + w
            pair_words.setdefault(p, set()).add(word)
    heap: list[tuple[int, tuple[str, str]]] = [
        (-w, p) for p, w in pair_w.items()
    ]
    heapq.heapify(heap)

    def merge_syms(syms: list[str], p1: str, p2: str) -> list[str]:
        out: list[str] = []
        i, n = 0, len(syms)
        while i < n:
            if i + 1 < n and syms[i] == p1 and syms[i + 1] == p2:
                out.append(p1 + p2)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    merges: list[tuple[str, str]] = []
    while len(merges) < k:
        # lazy heap: discard stale entries (weight changed since push)
        best: tuple[str, str] | None = None
        while heap:
            negw, p = heapq.heappop(heap)
            if pair_w.get(p, 0) == -negw and -negw > 0:
                best = p
                break
        if best is None:
            break  # merges ran dry before k rounds
        p1, p2 = best
        merges.append(best)
        for word in list(pair_words.get(best, ())):
            syms = words[word]
            w = weight[word]
            touched: set[tuple[str, str]] = set()
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_w[p] -= w
                pair_words[p].discard(word)
                touched.add(p)
            new = merge_syms(syms, p1, p2)
            words[word] = new
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                pair_w[p] = pair_w.get(p, 0) + w
                pair_words.setdefault(p, set()).add(word)
                touched.add(p)
            for p in touched:
                if pair_w.get(p, 0) > 0:
                    heapq.heappush(heap, (-pair_w[p], p))
                else:
                    pair_w.pop(p, None)
                    pair_words.pop(p, None)
    return merges


_BPE_ENC_MERGES = 4  # learned merge ranks applied by the encode entry


def _bpe_encode_oracle(k: int) -> str:
    """Unrolled-SQL oracle for the encode entries: k learn rounds, then
    token stats over the merged vocabulary."""
    return f"""
WITH
{_bpe_learn_rounds_sql(k)},
 tok AS (
  SELECT word, w, unnest(string_split(trim(s, '()'), ')(')) AS token
  FROM vocab{k + 1}),
 stats AS (
  SELECT token,
         CAST(count(DISTINCT word) AS BIGINT) AS n_words,
         CAST(sum(w) AS BIGINT)               AS total_count
  FROM tok GROUP BY token)
SELECT CAST(rank AS INTEGER) AS rank, token, n_words, total_count
FROM (SELECT *, row_number() OVER (ORDER BY total_count DESC, token) AS rank
      FROM stats)
WHERE rank <= 20 ORDER BY rank
"""


def _bpe_encode_pipeline(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """Shared encode pipeline: vocab word-count (the only corpus-scale
    work), in-process heap learn of ``k`` merges, distributed rank-order
    encode, top-20 token stats. See ``text_bpe_encode`` for the full
    scale contract."""
    docs = T(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word")
        )
        .where(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint(eager=True)  # corpus scanned ONCE
    )
    vocab_rows = [(r["word"], r["w"]) for r in vocab.collect()]
    ranks = tuple(_bpe_learn_inprocess(vocab_rows, k))

    @F.pandas_udf("array<string>")
    def bpe_enc(words: pd.Series) -> pd.Series:
        def enc(wd: str) -> list[str]:
            sym = list(wd)
            for p1, p2 in ranks:
                out, i, n = [], 0, len(sym)
                while i < n:
                    if i + 1 < n and sym[i] == p1 and sym[i + 1] == p2:
                        out.append(p1 + p2)
                        i += 2
                    else:
                        out.append(sym[i])
                        i += 1
                sym = out
            return sym

        return words.map(enc)

    toks = vocab.select(
        "word", "w", F.explode(bpe_enc(F.col("word"))).alias("token")
    )
    stats = toks.groupBy("token").agg(
        F.countDistinct("word").alias("n_words"),
        F.sum("w").cast("long").alias("total_count"),
    )
    ranked = _ranked_topk(stats, 20, F.desc("total_count"), "token")
    return materialize_bounded(
        ranked.select("rank", "token", "n_words", "total_count").orderBy("rank")
    )


@register(
    "text_bpe_encode",
    bench=True,  # corpus tokenize step: vocab-bounded Python, track it
    tags=("llm", "text", "tokenizer", "bpe", "encode"),
    oracle=_bpe_encode_oracle(_BPE_ENC_MERGES),
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge APPLICATION — the actual tokenize step of
    a training pipeline (VERDICT r9 #5; ``text_bpe_merges`` only LEARNS
    ranks). Learns four greedy merges with the in-process
    heap learner (:func:`_bpe_learn_inprocess` over the |vocab|-bounded
    collected word counts — job count independent of the merge count),
    then encodes with the classic inference kernel: per word, apply
    merges in RANK order, each a left-to-right adjacent pair merge over
    the symbol list (an Arrow-batched pandas_udf; the merge table rides
    the task closure — at a production vocab it would be an explicit
    broadcast, same shape).

    Scale shape: the ONLY corpus-scale work is the word-count pass
    (map-side partials, text never shuffles). Learning runs in-process
    over the DISTINCT vocabulary — Zipf-bounded, tiny relative to the
    corpus — and the Python encode kernel over the same vocab frame
    (localCheckpoint'd once). Encoding a 100 TB corpus costs one
    word-level aggregation plus O(|vocab| x n_merges) Python — never
    O(corpus) Python.

    Correctness cross-check: the oracle segments by UNROLLED global
    replace rounds in training order, the Spark side by per-word
    rank-ordered pair merging — two independent formulations of BPE
    whose equivalence (sequential merge application commutes across
    words) the value-compare proves on real data."""
    return _bpe_encode_pipeline(spark, sf_dir, _BPE_ENC_MERGES)


@register(
    "text_bpe_encode_k64",
    tags=("llm", "text", "tokenizer", "bpe", "encode"),
    oracle=_bpe_encode_oracle(64),
)
def text_bpe_encode_k64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``text_bpe_encode`` at a 64-merge vocabulary — the entry that
    exists BECAUSE the learn phase is in-process now: the previous
    one-Spark-job-per-merge shape made k=64 mean 64 sequential jobs
    (and a production 50k-merge vocab absurd), while the heap learner's
    cluster cost is one word-count aggregation regardless of k
    (VERDICT r10 #3 "done" criterion). The oracle unrolls all 64 global
    replace rounds in SQL — 64 materialized CTE stages proving the
    heap's incremental pair bookkeeping tracks exact global recounts
    through deep merge chains (merged symbols merging again, dry-round
    no-ops), not just the 4 shallow rounds."""
    return _bpe_encode_pipeline(spark, sf_dir, 64)


# Byte-level BPE (VERDICT r12 #6): symbols are RAW UTF-8 BYTES, not
# characters — the GPT-2-style byte alphabet, so multi-byte characters
# split and merges can cross character boundaries. Engine-portable
# encoding: each byte rides as its 2-hex-char uppercase chunk (Spark
# hex(binary) == DuckDB hex(varchar), probed identical), so the whole
# char-level oracle/learner machinery applies with unit=2 symbols. The
# vocab keeps EVERY whitespace token (punctuation, digits, casing —
# no ^[a-z]+$ gate): byte-level BPE exists precisely to need no
# alphabet assumptions.
_BPE_BYTE_MERGES = 6

_BPE_BYTE_VOCAB_SQL = """
  SELECT word, CAST(count(*) AS BIGINT) AS w,
         regexp_replace(hex(word), '([0-9A-F]{2})', '(\\1)', 'g') AS s
  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
        FROM documents)
  WHERE word <> ''
  GROUP BY word
"""


@register(
    "text_bpe_byte_level",
    tags=("llm", "text", "tokenizer", "bpe", "bytes"),
    oracle=f"""
WITH
{{rounds}},
 tok AS (
  SELECT word, w, unnest(string_split(trim(s, '()'), ')(')) AS token_hex
  FROM vocab{_BPE_BYTE_MERGES + 1}),
 stats AS (
  SELECT token_hex,
         CAST(length(token_hex) // 2 AS BIGINT)  AS n_bytes,
         CAST(count(DISTINCT word) AS BIGINT)    AS n_words,
         CAST(sum(w) AS BIGINT)                  AS total_count
  FROM tok GROUP BY token_hex),
 ranked AS (
  SELECT *, row_number() OVER (ORDER BY total_count DESC, token_hex) AS rank
  FROM stats)
SELECT CAST(rank AS INTEGER) AS rank, token_hex, n_bytes, n_words, total_count
FROM ranked WHERE rank <= 20 ORDER BY rank
""".replace(
        "{rounds}", _bpe_learn_rounds_sql(_BPE_BYTE_MERGES, _BPE_BYTE_VOCAB_SQL)
    ),
)
def text_bpe_byte_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BYTE-level BPE learn + encode (VERDICT r12 #6): the same
    in-process heap learner as ``text_bpe_encode``, but over the raw
    UTF-8 byte alphabet — every whitespace token (no lowercase gate),
    each initial symbol one byte, merges free to cross character
    boundaries. This proves the |vocab| driver-collect bound is a
    property of the LEARNER, not of the [a-z] alphabet: the collected
    rows are still the distinct-token vocabulary (hex-encoded — 2 chars
    per byte), and the learn loop's cost is bounded by total symbol
    updates exactly as before (vocab-scale probe row in SCALE.md).
    Output: top-20 learned tokens as uppercase hex with byte length,
    word coverage, and corpus mass. The oracle unrolls the same six
    greedy rounds over the hex-chunked vocabulary in SQL — byte-exact
    because both engines produce identical uppercase ``hex()`` and
    binary-collation tie-breaks.

    Scale: identical contract to ``text_bpe_encode`` — ONE corpus-scale
    word-count aggregation, learn in-process, encode as a vectorized
    pandas_udf over the DISTINCT vocabulary only."""
    docs = T(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("w"))
        .select(F.hex(F.col("word").cast("binary")).alias("hx"), "word", "w")
        .localCheckpoint(eager=True)  # corpus scanned ONCE
    )
    vocab_rows = [(r["hx"], r["w"]) for r in vocab.collect()]
    ranks = tuple(_bpe_learn_inprocess(vocab_rows, _BPE_BYTE_MERGES, unit=2))

    @F.pandas_udf("array<string>")
    def bpe_enc_bytes(hexes: pd.Series) -> pd.Series:
        def enc(hx: str) -> list[str]:
            sym = [hx[i : i + 2] for i in range(0, len(hx), 2)]
            for p1, p2 in ranks:
                out, i, n = [], 0, len(sym)
                while i < n:
                    if i + 1 < n and sym[i] == p1 and sym[i + 1] == p2:
                        out.append(p1 + p2)
                        i += 2
                    else:
                        out.append(sym[i])
                        i += 1
                sym = out
            return sym

        return hexes.map(enc)

    toks = vocab.select(
        "word", "w", F.explode(bpe_enc_bytes(F.col("hx"))).alias("token_hex")
    )
    stats = toks.groupBy("token_hex").agg(
        F.countDistinct("word").alias("n_words"),
        F.sum("w").cast("long").alias("total_count"),
    ).withColumn("n_bytes", (F.length("token_hex") / 2).cast("long"))
    ranked = _ranked_topk(stats, 20, F.desc("total_count"), "token_hex")
    return materialize_bounded(
        ranked.select(
            "rank", "token_hex", "n_bytes", "n_words", "total_count"
        ).orderBy("rank")
    )


_KW_TAG_TERMS = (
    "an", "batch", "fast key", "join", "merge",
    "order", "part", "scan", "stream", "value",
)
# every term above is BORDER-FREE (no proper prefix equals a suffix),
# which makes the oracle's replace-trick count (non-overlapping) equal
# to the automaton's all-occurrence count — a property of the ORACLE
# ENCODING, not the operator (operators/keywords.py handles any terms);
# test_llm_ops pins the border-free invariant so a dictionary edit
# cannot silently break oracle equivalence.

_KW_TAG_VALUES = ", ".join(f"('{t}')" for t in _KW_TAG_TERMS)


@register(
    "text_multi_keyword_tag",
    bench=True,  # one-pass dictionary tagging kernel: track the scan cost
    tags=("llm", "text", "keywords", "tagging"),
    oracle=f"""
SELECT kw AS keyword,
       CAST(sum(CASE WHEN instr(text, kw) > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs,
       CAST(sum((length(text) - length(replace(text, kw, ''))) // length(kw))
         AS BIGINT) AS n_occurrences
FROM documents CROSS JOIN (VALUES {_KW_TAG_VALUES}) AS k(kw)
GROUP BY kw
ORDER BY kw
""",
)
def text_multi_keyword_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary tagging in ONE corpus pass: a broadcast Aho-Corasick
    automaton (:mod:`pyblazing_spark.operators.keywords`) matches all
    ten terms simultaneously — O(corpus + matches)
    where k separate instr/regex passes are O(k x corpus); the shape
    FlashText-style taggers use for contamination/unsafe-term/licensing
    dictionaries at training-pipeline scale. Occurrence semantics is
    ALL matches incl. cross-keyword overlaps ("an" inside "scan"
    counts for both terms — the oracle's per-term replace-trick
    independently reproduces exactly that for border-free terms).
    Per-keyword rollup: docs touched + total occurrences; zero-match
    terms still emit a row (dictionary left join)."""
    from pyblazing_spark.operators.keywords import tag_keywords

    docs = T(spark, sf_dir, "documents")
    tags = tag_keywords(docs, list(_KW_TAG_TERMS))
    agg = tags.groupBy("keyword").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_matches").cast("long").alias("n_occurrences"),
    )
    dictionary = spark.createDataFrame(
        [(t,) for t in _KW_TAG_TERMS], "keyword string"
    )
    out = (
        dictionary.join(agg, "keyword", "left")
        .select(
            "keyword",
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
            F.coalesce("n_occurrences", F.lit(0)).cast("long").alias(
                "n_occurrences"
            ),
        )
        .orderBy("keyword")
    )
    return materialize_bounded(out)


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS
# algorithm): hash every k-word gram, slide a w-gram window, keep each
# window's minimum hash (ties -> rightmost). Guarantees every w-gram run
# contributes a fingerprint while selecting ~2/(w+1) of all grams — the
# position-robust local fingerprint exact-md5 (text_fingerprint) can't give.
_WINNOW_K = 3  # gram width, words
_WINNOW_W = 4  # window width, grams
_WINNOW_POS = 1 << 20  # position packing base (doc positions < 2^20)

# md5-hex -> 32-bit integer, digit by digit over a precomputed hex column
# (mirrors Spark's `conv(substr(md5(gram),1,8),16,10)`; 2^32 * 2^20 < 2^63
# so hash*POS + pos packs losslessly into a BIGINT).
_SQL_MD5_32 = " + ".join(
    f"(strpos('0123456789abcdef', substr(mh, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
    for i in range(8)
)


@register(
    "text_winnowing",
    tags=("llm", "text", "fingerprint", "dedup"),
    oracle=rf"""
WITH docs AS (SELECT doc_id, trim(text) AS t FROM documents),
 toks AS (SELECT doc_id, string_split_regex(t, '\s+') AS tk FROM docs),
 ok AS (SELECT doc_id, tk, len(tk) - {_WINNOW_K - 1} AS n_grams
        FROM toks WHERE len(tk) >= {_WINNOW_K + _WINNOW_W - 1}),
 idx AS (SELECT doc_id, n_grams, tk,
         unnest(generate_series(1, n_grams)) AS i FROM ok),
 g AS (SELECT doc_id, n_grams, i,
       md5(array_to_string(tk[i:i+{_WINNOW_K - 1}], ' ')) AS mh FROM idx),
 h AS (SELECT doc_id, n_grams, i, ({_SQL_MD5_32}) AS h32 FROM g),
 p AS (SELECT doc_id, n_grams, i,
       h32 * {_WINNOW_POS} + ({_WINNOW_POS} - i) AS packed FROM h),
 wm AS (SELECT doc_id, n_grams, i,
        min(packed) OVER (PARTITION BY doc_id ORDER BY i
          ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING) AS fp
        FROM p),
 sel AS (SELECT doc_id, n_grams, fp FROM wm
         WHERE i <= n_grams - {_WINNOW_W - 1}),
 agg AS (SELECT doc_id, min(n_grams) AS n_grams,
         count(DISTINCT fp) AS n_fps,
         count(DISTINCT fp // {_WINNOW_POS}) AS n_hashes
         FROM sel GROUP BY doc_id)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       CAST(n_grams - {_WINNOW_W - 1} AS BIGINT) AS n_windows,
       n_fps, n_hashes,
       round(n_fps * 1.0 / (n_grams - {_WINNOW_W - 1}) + 1e-9, 4) AS density
FROM agg ORDER BY doc_id
""",
)
def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (MOSS; Schleimer et al. 2003):
    per doc, the count of selected (position-bearing) fingerprints,
    distinct selected hashes, and selection density over full windows.

    Packing ``hash * 2^20 + (2^20 - pos)`` makes ONE window-min per
    position implement the whole select rule — min hash, ties to the
    RIGHTMOST position (robust winnowing) — with no self-join back to
    recover the argmin. Scale shape: grams are hashed in the scan stage
    (md5 -> 32-bit, position-packed into a long); the only shuffle is
    the doc_id-partitioned window + final groupBy, carrying four long
    columns — gram TEXT never shuffles. The window frame is
    ``ROWS BETWEEN CURRENT AND w-1 FOLLOWING`` per doc, so state is
    w longs per task. Oracle: identical digit-by-digit md5 packing in
    DuckDB — full-equality check, not a property proxy."""
    from pyspark.sql import Window

    docs = T(spark, sf_dir, "documents")
    K, Wn, P = _WINNOW_K, _WINNOW_W, _WINNOW_POS
    toks = docs.select("doc_id", TXT.tokens(F.col("text")).alias("__tk")).where(
        F.size("__tk") >= K + Wn - 1
    )
    base = toks.select(
        "doc_id", "__tk", (F.size("__tk") - F.lit(K - 1)).cast("long").alias("n_grams")
    )
    pos = base.select(
        "doc_id",
        "__tk",
        "n_grams",
        F.explode(F.sequence(F.lit(1), F.col("n_grams").cast("int"))).alias("__i"),
    )
    gram = F.concat_ws(
        " ",
        F.element_at("__tk", F.col("__i")),
        F.element_at("__tk", F.col("__i") + F.lit(1)),
        F.element_at("__tk", F.col("__i") + F.lit(2)),
    )
    h32 = F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
    packed = (h32 * F.lit(P) + (F.lit(P) - F.col("__i"))).alias("__packed")
    p = pos.select("doc_id", "n_grams", "__i", packed)
    win = Window.partitionBy("doc_id").orderBy("__i").rowsBetween(0, Wn - 1)
    sel = p.select(
        "doc_id", "n_grams", "__i", F.min("__packed").over(win).alias("__fp")
    ).where(F.col("__i") <= F.col("n_grams") - F.lit(Wn - 1))
    return (
        sel.groupBy("doc_id")
        .agg(
            F.min("n_grams").alias("n_grams"),
            F.countDistinct("__fp").alias("n_fps"),
            F.countDistinct(F.expr(f"__fp div {P}")).alias("n_hashes"),
        )
        .select(
            "doc_id",
            "n_grams",
            (F.col("n_grams") - F.lit(Wn - 1)).alias("n_windows"),
            "n_fps",
            "n_hashes",
            F.round(
                F.col("n_fps") / (F.col("n_grams") - F.lit(Wn - 1)) + F.lit(1e-9), 4
            ).alias("density"),
        )
        .orderBy("doc_id")
    )


@register(
    "decontam_fraction",
    tags=("llm", "decontam"),
    oracle=r"""
WITH corpus AS (SELECT doc_id, trim(text) AS t FROM documents WHERE doc_id >= 50),
 bench AS (SELECT trim(text) AS t FROM documents WHERE doc_id < 50),
 ctoks AS (SELECT doc_id, string_split_regex(t, '\s+') AS tk FROM corpus),
 cidx AS (SELECT doc_id, tk,
          unnest(generate_series(1, greatest(1, len(tk)-4))) AS i FROM ctoks),
 csh AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+4], ' ') AS s FROM cidx),
 btoks AS (SELECT string_split_regex(t, '\s+') AS tk FROM bench),
 bidx AS (SELECT tk, unnest(generate_series(1, greatest(1, len(tk)-4))) AS i
          FROM btoks),
 bsh AS (SELECT DISTINCT array_to_string(tk[i:i+4], ' ') AS s FROM bidx),
 tot AS (SELECT doc_id, count(*) AS n_shingles FROM csh GROUP BY doc_id),
 hits AS (SELECT doc_id, count(*) AS n_hits FROM csh
          WHERE s IN (SELECT s FROM bsh) GROUP BY doc_id)
SELECT t.doc_id, t.n_shingles,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0) * 1.0 / t.n_shingles + 1e-9, 4) AS frac
FROM tot t LEFT JOIN hits h ON t.doc_id = h.doc_id
ORDER BY t.doc_id
""",
)
def decontam_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded decontamination report: for every corpus doc (doc_id >= 50),
    its distinct 5-token shingle count, how many of those shingles occur
    in the held-out set (doc_id < 50), and the contaminated fraction —
    the threshold-picking companion to ``decontam_overlap``'s binary
    flag (:func:`pyblazing_spark.operators.decontam.contamination_report`).
    Hashed shingles are bijective with the oracle's string shingles, so
    counts and fractions match exactly."""
    from pyblazing_spark.operators.decontam import contamination_report

    docs = T(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") >= 50)
    bench = docs.where(F.col("doc_id") < 50)
    return contamination_report(corpus, bench, shingle_words=5).orderBy("doc_id")


@register(
    "source_orc_roundtrip",
    tags=("source", "orc"),
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT)              AS n,
       round(sum(o_totalprice) + 1e-4, 2)    AS total_price
FROM orders
WHERE o_orderkey < 2000 AND o_totalprice > 100000
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source path driven end-to-end through the formal gate: an
    orders slice is written as ORC, read back through
    :func:`pyblazing_spark.sources.files.read_files` (the
    ``create_table`` route for ``.orc`` paths — reference parity:
    OrcParser/orc_parser.cpp), filtered (ORC predicate pushdown — same
    plan audit family as parquet), and aggregated; must equal the same
    query over the original parquet."""
    import shutil
    import tempfile

    from pyblazing_spark.sources.files import read_files

    out = tempfile.mkdtemp(prefix="pbs_orc_")
    try:
        (
            T(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") < 2000)
            .select("o_orderkey", "o_orderstatus", "o_totalprice")
            .write.mode("overwrite")
            .orc(out + "/orders_orc")
        )
        back, fmt = read_files(spark, [out + "/orders_orc"], file_format="orc")
        assert fmt == "orc"
        return (
            back.where(F.col("o_totalprice") > 100000)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("o_totalprice") + 1e-4, 2).alias("total_price"),
            )
            .orderBy("o_orderstatus")
            # materialize BEFORE the temp dir disappears
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@register(
    "source_csv_roundtrip",
    tags=("source", "csv"),
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT)              AS n,
       round(sum(o_totalprice) + 1e-4, 2)    AS total_price
FROM orders
WHERE o_orderkey < 3000 AND o_totalprice > 80000
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source path driven end-to-end through the formal gate: an
    orders slice is written headerless, read back through
    :func:`pyblazing_spark.sources.files.read_files` with the
    reference-style ``names``/``dtype`` kwargs (declared schema, no
    inference pass — reference parity: CSVParser + cudf dtype strings),
    filtered and aggregated; must equal the same query over the
    original parquet."""
    import shutil
    import tempfile

    from pyblazing_spark.sources.files import read_files

    out = tempfile.mkdtemp(prefix="pbs_csv_")
    try:
        (
            T(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") < 3000)
            .select("o_orderkey", "o_orderstatus", "o_totalprice")
            .write.mode("overwrite")
            .csv(out + "/orders_csv")
        )
        back, fmt = read_files(
            spark,
            [out + "/orders_csv"],
            file_format="csv",
            names=["o_orderkey", "o_orderstatus", "o_totalprice"],
            dtype=["int64", "str", "float64"],
        )
        assert fmt == "csv"
        return (
            back.where(F.col("o_totalprice") > 80000)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("o_totalprice") + 1e-4, 2).alias("total_price"),
            )
            .orderBy("o_orderstatus")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@register(
    "source_schema_evolution",
    tags=("source", "parquet", "schema"),
    oracle="""
WITH old_part AS (
  SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
  FROM orders WHERE o_orderkey < 1000),
 new_part AS (
  SELECT o_orderkey, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 2000),
 unioned AS (SELECT * FROM old_part UNION ALL SELECT * FROM new_part)
SELECT CAST(count(*) AS BIGINT)                       AS n_rows,
       CAST(count(o_orderpriority) AS BIGINT)                 AS n_with_priority,
       CAST(count(DISTINCT o_orderpriority) AS BIGINT)        AS n_priorities,
       round(sum(o_totalprice) + 1e-4, 2)             AS total_price
FROM unioned
""",
)
def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema evolution through the formal gate: an 'old' file
    written WITHOUT the o_orderpriority column and a 'new' file written with it
    are read as one dataset via ``mergeSchema`` — rows from the old file
    surface NULL o_orderpriority, exactly the production contract when a column
    is added mid-pipeline (reference parity: the schema-unification path
    in ParquetParser; Spark's merged footer schema replaces it). The
    aggregate must equal a NULL-padded UNION over the original parquet."""
    import shutil
    import tempfile

    out = tempfile.mkdtemp(prefix="pbs_evo_")
    try:
        od = T(spark, sf_dir, "orders")
        (
            od.where(F.col("o_orderkey") < 1000)
            .select("o_orderkey", "o_totalprice")
            .write.mode("overwrite")
            .parquet(out + "/data/part_old")
        )
        (
            od.where((F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 2000))
            .select("o_orderkey", "o_totalprice", "o_orderpriority")
            .write.mode("overwrite")
            .parquet(out + "/data/part_new")
        )
        merged = (
            spark.read.option("mergeSchema", "true")
            .option("recursiveFileLookup", "true")
            .parquet(out + "/data")
        )
        return (
            merged.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count("o_orderpriority").alias("n_with_priority"),
                F.countDistinct("o_orderpriority").alias("n_priorities"),
                F.round(F.sum("o_totalprice") + 1e-4, 2).alias("total_price"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@register(
    "source_text_roundtrip",
    tags=("source", "text"),
    oracle="""
SELECT lang,
       CAST(count(*) AS BIGINT)        AS n_docs,
       CAST(sum(n_chars) AS BIGINT)    AS total_chars,
       CAST(min(doc_id) AS BIGINT)     AS min_doc_id
FROM documents
WHERE doc_id < 300
GROUP BY lang
ORDER BY lang
""",
)
def source_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-oriented TEXT source driven end-to-end through the formal
    gate (beyond the reference surface — its create_table routes
    csv/json/parquet/orc only): a documents slice is serialized as
    tab-delimited single-line records via ``write.text``, read back
    with ``spark.read.text`` (one ``value`` column per line), re-parsed
    with scan-stage ``split``/``getItem`` codegen, and aggregated; the
    result must equal the same aggregate over the original parquet.

    The text source is the raw-corpus landing format (one JSONL/TSV
    record per line) every ingestion pipeline starts from; at 100 TB
    the read is a splittable line scan with the same
    ``maxPartitionBytes`` task sizing as any file source, and parsing
    happens in whole-stage codegen (no Python). Newline-safety is part
    of the contract: only newline-free derived fields are serialized
    here — raw text bodies belong in parquet/ORC columns (their
    round-trip entries), never in line-oriented files."""
    import shutil
    import tempfile

    out = tempfile.mkdtemp(prefix="pbs_text_")
    try:
        (
            T(spark, sf_dir, "documents")
            .where(F.col("doc_id") < 300)
            .select(
                F.concat_ws(
                    "\t",
                    F.col("doc_id").cast("string"),
                    "lang",
                    F.col("n_chars").cast("string"),
                ).alias("value")
            )
            .write.mode("overwrite")
            .text(out + "/docs_txt")
        )
        back = spark.read.text(out + "/docs_txt")
        parsed = back.select(
            F.split(F.col("value"), "\t").alias("f")
        ).select(
            F.col("f").getItem(0).cast("long").alias("doc_id"),
            F.col("f").getItem(1).alias("lang"),
            F.col("f").getItem(2).cast("long").alias("n_chars"),
        )
        return (
            parsed.groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("total_chars"),
                F.min("doc_id").alias("min_doc_id"),
            )
            .orderBy("lang")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@register(
    "pipeline_quality_deciles",
    tags=("llm", "pipeline", "quality", "global-window"),
    oracle=f"""
WITH q AS (
  SELECT doc_id,
         {_SQL_SCORE} AS score,
         {_SQL_TOKN} AS n_toks
  FROM documents),
 d AS (SELECT doc_id, score, n_toks,
       ntile(10) OVER (ORDER BY score, doc_id) AS decile FROM q)
SELECT decile,
       CAST(count(*) AS BIGINT)    AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       round(min(score) + 1e-9, 4) AS min_score,
       round(max(score) + 1e-9, 4) AS max_score
FROM d
GROUP BY decile
ORDER BY decile
""",
)
def pipeline_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ablation report: rank the corpus into global quality
    deciles and report each decile's doc and TOKEN mass — the table a
    data-mix owner reads to pick a filter threshold ("dropping the
    bottom 3 deciles costs X% of tokens"). The global decile split uses
    the two-phase :func:`pyblazing_spark.operators.global_window.global_ntile`
    (range-bucket + per-bucket window + ≤32-row offset broadcast), never
    an unpartitioned ntile window; the oracle's plain ntile proves the
    parallel form computes the identical split. Scores are rounded to
    4dp by quality_score itself, so the order key is discrete and the
    (score, doc_id) tie-break is engine-stable."""
    from pyblazing_spark.operators.global_window import global_ntile

    docs = T(spark, sf_dir, "documents").select(
        "doc_id",
        TXT.quality_score(F.col("text")).alias("score"),
        TXT.token_count(F.col("text")).cast("long").alias("n_toks"),
    )
    d = global_ntile(docs, ["score", "doc_id"], 10, out_col="decile")
    return (
        d.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            F.round(F.min("score") + F.lit(1e-9), 4).alias("min_score"),
            F.round(F.max("score") + F.lit(1e-9), 4).alias("max_score"),
        )
        .orderBy("decile")
    )


@register(
    "join_dynamic_partition_pruning",
    tags=("join", "dpp", "partition-pruning"),
    oracle="""
WITH dim AS (
  SELECT DISTINCT o_orderpriority AS prio,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 'hot' ELSE 'cold' END AS klass
  FROM orders)
SELECT f.o_orderpriority,
       CAST(count(*) AS BIGINT)            AS n,
       round(sum(o_totalprice) + 1e-4, 2)  AS total
FROM orders f JOIN dim d ON f.o_orderpriority = d.prio
WHERE d.klass = 'hot'
GROUP BY f.o_orderpriority
ORDER BY f.o_orderpriority
""",
)
def join_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning driven end-to-end: the fact side is a
    Hive-partitioned parquet tree (partitioned on o_orderpriority), the
    dim side carries a NON-partition predicate (klass = 'hot'), so only
    a runtime subquery over the dim can prune fact partitions — the
    star-schema scan pattern that reads 2/5 of the fact at 100 TB
    instead of all of it. The DPP subquery in the fact scan's
    PartitionFilters is plan-audited (tests/test_plan_audits.py); this
    entry proves values. The reference's skip-data subsystem is the
    counterpart surface (SURVEY §4) — Catalyst's
    PartitionPruning rule replaces it wholesale."""
    import shutil
    import tempfile

    out = tempfile.mkdtemp(prefix="pbs_dpp_")
    try:
        od = T(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice", "o_orderpriority"
        )
        od.write.mode("overwrite").partitionBy("o_orderpriority").parquet(
            out + "/fact"
        )
        # explicit schema: an empty-input write leaves only _SUCCESS in
        # the tree and schema inference on zero files throws (same trap
        # sink_partitioned_roundtrip documents)
        fact = spark.read.schema(
            "o_orderkey bigint, o_totalprice double, o_orderpriority string"
        ).parquet(out + "/fact")
        dim = (
            od.select(F.col("o_orderpriority").alias("prio"))
            .distinct()
            .withColumn(
                "klass",
                F.when(
                    F.col("prio").isin("1-URGENT", "2-HIGH"), "hot"
                ).otherwise("cold"),
            )
        )
        return (
            fact.join(dim, fact.o_orderpriority == dim.prio)
            .where(F.col("klass") == "hot")
            .groupBy(F.col("o_orderpriority").cast("string").alias("o_orderpriority"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("o_totalprice") + 1e-4, 2).alias("total"),
            )
            .orderBy("o_orderpriority")
            # materialize BEFORE the temp dir disappears
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@register(
    "pipeline_data_card",
    tags=("llm", "pipeline", "reporting"),
    oracle=f"""
WITH d AS (
  SELECT source, lang, md5({_SQL_NORM}) AS fp,
         {_SQL_TOKN} AS toks, {_SQL_SCORE} AS score
  FROM documents),
 per AS (
  SELECT source,
         CAST(count(*) AS BIGINT)          AS n_docs,
         CAST(sum(toks) AS BIGINT)         AS n_tokens,
         round(avg(score) + 1e-9, 4)       AS avg_quality,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(count(DISTINCT fp) AS BIGINT)   AS n_unique
  FROM d GROUP BY source)
SELECT source, n_docs, n_tokens, avg_quality, n_langs,
       CAST(n_docs - n_unique AS BIGINT) AS dup_docs
FROM per
ORDER BY source
""",
)
def pipeline_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus data card in ONE aggregation pass: doc and
    token mass, mean quality, language spread, and exact-duplicate
    burden — the summary table a dataset release ships (datasheets /
    data-statements practice) and the first thing a mix owner reads.
    Tokens, fingerprints, and scores are all scan-stage expressions;
    the only shuffle is the groupBy(source) (Catalyst expands the two
    DISTINCT aggregates), so the card costs one pass at any corpus
    size."""
    docs = T(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        "lang",
        TXT.fingerprint(F.col("text")).alias("fp"),
        TXT.token_count(F.col("text")).cast("long").alias("toks"),
        TXT.quality_score(F.col("text")).alias("score"),
    )
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").alias("n_tokens"),
            F.round(F.avg("score") + F.lit(1e-9), 4).alias("avg_quality"),
            F.countDistinct("lang").alias("n_langs"),
            F.countDistinct("fp").alias("n_unique"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "avg_quality",
            "n_langs",
            (F.col("n_docs") - F.col("n_unique")).alias("dup_docs"),
        )
        .orderBy("source")
    )


@register(
    "source_json_roundtrip",
    tags=("source", "json"),
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT)              AS n,
       round(sum(o_totalprice) + 1e-4, 2)    AS total_price
FROM orders
WHERE o_orderkey < 2500 AND o_totalprice > 90000
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source path through the formal gate (completing the
    format roundtrip family: parquet/ORC/CSV/JSON): an orders slice is
    written as JSON lines, read back through
    :func:`pyblazing_spark.sources.files.read_files` (the
    ``create_table`` route for ``.json`` paths — reference parity:
    JSONParser with cudf read_json lines=True), filtered and
    aggregated; must equal the same query over the original parquet."""
    import shutil
    import tempfile

    from pyblazing_spark.sources.files import read_files

    out = tempfile.mkdtemp(prefix="pbs_json_")
    try:
        (
            T(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") < 2500)
            .select("o_orderkey", "o_orderstatus", "o_totalprice")
            .write.mode("overwrite")
            .json(out + "/orders_json")
        )
        back, fmt = read_files(
            spark,
            [out + "/orders_json"],
            file_format="json",
            names=["o_orderkey", "o_orderstatus", "o_totalprice"],
            dtype=["int64", "str", "float64"],
        )
        assert fmt == "json"
        return (
            back.where(F.col("o_totalprice") > 90000)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("o_totalprice") + 1e-4, 2).alias("total_price"),
            )
            .orderBy("o_orderstatus")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@register(
    "source_xml_roundtrip",
    tags=("source", "xml"),
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT)           AS n,
       CAST(sum(o_orderkey) AS BIGINT)    AS key_sum,
       round(sum(o_totalprice) + 1e-4, 2) AS total_price
FROM orders
WHERE o_orderkey < 2500 AND o_totalprice > 60000
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source path through the formal gate — completing the
    in-container format matrix (parquet/ORC/CSV/JSON/text/XML; XML is
    BUILT-IN since Spark 4.0, a format-matrix superset with no
    reference counterpart): an orders slice is written as real XML
    documents (rowTag rows), read back through
    :func:`pyblazing_spark.sources.files.read_files` (the
    ``create_table`` route for ``.xml`` paths, with the same declared
    names/dtype kwarg surface as CSV/JSON), filtered and aggregated;
    must equal the same query over the original parquet — a row lost,
    duplicated, or mistyped anywhere in the serialize->parse cycle
    fails the value compare.

    Scale: Spark's XML reader splits files like any text source; the
    declared schema skips the inference pass."""
    import shutil
    import tempfile

    from pyblazing_spark.sources.files import read_files

    out = tempfile.mkdtemp(prefix="pbs_xml_")
    try:
        (
            T(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") < 2500)
            .select("o_orderkey", "o_orderpriority", "o_totalprice")
            .write.mode("overwrite")
            .format("xml")
            .option("rowTag", "order")
            .option("rootTag", "orders")
            .save(out + "/orders_xml")
        )
        back, fmt = read_files(
            spark,
            [out + "/orders_xml"],
            file_format="xml",
            row_tag="order",
            names=["o_orderkey", "o_orderpriority", "o_totalprice"],
            dtype=["int64", "str", "float64"],
        )
        assert fmt == "xml"
        return (
            back.where(F.col("o_totalprice") > 60000)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("o_orderkey").alias("key_sum"),
                F.round(F.sum("o_totalprice") + 1e-4, 2).alias("total_price"),
            )
            .orderBy("o_orderpriority")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@register(
    "text_tfidf_keywords",
    tags=("llm", "text", "retrieval", "keywords"),
    oracle=r"""
WITH docs AS (SELECT doc_id, trim(text) AS t FROM documents),
 tok AS (SELECT doc_id, unnest(string_split_regex(t, '\s+')) AS term FROM docs),
 tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM tok GROUP BY doc_id, term),
 df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
 n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM docs),
 scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1e-9, 4)
           AS score
  FROM tf JOIN df USING (term) CROSS JOIN n),
 ranked AS (
  SELECT doc_id, term, score,
         CAST(row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, term) AS INTEGER) AS rank
  FROM scored)
SELECT doc_id, rank, term, score
FROM ranked WHERE rank <= 3
ORDER BY doc_id, rank
""",
)
def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF keyword extraction (top-3 terms): term
    frequency per doc x add-one idf over the corpus — the classic
    keyword/tag stage of a curation pipeline. Ranking uses the
    4dp-ROUNDED score (ties broken by term) on BOTH engines, so a
    last-ulp ln() difference between libms can never flip a rank.

    Scale shape: same vocabulary discipline as text_top_tokens/BM25 —
    the (doc, term) tf aggregation map-side combines before its
    exchange, the df table is vocabulary-sized (Zipf-bounded) and joins
    back broadcast, and N rides a one-row broadcast; full text never
    shuffles, only tokens and counts. The tf frame feeds both the df
    aggregation and the scoring probe, so it is materialized once (r14
    — the corpus explode used to plan and run twice per invocation)."""
    from pyspark.sql import Window

    from pyblazing_spark.session import materialize_bounded

    docs = T(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(TXT.tokens(F.col("text"))).alias("term")
    )
    tf = materialize_bounded(
        tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                + F.lit(1e-9),
                4,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select("doc_id", "rank", "term", "score")
        .orderBy("doc_id", "rank")
    )


@register(
    "pipeline_source_gini",
    tags=("llm", "pipeline", "reporting", "mixture"),
    oracle=f"""
WITH per AS (
  SELECT source, CAST(sum({_SQL_TOKN}) AS BIGINT) AS toks
  FROM documents GROUP BY source),
 r AS (
  SELECT toks,
         CAST(row_number() OVER (ORDER BY toks, source) AS BIGINT) AS i,
         CAST(count(*) OVER () AS BIGINT) AS n,
         CAST(sum(toks) OVER () AS BIGINT) AS tot
  FROM per)
SELECT CAST(min(n) AS BIGINT)   AS n_sources,
       CAST(min(tot) AS BIGINT) AS total_tokens,
       round((2.0 * sum(i * toks) - (min(n) + 1.0) * min(tot))
             / (min(n) * 1.0 * min(tot)) + 1e-9, 4) AS gini
FROM r
""",
)
def pipeline_source_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of token mass across sources — the mix-imbalance
    scalar a data-mix owner tracks (0 = perfectly balanced corpus,
    -> 1 = one source dominates). Every term of the classic sorted
    formula ``(2*Σ i*x_i - (n+1)*Σx) / (n*Σx)`` is an exact BIGINT
    until the final division, so no float summation-order risk.

    Scale shape: the fact-scale work is one token-count aggregation to
    a DIMENSION-sized (per-source) table; the rank/sum windows run over
    those ~20 rows, so the unpartitioned window is bounded by the
    source dimension, not the corpus."""
    from pyspark.sql import Window

    docs = T(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.sum(TXT.token_count(F.col("text")).cast("long")).alias("toks")
    )
    w_rank = Window.orderBy("toks", "source")
    w_all = Window.partitionBy()
    r = per.select(
        "toks",
        F.row_number().over(w_rank).cast("long").alias("i"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n"),
        F.sum("toks").over(w_all).alias("tot"),
    )
    return r.agg(
        F.min("n").cast("long").alias("n_sources"),
        F.min("tot").cast("long").alias("total_tokens"),
        F.round(
            (2.0 * F.sum(F.col("i") * F.col("toks")) - (F.min("n") + F.lit(1.0)) * F.min("tot"))
            / (F.min("n") * 1.0 * F.min("tot"))
            + F.lit(1e-9),
            4,
        ).alias("gini"),
    )


_PARA_W = 10  # words per chunk ("paragraph" granularity on the fixture corpus)


@register(
    "dedup_paragraph",
    bench=True,  # scale-critical new r8 ops: visible per-round
    tags=("llm", "dedup", "paragraph", "ccnet"),
    oracle=f"""
WITH w AS (
  SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS words
  FROM documents),
 n AS (
  SELECT doc_id, source, words,
         CAST(ceil(len(words) / {_PARA_W}.0) AS BIGINT) AS nc
  FROM w WHERE len(words) >= 1),
 c AS (
  SELECT doc_id, source, unnest(generate_series(1, nc)) AS i, words FROM n),
 h AS (
  SELECT doc_id, source, i,
         md5(array_to_string(
             list_slice(words, (i - 1) * {_PARA_W} + 1, i * {_PARA_W}), ' ')) AS hash
  FROM c),
 occ AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY hash ORDER BY doc_id, i) AS occ
  FROM h),
 per_doc AS (
  SELECT doc_id, source,
         CAST(count(*) AS BIGINT)                          AS n_chunks,
         CAST(count(*) FILTER (occ > 1) AS BIGINT)         AS n_dup
  FROM occ GROUP BY doc_id, source)
SELECT source,
       CAST(count(*) AS BIGINT)        AS n_docs,
       CAST(sum(n_chunks) AS BIGINT)   AS n_chunks,
       CAST(sum(n_dup) AS BIGINT)      AS dup_chunks,
       round(sum(n_dup) * 1.0 / sum(n_chunks) + 1e-9, 4) AS dup_frac,
       CAST(count(*) FILTER (n_dup * 2 >= n_chunks) AS BIGINT) AS docs_half_dup
FROM per_doc
GROUP BY source
ORDER BY source
""",
)
def dedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-granularity corpus dedup — the CCNet/RefinedWeb shape:
    hash each paragraph (here: consecutive 10-word chunks, the fixture
    corpus being single-line), keep the FIRST occurrence corpus-wide
    (ordered by doc_id, chunk index), and report per-source removal
    pressure plus the count of documents losing >= half their content —
    the signal that drives doc-level drop decisions in production web
    pipelines. Complements ``dedup_exact`` (whole-doc) and
    ``dedup_substring_coverage`` (gram-interval spans): paragraph
    dedup removes boilerplate shared across otherwise-distinct pages.

    Scale: chunking is scan-stage codegen (split + slice + md5 — the
    TEXT never shuffles); the only fact-scale exchange carries 16-byte
    (hash, doc_id, i) triples for the first-occurrence window, exactly
    the one-shuffle budget of the exact-dedup path. The final rollup is
    a count aggregation per source.
    """
    docs = T(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", "source", F.split(F.trim(F.col("text")), r"\s+").alias("words")
    ).withColumn("n", F.size("words"))
    n = w.where(F.col("n") >= 1).withColumn(
        "nc", F.ceil(F.col("n") / float(_PARA_W))
    )
    c = n.select(
        "doc_id", "source", "words",
        F.explode(F.sequence(F.lit(1), F.col("nc"))).alias("i"),
    )
    h = c.select(
        "doc_id", "source", "i",
        F.md5(
            F.array_join(
                F.slice(F.col("words"), (F.col("i") - 1) * _PARA_W + 1, _PARA_W), " "
            )
        ).alias("hash"),
    )
    from pyspark.sql import Window

    occ = h.select(
        "doc_id", "source",
        F.row_number()
        .over(Window.partitionBy("hash").orderBy("doc_id", "i"))
        .alias("occ"),
    )
    per_doc = occ.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.count_if(F.col("occ") > 1).alias("n_dup"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chunks").alias("n_chunks"),
            F.sum("n_dup").alias("dup_chunks"),
            F.round(
                F.sum("n_dup") / F.sum("n_chunks") + F.lit(1e-9), 4
            ).alias("dup_frac"),
            F.count_if(F.col("n_dup") * 2 >= F.col("n_chunks")).alias("docs_half_dup"),
        )
        .orderBy("source")
    )


@register(
    "sink_dynamic_overwrite",
    tags=("sink", "write", "overwrite", "partition"),
    oracle="""
SELECT CAST(o_orderpriority AS VARCHAR) AS o_orderpriority,
       CAST(count(*) AS BIGINT)         AS n,
       round(sum(CASE WHEN o_orderpriority = '1-URGENT'
                      THEN o_totalprice * 2 ELSE o_totalprice END)
             + 1e-4, 2)                 AS total
FROM orders
WHERE o_orderstatus = 'O'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def sink_dynamic_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition overwrite — the lake-maintenance write mode
    static overwrite can't express: ``mode("overwrite")`` with
    ``partitionOverwriteMode=dynamic`` replaces ONLY the partitions the
    incoming frame touches and leaves every other partition's files in
    place (static mode would truncate the whole table first). The
    entry lays down all five priority partitions, then overwrites just
    ``1-URGENT`` with a revised slice (prices doubled); the read-back
    aggregate must show the revision in that partition AND the
    untouched originals everywhere else — byte-level proof the other
    partitions survived. At 100 TB this is how a daily pipeline
    republishes one day's partition under a corrected upstream without
    rewriting the lake. Writer-level option, no session conf mutation
    (the driver runs a plain session)."""
    import shutil
    import tempfile

    out_dir = tempfile.mkdtemp(prefix="sink_dyn_")
    try:
        od = T(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O").select(
            "o_orderkey", "o_totalprice", "o_orderpriority"
        )
        od.write.partitionBy("o_orderpriority").mode("overwrite").parquet(out_dir)
        revised = od.where(F.col("o_orderpriority") == "1-URGENT").withColumn(
            "o_totalprice", F.col("o_totalprice") * 2
        )
        (
            revised.write.option("partitionOverwriteMode", "dynamic")
            .partitionBy("o_orderpriority")
            .mode("overwrite")
            .parquet(out_dir)
        )
        back = spark.read.schema(
            "o_orderkey bigint, o_totalprice double, o_orderpriority string"
        ).parquet(out_dir)
        return (
            back.groupBy(F.col("o_orderpriority").cast("string").alias("o_orderpriority"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("o_totalprice") + 1e-4, 2).alias("total"),
            )
            .orderBy("o_orderpriority")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


@register(
    "source_avro_roundtrip",
    bench=True,  # jar-free wire codec: track its Python-path cost per round
    tags=("source", "sink", "avro", "roundtrip", "jar-free"),
    oracle="""
WITH src AS (
  SELECT o_orderkey, o_totalprice,
         nullif(o_orderpriority, '1-URGENT') AS prio,
         o_orderdate
  FROM orders WHERE o_orderkey % 3 = 0)
SELECT coalesce(prio, '(urgent)')            AS prio,
       CAST(count(*) AS BIGINT)              AS n,
       CAST(count(prio) AS BIGINT)           AS n_nonnull,
       round(sum(o_totalprice) + 1e-4, 2)    AS total,
       min(o_orderdate)                      AS first_date,
       CAST(sum(o_orderkey) AS BIGINT)       AS key_sum
FROM src GROUP BY 1 ORDER BY 1
""",
)
def source_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro source/sink round-trip with ZERO jars — Spark's own
    ``format("avro")`` is the undeployable external spark-avro module
    (probed round 9: only avro-core jars ship; no network), so the
    container format is implemented from the Apache Avro spec in pure
    Python (:mod:`pyblazing_spark.operators.avro_py` — zigzag varints,
    blocks, sync markers, null+deflate codecs, nullable unions,
    timestamp-micros logical type) with distributed Spark I/O around
    it (:mod:`pyblazing_spark.sources.avro_files`: mapInPandas encode,
    one container per partition; binaryFile + mapInPandas decode) —
    the same jar-free from-spec answer as the r8 sqlite bridge.

    The slice routes LONGs, DOUBLEs, a NULLABLE string (union
    branches), and a TIMESTAMP (logical type) through the wire format;
    the oracle recomputes the aggregate from the source table, so one
    bit lost anywhere in encode->deflate->decode fails the equality."""
    import shutil
    import tempfile

    from pyblazing_spark.sources.avro_files import read_avro, write_avro

    out_dir = tempfile.mkdtemp(prefix="avro_rt_")
    try:
        src = T(spark, sf_dir, "orders").where(F.col("o_orderkey") % 3 == 0).select(
            "o_orderkey",
            "o_totalprice",
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("prio"),
            F.col("o_orderdate").cast("timestamp_ntz").alias("o_orderdate"),
        )
        # narrow 4-column projection of a single small parquet file =
        # ONE scan task (split parallelism follows bytes, not rows —
        # the r8 multimodal lesson): spread it so encode AND the
        # file-per-task decode read-back run on every core
        src = src.repartition(spark.sparkContext.defaultParallelism)
        n_written = write_avro(src, out_dir, codec="deflate")
        if n_written == 0:
            # empty input writes no container files (nothing to read a
            # schema from): the round-trip of nothing is an empty frame
            back = spark.createDataFrame(
                [],
                "o_orderkey bigint, o_totalprice double, "
                "prio string, o_orderdate timestamp_ntz",
            )
        else:
            back = read_avro(spark, out_dir)
        return (
            back.groupBy(F.coalesce(F.col("prio"), F.lit("(urgent)")).alias("prio"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.count("prio").alias("n_nonnull"),
                F.round(F.sum("o_totalprice") + 1e-4, 2).alias("total"),
                F.min("o_orderdate").alias("first_date"),
                F.sum("o_orderkey").cast("long").alias("key_sum"),
            )
            .orderBy("prio")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


@register(
    "source_avro_split_scan",
    bench=True,  # the monolithic-container scale path: track per round
    tags=("source", "avro", "split", "scale", "jar-free"),
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT)           AS n,
       round(sum(o_totalprice) + 1e-4, 2) AS total,
       CAST(sum(o_orderkey) AS BIGINT)    AS key_sum
FROM orders
GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
)
def source_avro_split_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-range-parallel scan of ONE monolithic Avro container
    (:mod:`pyblazing_spark.sources.avro_split_ds`): the file-per-task
    reader gives a single 50 GB container exactly one task at 100 TB,
    so this source re-enters the byte stream at arbitrary offsets via
    the spec's 16-byte sync markers (Hadoop AvroInputFormat's split
    model) — one Spark input partition per split_size bytes, false
    sync matches inside block data rejected by re-verifying the block
    framing. The 64 KiB split here forces a multi-partition scan of a
    file the fixture would otherwise read in one task; the oracle
    recomputes from the source parquet, so any block lost or doubled
    at a split boundary fails the compare."""
    import shutil
    import tempfile

    from pyblazing_spark.sources.avro_files import write_avro
    from pyblazing_spark.sources.avro_split_ds import read_avro_split

    out_dir = tempfile.mkdtemp(prefix="avro_sp_")
    try:
        src = T(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        ).coalesce(1)
        n = write_avro(src, out_dir, codec="deflate")
        if n == 0:
            back = spark.createDataFrame(
                [], "o_orderkey bigint, o_orderstatus string, o_totalprice double"
            )
        else:
            back = read_avro_split(spark, out_dir, split_size=1 << 16)
        return (
            back.groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("o_totalprice") + 1e-4, 2).alias("total"),
                F.sum("o_orderkey").cast("long").alias("key_sum"),
            )
            .orderBy("o_orderstatus")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


# ------------------------------------------------ unigram-LM tokenizer
_UNI_MAXW = 16  # bounded word length (the oracle unrolls the DP to it)
_UNI_MAXP = 4  # maximum piece length
_UNI_MINF = 3  # cull threshold for len>=2 pieces
_UNI_INF = 1 << 40  # infeasible-cell sentinel (24 adds stay < 2^45)


def _unigram_oracle() -> str:
    """Generated exact-integer Viterbi DP oracle: seed piece
    frequencies, fixed-point costs, then the same combined
    (cost*32 + 1)-per-piece DP the kernel runs, unrolled to
    ``_UNI_MAXW`` chained projection steps over a per-word cell-cost
    array. Integer arithmetic end to end except the ONE ln per piece —
    quantization-boundary-guarded in tests."""
    steps = []
    for j in range(1, _UNI_MAXW + 1):
        terms = [
            f"d{j - L} + arr[{(j - L) * _UNI_MAXP + L}]"
            for L in range(1, min(_UNI_MAXP, j) + 1)
        ]
        expr = terms[0] if len(terms) == 1 else f"least({', '.join(terms)})"
        steps.append(
            f" dp{j} AS (SELECT *, CASE WHEN len >= {j} THEN {expr} END AS d{j}"
            f" FROM dp{j - 1})"
        )
    dp_chain = ",\n".join(steps)
    d_list = ", ".join(f"d{j}" for j in range(1, _UNI_MAXW + 1))
    return rf"""
WITH words AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS w
  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
        FROM documents)
  WHERE regexp_matches(word, '^[a-z]+$') AND length(word) <= {_UNI_MAXW}
  GROUP BY word),
 posi AS (SELECT word, w, unnest(generate_series(1, length(word))) AS i
          FROM words),
 cells AS MATERIALIZED (
  SELECT word, w, CAST(i AS INTEGER) AS i, CAST(L AS INTEGER) AS L,
         substr(word, CAST(i AS INTEGER), CAST(L AS INTEGER)) AS piece,
         (i + L - 1 <= length(word)) AS valid
  FROM (SELECT word, w, i, unnest(generate_series(1, {_UNI_MAXP})) AS L
        FROM posi)),
 cand AS MATERIALIZED (
  SELECT piece, CAST(sum(w) AS BIGINT) AS freq FROM cells WHERE valid
  GROUP BY piece),
 tot AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM cand),
 kept AS MATERIALIZED (
  SELECT piece,
         CAST(floor(ln(CAST((SELECT total FROM tot) AS DOUBLE) / freq)
                    * 4096.0 + 0.5) AS BIGINT) AS cost
  FROM cand WHERE length(piece) = 1 OR freq >= {_UNI_MINF}),
 wcell AS (
  SELECT c.word, c.w, c.i, c.L,
         CASE WHEN c.valid AND k.cost IS NOT NULL
              THEN k.cost * 32 + 1 ELSE {_UNI_INF} END AS comb
  FROM cells c LEFT JOIN kept k USING (piece)),
 carr AS MATERIALIZED (
  SELECT word, any_value(w) AS w, length(word) AS len,
         list(comb ORDER BY i, L) AS arr
  FROM wcell GROUP BY word),
 dp0 AS (SELECT word, w, len, arr, CAST(0 AS BIGINT) AS d0 FROM carr),
{dp_chain},
 seg AS (SELECT word, w, len,
         list_value({d_list})[len] AS comb
         FROM dp{_UNI_MAXW}),
 res AS (SELECT word, w, CAST(len AS BIGINT) AS wlen,
         comb // 32 AS cost, comb % 32 AS n_pieces FROM seg)
SELECT wlen, CAST(n_pieces AS BIGINT) AS n_pieces,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(w) AS BIGINT) AS corpus_occ,
       CAST(sum(cost) AS BIGINT) AS sum_cost
FROM res GROUP BY wlen, n_pieces ORDER BY wlen, n_pieces
"""


def _unigram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct lowercase-word vocabulary with corpus multiplicities —
    the ONLY corpus-scale job of the unigram entries (same contract as
    the BPE vocab pass; text never shuffles)."""
    docs = T(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word")
        )
        .where(
            F.col("word").rlike("^[a-z]+$")
            & (F.length("word") <= _UNI_MAXW)
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .localCheckpoint(eager=True)
    )


@register(
    "text_unigram_tokenize",
    bench=True,  # second tokenizer family: track the vocab-bounded kernel
    tags=("llm", "text", "tokenizer", "unigram", "viterbi"),
    oracle=_unigram_oracle(),
)
def text_unigram_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece-family) Viterbi tokenization — the
    second production tokenizer next to BPE (Kudo 2018, public
    literature; :mod:`pyblazing_spark.operators.unigram`). The entry
    runs the EM pipeline's deterministic seed scoring (EM iterations =
    0: fixed-point integer costs ``floor(ln(total/freq)·4096 + 0.5)``
    from the substring seed inventory), so the per-word minimum-cost
    segmentation DP is EXACT INTEGER arithmetic the DuckDB oracle
    replays verbatim (unrolled to the 16-char word bound) — the same
    exhaustive-settings pattern as the ANN entries; the EM-trained
    float path is pinned by hypothesis tests against brute-force
    segmentation enumeration instead.

    Scale shape: one corpus-scale word-count job (text never
    shuffles); the substring seed inventory explodes over the DISTINCT
    vocabulary in scan-stage codegen and aggregates on piece hashes;
    the driver collects only the culled (piece, cost) table (bounded
    by distinct <=4-char substrings — a production run caps the
    inventory per SentencePiece's seed heuristics); Viterbi runs in an
    Arrow-batched kernel over the vocabulary frame, never per corpus
    token. Output: per (word length, piece count) class — word count,
    corpus occurrences, and the exact summed fixed-point cost."""
    from pyblazing_spark.operators.unigram import (
        quantized_costs,
        viterbi_encode_frame,
    )

    vocab = _unigram_vocab(spark, sf_dir)
    posi = vocab.select(
        "word", "w", F.explode(F.sequence(F.lit(1), F.length("word"))).alias("i")
    )
    cells = posi.select(
        "word",
        "w",
        "i",
        F.explode(F.array(*[F.lit(L) for L in range(1, _UNI_MAXP + 1)])).alias(
            "L"
        ),
    ).where(F.col("i") + F.col("L") - 1 <= F.length("word"))
    freq = (
        cells.select(F.col("word").substr(F.col("i"), F.col("L")).alias("piece"), "w")
        .groupBy("piece")
        .agg(F.sum("w").cast("long").alias("freq"))
    )
    # bounded driver collect: the distinct <=4-char substring inventory
    rows = freq.collect()
    freqs = {r["piece"]: int(r["freq"]) for r in rows}
    total = sum(freqs.values())
    costs = quantized_costs(freqs, total, _UNI_MINF)
    seg = viterbi_encode_frame(vocab, costs, _UNI_MAXP)
    return materialize_bounded(
        seg.groupBy(
            F.length("word").cast("long").alias("wlen"), "n_pieces"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("w").cast("long").alias("corpus_occ"),
            F.sum("cost").cast("long").alias("sum_cost"),
        )
        .orderBy("wlen", "n_pieces")
    )


_UNI_EM_ITERS = 4  # EM iterations (the oracle unrolls them)


def _unigram_em_oracle() -> str:
    """Generated full-replay EM oracle (closes VERDICT r12 #1): the 4
    forward-backward EM iterations, the log-prob quantization, and the
    integer Viterbi WITH backtracking are all unrolled into DuckDB SQL,
    recomputed from the corpus itself — no frozen literals, so the same
    string is valid at every SF.

    Cross-engine float story: every PER-WORD lattice recurrence is
    written with the exact operand/addition order of
    ``operators/unigram.py::_forward_backward`` (missing pieces carry
    0.0, and ``x + 0.0``/``0.0 * b`` are IEEE-exact no-ops), so those
    agree bit-for-bit. The only order-unspecified float sums are the
    CROSS-WORD expected-count aggregations (SQL ``sum()`` order vs
    Python's loop order) — a ~1e-14 relative wobble that the fixed-point
    quantization ``floor(-ln(p)*4096 + 0.5)`` absorbs; the margin test
    (tests/test_unigram.py) asserts every learned logp clears its .5
    boundary by a wide factor at all fixture SFs. After quantization the
    Viterbi DP + backtrack is exact integer arithmetic on both engines
    (same combined cost*32+1 encoding and longest-piece tie-break as
    ``text_unigram_tokenize``)."""
    mp, mw = _UNI_MAXP, _UNI_MAXW
    parts: list[str] = []
    # -- shared seed (same base CTEs as _unigram_oracle) --------------
    parts.append(rf"""
WITH words AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS w
  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
        FROM documents)
  WHERE regexp_matches(word, '^[a-z]+$') AND length(word) <= {mw}
  GROUP BY word),
 posi AS (SELECT word, w, unnest(generate_series(1, length(word))) AS i
          FROM words),
 cells AS MATERIALIZED (
  SELECT word, w, CAST(i AS INTEGER) AS i, CAST(L AS INTEGER) AS L,
         substr(word, CAST(i AS INTEGER), CAST(L AS INTEGER)) AS piece,
         (i + L - 1 <= length(word)) AS valid
  FROM (SELECT word, w, i, unnest(generate_series(1, {mp})) AS L
        FROM posi)),
 cand AS MATERIALIZED (
  SELECT piece, CAST(sum(w) AS BIGINT) AS freq FROM cells WHERE valid
  GROUP BY piece),
 tot AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM cand),
 p0 AS MATERIALIZED (
  SELECT piece, CAST(freq AS DOUBLE)
                / (SELECT CAST(total AS DOUBLE) FROM tot) AS prob
  FROM cand WHERE length(piece) = 1 OR freq >= {_UNI_MINF})""")
    # -- EM iterations -------------------------------------------------
    for t in range(1, _UNI_EM_ITERS + 1):
        chain = []
        for j in range(1, mw + 1):
            # forward a[j] = sum_L a[j-L]*p(cell start j-L+1, len L);
            # backward (reversed index) b[k] = sum_L p(cell start
            # len-k+1, len L)*b[k-L]; term/addition order mirrors the
            # Python L=1.. loop (left-assoc +).
            fa = " + ".join(
                f"a{j - L} * parr[{(j - L) * mp + L}]"
                for L in range(1, min(mp, j) + 1)
            )
            fb = " + ".join(
                f"brr[{(j - 1) * mp + L}] * b{j - L}"
                for L in range(1, min(mp, j) + 1)
            )
            chain.append(
                f" fb{t}_{j} AS (SELECT *,"
                f" CASE WHEN len >= {j} THEN {fa} END AS a{j},"
                f" CASE WHEN len >= {j} THEN {fb} END AS b{j}"
                f" FROM fb{t}_{j - 1})"
            )
        alist = ", ".join(f"a{j}" for j in range(0, mw + 1))
        blist = ", ".join(f"b{j}" for j in range(0, mw + 1))
        parts.append(
            f""",
 wc{t} AS MATERIALIZED (
  SELECT c.word, c.w, c.i, c.L, c.piece,
         CASE WHEN c.valid AND p.prob IS NOT NULL
              THEN p.prob ELSE 0.0 END AS prob
  FROM cells c LEFT JOIN p{t - 1} p USING (piece)),
 ca{t} AS (
  SELECT word, any_value(w) AS w, length(word) AS len,
         list(prob ORDER BY i, L) AS parr,
         list(prob ORDER BY i DESC, L) AS brr
  FROM wc{t} GROUP BY word),
 fb{t}_0 AS (SELECT word, w, len, parr, brr,
             CAST(1.0 AS DOUBLE) AS a0, CAST(1.0 AS DOUBLE) AS b0
             FROM ca{t}),
{",".join(chain)},
 lat{t} AS (SELECT word, w, len,
            list_value({alist}) AS alist,
            list_value({blist}) AS blist
            FROM fb{t}_{mw}),
 cn{t} AS MATERIALIZED (
  SELECT wc.piece,
         sum(((l.alist[wc.i] * wc.prob) * l.blist[l.len - wc.i - wc.L + 2])
             * (CAST(wc.w AS DOUBLE) / l.alist[l.len + 1])) AS c
  FROM wc{t} wc JOIN lat{t} l USING (word)
  WHERE wc.prob > 0
  GROUP BY wc.piece),
 p{t} AS MATERIALIZED (
  SELECT piece, c / (SELECT sum(c) FROM cn{t}) AS prob
  FROM cn{t} WHERE c > 0)"""
        )
    # -- quantize + integer Viterbi DP (same shape as _unigram_oracle) --
    dp_steps = []
    for j in range(1, mw + 1):
        terms = [
            f"d{j - L} + arr[{(j - L) * mp + L}]"
            for L in range(1, min(mp, j) + 1)
        ]
        expr = terms[0] if len(terms) == 1 else f"least({', '.join(terms)})"
        dp_steps.append(
            f" dp{j} AS (SELECT *, CASE WHEN len >= {j} THEN {expr} END AS d{j}"
            f" FROM dp{j - 1})"
        )
    dlist = ", ".join(f"d{j}" for j in range(0, mw + 1))
    parts.append(
        f""",
 kept AS MATERIALIZED (
  SELECT piece, CAST(floor(-ln(prob) * 4096.0 + 0.5) AS BIGINT) AS cost
  FROM p{_UNI_EM_ITERS}),
 wcv AS (
  SELECT c.word, c.w, c.i, c.L,
         CASE WHEN c.valid AND k.cost IS NOT NULL
              THEN k.cost * 32 + 1 ELSE {_UNI_INF} END AS comb
  FROM cells c LEFT JOIN kept k USING (piece)),
 varr AS MATERIALIZED (
  SELECT word, any_value(w) AS w, length(word) AS len,
         list(comb ORDER BY i, L) AS arr
  FROM wcv GROUP BY word),
 dp0 AS (SELECT word, w, len, arr, CAST(0 AS BIGINT) AS d0 FROM varr),
{",".join(dp_steps)},
 bt0 AS (SELECT word, w, len, arr, list_value({dlist}) AS ds,
         len AS j0 FROM dp{mw})"""
    )
    # -- backtracking: recompute the argmin (longest-L tie-break) at
    #    each visited position — identical to the stored backpointer.
    for k in range(1, mw + 1):
        jj = f"j{k - 1}"
        cands = ", ".join(
            f"CASE WHEN {jj} >= {L} THEN ds[{jj} - {L} + 1]"
            f" + arr[({jj} - {L}) * {mp} + {L}] ELSE {_UNI_INF} END"
            for L in range(1, mp + 1)
        )
        pick = (
            f"CASE WHEN c{k}[4] = m{k} THEN 4 WHEN c{k}[3] = m{k} THEN 3"
            f" WHEN c{k}[2] = m{k} THEN 2 ELSE 1 END"
        )
        parts.append(
            f""",
 bt{k} AS (SELECT *, CASE WHEN {jj} > 0
             THEN substr(word, {jj} - l{k} + 1, l{k}) END AS pc{k},
           CASE WHEN {jj} > 0 THEN {jj} - l{k} ELSE 0 END AS j{k}
  FROM (SELECT *, {pick} AS l{k}
        FROM (SELECT *, list_value({cands}) AS c{k},
                     least(c{k}[1], c{k}[2], c{k}[3], c{k}[4]) AS m{k}
              FROM bt{k - 1})))"""
        )
    pcs = ", ".join(f"pc{k}" for k in range(1, mw + 1))
    parts.append(
        f""",
 expl AS (SELECT unnest(list_value({pcs})) AS piece, w FROM bt{mw}),
 used AS (SELECT piece, CAST(sum(w) AS BIGINT) AS total_used
          FROM expl WHERE piece IS NOT NULL GROUP BY piece)
SELECT CAST(row_number() OVER (ORDER BY total_used DESC, piece) AS INTEGER)
         AS rank,
       piece, total_used
FROM used
ORDER BY total_used DESC, piece
LIMIT 20"""
    )
    return "".join(parts)


@register(
    "text_unigram_em_learn",
    tags=("llm", "text", "tokenizer", "unigram", "em"),
    oracle=_unigram_em_oracle(),
)
def text_unigram_em_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EM-trained unigram LM (the production scoring
    :func:`pyblazing_spark.operators.unigram.em_train` — 4 exact
    forward-backward iterations over the collected |vocab|-bounded
    word counts, in-process like the BPE heap learner), quantized to
    integer fixed-point costs (`quantize_logp`), then the exact integer
    Viterbi over the vocabulary frame. The oracle replays the ENTIRE
    pipeline — EM lattice marginals unrolled per iteration, quantization,
    DP + backtracking — in DuckDB SQL recomputed from the corpus
    (no frozen literals; see :func:`_unigram_em_oracle` for the float
    convention), closing VERDICT r12 #1: the last rows-only catalog
    entry is now value-compared. EM internals remain pinned by unit
    tests (monotone corpus log-likelihood, normalized probs, hypothesis
    Viterbi-vs-brute-force). Output: top-20 pieces by EM-expected usage
    across the Viterbi-segmented vocabulary."""
    import pandas as pd

    from pyblazing_spark.operators.unigram import (
        em_train,
        quantize_logp,
        viterbi_int,
    )

    vocab = _unigram_vocab(spark, sf_dir)
    word_rows = [(r["word"], int(r["w"])) for r in vocab.collect()]
    logp, _lls = em_train(word_rows, n_iters=_UNI_EM_ITERS, min_freq=_UNI_MINF)
    costs = quantize_logp(logp)

    def enc(pdfs):
        for pdf in pdfs:
            out: dict[str, int] = {}
            for word, w in zip(pdf["word"], pdf["w"]):
                _, pieces = viterbi_int(word, costs, _UNI_MAXP)
                for p in pieces:
                    out[p] = out.get(p, 0) + int(w)
            yield pd.DataFrame(
                {"piece": list(out), "used": list(out.values())}
            )

    used = (
        vocab.mapInPandas(enc, "piece string, used long")
        .groupBy("piece")
        .agg(F.sum("used").cast("long").alias("total_used"))
    )
    ranked = _ranked_topk(used, 20, F.desc("total_used"), "piece")
    return materialize_bounded(
        ranked.select("rank", "piece", "total_used").orderBy("rank")
    )
