"""Deduplication operators for LLM training-data pipelines.

Five families (BASELINE.json north-star; no reference equivalent — the
reference is a pure SQL engine):

- **exact**: hash-groupBy on (normalized) content. One shuffle on the
  content hash; at 100 TB the md5 key (16 bytes) shuffles, never the text.
- **MinHash + LSH**: shingle -> k minhashes -> band buckets -> candidate
  pairs -> exact-Jaccard verify. Only band-bucket collisions shuffle as
  pairs; the full n^2 never materializes.
- **SimHash**: 32-bit signature via per-bit token-hash majority; banded
  pigeonhole join (hamming<=d implies some band equal), then exact
  hamming via xor bit_count.
- **n-gram Jaccard**: exact pairwise Jaccard over shared shingles
  (inverted-index join). Exact but O(sum of bucket^2): use for bounded
  candidate sets; MinHash is the scale path.
- **embedding cosine**: near-dup by cosine over `array<float>` vectors;
  brute pairs for bounded sets, LSH-bucketed variant in
  :mod:`pyblazing_spark.operators.similarity` for scale.

All signatures are computed with JVM built-ins (xxhash64, transform,
aggregate) — no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyblazing_spark.functions import text as TXT
from pyblazing_spark.functions import vectors as VEC


# --------------------------------------------------------------- exact
def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", normalized: bool = True
) -> DataFrame:
    """Keep one representative (min id) per identical (normalized) text.

    Shuffles only (hash, id); the winning ids then semi-join the input.
    """
    key = TXT.fingerprint(F.col(text_col)) if normalized else F.md5(F.col(text_col))
    winners = (
        df.select(key.alias("__fp"), F.col(id_col))
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(winners, id_col, "left_semi")


def duplicate_clusters(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", normalized: bool = True
) -> DataFrame:
    """(fingerprint, n_docs, keep_id) for every content group."""
    key = TXT.fingerprint(F.col(text_col)) if normalized else F.md5(F.col(text_col))
    return (
        df.select(key.alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


# ------------------------------------------------------------- minhash
def minhash_signature(
    text_col: Column, num_hashes: int = 32, shingle_words: int = 3
) -> Column:
    """array<bigint> of ``num_hashes`` minhashes over word shingles.

    Hash family: xxhash64(shingle || '#' || seed_index) — deterministic,
    JVM-side, no Python."""
    shingles = TXT.word_shingles(text_col, shingle_words)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda s: F.array_min(
            F.transform(
                shingles, lambda sh: F.xxhash64(F.concat(sh, F.lit("#"), s.cast("string")))
            )
        ),
    )


def _band_hashes(sig: Column, bands: int, rows: int) -> Column:
    """Hash each band (slice of the signature) to a single bigint."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(
            F.concat_ws(
                ",", F.transform(F.slice(sig, b * rows + 1, rows), lambda v: v.cast("string"))
            )
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.7,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    Plan shape: signature projection (no shuffle) -> explode bands ->
    shuffle on (band, bucket) -> same-bucket pairs -> distinct ->
    exact-Jaccard verify via the shingle arrays. With b=8, r=4 the LSH
    S-curve crosses ~0.6; candidates are verified exactly, so the
    threshold is honest — LSH only bounds recall, never precision.
    """
    rows = num_hashes // bands
    base = df.select(
        F.col(id_col),
        TXT.word_shingles(F.col(text_col)).alias("__sh"),
        minhash_signature(F.col(text_col), num_hashes).alias("__sig"),
    )
    banded = base.select(
        id_col,
        F.posexplode(_band_hashes(F.col("__sig"), bands, rows)).alias("__band", "__bucket"),
    )
    left = banded.alias("a")
    right = banded.alias("b")
    cand = (
        left.join(
            right,
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__bucket") == F.col("b.__bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    sh = base.select(id_col, "__sh")
    verified = (
        cand.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("__sh", "__sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("__sh", "__sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("__sh_a", "__sh_b"))
            / F.size(F.array_union("__sh_a", "__sh_b")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )
    return verified


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
) -> DataFrame:
    """Drop the higher-id member of every near-duplicate pair (greedy,
    single-pass; transitive clusters keep their min id through chains in
    the common case)."""
    pairs = minhash_lsh_pairs(df, text_col, id_col, threshold=threshold)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


# ------------------------------------------------------------- simhash
def simhash32(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash int) — 32-bit SimHash from per-token xxhash64 bits.

    Explode distinct tokens, one row per token; 32 conditional sums in a
    single aggregation (bit-majority); reassemble the signature. One
    shuffle on id."""
    tok = df.select(
        F.col(id_col), F.explode(F.array_distinct(TXT.tokens(F.col(text_col)))).alias("__t")
    ).withColumn("__h", F.xxhash64("__t"))
    aggs = [
        F.sum(
            F.when(F.shiftrightunsigned(F.col("__h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"__b{j}")
        for j in range(32)
    ]
    maj = tok.groupBy(id_col).agg(*aggs)
    sig = F.lit(0).cast("long")
    for j in range(32):
        sig = sig + F.when(F.col(f"__b{j}") > 0, F.lit(1 << j).cast("long")).otherwise(0)
    return maj.select(F.col(id_col), sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs with hamming(simhash_a, simhash_b) <= max_hamming.

    Pigeonhole: split 32 bits into max_hamming+1 chunks; any pair within
    distance d agrees on >=1 chunk — join only on chunk equality, then
    verify with xor bit_count (exact)."""
    chunks = max_hamming + 1
    width = 32 // chunks
    sig = simhash32(df, text_col, id_col)
    exploded = sig.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    for i in range(chunks)
                ]
            )
        ).alias("__chunk_idx", "__chunk"),
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.__chunk_idx") == F.col("b.__chunk_idx"))
            & (F.col("a.__chunk") == F.col("b.__chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ------------------------------------------------- exact n-gram jaccard
def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact character-n-gram Jaccard pairs via an inverted-index join.

    Exact (no hashing) — use on bounded candidate sets; cost is
    sum(bucket^2) over shingle buckets, so hot shingles explode. The
    MinHash path above is the 100 TB variant.
    """
    sh = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(TXT.char_shingles(F.col(text_col), n))).alias("__s"),
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.__s") == F.col("b.__s"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    sa = sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("__n", "__na")
    sb = sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("__n", "__nb")
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard", F.col("__inter") / (F.col("__na") + F.col("__nb") - F.col("__inter"))
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


# ------------------------------------------------------ embedding cosine
def embedding_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
) -> DataFrame:
    """Near-duplicate pairs by cosine similarity (brute pairwise).

    O(n^2) — meant for bounded sets (a shard, an LSH bucket). For corpus
    scale, bucket with
    :func:`pyblazing_spark.operators.similarity.hyperplane_buckets`
    first and run this within buckets.
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", VEC.cosine(F.col("__va"), F.col("__vb")))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 4).alias("cos"))
    )
