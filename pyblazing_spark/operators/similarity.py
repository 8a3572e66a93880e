"""Similarity search over embedding columns.

Two paths (BASELINE.json north-star):

- **Brute-force cosine top-k** — exact baseline. Queries broadcast
  (they're small by construction); the corpus streams through one
  projection + per-partition top-k (window over a bounded key set).
- **Random-hyperplane LSH ANN** — the scale path. A fixed, seeded set of
  hyperplanes (driver-side numpy, shipped as literals — a few KB) maps
  each vector to a bit signature; banded buckets prune the candidate set,
  exact cosine re-ranks. Recall is tunable via bits/bands (unit-tested
  against the brute-force baseline).

At 100 TB: hyperplane_buckets is a map-only projection; the join is
bucket-equality (shuffle on small ints); only candidates pay the exact
cosine. An IVF variant would replace the hyperplanes with k-means
centroids — same plan shape.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from pyblazing_spark.functions import vectors as VEC


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query vector by cosine similarity.

    Result: (query_id, neighbor_id, cos, rank). Ordering ties are broken
    by neighbor id for determinism (cos rounded to 4 dp first, so
    float-noise cannot reorder ranks across engines)."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = q.crossJoin(c).select(
        "query_id",
        "neighbor_id",
        F.round(VEC.cosine(F.col("__qv"), F.col("__cv")), 4).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side, shipped as literals)."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_bits, dim)).tolist()


def signature_bits(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-of-dot-product bit per hyperplane -> array<int>."""
    return F.array(
        *[
            F.when(
                VEC.dot(vec, F.array(*[F.lit(float(x)) for x in plane])) >= 0, 1
            ).otherwise(0)
            for plane in planes
        ]
    )


def hyperplane_buckets(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_bits: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Append (band, bucket) rows: one row per band, bucket = the band's
    bit-slice packed to an int. Map-only (no shuffle)."""
    planes = _hyperplanes(dim, n_bits, seed)
    bits = signature_bits(F.col(vec_col), planes)
    width = n_bits // bands
    buckets = F.array(
        *[
            F.aggregate(
                F.slice(bits, b * width + 1, width),
                F.lit(0),
                lambda acc, x: acc * 2 + x,
            )
            for b in range(bands)
        ]
    )
    return df.select("*", F.posexplode(buckets).alias("band", "bucket"))


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    dim: int = 64,
    n_bits: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH candidate pruning + exact
    cosine re-rank. Same output schema as :func:`cosine_topk`; recall < 1
    by construction (band collisions bound it — verified in unit tests).
    """
    cb = hyperplane_buckets(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")),
        "__cv",
        dim,
        n_bits,
        bands,
    )
    qb = hyperplane_buckets(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")),
        "__qv",
        dim,
        n_bits,
        bands,
    )
    cand = (
        qb.join(cb, ["band", "bucket"])
        .select("query_id", "neighbor_id", "__qv", "__cv")
        .distinct()
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(VEC.cosine(F.col("__qv"), F.col("__cv")), 4).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )
