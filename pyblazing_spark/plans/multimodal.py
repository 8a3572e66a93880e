"""Multimodal-column queries (north-star extension; no reference
equivalent — BASELINE.json asks for image/audio/video as first-class
pipeline columns).

The test corpus ships no media files, so blobs are derived
deterministically from ``documents.text`` (pure ASCII: 1 char == 1
byte), which makes every byte-level kernel oracle-checkable with DuckDB
string functions: ``length`` == n_bytes, ``ascii(substr(..))`` == the
byte value, ``md5(text-slice)`` == the digest of the byte slice the
pandas kernel hashed. The Python side still operates on real ``bytes``
through Arrow — the oracle proves the binary column round-trips intact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyblazing_spark.operators import multimodal as MM
from pyblazing_spark.plans.registry import register
from pyblazing_spark.sources.tables import load_table as T


def _blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return MM.attach_blob(T(spark, sf_dir, "documents"))


@register(
    "multimodal_features",
    bench=True,
    tags=("multimodal", "mapInPandas"),
    oracle="""
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END                 AS modality,
       CAST(length(text) AS INTEGER)         AS n_bytes,
       md5(text)                             AS digest
FROM documents
ORDER BY doc_id
""",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level feature extraction over the binary column (Arrow-batched
    mapInPandas; digest computed from the raw buffer in Python)."""
    return MM.extract_features(_blobs(spark, sf_dir)).orderBy("doc_id")


@register(
    "multimodal_decode_image",
    tags=("multimodal", "decode", "mapInPandas"),
    oracle="""
WITH v AS (
  SELECT doc_id, text,
         CAST(floor(sqrt(length(text))) AS INTEGER) AS side
  FROM documents WHERE doc_id % 3 = 0),
px AS (
  -- DuckDB generate_series takes constants only (no lateral columns):
  -- cross join a fixed 1..4096 series (>= max text length in TESTDATA)
  -- and keep i <= side^2.
  SELECT doc_id, side, ascii(substr(text, CAST(i AS INTEGER), 1)) AS c
  FROM v JOIN generate_series(1, 4096) t(i) ON i <= side * side)
SELECT doc_id,
       CAST(min(side) AS INTEGER)   AS width,
       CAST(min(side) AS INTEGER)   AS height,
       round(avg(c) + 1e-9, 4)      AS mean_pixel
FROM px
GROUP BY doc_id
ORDER BY doc_id
""",
)
def multimodal_decode_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake-decode image blobs to (width, height, mean_pixel); the oracle
    recomputes the same byte math char-by-char in SQL."""
    blobs = _blobs(spark, sf_dir).where(F.col("meta.modality") == "image")
    return MM.decode_image(blobs).orderBy("doc_id")


@register(
    "multimodal_frame_sample",
    tags=("multimodal", "video", "mapInPandas"),
    oracle="""
WITH v AS (
  SELECT doc_id, text, length(text) AS L
  FROM documents WHERE doc_id % 3 = 2),
f AS (
  SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
         (i * L) // 4 AS s, ((i + 1) * L) // 4 AS e, text
  FROM v, generate_series(0, 3) t(i))
SELECT doc_id, frame_idx,
       CAST(e - s AS INTEGER) AS n_bytes,
       md5(substr(text, CAST(s + 1 AS INTEGER), CAST(e - s AS INTEGER))) AS digest
FROM f
ORDER BY doc_id, frame_idx
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1->4 frame sampling of video blobs (contiguous byte ranges), one
    row per frame with the frame digest."""
    blobs = _blobs(spark, sf_dir).where(F.col("meta.modality") == "video")
    return MM.frame_sample(blobs, n_frames=4).orderBy("doc_id", "frame_idx")
