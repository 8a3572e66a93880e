"""Multimodal (image/audio/video) column handling for training-data
pipelines — a north-star extension with no reference equivalent (the
reference is a fixed-schema relational engine; BASELINE.json asks for
multimodal columns as a first-class pipeline capability).

Design: media is an opaque ``binary`` column plus a typed metadata
struct; all per-byte work (feature extraction, decode, frame sampling)
runs as Arrow-batched ``mapInPandas`` over that column. At 100 TB the
binary column is the table's bulk, so every stage is a narrow map — no
shuffle touches content bytes; only extracted features (a few dozen
bytes/row) flow into joins/aggregations downstream.

The real image/audio codec libraries are not available in this
container, so the decode kernels use a **clearly-marked deterministic
fake** (grayscale-square interpretation of the raw bytes) when PIL is
missing, and :func:`transcode` is a NotImplementedError stub. The Spark
plumbing — schemas, UDF signatures, Arrow batch shapes, 1->N row
expansion — is real and oracle-tested byte-for-byte (the test corpus is
ASCII, so DuckDB string functions can check byte math exactly).
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

try:  # real codec path — absent in this environment by design
    from PIL import Image  # type: ignore  # noqa: F401

    HAVE_PIL = True
except ImportError:  # pragma: no cover
    HAVE_PIL = False

#: modality cycle used by :func:`attach_blob` (keyed on id % 3).
MODALITIES: tuple[str, ...] = ("image", "audio", "video")

CONTENT_TYPES: dict[str, str] = {
    "image": "image/png",
    "audio": "audio/wav",
    "video": "video/mp4",
}

FEATURE_SCHEMA = "doc_id bigint, modality string, n_bytes int, digest string"
IMAGE_SCHEMA = "doc_id bigint, width int, height int, mean_pixel double"
FRAME_SCHEMA = "doc_id bigint, frame_idx int, n_bytes int, digest string"


def read_binary_dir(spark, path: str, glob: str | None = None) -> DataFrame:
    """Real binary ingestion: Spark's ``binaryFile`` source
    (path, modificationTime, length, content). This is the production
    entry point for on-disk media; tests use :func:`attach_blob` because
    the container ships no media files."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def attach_blob(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Derive a multimodal-shaped table from a text table: ``content`` =
    the UTF-8 bytes, ``meta`` = struct<modality, content_type, n_bytes>.

    Deterministic (modality cycles by id % 3) so every downstream kernel
    is oracle-checkable. JVM-side only — no Python in this stage."""
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]), (F.pmod(F.col(id_col), 3) + 1).cast("int")
    )
    content_type = F.element_at(
        F.array(*[F.lit(CONTENT_TYPES[m]) for m in MODALITIES]),
        (F.pmod(F.col(id_col), 3) + 1).cast("int"),
    )
    content = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        content.alias("content"),
        F.struct(
            modality.alias("modality"),
            content_type.alias("content_type"),
            F.length(content).alias("n_bytes"),
        ).alias("meta"),
    )


def extract_features(blobs: DataFrame) -> DataFrame:
    """(doc_id, modality, n_bytes, digest): per-blob byte features via
    Arrow-batched mapInPandas.

    The kernel touches real bytes (hashlib over the buffer), proving the
    binary column round-trips Python intact. Narrow map: preserves
    partitioning, no shuffle."""

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "n_bytes": content.map(len).astype("int32"),
                    "digest": content.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    return blobs.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def decode_image(blobs: DataFrame) -> DataFrame:
    """(doc_id, width, height, mean_pixel) for image-modality blobs.

    With PIL installed this would decode real images; in this container
    it is a DETERMINISTIC FAKE decode: the blob is interpreted as a
    grayscale square (side = floor(sqrt(n_bytes)); the first side^2
    bytes are the pixels). The fake keeps every byte-math property a
    real decoder has (shape from content, mean over pixels), so the
    Arrow plumbing and downstream schema are exercised honestly."""

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["content"]):
                data = bytes(buf)
                if HAVE_PIL:  # pragma: no cover — not available here
                    import io

                    from PIL import Image

                    img = Image.open(io.BytesIO(data)).convert("L")
                    px = list(img.getdata())
                    rows.append((doc_id, img.width, img.height, sum(px) / len(px)))
                    continue
                side = int(math.isqrt(len(data)))
                px = data[: side * side]
                mean = (sum(px) / len(px)) if px else 0.0
                # +1e-9 tie-nudge before rounding, mirrored in the SQL
                # oracle so half-even vs half-up can't flip the 4th dp.
                rows.append((doc_id, side, side, round(mean + 1e-9, 4)))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "mean_pixel"])

    return blobs.mapInPandas(kernel, schema=IMAGE_SCHEMA)


def frame_sample(blobs: DataFrame, n_frames: int = 4) -> DataFrame:
    """1->N expansion: split each (video) blob into ``n_frames``
    contiguous byte ranges — frame i covers
    ``[i*L//n, (i+1)*L//n)`` — one output row per frame with its size and
    digest. Models video frame sampling; at scale the per-frame bytes
    would feed a feature extractor instead of a digest."""

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["content"]):
                data = bytes(buf)
                length = len(data)
                for i in range(n_frames):
                    chunk = data[i * length // n_frames : (i + 1) * length // n_frames]
                    rows.append((doc_id, i, len(chunk), hashlib.md5(chunk).hexdigest()))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "n_bytes", "digest"])

    return blobs.mapInPandas(kernel, schema=FRAME_SCHEMA)


def transcode(blobs: DataFrame, target_format: str) -> DataFrame:
    """STUB — real media transcoding needs codec libraries (ffmpeg/PIL/
    soundfile) that are not installed in this environment."""
    raise NotImplementedError(
        "transcode requires media codec libraries (ffmpeg/PIL/soundfile) "
        "not available in this container; the decode/feature kernels above "
        "demonstrate the Spark-side plumbing"
    )
