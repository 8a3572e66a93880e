"""Multimodal column plumbing: binary round-trip through Arrow, typed
metadata, 1->N frame expansion, decode stubs. Oracle-grade value checks
live in test_queries.py (the registered queries have DuckDB oracles);
these tests pin the operator-level contracts."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from pyblazing_spark.operators import multimodal as MM
from pyblazing_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def blobs(spark, sf_dir):
    return MM.attach_blob(load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 60))


def test_attach_blob_schema_and_meta(blobs):
    schema = dict(blobs.dtypes)
    assert schema["content"] == "binary"
    assert schema["meta"].startswith("struct<modality:string,content_type:string,n_bytes:int")
    rows = blobs.collect()
    for r in rows:
        assert r.meta.modality == MM.MODALITIES[r.doc_id % 3]
        assert r.meta.content_type == MM.CONTENT_TYPES[r.meta.modality]
        assert r.meta.n_bytes == len(r.content)


def test_binary_roundtrips_python_intact(blobs, spark, sf_dir):
    """The digest computed from raw bytes in the pandas kernel must equal
    md5 of the original text — proving content passes Arrow unmangled."""
    feats = {r.doc_id: r for r in MM.extract_features(blobs).collect()}
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 60).collect()
    assert len(feats) == len(docs)
    for d in docs:
        expected = hashlib.md5(d.text.encode("utf-8")).hexdigest()
        assert feats[d.doc_id].digest == expected
        assert feats[d.doc_id].n_bytes == len(d.text.encode("utf-8"))


def test_decode_image_fake_geometry(blobs):
    out = MM.decode_image(blobs.where(F.col("meta.modality") == "image")).collect()
    assert out, "no image-modality blobs in range"
    for r in out:
        assert r.width == r.height and r.width >= 1
        assert 0.0 <= r.mean_pixel <= 255.0


def test_frame_sample_expansion(blobs):
    videos = blobs.where(F.col("meta.modality") == "video")
    n_videos = videos.count()
    frames = MM.frame_sample(videos, n_frames=4).collect()
    assert len(frames) == 4 * n_videos
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    sizes = {r.doc_id: r for r in videos.select("doc_id", F.col("meta.n_bytes").alias("n")).collect()}
    for doc_id, fr in by_doc.items():
        assert sorted(f.frame_idx for f in fr) == [0, 1, 2, 3]
        assert sum(f.n_bytes for f in fr) == sizes[doc_id].n


def test_frame_sample_deterministic(blobs):
    videos = blobs.where(F.col("meta.modality") == "video")
    a = sorted((r.doc_id, r.frame_idx, r.digest) for r in MM.frame_sample(videos).collect())
    b = sorted((r.doc_id, r.frame_idx, r.digest) for r in MM.frame_sample(videos).collect())
    assert a == b


def test_transcode_is_a_marked_stub(blobs):
    with pytest.raises(NotImplementedError):
        MM.transcode(blobs, "webp")


def test_read_binary_dir_reads_real_files(spark, tmp_path):
    p = tmp_path / "media"
    p.mkdir()
    payload = bytes(range(256))
    (p / "a.bin").write_bytes(payload)
    (p / "b.bin").write_bytes(payload * 2)
    out = {r.length: bytes(r.content) for r in MM.read_binary_dir(spark, str(p)).collect()}
    assert out[256] == payload and out[512] == payload * 2
