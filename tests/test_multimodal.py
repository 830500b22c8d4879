"""Multimodal column plumbing: schemas, Arrow batch shapes, determinism
(decoders stubbed — see operators/multimodal.py)."""

import pytest
from pyspark.sql import functions as F

from gamma_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def images(spark, documents):
    """Fabricate binary image payloads from document text."""
    return documents.limit(40).select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("image"),
        F.struct(
            F.lit(16).alias("width"), F.lit(12).alias("height"), F.lit("fake").alias("format")
        ).alias("image_meta"),
    )


def test_feature_extraction_shape_and_determinism(images):
    out = M.extract_image_features(images, dim=64)
    rows = out.collect()
    assert len(rows) == 40
    assert all(len(r.feat) == 64 for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r.feat)
    # deterministic: same payload -> same features across runs
    again = {r.doc_id: r.feat for r in M.extract_image_features(images, dim=64).collect()}
    for r in rows:
        assert again[r.doc_id] == r.feat


def test_feature_vectors_flow_into_knn(images, spark):
    """The extracted features are a first-class vector column: the whole
    search stack applies to multimodal docs (multi-vector fusion of
    image+text embeddings is SURVEY M5 with these columns)."""
    from gamma_spark.operators import knn

    docs = M.extract_image_features(images, dim=16).select(
        F.col("doc_id").alias("_docid"), F.col("feat").alias("embedding")
    )
    row = docs.limit(1).collect()[0]
    queries = spark.createDataFrame(
        [(row._docid, row.embedding)], "qid long, qvec array<float>"
    )
    res = knn.knn_join(docs, queries, k=3, metric="L2").collect()
    assert res[0]._docid == row._docid and res[0].score < 1e-9


def test_resize_updates_payload_and_meta(images):
    out = M.resize_images(images, width=8, height=6).collect()
    for r in out:
        assert r.image_meta.width == 8 and r.image_meta.height == 6
        assert len(bytes(r.image)) == 8 * 6 * 3
        assert r.image_meta.format == "raw-rgb"


def test_real_decode_is_explicit_stub(images):
    with pytest.raises(Exception) as ei:
        M.extract_image_features(images, deterministic=False).collect()
    assert "NotImplementedError" in str(ei.value) or "not available" in str(ei.value)


def test_video_frame_sampling(spark):
    df = spark.createDataFrame(
        [(1, b"\x00\x01", 25), (2, b"\x02", 5)], "vid long, video binary, n_frames int"
    )
    out = M.sample_video_frames(df, every=10).collect()
    got = {(r.vid, r.frame_idx) for r in out}
    assert got == {(1, 0), (1, 10), (1, 20), (2, 0)}
    assert all(":" in r.frame_key for r in out)
