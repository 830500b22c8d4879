"""LoadFromFaiss (SURVEY S9 — `search/gamma_engine.cc:1287-1329`):
pure-Python parser for the public faiss index file layout
(faiss/impl/index_write.cpp), validated by writer/reader round-trips
and by search parity after import."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gamma_spark.operators import knn
from gamma_spark.operators.ivf import IvfFlatIndex
from gamma_spark.sources.faiss_io import (
    load_from_faiss,
    parse_faiss,
    write_faiss_flat,
    write_faiss_ivfflat,
)


def test_flat_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    mat = rng.normal(size=(123, 16)).astype(np.float32)
    p = str(tmp_path / "flat.faiss")
    write_faiss_flat(p, mat, metric="IP")
    parsed = parse_faiss(p)
    assert parsed["kind"] == "flat" and parsed["metric"] == "IP"
    assert np.allclose(parsed["vectors"], mat)


def test_ivfflat_roundtrip(tmp_path):
    rng = np.random.default_rng(9)
    cents = rng.normal(size=(8, 12))
    vecs = rng.normal(size=(200, 12)).astype(np.float32)
    ids = np.arange(1000, 1200, dtype=np.int64)
    assign = rng.integers(0, 8, size=200)
    p = str(tmp_path / "ivf.faiss")
    write_faiss_ivfflat(p, cents, ids, vecs, assign, metric="L2", nprobe=3)
    parsed = parse_faiss(p)
    assert parsed["kind"] == "ivfflat" and parsed["nprobe"] == 3
    assert np.allclose(parsed["centroids"], cents)
    got_ids = np.concatenate([i for i, _ in parsed["lists"] if len(i)])
    assert sorted(got_ids) == sorted(ids)
    for c, (lids, lvecs) in enumerate(parsed["lists"]):
        want = ids[assign == c]
        assert sorted(lids) == sorted(want)
        assert np.allclose(lvecs, vecs[assign == c])


def test_load_flat_search_parity(spark, tmp_path):
    """Imported flat dump answers exact kNN identically to a native
    docs relation over the same vectors."""
    rng = np.random.default_rng(2)
    mat = rng.normal(size=(300, 8)).astype(np.float32)
    p = str(tmp_path / "flat.faiss")
    write_faiss_flat(p, mat, metric="L2")
    loaded = load_from_faiss(spark, p, str(tmp_path / "out"))
    docs = loaded["docs"]
    assert docs.count() == 300
    queries = spark.createDataFrame(
        [(i, mat[i].tolist()) for i in range(5)], "qid long, qvec array<float>"
    )
    got = {
        (r.qid, r.rank): r._docid
        for r in loaded["index"].search(docs, queries, k=5, metric="L2").collect()
    }
    native = spark.createDataFrame(
        [(i, mat[i].tolist()) for i in range(300)], "_docid long, embedding array<float>"
    )
    want = {
        (r.qid, r.rank): r._docid
        for r in knn.knn_join(native, queries, k=5, metric="L2").collect()
    }
    assert got == want


def test_load_ivfflat_end_to_end(spark, embeddings, tmp_path):
    """Native IVF index -> faiss export -> import -> IvfFlatIndex.load
    layout, searchable with preserved list membership; degenerate
    nprobe == ncentroids equals exact."""
    docs = embeddings.withColumnRenamed("vec_id", "_docid")
    native = IvfFlatIndex.build(docs, ncentroids=8, seed=42)
    rows = native.index_df.select("_docid", "embedding", "cluster_id").collect()
    ids = np.array([r._docid for r in rows], dtype=np.int64)
    vecs = np.stack([np.array(r.embedding, dtype=np.float32) for r in rows])
    assign = np.array([r.cluster_id for r in rows], dtype=np.int64)
    p = str(tmp_path / "export.faiss")
    write_faiss_ivfflat(p, native.centroids, ids, vecs, assign, nprobe=8)

    loaded = load_from_faiss(spark, p, str(tmp_path / "imported"))
    idx = loaded["index"]
    assert isinstance(idx, IvfFlatIndex)
    assert np.allclose(idx.centroids, native.centroids)
    # list membership preserved verbatim
    imp = {
        r._docid: r.cluster_id
        for r in idx.index_df.select("_docid", "cluster_id").collect()
    }
    assert imp == {int(i): int(a) for i, a in zip(ids, assign)}

    queries = spark.createDataFrame(
        [(int(i), vecs[k].tolist()) for k, i in enumerate(ids[:6])],
        "qid long, qvec array<float>",
    )
    got = {
        (r.qid, r.rank): r._docid
        for r in idx.search(None, queries, k=5, metric="L2", nprobe=8).collect()
    }
    want = {
        (r.qid, r.rank): r._docid
        for r in knn.knn_join(docs, queries, k=5, metric="L2").collect()
    }
    assert got == want


def test_unsupported_fourcc_raises(tmp_path):
    p = str(tmp_path / "bogus.faiss")
    with open(p, "wb") as fh:
        fh.write(b"IHNf" + b"\x00" * 64)
    with pytest.raises(ValueError, match="fourcc"):
        parse_faiss(p)


def test_ivfpq_roundtrip_and_adc_search(spark, embeddings, tmp_path):
    """Native IVFPQ -> faiss IwPQ export -> import: codebooks, codes
    and list membership survive byte-for-byte; ADC-only search (no
    raw-feature source) and reranked search (with one) both work."""
    from gamma_spark.operators.pq import IvfPqIndex
    from gamma_spark.sources.faiss_io import write_faiss_ivfpq

    docs = embeddings.withColumnRenamed("vec_id", "_docid")
    native = IvfPqIndex.build(docs, ncentroids=8, nsubvector=8, nbits=8, seed=42)
    rows = native.codes_df.select("_docid", "cluster_id", "codes").collect()
    ids = np.array([r._docid for r in rows], dtype=np.int64)
    codes = np.stack([np.array(r.codes, dtype=np.uint8) for r in rows])
    assign = np.array([r.cluster_id for r in rows], dtype=np.int64)
    # faiss layout needs full 256-entry codebooks; pad the tiny-data
    # codebooks (ksub_eff < 256 on 500 docs) by repeating the last row
    cb = native.codebooks
    if cb.shape[1] < 256:
        pad = np.repeat(cb[:, -1:, :], 256 - cb.shape[1], axis=1)
        cb = np.concatenate([cb, pad], axis=1)
    p = str(tmp_path / "export.faiss")
    write_faiss_ivfpq(p, native.centroids, cb, ids, codes, assign, nprobe=8)

    parsed = parse_faiss(p)
    assert parsed["kind"] == "ivfpq" and parsed["by_residual"]
    assert np.allclose(parsed["codebooks"], cb)

    loaded = load_from_faiss(spark, p, str(tmp_path / "imported"))
    idx = loaded["index"]
    assert np.allclose(idx.centroids, native.centroids)
    imp = {
        r._docid: (r.cluster_id, tuple(r.codes))
        for r in idx.codes_df.collect()
    }
    want = {int(i): (int(a), tuple(int(x) for x in c))
            for i, a, c in zip(ids, assign, codes)}
    assert imp == want

    queries = spark.createDataFrame(
        [(int(r._docid), [float(x) for x in r.embedding])
         for r in docs.orderBy("_docid").limit(4).collect()],
        "qid long, qvec array<float>",
    )
    # ADC-only serving (no raw docs attached)
    adc = idx.search(None, queries, k=5, metric="L2", nprobe=8, has_rank=False)
    assert adc.count() == 20
    # identical ADC results to the native index (same codes + codebooks)
    nat = native.search(None, queries, k=5, metric="L2", nprobe=8, has_rank=False)
    assert {(r.qid, r.rank): r._docid for r in adc.collect()} == {
        (r.qid, r.rank): r._docid for r in nat.collect()
    }
    # with a raw-feature source the reranked path serves too
    loaded2 = load_from_faiss(spark, p, str(tmp_path / "imported2"), raw_docs=docs)
    rer = loaded2["index"].search(None, queries, k=5, metric="L2", nprobe=8)
    assert rer.count() == 20


def test_idmap_flat_preserves_ids(spark, tmp_path):
    from gamma_spark.sources.faiss_io import write_faiss_idmap_flat

    rng = np.random.default_rng(13)
    mat = rng.normal(size=(50, 8)).astype(np.float32)
    ids = (np.arange(50) * 7 + 1000).astype(np.int64)  # non-dense ids
    p = str(tmp_path / "idmap.faiss")
    write_faiss_idmap_flat(p, ids, mat, metric="IP")
    parsed = parse_faiss(p)
    assert parsed["kind"] == "flat" and (parsed["ids"] == ids).all()
    loaded = load_from_faiss(spark, p, str(tmp_path / "out"))
    got = {r._docid for r in loaded["docs"].collect()}
    assert got == set(ids.tolist())
