"""HNSW sharded-graph ANN (SURVEY K5 — `index/impl/hnswlib/
gamma_index_hnswlib.cc:128,316-380`): recall methodology mirrors the
reference's own acceptance tests (recall vs exact kernel), plus the
traversal-time filter/band semantics hnswlib enforces
(`hnswalg.h:312-313,379-380`)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gamma_spark.operators import knn
from gamma_spark.operators.hnsw import HnswIndex, NpHnsw


@pytest.fixture(scope="module")
def docs(embeddings):
    return embeddings.withColumnRenamed("vec_id", "_docid")


@pytest.fixture(scope="module")
def queries(spark, docs):
    rows = docs.orderBy("_docid").limit(8).collect()
    return spark.createDataFrame(
        [(int(r._docid), [float(x) for x in r.embedding]) for r in rows],
        "qid long, qvec array<float>",
    )


def _recall(approx_rows, exact_rows):
    a = {(r.qid, r._docid) for r in approx_rows}
    e = {(r.qid, r._docid) for r in exact_rows}
    return len(a & e) / len(e)


# ---------------------------------------------------------------------------
# in-memory kernel
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("metric", ["L2", "IP", "COSINE"])
def test_np_hnsw_recall(metric):
    rng = np.random.default_rng(7)
    mat = rng.normal(size=(600, 16))
    q = mat[:20]
    g = NpHnsw(m=16, ef_construction=80, metric=metric).build(mat, seed=1)
    pos, _ = g.search(q, k=10, ef=120)
    # brute-force truth
    if metric == "L2":
        d = ((q[:, None, :] - mat[None, :, :]) ** 2).sum(-1)
    else:
        mm = mat
        qq = q
        if metric == "COSINE":
            mm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            qq = q / np.linalg.norm(q, axis=1, keepdims=True)
        d = -(qq @ mm.T)
    truth = np.argsort(d, axis=1, kind="stable")[:, :10]
    hits = sum(len(set(pos[i]) & set(truth[i])) for i in range(len(q)))
    assert hits / truth.size >= 0.95


def test_np_hnsw_deterministic():
    rng = np.random.default_rng(11)
    mat = rng.normal(size=(300, 8))
    g1 = NpHnsw(m=8, ef_construction=40).build(mat, seed=5)
    g2 = NpHnsw(m=8, ef_construction=40).build(mat, seed=5)
    p1, d1 = g1.search(mat[:10], k=5, ef=50)
    p2, d2 = g2.search(mat[:10], k=5, ef=50)
    assert (p1 == p2).all() and np.allclose(d1, d2)


def test_np_hnsw_valid_mask_keeps_recall():
    """Invalid nodes are routed *through*, not around: recall over the
    valid subset stays high even when 50% of nodes are filtered."""
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(500, 12))
    valid = np.arange(500) % 2 == 0
    g = NpHnsw(m=16, ef_construction=80).build(mat, seed=2)
    pos, _ = g.search(mat[:10], k=5, ef=150, valid=valid)
    assert (valid[pos[pos >= 0]]).all()
    d = ((mat[:10][:, None, :] - mat[None, :, :]) ** 2).sum(-1)
    d[:, ~valid] = np.inf
    truth = np.argsort(d, axis=1, kind="stable")[:, :5]
    hits = sum(len(set(pos[i]) & set(truth[i])) for i in range(10))
    assert hits / truth.size >= 0.9


# ---------------------------------------------------------------------------
# sharded Spark index
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def hnsw(docs):
    return HnswIndex.build(docs, nshards=4, m=16, ef_construction=80, metric="L2")


def test_hnsw_recall_vs_exact(hnsw, docs, queries):
    exact = knn.knn_join(docs, queries, k=10, metric="L2").collect()
    approx = hnsw.search(None, queries, k=10, ef_search=128).collect()
    assert _recall(approx, exact) >= 0.9
    # self-hit: every query vector is a doc, so rank-1 must be itself
    best = {r.qid: r._docid for r in approx if r.rank == 1}
    assert all(q == d for q, d in best.items())


def test_hnsw_filter_during_traversal(hnsw, docs, queries):
    pred = F.col("label") == 1
    exact = knn.knn_join(docs, queries, k=10, metric="L2", predicate=pred).collect()
    approx = hnsw.search(None, queries, k=10, ef_search=200, predicate=pred).collect()
    labels = {r._docid: r.label for r in docs.select("_docid", "label").collect()}
    assert all(labels[r._docid] == 1 for r in approx)
    assert _recall(approx, exact) >= 0.85


def test_hnsw_score_band(hnsw, docs, queries):
    lo, hi = 1.0, 15.0
    out = hnsw.search(
        None, queries, k=10, ef_search=200, min_score=lo, max_score=hi
    ).collect()
    assert out, "band should admit some hits"
    assert all(lo <= r.score <= hi for r in out)


def test_hnsw_qsplits_invariant(hnsw, queries):
    a = hnsw.knn_join_distributed(queries, k=10, ef_search=128).collect()
    b = hnsw.knn_join_distributed(queries, k=10, ef_search=128, qsplits=3).collect()
    ka = {(r.qid, r.rank): (r._docid, r.score) for r in a}
    kb = {(r.qid, r.rank): (r._docid, r.score) for r in b}
    assert ka == kb


def test_hnsw_deterministic_rebuild(docs, queries):
    a = HnswIndex.build(docs, nshards=4, m=16, metric="IP", seed=9)
    b = HnswIndex.build(docs, nshards=4, m=16, metric="IP", seed=9)
    ra = {(r.qid, r.rank): (r._docid, r.score) for r in a.search(None, queries, k=5).collect()}
    rb = {(r.qid, r.rank): (r._docid, r.score) for r in b.search(None, queries, k=5).collect()}
    assert ra == rb


def test_hnsw_dump_load_roundtrip(docs, queries, tmp_path):
    path = str(tmp_path / "hnsw_idx")
    built = HnswIndex.build(docs, nshards=2, m=16, metric="COSINE", path=path)
    loaded = HnswIndex.load(docs.sparkSession, path)
    r1 = {(r.qid, r.rank): r._docid for r in built.search(None, queries, k=5).collect()}
    r2 = {(r.qid, r.rank): r._docid for r in loaded.search(None, queries, k=5).collect()}
    assert r1 == r2
    assert loaded.metric == "COSINE" and loaded.nshards == 2


def test_hnsw_metric_mismatch_raises(hnsw, queries):
    with pytest.raises(ValueError):
        hnsw.search(None, queries, k=5, metric="IP")


def test_hnsw_registered():
    from gamma_spark.operators.ann import get_model

    assert get_model("HNSW") is HnswIndex


# ---------------------------------------------------------------------------
# HNSW coarse quantizer for IVF (SURVEY K3's optional hnsw coarse path)
# ---------------------------------------------------------------------------

def test_hnsw_probe_matches_brute_probe():
    from gamma_spark.operators.ivf import IvfFlatIndex

    rng = np.random.default_rng(21)
    cents = rng.normal(size=(256, 16))
    idx = IvfFlatIndex(cents, index_df=None)
    q = rng.normal(size=(40, 16))
    brute = idx.probe_clusters(q, nprobe=8)
    idx.enable_hnsw_probe(m=16, ef_construction=80, ef_search=64)
    graph = idx.probe_clusters(q, nprobe=8)
    # probe recall: the graph's 8 picks vs the true 8 nearest centroids
    hits = sum(len(set(graph[i]) & set(brute[i])) for i in range(len(q)))
    assert hits / brute.size >= 0.95
    # degenerate nprobe == ncentroids must bypass the graph (exact)
    full_a = idx.probe_clusters(q[:4], nprobe=256)
    idx._hnsw_probe = None
    full_b = idx.probe_clusters(q[:4], nprobe=256)
    assert (full_a == full_b).all()


def test_hnsw_probe_end_to_end(docs, queries):
    from gamma_spark.operators import knn
    from gamma_spark.operators.ivf import IvfFlatIndex

    idx = IvfFlatIndex.build(docs, ncentroids=16, seed=42)
    idx.enable_hnsw_probe(m=8, ef_construction=40, ef_search=32)
    out = idx.search(None, queries, k=10, metric="L2", nprobe=4).collect()
    exact = knn.knn_join(docs, queries, k=10, metric="L2").collect()
    assert _recall(out, exact) >= 0.5  # same floor as the brute probe at nprobe=4/16


def test_hnsw_append_segments(docs, queries, tmp_path):
    """T2 micro-batch append: old graphs untouched, new docs land in
    fresh segments, search covers both, persistence round-trips."""
    old = docs.filter(F.col("_docid") < 400)
    new = docs.filter(F.col("_docid") >= 400)
    path = str(tmp_path / "grow")
    idx = HnswIndex.build(old, nshards=2, m=16, metric="L2", path=path)
    grown = idx.append(new, nshards=1)
    assert grown.nshards == 3
    assert grown.index_df.count() == docs.count()
    # old shard rows byte-identical (append-only)
    old_rows = idx.index_df.filter(F.col("_shard") < 2).count()
    assert grown.index_df.filter(F.col("_shard") < 2).count() == old_rows
    # a query targeting a new doc finds it
    target = new.orderBy("_docid").limit(1).collect()[0]
    q = docs.sparkSession.createDataFrame(
        [(int(target._docid), [float(x) for x in target.embedding])],
        "qid long, qvec array<float>",
    )
    hits = grown.search(None, q, k=3, ef_search=64).collect()
    assert hits[0]._docid == target._docid
    # reload sees the appended segments
    reloaded = HnswIndex.load(docs.sparkSession, path)
    assert reloaded.nshards == 3 and reloaded.index_df.count() == docs.count()
