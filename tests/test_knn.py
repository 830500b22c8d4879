"""Exact kNN (FLAT, SURVEY K1): both physical paths agree with each
other and with a numpy oracle; pre-filter and score-band semantics."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gamma_spark.operators import knn


@pytest.fixture(scope="module")
def docs(embeddings):
    return embeddings.withColumnRenamed("vec_id", "_docid")


@pytest.fixture(scope="module")
def queries(spark, embeddings):
    rows = embeddings.orderBy("vec_id").limit(8).collect()
    return spark.createDataFrame(
        [(int(r.vec_id), [float(x) for x in r.embedding]) for r in rows],
        "qid long, qvec array<float>",
    )


def numpy_topk(docs_np, ids, q, k, metric):
    if metric == "IP":
        s = docs_np @ q
        order = np.argsort(-s, kind="stable")
    else:
        s = ((docs_np - q) ** 2).sum(axis=1)
        order = np.argsort(s, kind="stable")
    return [int(ids[i]) for i in order[:k]]


@pytest.fixture(scope="module")
def docs_np(docs):
    rows = docs.orderBy("_docid").collect()
    ids = np.array([r._docid for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, mat


@pytest.mark.parametrize("metric", ["IP", "L2"])
def test_knn_join_matches_numpy(docs, queries, docs_np, metric):
    ids, mat = docs_np
    res = knn.knn_join(docs, queries, k=5, metric=metric).collect()
    got = {}
    for r in res:
        got.setdefault(r.qid, []).append((r.rank, r._docid))
    qrows = {r.qid: np.array(r.qvec, dtype=np.float64) for r in queries.collect()}
    for qid, hits in got.items():
        expect = numpy_topk(mat, ids, qrows[qid], 5, metric)
        assert [d for _, d in sorted(hits)] == expect


@pytest.mark.parametrize("metric", ["IP", "L2", "COSINE"])
def test_knn_scan_matches_join(docs, queries, metric):
    a = knn.knn_join(docs, queries, k=10, metric=metric)
    b = knn.knn_scan(docs, queries, k=10, metric=metric)
    ja = {(r.qid, r.rank): r._docid for r in a.collect()}
    jb = {(r.qid, r.rank): r._docid for r in b.collect()}
    assert ja == jb


def test_self_recall(docs, queries):
    """Mirrors the reference's self-recall assertion: querying with an
    indexed vector returns that doc at rank 1 with IP score ~ |v|^2
    (`tests/test.h:690`)."""
    res = knn.knn_join(docs, queries, k=1, metric="L2").collect()
    for r in res:
        assert r._docid == r.qid
        assert r.score < 1e-12


def test_prefilter_semantics(docs, queries):
    """Top-k of the filtered set, not filter of the top-k (SURVEY O1)."""
    pred = F.col("label") == 1
    res = knn.knn_join(docs, queries, k=5, metric="IP", predicate=pred)
    labels = {r._docid for r in res.collect()}
    allowed = {r._docid for r in docs.filter(pred).select("_docid").collect()}
    assert labels <= allowed
    res2 = knn.knn_scan(docs, queries, k=5, metric="IP", predicate=pred)
    assert {r._docid for r in res2.collect()} <= allowed


def test_score_band(docs, queries):
    """F8: hits outside [min_score, max_score] dropped before top-k."""
    res = knn.knn_join(docs, queries, k=100, metric="IP", min_score=0.0, max_score=0.5)
    for r in res.collect():
        assert 0.0 <= r.score <= 0.5
    res2 = knn.knn_scan(docs, queries, k=100, metric="IP", min_score=0.0, max_score=0.5)
    ja = {(r.qid, r.rank): r._docid for r in res.collect()}
    jb = {(r.qid, r.rank): r._docid for r in res2.collect()}
    assert ja == jb


def test_deleted_mask(docs, queries, spark):
    """F7: deleted docs never surface."""
    with_del = docs.withColumn("_deleted", F.col("_docid") % 2 == 0)
    res = knn.knn_join(with_del, queries, k=5, metric="IP")
    assert all(r._docid % 2 == 1 for r in res.collect())


def test_scan_kernel_tie_order_on_duplicate_vectors(spark):
    """Exact duplicate vectors tie on every metric; the scan kernel's
    partition-local top-k must keep the SMALLEST docids among boundary
    ties, matching the window-path (oracle) tie order."""
    base = [[1.0, 0.0], [0.9, 0.1], [0.5, 0.5]]
    rows = []
    for rep in range(6):  # 18 docs: six copies of each vector
        for j, v in enumerate(base):
            rows.append((rep * 3 + j, v))
    docs = spark.createDataFrame(rows, "_docid long, embedding array<float>")
    queries = spark.createDataFrame([(0, [1.0, 0.0])], "qid long, qvec array<float>")
    for metric in ("IP", "L2", "COSINE"):
        a = {(r.qid, r.rank): (r._docid, round(r.score, 9)) for r in
             knn.knn_scan(docs, queries, k=4, metric=metric).collect()}
        b = {(r.qid, r.rank): (r._docid, round(r.score, 9)) for r in
             knn.knn_join(docs, queries, k=4, metric=metric).collect()}
        assert a == b, metric


def test_null_vectors_fail_loud_or_rank_last(spark, docs, queries):
    """r10 dirty-vector contract: gamma zero-fills absent vectors
    (SURVEY §1.2) and our kernels require fixed-length non-null input.
    The Arrow scan kernel must fail LOUDLY with the remediation in the
    message (not an opaque numpy stack error); the expression kernel's
    NULL scores must sort NULLS LAST (DuckDB's default) instead of
    displacing real results; zero_fill_vectors restores reference
    semantics and makes both paths agree."""
    from gamma_spark.functions.vector import stack_vectors, zero_fill_vectors

    dirty = docs.withColumn(
        "embedding",
        F.when(F.col("_docid") % 5 == 0, F.lit(None)).otherwise(
            F.col("embedding")
        ),
    )
    # expression kernel: NULL-vector docs never displace real results
    out = knn.knn_join(dirty, queries, k=5, metric="L2")
    rows = out.collect()
    assert rows and all(r.score is not None for r in rows)
    assert all(r._docid % 5 != 0 for r in rows)

    # Arrow scan kernel: loud, actionable error
    with pytest.raises(Exception, match="zero_fill_vectors"):
        knn.knn_scan(dirty, queries, k=5, metric="L2").collect()

    # zero-fill restores gamma's absent-field-is-zero semantics: both
    # kernels agree, and the zero vector scores exactly ||q||^2 on L2
    dim = len(docs.select("embedding").first()[0])
    filled = zero_fill_vectors(dirty, "embedding", dim)
    a = {(r.qid, r._docid, round(r.score, 6))
         for r in knn.knn_join(filled, queries, k=5, metric="L2").collect()}
    b = {(r.qid, r._docid, round(r.score, 6))
         for r in knn.knn_scan(filled, queries, k=5, metric="L2").collect()}
    assert a == b

    # stack_vectors: ragged rows also diagnosed
    import pandas as pd

    with pytest.raises(ValueError, match="fixed-length"):
        stack_vectors(
            pd.Series([[1.0, 2.0], [1.0]]).to_numpy(), "unit"
        )
