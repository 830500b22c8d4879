"""Planner retrieval_params passthrough + brute-force fallback (O7)."""

import pytest
from pyspark.sql import functions as F

from gamma_spark.operators import knn
from gamma_spark.operators.ivf import IvfFlatIndex
from gamma_spark.plans.search import SearchRequest, VectorQuery, search

NCENT = 8


@pytest.fixture(scope="module")
def docs(embeddings):
    return embeddings.withColumnRenamed("vec_id", "_docid")


@pytest.fixture(scope="module")
def queries(spark, docs):
    rows = docs.orderBy("_docid").limit(4).collect()
    return spark.createDataFrame(
        [(int(r._docid), [float(x) for x in r.embedding]) for r in rows],
        "qid long, qvec array<float>",
    )


def test_retrieval_params_reach_index(docs, queries):
    idx = IvfFlatIndex.build(docs, ncentroids=NCENT, seed=42)
    req = SearchRequest(
        vector_queries=[
            VectorQuery(
                field="embedding", queries=queries, metric="L2",
                retrieval_params={"nprobe": NCENT, "strategy": "join"},
            )
        ],
        topn=5,
    )
    got = {(r.qid, r.rank): r._docid for r in search(docs, req, index=idx).collect()}
    want = {
        (r.qid, r.rank): r._docid
        for r in knn.knn_join(docs, queries, k=5, metric="L2").collect()
    }
    assert got == want


def test_brute_force_search_forces_flat(docs, queries):
    """brute_force_search=1 must bypass the index entirely (gamma's
    guard, `search/gamma_engine.cc:329-340`) — same result as FLAT."""
    idx = IvfFlatIndex.build(docs, ncentroids=NCENT, seed=42)
    req = SearchRequest(
        vector_queries=[
            VectorQuery(
                field="embedding", queries=queries, metric="L2",
                retrieval_params={"brute_force_search": 1},
            )
        ],
        topn=5,
    )
    got = {(r.qid, r.rank): r._docid for r in search(docs, req, index=idx).collect()}
    want = {
        (r.qid, r.rank): r._docid
        for r in knn.knn_join(docs, queries, k=5, metric="L2").collect()
    }
    assert got == want


def test_no_index_means_flat(docs, queries):
    req = SearchRequest(
        vector_queries=[VectorQuery(field="embedding", queries=queries, metric="IP")],
        topn=3,
    )
    res = search(docs, req, index=None).collect()
    assert all(r.rank <= 3 for r in res)
    top1 = {r.qid: r._docid for r in res if r.rank == 1}
    assert all(top1[q] == q for q in top1)
