"""Multi-vector fusion (SURVEY R2-R4) + the search planner end to end."""

import pytest
from pyspark.sql import functions as F

from gamma_spark import filters as GF
from gamma_spark.operators import knn
from gamma_spark.operators.fusion import fuse
from gamma_spark.plans.search import SearchRequest, VectorQuery, search


@pytest.fixture(scope="module")
def docs(embeddings):
    # fabricate a second vector field: reversed embedding (independent order)
    return (
        embeddings.withColumnRenamed("vec_id", "_docid")
        .withColumn("emb2", F.reverse(F.col("embedding")))
    )


@pytest.fixture(scope="module")
def queries(spark, docs):
    rows = docs.orderBy("_docid").limit(5).collect()
    q1 = spark.createDataFrame(
        [(int(r._docid), [float(x) for x in r.embedding]) for r in rows],
        "qid long, qvec array<float>",
    )
    q2 = spark.createDataFrame(
        [(int(r._docid), [float(x) for x in r.emb2]) for r in rows],
        "qid long, qvec array<float>",
    )
    return q1, q2


def test_fusion_intersects_and_sums(docs, queries):
    q1, q2 = queries
    k = 20
    r1 = knn.knn_join(docs, q1, k=k, metric="IP", doc_vec="embedding")
    r2 = knn.knn_join(docs, q2, k=k, metric="IP", doc_vec="emb2")
    fused = fuse([r1, r2], boosts=[0.7, 0.3], metric="IP", k=5)
    rows = fused.collect()
    s1 = {(r.qid, r._docid): r.score for r in r1.collect()}
    s2 = {(r.qid, r._docid): r.score for r in r2.collect()}
    for r in rows:
        key = (r.qid, r._docid)
        assert key in s1 and key in s2  # intersection on docid (R2)
        assert abs(r.score - (0.7 * s1[key] + 0.3 * s2[key])) < 1e-9  # R3
    # self-match should fuse to top rank per query
    for r in rows:
        if r.rank == 1:
            assert r._docid == r.qid


def test_planner_single_field(docs, queries):
    q1, _ = queries
    req = SearchRequest(
        vector_queries=[VectorQuery(field="embedding", queries=q1, metric="IP")],
        filters=[GF.RangeFilter("label", lower=0)],
        topn=3,
        fields=["label"],
    )
    res = search(docs, req).collect()
    assert len(res) == 15
    assert {c for c in res[0].asDict()} == {"qid", "_docid", "score", "rank", "label"}


def test_planner_multi_field_fusion(docs, queries):
    q1, q2 = queries
    req = SearchRequest(
        vector_queries=[
            VectorQuery(field="embedding", queries=q1, metric="IP", boost=0.7),
            VectorQuery(field="emb2", queries=q2, metric="IP", boost=0.3),
        ],
        topn=5,
    )
    res = search(docs, req).collect()
    assert all(r.rank <= 5 for r in res)


def test_planner_filter_only(documents):
    docs = documents.withColumn("_docid", F.col("doc_id"))
    req = SearchRequest(filters=[GF.TermFilter("lang", ("de",), GF.TERM_OR)], topn=7)
    res = search(docs, req).collect()
    assert len(res) == 7
    assert all(r.lang == "de" for r in res)


@pytest.mark.parametrize("salts", [1, 3])
def test_fusion_distributed_legs_match_request_path(docs, salts):
    """R2 fusion composed from two corpus-scale knn_join_distributed
    legs (VERDICT r4 #3): with full probes + exact rescore — salted or
    not, on a skew-heavy corpus (the synthetic table IS cluster-skewed
    at 16 centroids) — the fused result must equal the bounded-query
    request path (knn_join legs) exactly."""
    from gamma_spark.operators.ivf import IvfFlatIndex

    k_field, k_fuse = 20, 5
    sub = docs.limit(120)
    q1 = sub.select(F.col("_docid").alias("qid"), F.col("embedding").alias("qvec"))
    q2 = sub.select(F.col("_docid").alias("qid"), F.col("emb2").alias("qvec"))

    idx1 = IvfFlatIndex.build(sub, doc_vec="embedding", ncentroids=8, seed=42)
    idx2 = IvfFlatIndex.build(sub, doc_vec="emb2", ncentroids=8, seed=43)
    d1 = idx1.knn_join_distributed(
        q1, k=k_field, metric="IP", nprobe=8, rescore=True, salts=salts
    )
    d2 = idx2.knn_join_distributed(
        q2, k=k_field, metric="IP", nprobe=8, rescore=True, salts=salts,
        doc_vec="emb2",
    )
    got = fuse([d1, d2], boosts=[0.7, 0.3], metric="IP", k=k_fuse)

    r1 = knn.knn_join(sub, q1, k=k_field, metric="IP", doc_vec="embedding")
    r2 = knn.knn_join(sub, q2, k=k_field, metric="IP", doc_vec="emb2")
    want = fuse([r1, r2], boosts=[0.7, 0.3], metric="IP", k=k_fuse)

    gd = {(r.qid, r._docid): (r.score, r.rank) for r in got.collect()}
    wd = {(r.qid, r._docid): (r.score, r.rank) for r in want.collect()}
    assert gd == wd


def test_mixed_direction_metrics_rejected(docs):
    """ADVICE r9: the fused score Σ boost·score has no defined ordering
    when legs mix IP (descending) with L2 (ascending) — the planner
    rejects the request instead of ranking the pool by the first leg's
    direction."""
    q = docs.limit(2).select(
        F.col("_docid").alias("qid"), F.col("embedding").alias("qvec")
    )
    req = SearchRequest(
        vector_queries=[
            VectorQuery(field="embedding", queries=q, metric="IP"),
            VectorQuery(field="emb2", queries=q, metric="L2"),
        ],
        topn=5,
    )
    with pytest.raises(ValueError, match="ordering direction"):
        search(docs, req)
    # IP + COSINE share a direction: accepted
    req2 = SearchRequest(
        vector_queries=[
            VectorQuery(field="embedding", queries=q, metric="IP"),
            VectorQuery(field="emb2", queries=q, metric="COSINE"),
        ],
        topn=5,
    )
    assert search(docs, req2).columns  # plans fine


def test_filter_only_projection_has_unique_columns(documents):
    """ADVICE r9 (medium): F9 through search() with a field projection
    used to join the projection onto FULL doc rows — duplicate column
    names that broke any downstream select. The result now carries each
    requested column exactly once and stays selectable."""
    docs = documents.withColumn("_docid", F.col("doc_id"))
    req = SearchRequest(
        filters=[GF.TermFilter("lang", ("de",), GF.TERM_OR)],
        topn=7,
        fields=["lang", "text"],
    )
    out = search(docs, req)
    assert len(out.columns) == len(set(out.columns))
    assert set(out.columns) == {"_docid", "total", "lang", "text"}
    rows = out.select("lang", "total").collect()  # no AMBIGUOUS_REFERENCE
    assert rows and all(r.lang == "de" for r in rows)
    # without a projection the F9 contract stays full-doc rows
    plain = search(docs, SearchRequest(filters=[], topn=3))
    assert "text" in plain.columns and "total" in plain.columns
