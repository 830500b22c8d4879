"""Top-level public API: a reference user's whole workflow through
`import gamma_spark` — create table, search, upsert, delete, snapshot."""

from pyspark.sql import functions as F

import gamma_spark as gs


def test_end_to_end_user_workflow(tmp_path, spark, embeddings):
    table = gs.GammaTable(spark, embeddings.withColumnRenamed("vec_id", "_id"))
    assert table.doc_count() == embeddings.count()

    rows = table.df.orderBy("_id").limit(3).collect()
    queries = spark.createDataFrame(
        [(int(r._id), [float(x) for x in r.embedding]) for r in rows],
        "qid long, qvec array<float>",
    )
    req = gs.SearchRequest(
        vector_queries=[gs.VectorQuery(field="embedding", queries=queries, metric="L2")],
        filters=[gs.RangeFilter("label", lower=0)],
        topn=5,
        fields=["label"],
    )
    hits = table.search(req).collect()
    assert len(hits) == 15
    top1 = {r.qid: r._docid for r in hits if r.rank == 1}
    assert all(top1[q] == q for q in top1)

    # upsert + delete + snapshot round trip
    t2, deleted = table.delete_by_filter([gs.RangeFilter("label", 2, 2)])
    n_del = deleted.count()
    assert t2.doc_count() == table.doc_count() - n_del
    t2.dump(str(tmp_path))
    loaded = gs.GammaTable.load(spark, str(tmp_path))
    assert loaded.doc_count() == t2.doc_count()

    # index through the registry
    model = gs.get_model("IVFFLAT")
    idx = model.build(t2.df, ncentroids=8, seed=42)
    res = idx.search(None, queries, k=3, metric="L2", nprobe=8)
    assert res.count() == 9


def test_requested_field_colliding_with_engine_column_raises(spark, embeddings):
    """r11 review: a requested doc field whose name collides with an
    engine result column (score/rank/qid/total) cannot be represented
    in the flat-column result — the first r11 shape of the ADVICE r10
    projection fix silently substituted the ENGINE value for the
    stored field. It must raise with the remediation instead. Names
    that are engine-only (no such doc column) still pass through to
    the engine column, and `_docid` is exempt (engine value == doc
    value)."""
    import pytest

    docs = (
        embeddings.withColumnRenamed("vec_id", "_docid")
        .withColumn("score", F.lit(1.0))
    )
    rows = docs.orderBy("_docid").limit(2).collect()
    queries = spark.createDataFrame(
        [(int(r._docid), [float(x) for x in r.embedding]) for r in rows],
        "qid long, qvec array<float>",
    )
    req = gs.SearchRequest(
        vector_queries=[gs.VectorQuery(field="embedding", queries=queries, metric="L2")],
        topn=3,
        fields=["score"],
    )
    from gamma_spark.plans.search import search as plan_search

    with pytest.raises(ValueError, match="collide"):
        plan_search(docs, req).collect()

    # engine-only name on the filter-only path: docs has no `total`
    # column, so fields=["total"] means the engine total and works
    req2 = gs.SearchRequest(topn=3, fields=["total", "label"])
    out = plan_search(docs.drop("score"), req2)
    assert set(out.columns) == {"_docid", "total", "label"}
    assert out.count() == 3

    # _docid stays exempt: requesting it alongside a real field works
    req3 = gs.SearchRequest(
        vector_queries=[gs.VectorQuery(field="embedding", queries=queries, metric="L2")],
        topn=3,
        fields=["_docid", "label"],
    )
    assert plan_search(docs.drop("score"), req3).count() == 6
