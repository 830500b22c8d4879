"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` carries the
DuckDB-equivalent SQL. Column names AND types are aligned on both sides;
all floating-point score arithmetic is written so Spark and DuckDB
produce bit-identical doubles (in-order double accumulation — see
gamma_spark/functions/vector.py), and money-style aggregates go through
DECIMAL so sums are order-independent and exact.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gamma_spark import filters as GF
from gamma_spark.functions import vector as V
from gamma_spark.operators import knn
from gamma_spark.operators.fusion import fuse
from gamma_spark.table import GammaTable

# ---------------------------------------------------------------------------
# shared constants (Spark + oracle must agree)
# ---------------------------------------------------------------------------
KNN_K = 10
KNN_NQ = 8  # query vectors = embeddings with vec_id < KNN_NQ
FUSE_K_PER_FIELD = 20
FUSE_K = 5
FUSE_B1, FUSE_B2 = 0.7, 0.3
BAND_LO, BAND_HI = 0.0, 0.5
LOOKUP_ID = 123
EMB_NEARDUP_T = 0.35  # synthetic vectors: max pairwise cosine ~0.51


#: inferred-schema cache per parquet path (r12, guide §1.2 "the driver
#: is part of the job"): a bare spark.read.parquet() runs a one-task
#: footer-inference JOB on every call, and the query constructors read
#: each table 1-4 times per invocation — measured 0.10 s/read inferred
#: vs 0.018 s schema-pinned at sf0.1 (the suite pays hundreds of such
#: reads). The testdata tables are immutable fixtures, so the schema is
#: a pure function of the path; a failed inference (the events
#: TIMESTAMP(NANOS) fallback) raises before anything is cached. This is
#: metadata caching only — every query still computes from the parquet
#: inputs.
_SCHEMA_CACHE: dict = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    cached = _SCHEMA_CACHE.get(path)
    if cached is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[path] = df.schema
        return df
    return spark.read.schema(cached).parquet(path)


def _scratch_dir(prefix: str) -> str:
    """mkdtemp whose removal is deferred to interpreter exit: the
    returned DataFrames read these dirs lazily (the driver collects
    AFTER the query callable returns), so the dir must outlive the
    call — but not the process. atexit keeps /tmp clean across
    driver/bench runs."""
    import atexit
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    return root


def _docs(spark, sf_dir) -> DataFrame:
    return _t(spark, sf_dir, "embeddings").withColumnRenamed("vec_id", "_docid")


def _queries_df(spark, sf_dir) -> DataFrame:
    return (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < KNN_NQ)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    )


# ---------------------------------------------------------------------------
# kNN family (SURVEY K1/F7/F8/R5)
# ---------------------------------------------------------------------------

def q_knn_ip(spark, sf_dir):
    return knn.knn_join(_docs(spark, sf_dir), _queries_df(spark, sf_dir), k=KNN_K, metric="IP")


def q_knn_l2(spark, sf_dir):
    return knn.knn_join(_docs(spark, sf_dir), _queries_df(spark, sf_dir), k=KNN_K, metric="L2")


def q_knn_cosine(spark, sf_dir):
    return knn.knn_join(_docs(spark, sf_dir), _queries_df(spark, sf_dir), k=KNN_K, metric="COSINE")


def q_knn_metrics_topk(spark, sf_dir):
    """K1 exact kNN across all three DistanceComputeTypes (IP / L2 /
    Cosine, `index/retrieval_model.h:20`) as ONE relation with a metric
    discriminator column — consolidates three registry slots into one so
    the 50-query driver window covers the whole registry (VERDICT r3 #1)
    while keeping every metric hash-checked."""
    parts = []
    for metric in ("IP", "L2", "COSINE"):
        parts.append(
            knn.knn_join(
                _docs(spark, sf_dir), _queries_df(spark, sf_dir), k=KNN_K, metric=metric
            ).withColumn("metric", F.lit(metric))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def q_knn_ip_filtered(spark, sf_dir):
    return knn.knn_join(
        _docs(spark, sf_dir),
        _queries_df(spark, sf_dir),
        k=KNN_K,
        metric="IP",
        predicate=F.col("label") == 1,
    )


def q_knn_ip_banded(spark, sf_dir):
    return knn.knn_join(
        _docs(spark, sf_dir),
        _queries_df(spark, sf_dir),
        k=KNN_K,
        metric="IP",
        min_score=BAND_LO,
        max_score=BAND_HI,
    )


def q_knn_ip_filtered_banded(spark, sf_dir):
    """The composite request shape gamma actually serves — term filter
    AND score band AND kNN in ONE request (F6 ∧ F8 pre-band inside the
    scan, `common/gamma_common_data.h:95-108` + `gamma_index_flat.cc:
    200-225`). Consolidates the former knn_ip_filtered + knn_ip_banded
    registry rows (each feature also covered separately in pytest)."""
    return knn.knn_join(
        _docs(spark, sf_dir),
        _queries_df(spark, sf_dir),
        k=KNN_K,
        metric="IP",
        predicate=F.col("label") == 1,
        min_score=BAND_LO,
        max_score=BAND_HI,
    )


def q_knn_hamming(spark, sf_dir):
    docs = _docs(spark, sf_dir).select(
        "_docid", V.sign_bits("embedding").alias("sig")
    )
    queries = _queries_df(spark, sf_dir).select(
        "qid", V.sign_bits("qvec").alias("qsig")
    )
    return knn.knn_join(
        docs, queries, k=KNN_K, metric="HAMMING", doc_vec="sig", query_vec="qsig"
    ).withColumn("score", F.col("score").cast("double"))


def q_knn_fusion(spark, sf_dir):
    docs = _docs(spark, sf_dir).withColumn("emb2", F.reverse(F.col("embedding")))
    q = _queries_df(spark, sf_dir)
    q2 = q.select("qid", F.reverse(F.col("qvec")).alias("qvec"))
    r1 = knn.knn_join(docs, q, k=FUSE_K_PER_FIELD, metric="IP", doc_vec="embedding")
    r2 = knn.knn_join(docs, q2, k=FUSE_K_PER_FIELD, metric="IP", doc_vec="emb2")
    return fuse([r1, r2], boosts=[FUSE_B1, FUSE_B2], metric="IP", k=FUSE_K)


def q_knn_fusion_distributed(spark, sf_dir):
    """R2 multi-vector fusion at CORPUS query scale (VERDICT r4 #3):
    each field's top-k comes through ``knn_join_distributed`` (two
    independently built IVF indexes, one per field; queries = every
    embedding, never collected), then the same ``fuse()`` used on the
    request path intersects docids and boost-sums scores — the
    multi-field semantic-dedup shape (`vector/vector_manager.cc:512-561`
    with |Q| ~ |corpus|). nprobe == ncentroids + exact rescore
    degenerates each leg to exact, so the fused result hash-matches the
    all-pairs fused oracle bit-for-bit."""
    from gamma_spark.operators.ivf import IvfFlatIndex

    docs = _docs(spark, sf_dir).withColumn("emb2", F.reverse(F.col("embedding")))
    idx1 = IvfFlatIndex.build(docs, doc_vec="embedding", ncentroids=IVF_NCENT, seed=42)
    idx2 = IvfFlatIndex.build(docs, doc_vec="emb2", ncentroids=IVF_NCENT, seed=43)
    q1 = docs.select(F.col("_docid").alias("qid"), F.col("embedding").alias("qvec"))
    q2 = docs.select(F.col("_docid").alias("qid"), F.col("emb2").alias("qvec"))
    r1 = idx1.knn_join_distributed(
        q1, k=FUSE_K_PER_FIELD, metric="IP", nprobe=IVF_NCENT, rescore=True
    )
    r2 = idx2.knn_join_distributed(
        q2, k=FUSE_K_PER_FIELD, metric="IP", nprobe=IVF_NCENT, rescore=True,
        doc_vec="emb2",
    )
    return fuse([r1, r2], boosts=[FUSE_B1, FUSE_B2], metric="IP", k=FUSE_K)


def q_knn_fusion_variants(spark, sf_dir):
    """R2/R3/R4 fusion as ONE relation with a variant column: the
    bounded-query request shape (TOPK) and the corpus-scale distributed
    composition (DISTRIBUTED) — both hash-checked."""
    parts = [
        q_knn_fusion(spark, sf_dir).withColumn("variant", F.lit("TOPK")),
        q_knn_fusion_distributed(spark, sf_dir).withColumn(
            "variant", F.lit("DISTRIBUTED")
        ),
    ]
    return parts[0].unionByName(parts[1])


IVF_NCENT = 16


def q_knn_ivfflat_exact(spark, sf_dir):
    """IVFFLAT with nprobe == ncentroids degenerates to exact brute force
    (SURVEY §5) — the oracle-checkable configuration; pruned-nprobe recall
    is covered by tests/test_ann.py."""
    from gamma_spark.operators.ivf import IvfFlatIndex

    docs = _docs(spark, sf_dir)
    idx = IvfFlatIndex.build(docs, ncentroids=IVF_NCENT, seed=42)
    return idx.search(None, _queries_df(spark, sf_dir), k=KNN_K, metric="L2", nprobe=IVF_NCENT)


def q_knn_ivfpq_rerank_exact(spark, sf_dir):
    """IVFPQ with full probes + recall_num = N + exact rerank: the ADC
    stage orders candidates, the rerank recomputes exact distances for
    all of them, so the result equals exact brute force while exercising
    the whole codes->ADC->rerank pipeline."""
    from gamma_spark.operators.pq import IvfPqIndex

    docs = _docs(spark, sf_dir)
    n = docs.count()
    pq = IvfPqIndex.build(docs, ncentroids=IVF_NCENT, nsubvector=8, seed=42)
    return pq.search(
        docs, _queries_df(spark, sf_dir), k=KNN_K, metric="L2",
        nprobe=IVF_NCENT, recall_num=n, has_rank=True,
    )


def q_knn_ivfpq_opq_exact(spark, sf_dir):
    """IVFPQ with OPQ rotation, full probes + full recall + rerank —
    exercises residual encoding AND the rotation end to end while
    remaining equal to exact brute force."""
    from gamma_spark.operators.pq import IvfPqIndex

    docs = _docs(spark, sf_dir)
    n = docs.count()
    pq = IvfPqIndex.build(docs, ncentroids=IVF_NCENT, nsubvector=8, seed=42, opq=True)
    return pq.search(
        docs, _queries_df(spark, sf_dir), k=KNN_K, metric="L2",
        nprobe=IVF_NCENT, recall_num=n, has_rank=True,
    )


def q_knn_ivfpq_fastscan_exact(spark, sf_dir):
    """K4 IVFPQFastScan parity (`index/impl/gamma_index_ivfpqfs.cc`):
    the defining property is 4-bit PQ codes (16-centroid subspace
    codebooks — the SIMD register-shuffle scan is an execution detail;
    our analogue is the same vectorized ADC LUT kernel). Full probes +
    full recall + exact rerank makes it exact-degenerate -> oracle."""
    from gamma_spark.operators.pq import IvfPqIndex

    docs = _docs(spark, sf_dir)
    n = docs.count()
    pq = IvfPqIndex.build(docs, ncentroids=IVF_NCENT, nsubvector=8, nbits=4, seed=42)
    return pq.search(
        docs, _queries_df(spark, sf_dir), k=KNN_K, metric="L2",
        nprobe=IVF_NCENT, recall_num=n, has_rank=True,
    )


def q_knn_binaryivf_exact(spark, sf_dir):
    """BINARYIVF with full probes == exact Hamming top-k."""
    from gamma_spark.operators.ann import BinaryIvfIndex

    docs = _docs(spark, sf_dir)
    idx = BinaryIvfIndex.build(docs, ncentroids=IVF_NCENT, seed=42)
    res = idx.search(None, _queries_df(spark, sf_dir), k=KNN_K, nprobe=IVF_NCENT)
    return res.withColumn("score", F.col("score").cast("double"))


def _sql_knn(score_expr: str, order: str, where: str = "", band: str = "", k: int = KNN_K) -> str:
    return f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < {KNN_NQ}),
s AS (
  SELECT q.qid, e.vec_id AS _docid, {score_expr} AS score
  FROM embeddings e CROSS JOIN q {where}
)
SELECT qid, _docid, score, rank::INT AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score {order}, _docid ASC) AS rank
  FROM s {band}
) t WHERE rank <= {k}
"""


SQL_KNN_IP = _sql_knn(V.sql_dot("e.embedding", "q.qvec"), "DESC")
SQL_KNN_L2 = _sql_knn(V.sql_l2_squared("e.embedding", "q.qvec"), "ASC")
SQL_KNN_COSINE = _sql_knn(V.sql_cosine("e.embedding", "q.qvec"), "DESC")
SQL_KNN_METRICS = " UNION ALL ".join(
    f"SELECT t.*, '{m}' AS metric FROM ({sql}) t"
    for m, sql in (("IP", SQL_KNN_IP), ("L2", SQL_KNN_L2), ("COSINE", SQL_KNN_COSINE))
)
SQL_KNN_IP_FILTERED = _sql_knn(
    V.sql_dot("e.embedding", "q.qvec"), "DESC", where="WHERE e.label = 1"
)
SQL_KNN_IP_BANDED = _sql_knn(
    V.sql_dot("e.embedding", "q.qvec"),
    "DESC",
    band=f"WHERE score >= {BAND_LO} AND score <= {BAND_HI}",
)
SQL_KNN_IP_FILTERED_BANDED = _sql_knn(
    V.sql_dot("e.embedding", "q.qvec"),
    "DESC",
    where="WHERE e.label = 1",
    band=f"WHERE score >= {BAND_LO} AND score <= {BAND_HI}",
)
SQL_KNN_HAMMING = f"""
WITH d AS (SELECT vec_id AS _docid, {V.sql_sign_bits('embedding')} AS sig FROM embeddings),
q AS (SELECT vec_id AS qid, {V.sql_sign_bits('embedding')} AS qsig FROM embeddings WHERE vec_id < {KNN_NQ}),
s AS (SELECT q.qid, d._docid, {V.sql_hamming('d.sig', 'q.qsig')} AS score FROM d CROSS JOIN q)
SELECT qid, _docid, score::DOUBLE AS score, rank::INT AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score ASC, _docid ASC) AS rank FROM s
) t WHERE rank <= {KNN_K}
"""
SQL_KNN_FUSION = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < {KNN_NQ}),
r1 AS (
  SELECT qid, _docid, score FROM (
    SELECT q.qid, e.vec_id AS _docid, {V.sql_dot('e.embedding', 'q.qvec')} AS score,
           row_number() OVER (PARTITION BY q.qid ORDER BY {V.sql_dot('e.embedding', 'q.qvec')} DESC, e.vec_id ASC) AS rn
    FROM embeddings e CROSS JOIN q) t WHERE rn <= {FUSE_K_PER_FIELD}
),
r2 AS (
  SELECT qid, _docid, score FROM (
    SELECT q.qid, e.vec_id AS _docid,
           {V.sql_dot('list_reverse(e.embedding)', 'list_reverse(q.qvec)')} AS score,
           row_number() OVER (PARTITION BY q.qid ORDER BY {V.sql_dot('list_reverse(e.embedding)', 'list_reverse(q.qvec)')} DESC, e.vec_id ASC) AS rn
    FROM embeddings e CROSS JOIN q) t WHERE rn <= {FUSE_K_PER_FIELD}
),
fused AS (
  SELECT r1.qid, r1._docid, (r1.score * {FUSE_B1}) + (r2.score * {FUSE_B2}) AS score
  FROM r1 JOIN r2 ON r1.qid = r2.qid AND r1._docid = r2._docid
)
SELECT qid, _docid, score, rank::INT AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, _docid ASC) AS rank FROM fused
) t WHERE rank <= {FUSE_K}
"""

# corpus-scale twin: same fused relation with q = EVERY embedding
SQL_KNN_FUSION_DISTRIBUTED = SQL_KNN_FUSION.replace(
    f"WHERE vec_id < {KNN_NQ}", ""
)

SQL_KNN_FUSION_VARIANTS = (
    f"SELECT *, 'TOPK' AS variant FROM ({SQL_KNN_FUSION}) tv0"
    " UNION ALL "
    f"SELECT *, 'DISTRIBUTED' AS variant FROM ({SQL_KNN_FUSION_DISTRIBUTED}) tv1"
)


# ---------------------------------------------------------------------------
# filter engine (SURVEY F2-F9)
# ---------------------------------------------------------------------------

def q_filter_range_term(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    fs = [
        GF.RangeFilter("n_chars", 100, 400, include_lower=False, include_upper=True),
        GF.TermFilter("lang", ("en", "fr"), GF.TERM_OR),
        GF.TermFilter("source", ("src3",), GF.TERM_NOT_IN),
    ]
    return docs.filter(GF.combine(fs, docs)).select("doc_id", "lang", "source", "n_chars")


SQL_FILTER_RANGE_TERM = """
SELECT doc_id, lang, source, n_chars FROM documents
WHERE n_chars > 100 AND n_chars <= 400 AND lang IN ('en','fr') AND source NOT IN ('src3')
"""


def _tagged_docs(spark, sf_dir):
    """documents + a multi-valued tag column (gamma's \\x01-delimited
    term fields are semantically ARRAY<STRING> — SURVEY §1.2); tags are
    the doc's first three tokens."""
    from gamma_spark.functions import text as T

    return _t(spark, sf_dir, "documents").withColumn(
        "tags", F.slice(T.tokens("text"), 1, 3)
    )


SQL_TAGGED = "(SELECT *, string_split(text, ' ')[1:3] AS tags FROM documents)"


def q_knn_multivid_collapse(spark, sf_dir):
    """R1 vid->docid collapse: each doc carries TWO vectors for the same
    field (gamma's multi-vid case, `vector/vector_manager.cc:38-50`);
    the doc's score is its best vid score, then top-k over docs."""
    from gamma_spark.operators.fusion import collapse_vids
    from gamma_spark.operators.topk import topk

    emb = _t(spark, sf_dir, "embeddings")
    vids = emb.select(
        (F.col("vec_id") * 2).alias("_vid"),
        F.col("vec_id").alias("_docid"),
        F.col("embedding").alias("vec"),
    ).unionByName(
        emb.select(
            (F.col("vec_id") * 2 + 1).alias("_vid"),
            F.col("vec_id").alias("_docid"),
            F.reverse(F.col("embedding")).alias("vec"),
        )
    )
    q = _queries_df(spark, sf_dir)
    scored = vids.crossJoin(F.broadcast(q)).select(
        "qid", "_vid", "_docid", V.dot("vec", "qvec").alias("score")
    )
    collapsed = collapse_vids(scored, metric="IP")
    return topk(collapsed, ["qid"], "score", KNN_K, ascending=False, tiebreak_cols=["_docid"])


SQL_KNN_MULTIVID_COLLAPSE = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < {KNN_NQ}),
vids AS (
  SELECT vec_id AS _docid, embedding AS vec FROM embeddings
  UNION ALL
  SELECT vec_id AS _docid, list_reverse(embedding) AS vec FROM embeddings
),
collapsed AS (
  SELECT q.qid, v._docid, max({V.sql_dot('v.vec', 'q.qvec')}) AS score
  FROM vids v CROSS JOIN q GROUP BY 1, 2
)
SELECT qid, _docid, score, rank::INT AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, _docid ASC) AS rank
  FROM collapsed
) t WHERE rank <= {KNN_K}
"""


def q_filter_tags_and(spark, sf_dir):
    """F4: term AND over a multi-value tag field — doc must carry every
    requested tag."""
    docs = _tagged_docs(spark, sf_dir)
    fs = [GF.TermFilter("tags", ("data", "row"), GF.TERM_AND)]
    return docs.filter(GF.combine(fs, docs)).select(
        "doc_id", F.array_join("tags", ",").alias("tags_csv")
    )


SQL_FILTER_TAGS_AND = f"""
SELECT doc_id, array_to_string(tags, ',') AS tags_csv FROM {SQL_TAGGED}
WHERE list_contains(tags, 'data') AND list_contains(tags, 'row')
"""


def q_filter_tags_or_notin(spark, sf_dir):
    """F3 + F5 on tag arrays: overlap with an OR set, excluding a NOT-IN
    set."""
    docs = _tagged_docs(spark, sf_dir)
    fs = [
        GF.TermFilter("tags", ("data", "row", "key"), GF.TERM_OR),
        GF.TermFilter("tags", ("slow",), GF.TERM_NOT_IN),
    ]
    return docs.filter(GF.combine(fs, docs)).select(
        "doc_id", F.array_join("tags", ",").alias("tags_csv")
    )


SQL_FILTER_TAGS_OR_NOTIN = f"""
SELECT doc_id, array_to_string(tags, ',') AS tags_csv FROM {SQL_TAGGED}
WHERE len(list_intersect(tags, ['data','row','key'])) > 0
  AND NOT len(list_intersect(tags, ['slow'])) > 0
"""


def q_search_projected_l2sqrt(spark, sf_dir):
    """The full Search shape (SURVEY §3.1): pre-filter AND kNN with
    l2_sqrt score presentation (`idl/fbs/request.fbs:39`) AND field
    projection (P1) through the planner."""
    from gamma_spark.plans.search import SearchRequest, VectorQuery, search

    docs = _docs(spark, sf_dir)
    req = SearchRequest(
        vector_queries=[VectorQuery(field="embedding", queries=_queries_df(spark, sf_dir), metric="L2")],
        topn=KNN_K,
        fields=["label"],
        l2_sqrt=True,
    )
    return search(docs, req, extra_predicate=F.col("label").isin(0, 1, 2))


SQL_SEARCH_PROJECTED_L2SQRT = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < {KNN_NQ}),
s AS (
  SELECT q.qid, e.vec_id AS _docid, sqrt({{l2sq}}) AS score, e.label
  FROM embeddings e CROSS JOIN q WHERE e.label IN (0, 1, 2)
)
SELECT _docid, qid, score, rank::INT AS rank, label FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score ASC, _docid ASC) AS rank
  FROM s
) t WHERE rank <= {KNN_K}
""".replace("{l2sq}", V.sql_l2_squared("e.embedding", "q.qvec"))


def q_search_with_total(spark, sf_dir):
    """R8 result-packing parity: every hit carries ``total`` = the
    filter-survivor count (`search/gamma_engine.cc:448-449`) and a
    ``_source`` payload of the stored fields
    (`c_api/api_data/gamma_response.cc:215-260`)."""
    from gamma_spark.plans.search import SearchRequest, VectorQuery, search

    docs = _docs(spark, sf_dir)
    req = SearchRequest(
        vector_queries=[VectorQuery(field="embedding", queries=_queries_df(spark, sf_dir), metric="L2")],
        topn=KNN_K,
        source_fields=["_docid", "label"],
        with_total=True,
    )
    return search(docs, req, extra_predicate=F.col("label").isin(0, 1))


SQL_SEARCH_WITH_TOTAL = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < {KNN_NQ}),
m AS (SELECT * FROM embeddings WHERE label IN (0, 1)),
s AS (
  SELECT q.qid, e.vec_id AS _docid, {{l2sq}} AS score,
         '{{"_docid":' || e.vec_id || ',"label":' || e.label || '}}' AS _source
  FROM m e CROSS JOIN q
)
SELECT _docid, qid, score, rank::INT AS rank, _source,
       (SELECT count(*) FROM m) AS total
FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score ASC, _docid ASC) AS rank
  FROM s
) t WHERE rank <= {KNN_K}
""".replace("{l2sq}", V.sql_l2_squared("e.embedding", "q.qvec"))


def q_search_request_full(spark, sf_dir):
    """EVERY SearchRequest feature in one request — pre-filter, kNN
    with l2_sqrt presentation (`idl/fbs/request.fbs:39`), P1 field
    projection, R8 `_source` packing + `total` = filter-survivor count
    (`search/gamma_engine.cc:448-449`, `gamma_response.cc:215-260`).
    Consolidates the former search_projected_l2sqrt + search_with_total
    registry rows (both shapes stay covered in tests/test_plans.py)."""
    from gamma_spark.plans.search import SearchRequest, VectorQuery, search

    docs = _docs(spark, sf_dir)
    req = SearchRequest(
        vector_queries=[
            VectorQuery(
                field="embedding", queries=_queries_df(spark, sf_dir), metric="L2"
            )
        ],
        topn=KNN_K,
        fields=["label"],
        source_fields=["_docid", "label"],
        with_total=True,
        l2_sqrt=True,
    )
    return search(docs, req, extra_predicate=F.col("label").isin(0, 1))


SQL_SEARCH_REQUEST_FULL = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < {KNN_NQ}),
m AS (SELECT * FROM embeddings WHERE label IN (0, 1)),
s AS (
  SELECT q.qid, e.vec_id AS _docid, sqrt({{l2sq}}) AS score, e.label,
         '{{"_docid":' || e.vec_id || ',"label":' || e.label || '}}' AS _source
  FROM m e CROSS JOIN q
)
SELECT _docid, qid, score, rank::INT AS rank, label, _source,
       (SELECT count(*) FROM m) AS total
FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score ASC, _docid ASC) AS rank
  FROM s
) t WHERE rank <= {KNN_K}
""".replace("{l2sq}", V.sql_l2_squared("e.embedding", "q.qvec"))


def q_filter_only_topn(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").withColumn("_docid", F.col("doc_id"))
    fs = [GF.TermFilter("lang", ("en",), GF.TERM_OR), GF.RangeFilter("n_chars", lower=200)]
    res = GF.filter_only_query(docs, fs, topn=20)
    return res.select("doc_id", "lang", "n_chars", "total")


SQL_FILTER_ONLY_TOPN = """
WITH m AS (SELECT * FROM documents WHERE lang = 'en' AND n_chars >= 200)
SELECT doc_id, lang, n_chars, (SELECT count(*) FROM m) AS total
FROM m ORDER BY doc_id LIMIT 20
"""


def q_point_lookup(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    table = GammaTable(spark, docs, id_col="doc_id")
    return table.get_doc_by_id(LOOKUP_ID).drop("_docid")


SQL_POINT_LOOKUP = f"SELECT doc_id, text, lang, source, n_chars FROM documents WHERE doc_id = {LOOKUP_ID}"


# ---------------------------------------------------------------------------
# DML (SURVEY S2-S4, F10) — simulated on the read-only testdata
# ---------------------------------------------------------------------------

def q_upsert_last_wins(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    table = GammaTable(spark, docs, id_col="doc_id")
    updates_stale = docs.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id",
        F.lit("stale").alias("text"),
        "lang",
        "source",
        F.col("n_chars"),
    )
    updates_final = docs.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id",
        F.concat(F.lit("updated:"), F.col("doc_id").cast("string")).alias("text"),
        "lang",
        "source",
        (F.col("n_chars") + 1000).alias("n_chars"),
    )
    inserts = docs.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.lit("new:"), F.col("doc_id").cast("string")).alias("text"),
        "lang",
        "source",
        F.col("doc_id").alias("n_chars"),
    )
    # batch order via explicit position column: stale rows first, final
    # rows later -> last write wins deterministically even when the
    # batch arrives multi-partition (VERDICT r2 #4 — no coalesce crutch)
    batch = (
        updates_stale.withColumn("_pos", F.lit(0))
        .unionByName(updates_final.withColumn("_pos", F.lit(1)))
        .unionByName(inserts.withColumn("_pos", F.lit(2)))
        .repartition(8)
    )
    merged = table.add_or_update(batch, order_col="_pos")
    return merged.df.select("doc_id", "text", "n_chars")


SQL_UPSERT_LAST_WINS = """
SELECT doc_id,
       CASE WHEN doc_id % 10 = 0 THEN 'updated:' || doc_id ELSE text END AS text,
       CASE WHEN doc_id % 10 = 0 THEN n_chars + 1000 ELSE n_chars END AS n_chars
FROM documents
UNION ALL
SELECT doc_id + 1000000 AS doc_id, 'new:' || doc_id AS text, doc_id AS n_chars
FROM documents WHERE doc_id < 5
"""


def q_upsert_chain(spark, sf_dir):
    """S2/S3 drip-feed shape: three successive AddOrUpdateDocs batches
    against a BucketedDocStore — each commit rewrites ONLY the buckets
    the batch's keys hash into (O(batch), the Spark analogue of the
    reference's in-place update, `search/gamma_engine.cc:761-800`),
    and each reload is a bare Parquet scan (no stacked lineage).

    The first batch also carries a within-batch duplicate-key pair
    (stale row at ``_pos`` 0, winner at ``_pos`` 1) so the S3
    duplicate-keys-fall-back-to-update last-write-wins contract
    (`search/gamma_engine.cc:676-759`) is hash-checked here —
    subsuming the former ``upsert_last_wins`` registry row."""
    from gamma_spark.table import BucketedDocStore

    docs = _t(spark, sf_dir, "documents")
    table = GammaTable(spark, docs, id_col="doc_id")
    root = _scratch_dir("gamma_upsert_chain_")
    b1_final = docs.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id",
        F.concat(F.lit("v1:"), F.col("doc_id").cast("string")).alias("text"),
        "lang",
        "source",
        (F.col("n_chars") + 1).alias("n_chars"),
    )
    b1_stale = b1_final.withColumn("text", F.lit("stale"))
    b1 = b1_stale.withColumn("_pos", F.lit(0)).unionByName(
        b1_final.withColumn("_pos", F.lit(1))
    )
    b2 = docs.filter(F.col("doc_id") % 20 == 0).select(
        "doc_id",
        F.concat(F.lit("v2:"), F.col("doc_id").cast("string")).alias("text"),
        "lang",
        "source",
        (F.col("n_chars") + 2).alias("n_chars"),
    )
    b3 = docs.filter(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.lit("ins:"), F.col("doc_id").cast("string")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    store = BucketedDocStore.create(table, root, nbuckets=16)
    store = store.upsert(b1, order_col="_pos")
    for b in (b2, b3):
        store = store.upsert(b)
    return store.table().df.select("doc_id", "text", "n_chars")


SQL_UPSERT_CHAIN = """
SELECT doc_id,
       CASE WHEN doc_id % 20 = 0 THEN 'v2:' || doc_id
            WHEN doc_id % 10 = 0 THEN 'v1:' || doc_id
            ELSE text END AS text,
       CASE WHEN doc_id % 20 = 0 THEN n_chars + 2
            WHEN doc_id % 10 = 0 THEN n_chars + 1
            ELSE n_chars END AS n_chars
FROM documents
UNION ALL
SELECT doc_id + 2000000 AS doc_id, 'ins:' || doc_id AS text, n_chars
FROM documents WHERE doc_id < 3
"""


def q_delete_by_filter(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    table = GammaTable(spark, docs, id_col="doc_id")
    _, deleted = table.delete_by_filter(
        [
            GF.TermFilter("lang", ("zh",), GF.TERM_OR),
            GF.RangeFilter("n_chars", 100, 300),
        ]
    )
    return deleted.select("doc_id")


SQL_DELETE_BY_FILTER = """
SELECT doc_id FROM documents WHERE lang = 'zh' AND n_chars >= 100 AND n_chars <= 300
"""


def q_snapshot_roundtrip(spark, sf_dir):
    """S5 Dump/Load (`search/gamma_engine.cc:1101-1146,1175-1285`):
    timestamped snapshot with a done-marker written last; Load picks the
    newest complete snapshot. Round-trip must reproduce the table
    exactly -> identity oracle."""
    docs = _t(spark, sf_dir, "documents")
    table = GammaTable(spark, docs, id_col="doc_id")
    root = _scratch_dir("gamma_snap_")
    table.dump(root)
    loaded = GammaTable.load(spark, root)
    return loaded.df.select("doc_id", "text", "lang", "source", "n_chars")


SQL_SNAPSHOT_ROUNDTRIP = """
SELECT doc_id, text, lang, source, n_chars FROM documents
"""


def q_migrate_export(spark, sf_dir):
    """S8 Migrate (`c_api/gamma_api.cc:238-255`, `storage/migrate_data.cc`):
    after an upsert batch and a delete-by-filter, export the delta vs the
    original snapshot — changed/new live docs plus tombstoned keys. A
    consumer replaying both onto the snapshot reconstructs the table."""
    docs = _t(spark, sf_dir, "documents")
    base = GammaTable(spark, docs, id_col="doc_id")
    updates = docs.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id",
        F.concat(F.lit("migrated:"), F.col("doc_id").cast("string")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    t2 = base.add_or_update(updates)
    t3, _ = t2.delete_by_filter([GF.RangeFilter("n_chars", lower=450)])
    ups, dels = t3.migrate_since(base)
    return ups.select(
        "doc_id", "text", F.lit("upsert").alias("kind")
    ).unionByName(
        dels.select(
            "doc_id",
            F.lit(None).cast("string").alias("text"),
            F.lit("delete").alias("kind"),
        )
    )


SQL_MIGRATE_EXPORT = """
SELECT doc_id, 'migrated:' || doc_id::VARCHAR AS text, 'upsert' AS kind
FROM documents WHERE doc_id % 7 = 0 AND n_chars < 450
UNION ALL
SELECT doc_id, NULL::VARCHAR AS text, 'delete' AS kind
FROM documents WHERE n_chars >= 450
"""


# ---------------------------------------------------------------------------
# Spark-native relational surface (SURVEY §2.6 — free from Spark SQL)
# ---------------------------------------------------------------------------

def q_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       (sum(l_quantity::DECIMAL(18,2)))::DOUBLE AS sum_qty,
       (sum(l_extendedprice::DECIMAL(18,2)))::DOUBLE AS sum_base_price,
       (sum(l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2))))::DOUBLE AS sum_disc_price,
       count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_top_customers(spark, sf_dir):
    """Join + agg with a broadcast dimension (customer is small)."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .filter(F.col("n_orders") >= 5)
    )


SQL_TOP_CUSTOMERS = """
SELECT c_custkey, c_mktsegment,
       (sum(o_totalprice::DECIMAL(18,2)))::DOUBLE AS total_spent,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_mktsegment
HAVING count(*) >= 5
"""


def _events(spark, sf_dir) -> DataFrame:
    """events table with ``ts`` normalized to epoch-nanos BIGINT.

    The testdata has stored ``ts`` both as TIMESTAMP(NANOS) (needs the
    nanos-as-long legacy conf) and as ``timestamp[us]`` (reads as
    TIMESTAMP_NTZ); ``normalize_event_time`` branches on the read dtype
    and pins the session timezone to UTC so the NTZ→epoch mapping is
    deterministic and matches DuckDB's ``epoch_ns``."""
    from gamma_spark.sources.ingest import normalize_event_time

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_event_time(_t(spark, sf_dir, "events"), "ts")


def q_events_hourly(spark, sf_dir):
    """Tumbling event-time window over the events table — the batch
    equivalent of the Structured Streaming path (SURVEY §2.7)."""
    ev = _events(spark, sf_dir)
    hour_epoch = (F.col("ts") - F.pmod(F.col("ts"), F.lit(3_600_000_000_000))) / F.lit(
        1_000_000_000
    )
    return (
        ev.groupBy(
            hour_epoch.cast("long").alias("hour_epoch"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
    )


SQL_EVENTS_HOURLY = """
SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS hour_epoch, event_type,
       count(*) AS n_events,
       (sum(value::DECIMAL(18,6)))::DOUBLE AS total_value
FROM events GROUP BY 1, 2
"""


def q_knn_hybrid_exact(spark, sf_dir):
    """T1 semantics (SURVEY §2.7): half the docs are indexed, half are a
    pending tail searched exactly; the hybrid union must equal exact
    brute force over everything — so the exact-kNN oracle applies."""
    from gamma_spark.operators.ivf import IvfFlatIndex
    from gamma_spark.streaming.incremental import HybridSearcher

    docs = _docs(spark, sf_dir)
    n = docs.count()
    indexed = docs.filter(F.col("_docid") < n // 2)
    pending = docs.filter(F.col("_docid") >= n // 2)
    idx = IvfFlatIndex.build(indexed, ncentroids=IVF_NCENT, seed=42)
    hybrid = HybridSearcher(idx, pending, doc_vec="embedding")
    return hybrid.search(_queries_df(spark, sf_dir), k=KNN_K, metric="L2", nprobe=IVF_NCENT)


def q_knn_ivfflat_pruned(spark, sf_dir):
    """Recall-mode IVF (pruned probing): not SQL-expressible (the
    probe set depends on trained centroids) -> checked via the
    ann_recall_checks gate. nprobe=12 is the tune_nprobe knee for
    recall@10 >= 0.9 on this corpus (measured 0.950 at sf0.01; the
    reference's published sweeps land at the same recall via nprobe,
    `benchs/README.md:82-128`)."""
    from gamma_spark.operators.ivf import IvfFlatIndex

    docs = _docs(spark, sf_dir)
    idx = IvfFlatIndex.build(docs, ncentroids=IVF_NCENT, seed=42)
    return idx.search(None, _queries_df(spark, sf_dir), k=KNN_K, metric="L2", nprobe=12)


def q_knn_ivfpq_adc(spark, sf_dir):
    """Recall-mode IVFPQ (ADC candidates + rerank). nprobe=12 is the
    tuned knee (recall@10 saturates in nprobe here, not recall_num —
    measured 0.950 at sf0.01 vs 0.863 at nprobe=8 across recall_num
    64-256)."""
    from gamma_spark.operators.pq import IvfPqIndex

    docs = _docs(spark, sf_dir)
    pq = IvfPqIndex.build(docs, ncentroids=IVF_NCENT, nsubvector=8, seed=42)
    return pq.search(
        docs, _queries_df(spark, sf_dir), k=KNN_K, metric="L2",
        nprobe=12, recall_num=64, has_rank=True,
    )


def q_knn_graph_exact(spark, sf_dir):
    """Corpus-scale kNN join: EVERY embedding queries the corpus for its
    top-k neighbors through the fully distributed path (executor-side
    multi-probe -> cluster-cogrouped BLAS -> exact two-phase rescore) —
    the queries relation is never collected to the driver, the shape a
    kNN-graph / semantic-dedup pipeline needs at |Q| ~ |corpus|. With
    nprobe == ncentroids the result equals exact brute force
    bit-for-bit (ivf.knn_join_distributed, VERDICT r2 growth area)."""
    from gamma_spark.operators.ivf import IvfFlatIndex

    docs = _docs(spark, sf_dir)
    idx = IvfFlatIndex.build(docs, ncentroids=IVF_NCENT, seed=42)
    q = docs.select(F.col("_docid").alias("qid"), F.col("embedding").alias("qvec"))
    return idx.knn_join_distributed(
        q, k=KNN_K, metric="L2", nprobe=IVF_NCENT, rescore=True
    )


SQL_KNN_GRAPH = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings),
s AS (
  SELECT q.qid, e.vec_id AS _docid, {{l2sq}} AS score
  FROM embeddings e CROSS JOIN q
)
SELECT qid, _docid, score, rank::INT AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score ASC, _docid ASC) AS rank
  FROM s
) t WHERE rank <= {KNN_K}
""".replace("{l2sq}", V.sql_l2_squared("e.embedding", "q.qvec"))


def q_knn_graph_banded(spark, sf_dir):
    """F8 score band on the DISTRIBUTED kNN path (VERDICT r3 #2): the
    corpus-scale cogroup join with min/max_score masked inside the scan
    kernel BEFORE per-cluster top-k (gamma's in-scan band,
    `index/impl/gamma_index_flat.cc:200-225`) — banded-out docs never
    occupy candidate slots. With nprobe == ncentroids + exact rescore
    the result equals the banded exact oracle bit-for-bit. This is the
    one request shape (filters ∧ band ∧ kNN) gamma serves that r3 still
    refused at corpus-query scale."""
    from gamma_spark.operators.ivf import IvfFlatIndex

    docs = _docs(spark, sf_dir)
    idx = IvfFlatIndex.build(docs, ncentroids=IVF_NCENT, seed=42)
    q = docs.select(F.col("_docid").alias("qid"), F.col("embedding").alias("qvec"))
    return idx.knn_join_distributed(
        q, k=KNN_K, metric="IP", nprobe=IVF_NCENT, rescore=True,
        min_score=BAND_LO, max_score=BAND_HI, salts=2,
    )


SQL_KNN_GRAPH_BANDED = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings),
s AS (
  SELECT q.qid, e.vec_id AS _docid, {V.sql_dot('e.embedding', 'q.qvec')} AS score
  FROM embeddings e CROSS JOIN q
)
SELECT qid, _docid, score, rank::INT AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, _docid ASC) AS rank
  FROM s WHERE score >= {BAND_LO} AND score <= {BAND_HI}
) t WHERE rank <= {KNN_K}
"""


def q_pq_graph_exact(spark, sf_dir):
    """The PQ twin of knn_graph_exact: every embedding queries the
    corpus through the distributed ADC join (cluster-cogrouped LUT scan
    over codes, exact rerank via plain joins — queries never collected).
    nprobe = ncentroids + recall_num = N degenerates to exact."""
    from gamma_spark.operators.pq import IvfPqIndex

    docs = _docs(spark, sf_dir)
    n = docs.count()
    pq = IvfPqIndex.build(docs, ncentroids=IVF_NCENT, nsubvector=8, seed=42)
    q = docs.select(F.col("_docid").alias("qid"), F.col("embedding").alias("qvec"))
    return pq.knn_join_distributed(
        q, k=KNN_K, metric="L2", nprobe=IVF_NCENT, recall_num=n, has_rank=True
    )


# Floors anchored to the reference's published recall regime (recall@10
# 0.97-0.99 at production params, `benchs/README.md:82-128`) via the
# autotune operators (ann.py tune_nprobe/tune_recall_num): every model
# holds >= 0.9 at its gate knobs, measured deterministic across
# parallelism (local[4]/sp7 == local[32]/sp32 at sf0.01):
#   IVFFLAT nprobe=12          -> 0.950
#   IVFPQ   nprobe=12 rn=64    -> 0.950
#   VEARCH  nprobe=16 rn=128   -> 0.925
#   HNSW    m=16 efc=80 ef=128 -> >= 0.9 (tests/test_hnsw.py)
#   IVFSQ8  full probe         -> >= 0.9 (quantization-only error)
#   HNSW-SCAN routed bulk scan  -> >= 0.999 (exact by construction)
IVF_RECALL_T = 0.9
PQ_RECALL_T = 0.9
HNSW_RECALL_T = 0.9
SCANN_RECALL_T = 0.9
SQ8_RECALL_T = 0.9
# the r7 routed bulk path is exact by construction (per-shard exact
# top-k union) — gate it at 0.999 so any future regression that makes
# the scan approximate fails the driver hash, not just a unit test
HNSW_SCAN_RECALL_T = 0.999


def q_ivf_recall_check(spark, sf_dir, exact=None):
    """Driver-visible recall@k for the pruned IVF path (VERDICT r2 #5):
    one row (k, threshold, recall_ok) where recall_ok is measured
    against the exact kernel — the reference's recall-table methodology
    (`benchs/README.md`; self-recall asserts `tests/test.h:690`) as a
    hash-checkable relation."""
    from gamma_spark.operators.ann import recall_check

    docs = _docs(spark, sf_dir)
    queries_df = _queries_df(spark, sf_dir)
    if exact is None:
        exact = knn.knn_join(docs, queries_df, k=KNN_K, metric="L2")
    approx = q_knn_ivfflat_pruned(spark, sf_dir)
    return recall_check(exact, approx, k=KNN_K, threshold=IVF_RECALL_T)


def q_pq_recall_check(spark, sf_dir, exact=None):
    """Recall@k for IVFPQ at practical settings (ADC candidates + exact
    rerank, nprobe=8/16, recall_num=64) vs the exact kernel."""
    from gamma_spark.operators.ann import recall_check

    docs = _docs(spark, sf_dir)
    queries_df = _queries_df(spark, sf_dir)
    if exact is None:
        exact = knn.knn_join(docs, queries_df, k=KNN_K, metric="L2")
    approx = q_knn_ivfpq_adc(spark, sf_dir)
    return recall_check(exact, approx, k=KNN_K, threshold=PQ_RECALL_T)


def q_faiss_load_search(spark, sf_dir):
    """LoadFromFaiss (SURVEY S9, flipped from a declared non-goal:
    `search/gamma_engine.cc:1287-1329`): the embeddings corpus goes out
    through the faiss-format writer as an IndexIVFFlat file (the
    Migrate-style export direction; bounded collect — a faiss dump is
    one driver-side blob by construction) and back in through the
    pure-Python parser, which materializes the cluster-partitioned
    parquet layout `IvfFlatIndex.load` reads. Search over the imported
    index at nprobe == ncentroids must equal exact brute force — list
    membership and vectors survive the round-trip bit-for-bit."""
    import numpy as np

    from gamma_spark.operators.ivf import IvfFlatIndex
    from gamma_spark.sources.faiss_io import load_from_faiss, write_faiss_ivfflat

    docs = _docs(spark, sf_dir)
    native = IvfFlatIndex.build(docs, ncentroids=IVF_NCENT, seed=42)
    rows = native.index_df.select("_docid", "embedding", "cluster_id").collect()
    ids = np.array([r._docid for r in rows], dtype=np.int64)
    vecs = np.stack([np.array(r.embedding, dtype=np.float32) for r in rows])
    assign = np.array([r.cluster_id for r in rows], dtype=np.int64)
    root = _scratch_dir("gamma_faiss_")
    fpath = f"{root}/export.faiss"
    write_faiss_ivfflat(fpath, native.centroids, ids, vecs, assign, nprobe=IVF_NCENT)
    idx = load_from_faiss(spark, fpath, f"{root}/imported")["index"]
    return idx.search(
        None, _queries_df(spark, sf_dir), k=KNN_K, metric="L2", nprobe=IVF_NCENT
    )


def q_scann_recall_check(spark, sf_dir, exact=None):
    """Recall@k for the VEARCH model (SURVEY K7, flipped from a
    declared non-goal: `index/impl/scann/gamma_index_vearch.cc:19,
    415-520`): anisotropic (score-aware, ScaNN-objective) 4-bit
    codebooks behind the shared ADC+rerank machinery, measured against
    the exact IP kernel at practical settings (nprobe=16/16 lists but
    candidate-bounded recall_num=128 of 500)."""
    from gamma_spark.operators.ann import recall_check
    from gamma_spark.operators.pq import VearchIndex

    docs = _docs(spark, sf_dir)
    queries_df = _queries_df(spark, sf_dir)
    if exact is None:
        exact = knn.knn_join(docs, queries_df, k=KNN_K, metric="IP")
    idx = VearchIndex.build(docs, ncentroids=IVF_NCENT, nsubvector=8, seed=42)
    # recall_num=128: the tune_recall_num knee for recall@10 >= 0.9
    # (0.925 at sf0.01; 64 measured 0.825)
    approx = idx.search(
        None, queries_df, k=KNN_K, metric="IP", nprobe=IVF_NCENT, recall_num=128
    )
    return recall_check(exact, approx, k=KNN_K, threshold=SCANN_RECALL_T)


def q_hnsw_recall_check(spark, sf_dir, exact=None):
    """Recall@k for the sharded-HNSW graph path (SURVEY K5, flipped
    from a declared non-goal this round: `index/impl/hnswlib/
    gamma_index_hnswlib.cc:128,316-380`): 4 independent per-shard
    graphs (m=16, efConstruction=80), fan-out search at efSearch=128,
    measured against the exact kernel with the same recall-table
    methodology as IVF/PQ (`benchs/README.md`)."""
    from gamma_spark.operators.ann import recall_check
    from gamma_spark.operators.hnsw import HnswIndex

    docs = _docs(spark, sf_dir)
    queries_df = _queries_df(spark, sf_dir)
    if exact is None:
        exact = knn.knn_join(docs, queries_df, k=KNN_K, metric="L2")
    idx = HnswIndex.build(docs, nshards=4, m=16, ef_construction=80, metric="L2")
    # mode="graph": this row's purpose is to gate the TRAVERSAL kernel's
    # recall — the auto router would route small sf shards to the exact
    # scan (recall 1.0 by construction) and the gate would measure nothing
    approx = idx.search(None, queries_df, k=KNN_K, ef_search=128, mode="graph")
    return recall_check(exact, approx, k=KNN_K, threshold=HNSW_RECALL_T)


def q_hnsw_scan_recall_check(spark, sf_dir, exact=None):
    """The r7 bulk-router scan kernel (operators/hnsw.py NpHnsw.scan):
    per-shard exact GEMM top-k whose global merge is the exact answer,
    so the gate sits at 0.999 — a regression that makes this path
    approximate fails the driver hash."""
    from gamma_spark.operators.ann import recall_check
    from gamma_spark.operators.hnsw import HnswIndex

    docs = _docs(spark, sf_dir)
    queries_df = _queries_df(spark, sf_dir)
    if exact is None:
        exact = knn.knn_join(docs, queries_df, k=KNN_K, metric="L2")
    idx = HnswIndex.build(docs, nshards=4, m=16, ef_construction=80, metric="L2")
    approx = idx.search(None, queries_df, k=KNN_K, mode="scan")
    return recall_check(exact, approx, k=KNN_K, threshold=HNSW_SCAN_RECALL_T)


SQL_IVF_RECALL_CHECK = (
    f"SELECT {KNN_K}::INT AS k, {IVF_RECALL_T}::DOUBLE AS threshold, true AS recall_ok"
)
SQL_PQ_RECALL_CHECK = (
    f"SELECT {KNN_K}::INT AS k, {PQ_RECALL_T}::DOUBLE AS threshold, true AS recall_ok"
)
SQL_HNSW_RECALL_CHECK = (
    f"SELECT {KNN_K}::INT AS k, {HNSW_RECALL_T}::DOUBLE AS threshold, true AS recall_ok"
)
SQL_HNSW_SCAN_RECALL_CHECK = (
    f"SELECT {KNN_K}::INT AS k, {HNSW_SCAN_RECALL_T}::DOUBLE AS threshold, true AS recall_ok"
)
SQL_SCANN_RECALL_CHECK = (
    f"SELECT {KNN_K}::INT AS k, {SCANN_RECALL_T}::DOUBLE AS threshold, true AS recall_ok"
)
SQL_SQ8_RECALL_CHECK = (
    f"SELECT {KNN_K}::INT AS k, {SQ8_RECALL_T}::DOUBLE AS threshold, true AS recall_ok"
)


def q_sq8_recall_check(spark, sf_dir, exact=None):
    """Recall@k for IVFSQ8 (operators/sq.py — the idiomatic analogue of
    the reference's ZFP-compressed raw-vector tier, SURVEY O12,
    `storage/compress/compressor_zfp.h:38-58`): full probes so the ONLY
    error source is 8-bit scalar quantization — recall measures the
    codec, not the pruning."""
    from gamma_spark.operators.ann import recall_check
    from gamma_spark.operators.sq import IvfSq8Index

    docs = _docs(spark, sf_dir)
    queries_df = _queries_df(spark, sf_dir)
    if exact is None:
        exact = knn.knn_join(docs, queries_df, k=KNN_K, metric="L2")
    idx = IvfSq8Index.build(docs, ncentroids=IVF_NCENT, seed=42)
    approx = idx.search(None, queries_df, k=KNN_K, metric="L2", nprobe=IVF_NCENT)
    return recall_check(exact, approx, k=KNN_K, threshold=SQ8_RECALL_T)


def q_embedding_neardup_lsh(spark, sf_dir):
    """Multi-band hyperplane-LSH near-dup (scale path): 16 bands x 8
    sign bits OR'd, exact cosine verify on candidates. Deterministic
    baked hyperplanes -> the oracle applies the identical prune."""
    from gamma_spark.operators import dedup as D

    return D.embedding_neardup_banded(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        threshold=EMB_NEARDUP_T, dim=64,
    )


def q_multimodal_features(spark, sf_dir):
    """Multimodal with a REAL codec (VERDICT r2 #6): per-doc binary PPM
    (P6) payloads are generated (two horizontal bands with pixel values
    derived from doc_id), decoded by the registered pure-numpy "ppm"
    codec inside the Arrow-batched mapInPandas kernel, and pooled into
    features. The band construction aligns with the 2x2 mean-pyramid
    pooling, so pooled values recover the exact band pixel values —
    integer math a DuckDB twin reproduces (hash-checked, not rows-only).
    """
    from pyspark.sql.types import BinaryType

    from gamma_spark.operators import multimodal as M

    W, H, DIM = 16, 12, 16

    @F.pandas_udf(BinaryType())
    def make_ppm(doc_id: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for d in doc_id:
            top, bottom = int(d) % 256, (int(d) * 7) % 256
            px = np.empty((H, W, 3), np.uint8)
            px[: H // 2] = top
            px[H // 2:] = bottom
            out.append(M.encode_ppm(px))
        return pd.Series(out)

    imgs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        make_ppm("doc_id").alias("image"),
        F.struct(
            F.lit(W).alias("width"), F.lit(H).alias("height"),
            F.lit("ppm").alias("format"),
        ).alias("image_meta"),
    )
    out = M.extract_image_features(imgs, dim=DIM, codec="ppm")
    # pools (2x2 over the band image) = [top, top, bottom, bottom], tiled
    # to DIM by np.resize -> feat[0]=top/255, feat[2]=bottom/255; *255
    # recovers the integers exactly (float32 error << 0.5)
    return out.select(
        "doc_id",
        F.size("feat").alias("feat_dim"),
        F.round(F.element_at("feat", 1) * 255).cast("long").alias("top_px"),
        F.round(F.element_at("feat", 3) * 255).cast("long").alias("bottom_px"),
    )


SQL_MULTIMODAL_FEATURES = """
SELECT doc_id, 16 AS feat_dim,
       doc_id % 256 AS top_px,
       (doc_id * 7) % 256 AS bottom_px
FROM documents
"""


def q_multimodal_resize(spark, sf_dir):
    """resize -> feature-extract pipeline composed through the codec
    registry (VERDICT r3 #7 — these kernels were pytest-only): per-doc
    band images (two doc_id-derived bands, as in multimodal_features)
    arrive in a MIXED-FORMAT corpus — doc_id%3 picks palette PNG
    (ctype 3, band values resolved through PLTE), RGBA PNG (ctype 6,
    doc_id-derived alpha the decoder must drop), or binary PPM — and
    the per-row "auto" codec dispatches each through the registry by
    its metadata format (VERDICT r8 #3: the PNG palette/alpha decode
    paths were pytest-only; now a third of the driver rows round-trip
    them). All three containers decode to the identical band image, so
    after nearest-neighbor resize 16x12 -> 8x6 (raw-rgb re-encode +
    metadata rewrite) and pooling via the registered "raw-rgb" codec,
    pooled pixel values stay integer-recoverable — one hash-matched
    oracle covers every decode path."""
    from pyspark.sql.types import BinaryType

    from gamma_spark.operators import multimodal as M

    W, H, DIM = 16, 12, 16

    @F.pandas_udf(BinaryType())
    def make_payload(doc_id: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for d in doc_id:
            top, bottom = int(d) % 256, (int(d) * 7) % 256
            kind = int(d) % 3
            if kind == 0:  # palette PNG: band values live in the PLTE
                idx = np.zeros((H, W), np.uint8)
                idx[H // 2:] = 1
                plte = np.array(
                    [[top] * 3, [bottom] * 3], dtype=np.uint8
                )
                out.append(M.encode_png_indexed(idx, plte))
            elif kind == 1:  # RGBA PNG: alpha must be dropped on decode
                px = np.empty((H, W, 4), np.uint8)
                px[: H // 2, :, :3] = top
                px[H // 2:, :, :3] = bottom
                px[:, :, 3] = (int(d) * 13) % 256
                out.append(M.encode_png_rgba(px))
            else:  # binary PPM (P6)
                px = np.empty((H, W, 3), np.uint8)
                px[: H // 2] = top
                px[H // 2:] = bottom
                out.append(M.encode_ppm(px))
        return pd.Series(out)

    fmt = F.when(F.col("doc_id") % 3 == 2, F.lit("ppm")).otherwise(F.lit("png"))
    imgs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        make_payload("doc_id").alias("image"),
        F.struct(
            F.lit(W).alias("width"), F.lit(H).alias("height"),
            fmt.alias("format"),
        ).alias("image_meta"),
    )
    resized = M.resize_images(imgs, width=8, height=6, codec="auto")
    out = M.extract_image_features(resized, dim=DIM, codec="raw-rgb")
    return out.select(
        "doc_id",
        F.length("image").alias("payload_bytes"),
        F.col("image_meta.width").alias("width"),
        F.col("image_meta.height").alias("height"),
        F.round(F.element_at("feat", 1) * 255).cast("long").alias("top_px"),
        F.round(F.element_at("feat", 3) * 255).cast("long").alias("bottom_px"),
    )


SQL_MULTIMODAL_RESIZE = """
SELECT doc_id, 144 AS payload_bytes, 8 AS width, 6 AS height,
       doc_id % 256 AS top_px,
       (doc_id * 7) % 256 AS bottom_px
FROM documents
"""


def q_multimodal_audio(spark, sf_dir):
    """Audio + video as first-class multimodal columns. Audio: PCM16
    WAV payloads (square wave, amplitude derived from doc_id) are
    synthesized per doc, decoded by the registered pure-numpy "wav"
    RIFF parser inside the Arrow-batched kernel, and reduced to scalar
    features. Square-wave math makes every feature integer-recoverable
    (mean|x| == peak == amplitude; 119 sign flips in 120 alternating
    4-sample segments). Video (VERDICT r9 #2 — ``sample_video_frames``
    was the last pytest-only codec path): per-doc opaque payloads carry
    an ``n_frames`` fixture spanning zero (doc_id%5==0) and NULL
    (doc_id%5==1) — the 8eaccf3 crash guard — else (doc_id%23)+1;
    frames explode at stride ``every=4`` and the stubbed decode
    (md5 payload hash + frame index) aggregates back per doc, so the
    sampled count, last stride index, and the exact first frame key all
    hash-match the oracle. One row per doc either way — a hash-match
    oracle, not rows-only."""
    from pyspark.sql.types import BinaryType

    from gamma_spark.operators import multimodal as M

    @F.pandas_udf(BinaryType())
    def make_wav(doc_id: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for d in doc_id:
            a = int(d) % 100 + 1
            period = np.concatenate([np.full(4, a), np.full(4, -a)])
            out.append(M.encode_wav(np.tile(period, 60).astype(np.int16)))
        return pd.Series(out)

    docs = _t(spark, sf_dir, "documents")
    au = docs.select("doc_id", make_wav("doc_id").alias("audio"))
    audio = M.extract_audio_features(au, "audio", codec="wav")

    vid = docs.select(
        "doc_id",
        F.encode(
            F.concat(F.lit("vid-"), F.col("doc_id").cast("string")), "utf-8"
        ).alias("video"),
        F.when(F.col("doc_id") % 5 == 0, F.lit(0))
        .when(F.col("doc_id") % 5 == 1, F.lit(None))
        .otherwise(F.col("doc_id") % 23 + 1)
        .cast("long")
        .alias("n_frames"),
    )
    frames = M.sample_video_frames(vid, "video", "n_frames", every=4)
    vagg = frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("_ns"),
        F.max("frame_idx").alias("_li"),
        F.min("frame_key").alias("_fk"),
    )
    return (
        audio.join(vagg, "doc_id", "left")
        .join(vid.select("doc_id", "n_frames"), "doc_id", "inner")
        .select(
            "doc_id",
            "n_samples",
            F.round("peak").cast("long").alias("peak"),
            F.round("mean_abs").cast("long").alias("mean_abs"),
            "zero_cross",
            "n_frames",
            F.coalesce(F.col("_ns"), F.lit(0)).cast("long").alias(
                "n_sampled_frames"
            ),
            F.coalesce(F.col("_li"), F.lit(-1)).cast("long").alias(
                "last_frame_idx"
            ),
            F.coalesce(F.col("_fk"), F.lit("")).alias("first_frame_key"),
        )
    )


SQL_MULTIMODAL_AUDIO = """
WITH v AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN 0
              WHEN doc_id % 5 = 1 THEN NULL
              ELSE doc_id % 23 + 1 END AS n_frames
  FROM documents
)
SELECT doc_id, 480 AS n_samples,
       (doc_id % 100 + 1) AS peak,
       (doc_id % 100 + 1) AS mean_abs,
       119 AS zero_cross,
       n_frames,
       CASE WHEN n_frames > 0 THEN (n_frames - 1) // 4 + 1 ELSE 0 END
         AS n_sampled_frames,
       CASE WHEN n_frames > 0 THEN ((n_frames - 1) // 4) * 4 ELSE -1 END
         AS last_frame_idx,
       CASE WHEN n_frames > 0 THEN md5('vid-' || doc_id) || ':0' ELSE '' END
         AS first_frame_key
FROM v
"""


def q_events_sliding_window(spark, sf_dir):
    """Sliding event-time windows (1h window, 30min slide) — Spark-native
    capability beyond the reference (SURVEY §2.7); epoch-second window
    starts keep the oracle type-aligned."""
    ev = _events(spark, sf_dir)
    # exact integer nanos->micros (`div`, not `/`): the float chain is
    # off by one for int64 nanos within ~128 ns of a boundary, which
    # would assign boundary events to the wrong window vs the oracle's
    # integer arithmetic (same fix as q_events_session_window)
    ts = F.timestamp_micros(F.expr("ts div 1000"))
    win = F.window(ts, "1 hour", "30 minutes")
    return (
        ev.groupBy(win.alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").cast("long").alias("window_start_epoch"),
            "event_type",
            "n_events",
        )
    )


SQL_EVENTS_SLIDING_WINDOW = """
WITH e AS (
  SELECT epoch_ns(ts) // 1000000000 AS sec, event_type FROM events
),
w AS (
  SELECT unnest([ (sec // 1800) * 1800, (sec // 1800) * 1800 - 1800 ]) AS window_start_epoch,
         event_type
  FROM e
)
SELECT window_start_epoch, event_type, count(*) AS n_events
FROM w GROUP BY 1, 2
"""


def q_events_sessionization(spark, sf_dir):
    """Gap-based sessionization per user (30-min inactivity gap) via
    analytic windows — lag + cumulative session counter. Spark-native
    capability; the streaming twin is session_window/applyInPandasWithState."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    # exact integer nanos->seconds (see q_events_sliding_window)
    sec = F.expr("ts div 1000000000")
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    with_gap = (
        ev.select("user_id", "event_id", sec.alias("sec"))
        .withColumn("prev_sec", F.lag("sec").over(w))
        .withColumn(
            "new_session",
            (F.col("prev_sec").isNull() | (F.col("sec") - F.col("prev_sec") > 1800)).cast("int"),
        )
        .withColumn("session_no", F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ))
    )
    return (
        with_gap.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max("sec") - F.min("sec")).alias("duration_sec"),
        )
        .groupBy("user_id")
        .agg(
            F.max("session_no").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("duration_sec").alias("max_session_sec"),
        )
    )


SQL_EVENTS_SESSIONIZATION = """
WITH e AS (
  SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS sec FROM events
),
g AS (
  SELECT user_id, event_id, sec,
         lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS prev_sec
  FROM e
),
s AS (
  SELECT user_id, sec,
         sum(CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY sec, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM g
),
per_session AS (
  SELECT user_id, session_no, count(*) AS n_events,
         max(sec) - min(sec) AS duration_sec
  FROM s GROUP BY 1, 2
)
SELECT user_id, max(session_no)::BIGINT AS n_sessions, sum(n_events)::BIGINT AS n_events,
       max(duration_sec) AS max_session_sec
FROM per_session GROUP BY user_id
"""


def q_events_session_window(spark, sf_dir):
    """Spark-native gap sessionization (``session_window``, 30-min gap)
    — the built-in twin of q_events_sessionization's lag/cumsum plan and
    of streaming/stateful.py's applyInPandasWithState sessionizer
    (VERDICT r2 #8). ``ts div 1000`` is exact integer nanos→micros
    (epoch nanos exceed double precision, so no ``/`` division)."""
    ev = _events(spark, sf_dir)
    ts = F.timestamp_micros(F.expr("ts div 1000"))
    return (
        ev.groupBy(F.col("user_id"), F.session_window(ts, "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("long").alias("session_start_epoch"),
            "n_events",
        )
    )


SQL_EVENTS_SESSION_WINDOW = """
WITH e AS (
  SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events
),
g AS (
  SELECT user_id, us, lag(us) OVER (PARTITION BY user_id ORDER BY us) AS prev
  FROM e
),
s AS (
  SELECT user_id, us,
         sum(CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY us
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM g
)
SELECT user_id, (min(us) // 1000000)::BIGINT AS session_start_epoch,
       count(*) AS n_events
FROM s GROUP BY user_id, sid
"""


def q_engine_status(spark, sf_dir):
    """EngineStatus analogue (SURVEY §2.6): doc/deleted counters after a
    delete-by-filter, as a one-row relation."""
    docs = _t(spark, sf_dir, "documents")
    table = GammaTable(spark, docs, id_col="doc_id")
    t2, _ = table.delete_by_filter([GF.TermFilter("lang", ("es",), GF.TERM_OR)])
    raw = t2.raw
    return raw.select(
        F.count(F.lit(1)).alias("max_docid"),
        F.sum(F.col("_deleted").cast("long")).alias("deleted"),
        (F.count(F.lit(1)) - F.sum(F.col("_deleted").cast("long"))).alias("doc_count"),
    )


SQL_ENGINE_STATUS = """
SELECT count(*) AS max_docid,
       sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END)::BIGINT AS deleted,
       (count(*) - sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END))::BIGINT AS doc_count
FROM documents
"""


def q_order_priority_ranks(spark, sf_dir):
    """Window-function breadth (rank within group + date filter) — the
    relational surface gamma lacks entirely (SURVEY §2.6)."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.filter(F.col("o_orderstatus") != "F")
        .withColumn("price_rank", F.row_number().over(w))
        .filter(F.col("price_rank") <= 5)
        .select("o_orderpriority", "price_rank", "o_orderkey",
                F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("total_price"))
    )


SQL_ORDER_PRIORITY_RANKS = """
SELECT o_orderpriority, price_rank::INT AS price_rank, o_orderkey,
       (o_totalprice::DECIMAL(18,2))::DOUBLE AS total_price
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice DESC, o_orderkey ASC) AS price_rank
  FROM orders WHERE o_orderstatus <> 'F'
) t WHERE price_rank <= 5
"""


def q_lineitem_by_region(spark, sf_dir):
    """3-way join through the star schema with two broadcast dims."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


SQL_LINEITEM_BY_REGION = """
SELECT r_name,
       (sum(l_extendedprice::DECIMAL(18,2)))::DOUBLE AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# ---------------------------------------------------------------------------
# LLM-pipeline operators (north-star extensions): text analysis + dedup
# ---------------------------------------------------------------------------

MIX_FRACTIONS = {"en": 0.8, "de": 0.5, "zh": 0.25}
MIX_QUOTA = 40
PACK_MAX_TOKENS = 256


def q_mixture_sample(spark, sf_dir):
    """Training-mix construction over the documents table: per-language
    hash-gated sampling rates (reproducible, rand-free, stable under
    corpus growth) followed by a per-language quota drawn in hash order
    — the two mixing primitives a 100 TB data pipeline composes. The
    gate is a pure Catalyst predicate evaluated in the scan stage (no
    UDF, no shuffle); the quota is one shuffle + per-group top-k
    (operators/sampling.py)."""
    from gamma_spark.operators import sampling as S

    docs = _t(spark, sf_dir, "documents")
    mixed = S.sample_mixture(docs, "lang", MIX_FRACTIONS, key_col="doc_id")
    quota = S.stratified_quota(mixed, "lang", MIX_QUOTA, key_col="doc_id", salt="q")
    return quota.select("doc_id", "lang", "source")


def _sql_mixture_sample() -> str:
    from gamma_spark.operators.sampling import (
        sql_sample_mixture,
        sql_stratified_quota,
    )

    inner = (
        "SELECT * FROM documents WHERE "
        + sql_sample_mixture("lang", MIX_FRACTIONS, "doc_id")
    )
    return sql_stratified_quota(
        f"({inner})", "lang", MIX_QUOTA, "doc_id", salt="q",
        select="doc_id, lang, source",
    )


def q_pack_sequences(spark, sf_dir):
    """Sequence packing: lay the documents out into fixed-256-token
    training sequences by contiguous concatenation in doc_id order —
    the distributed two-level prefix-sum (cumsum within id-range
    buckets + a #buckets-row offset scan; operators/packing.py), whose
    result is bit-identical to the serial layout for every
    bucket_width (property-tested)."""
    from gamma_spark.functions.text import bpe_token_count
    from gamma_spark.operators import packing as P

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", bpe_token_count("text").alias("n_tokens"))
    out = P.pack_contiguous(
        toks, "doc_id", "n_tokens", PACK_MAX_TOKENS, bucket_width=100
    )
    return out.select("doc_id", "n_tokens", "seq_id", "seq_offset", "spans")


def _sql_pack_sequences() -> str:
    from gamma_spark.functions.text import sql_bpe_token_count
    from gamma_spark.operators.packing import sql_pack_contiguous

    return sql_pack_contiguous(
        "documents", "doc_id", sql_bpe_token_count("text"), PACK_MAX_TOKENS,
        select="doc_id, _n::INT AS n_tokens",
    )


def q_text_stats(spark, sf_dir):
    from gamma_spark.functions import text as T

    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        T.token_count("text").cast("long").alias("n_tokens"),
        T.avg_token_len("text").alias("avg_token_len"),
        T.stopword_ratio("text").alias("stopword_ratio"),
        T.quality_score("text").alias("quality"),
        T.fingerprint("text").alias("fp"),
        T.lang_id("text").alias("lang_pred"),
        T.bpe_token_count("text").cast("long").alias("n_bpe_tokens"),
    )


def _sql_text_stats() -> str:
    from gamma_spark.functions import text as T

    return f"""
SELECT doc_id,
       {T.sql_token_count('text')} AS n_tokens,
       {T.sql_avg_token_len('text')} AS avg_token_len,
       {T.sql_stopword_ratio('text')} AS stopword_ratio,
       {T.sql_quality_score('text')} AS quality,
       {T.sql_fingerprint('text')} AS fp,
       {T.sql_lang_id('text')} AS lang_pred,
       {T.sql_bpe_token_count('text')} AS n_bpe_tokens
FROM documents
"""


def q_dedup_exact(spark, sf_dir):
    from gamma_spark.operators import dedup as D

    docs = _t(spark, sf_dir, "documents")
    return D.exact_dedup(docs, "doc_id", F.substring(F.col("text"), 1, 40))


def _sql_dedup_exact() -> str:
    from gamma_spark.operators import dedup as D

    return D.sql_exact_dedup("documents", "doc_id", "substr(text, 1, 40)")


def q_dedup_minhash_lsh(spark, sf_dir):
    from gamma_spark.operators import dedup as D

    return D.minhash_dedup_pairs(_t(spark, sf_dir, "documents"), "doc_id", "text")


def _sql_dedup_minhash_lsh() -> str:
    from gamma_spark.operators import dedup as D

    sig = D.sql_minhash_signatures(
        D.sql_shingles("documents", "doc_id", "text", 3), "doc_id"
    )
    return D.sql_lsh_candidate_pairs(sig, "doc_id")


def q_dedup_jaccard(spark, sf_dir):
    from gamma_spark.operators import dedup as D

    return D.jaccard_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.3
    )


def _sql_dedup_jaccard() -> str:
    from gamma_spark.operators import dedup as D

    return D.sql_jaccard_pairs("documents", "doc_id", "text", 3, 0.3)


def q_simhash_signatures(spark, sf_dir):
    from gamma_spark.operators import dedup as D

    return D.simhash(_t(spark, sf_dir, "documents"), "doc_id", "text")


def _sql_simhash_signatures() -> str:
    from gamma_spark.operators import dedup as D

    return D.sql_simhash("documents", "doc_id", "text")


def q_embedding_neardup(spark, sf_dir):
    from gamma_spark.operators import dedup as D

    return D.embedding_neardup_pairs(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding", threshold=EMB_NEARDUP_T
    )


def _sql_embedding_neardup() -> str:
    from gamma_spark.operators import dedup as D

    return D.sql_embedding_neardup_pairs("embeddings", "vec_id", "embedding", EMB_NEARDUP_T)


def q_simhash_neardup_pairs(spark, sf_dir):
    """Pigeonhole-banded simhash near-dup (scale path) — must equal the
    all-pairs oracle exactly (banding is lossless by pigeonhole)."""
    from gamma_spark.operators import dedup as D

    return D.simhash_neardup_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", max_distance=3
    )


def _sql_simhash_neardup_pairs() -> str:
    from gamma_spark.operators import dedup as D

    return D.sql_simhash_pairs("documents", "doc_id", "text", max_distance=3)


def q_dedup_minhash_verified(spark, sf_dir):
    """Composed dedup pipeline: minhash LSH candidates -> exact Jaccard
    verify on the candidate relation only (no all-pairs stage)."""
    from gamma_spark.operators import dedup as D

    return D.minhash_verified_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.3
    )


def _sql_dedup_minhash_verified() -> str:
    from gamma_spark.operators import dedup as D

    return D.sql_minhash_verified_pairs("documents", "doc_id", "text", 3, 0.3)


def q_dedup_groups(spark, sf_dir):
    """Pair->group resolution: minhash LSH pairs -> connected components
    -> keeper per group (longest doc wins, min-id tiebreak) over the
    whole corpus, singletons included. filter(is_keeper) = deduplicated
    corpus."""
    from gamma_spark.operators import dedup as D
    from gamma_spark.operators import groups as G

    docs = _t(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(docs, "doc_id", "text")
    return G.resolve_groups(pairs, docs, "doc_id", keeper_order=F.col("n_chars"))


def _sql_dedup_groups() -> str:
    from gamma_spark.operators import dedup as D
    from gamma_spark.operators import groups as G

    sig = D.sql_minhash_signatures(
        D.sql_shingles("documents", "doc_id", "text", 3), "doc_id"
    )
    pairs = D.sql_lsh_candidate_pairs(sig, "doc_id")
    return G.sql_resolve_groups(pairs, "documents", "doc_id", "n_chars")


def _sql_embedding_neardup_lsh() -> str:
    from gamma_spark.operators import dedup as D

    return D.sql_embedding_neardup_banded(
        "embeddings", "vec_id", "embedding", EMB_NEARDUP_T, dim=64
    )


def q_semantic_dedup_groups(spark, sf_dir):
    """Semantic dedup: multi-band embedding LSH near-dup pairs ->
    connected components -> keeper per group over the full embeddings
    table (min-id keeper; singletons keep themselves). Shows the
    group-resolution operator composes with the vector pair producer
    exactly as with the text ones."""
    from gamma_spark.operators import dedup as D
    from gamma_spark.operators import groups as G

    embs = _t(spark, sf_dir, "embeddings")
    pairs = D.embedding_neardup_banded(
        embs, "vec_id", "embedding", threshold=EMB_NEARDUP_T, dim=64
    )
    return G.resolve_groups(pairs, embs.select("vec_id"), "vec_id")


def _sql_semantic_dedup_groups() -> str:
    from gamma_spark.operators import dedup as D
    from gamma_spark.operators import groups as G

    pairs = D.sql_embedding_neardup_banded(
        "embeddings", "vec_id", "embedding", EMB_NEARDUP_T, dim=64
    )
    return G.sql_resolve_groups(pairs, "embeddings", "vec_id")


def q_curation_pipeline(spark, sf_dir):
    """End-to-end corpus curation: quality/lang annotate -> gate ->
    minhash-LSH + exact-Jaccard near-dup on survivors -> dup-group
    keeper decisions. One row per doc; filter(kept) = curated corpus."""
    from gamma_spark.operators import curation as C

    return C.curate_corpus(_t(spark, sf_dir, "documents"), "doc_id", "text")


def _sql_curation_pipeline() -> str:
    from gamma_spark.operators import curation as C

    return C.sql_curate_corpus("documents", "doc_id", "text")


# ---------------------------------------------------------------------------
# round 5: lexical retrieval + hybrid fusion, repetition signals,
# decontamination; recall-check + ivfpq-variant consolidations
# ---------------------------------------------------------------------------

#: BM25 fixture: query ids 0..BM25_NQ-1; query i's terms are the first
#: BM25_QTERMS distinct tokens of document i (shared doc_id/vec_id key
#: space makes qid i's text terms and vector the same "query").
BM25_NQ = 8
BM25_QTERMS = 4
BM25_K = 10
HYBRID_K_PER_SYSTEM = 20
#: decontamination fixture: eval split = doc_id % DECONTAM_MOD == 0
DECONTAM_MOD = 7
DECONTAM_N = 6


def _bm25_query_terms(spark, sf_dir):
    from gamma_spark.functions import text as T

    docs = _t(spark, sf_dir, "documents")
    toks = T.tokens("text")
    return (
        docs.filter(F.col("doc_id") < BM25_NQ)
        .select(
            F.col("doc_id").alias("qid"),
            F.explode(F.slice(toks, 1, BM25_QTERMS)).alias("term"),
        )
        .distinct()
    )


SQL_BM25_QUERY_TERMS = f"""
SELECT DISTINCT doc_id AS qid, unnest(t[1:{BM25_QTERMS}]) AS term
FROM (SELECT doc_id, string_split(text, ' ') AS t
      FROM documents WHERE doc_id < {BM25_NQ}) s
"""


def q_bm25_topk(spark, sf_dir):
    """Lexical BM25 top-k over the documents table (beyond-reference
    capability: gamma's TermFilter is a hard predicate, never a scorer
    — SURVEY §2.3; this is the standard Lucene-style lexical leg a
    hybrid engine needs). Routed through the materialized
    ``Bm25Index`` build/search split — the production serving path —
    whose scores are bit-identical to the ad-hoc ``bm25_search``
    (tests/test_retrieval.py parity test)."""
    from gamma_spark.operators import retrieval as R

    idx = R.Bm25Index.build(_t(spark, sf_dir, "documents"))
    return idx.search(_bm25_query_terms(spark, sf_dir), k=BM25_K)


def _sql_bm25_topk() -> str:
    from gamma_spark.operators import retrieval as R

    return R.sql_bm25_search("documents", SQL_BM25_QUERY_TERMS, k=BM25_K)


def q_hybrid_rrf(spark, sf_dir):
    """Hybrid search: BM25 lexical ranking ∪ exact-kNN vector ranking,
    fused by reciprocal-rank fusion (RRF, Cormack et al. SIGIR'09).
    Union semantics deliberately differ from gamma's R2 multi-vector
    intersection (`vector/vector_manager.cc:512-561`) — R2 fuses two
    *vector* legs of one doc, RRF fuses two *systems*; both ship."""
    from gamma_spark.operators import retrieval as R

    lex = R.bm25_search(
        _t(spark, sf_dir, "documents"),
        _bm25_query_terms(spark, sf_dir),
        k=HYBRID_K_PER_SYSTEM,
    )
    vec = knn.knn_join(
        _docs(spark, sf_dir), _queries_df(spark, sf_dir),
        k=HYBRID_K_PER_SYSTEM, metric="L2",
    ).filter(F.col("qid") < BM25_NQ)
    return R.rrf_fuse([lex, vec], k=BM25_K)


def _sql_hybrid_rrf() -> str:
    from gamma_spark.operators import retrieval as R

    lex = R.sql_bm25_search("documents", SQL_BM25_QUERY_TERMS, k=HYBRID_K_PER_SYSTEM)
    vec = _sql_knn(
        V.sql_l2_squared("e.embedding", "q.qvec"), "ASC", k=HYBRID_K_PER_SYSTEM
    )
    return R.sql_rrf_fuse([lex, vec], k=BM25_K)


def q_quality_signals(spark, sf_dir):
    """Gopher-family repetition signals (dup-token fraction, top-bigram
    share, unigram entropy) per document — the distributional quality
    gates a 100 TB curation pipeline runs before dedup."""
    from gamma_spark.operators.quality import repetition_signals

    return repetition_signals(_t(spark, sf_dir, "documents"), "doc_id", "text")


def _sql_quality_signals() -> str:
    from gamma_spark.operators.quality import sql_repetition_signals

    return sql_repetition_signals("documents", "doc_id", "text")


def q_decontaminate(spark, sf_dir):
    """Eval-set decontamination (GPT-3 appendix C): training docs
    sharing any word 6-gram with the held-out split (doc_id %
    DECONTAM_MOD == 0), with the count of contaminated shingles."""
    from gamma_spark.operators import dedup as D

    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % DECONTAM_MOD != 0)
    eval_df = docs.filter(F.col("doc_id") % DECONTAM_MOD == 0)
    return D.decontaminate(train, eval_df, "doc_id", "text", n=DECONTAM_N)


def _sql_decontaminate() -> str:
    from gamma_spark.operators import dedup as D

    return D.sql_decontaminate(
        f"SELECT * FROM documents WHERE doc_id % {DECONTAM_MOD} != 0",
        f"SELECT * FROM documents WHERE doc_id % {DECONTAM_MOD} = 0",
        "doc_id",
        "text",
        n=DECONTAM_N,
    )


def q_corpus_profile(spark, sf_dir):
    """Corpus profiling: per (lang, source) doc counts, token totals,
    distinct fingerprints and mean quality — the relational surface ×
    text-function integration a curation dashboard reads (pure
    Catalyst: one map-side-combinable agg over pushed-down columns)."""
    from gamma_spark.functions import text as T

    return (
        _t(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(T.token_count("text")).cast("long").alias("total_tokens"),
            F.countDistinct(T.fingerprint("text")).alias("distinct_fps"),
            F.sum(F.round(T.quality_score("text"), 7).cast("decimal(20,7)"))
            .cast("double")
            .alias("sum_quality"),
        )
    )


def _sql_corpus_profile() -> str:
    from gamma_spark.functions import text as T

    return f"""
SELECT lang, source,
       count(*) AS n_docs,
       sum({T.sql_token_count('text')})::BIGINT AS total_tokens,
       count(DISTINCT {T.sql_fingerprint('text')}) AS distinct_fps,
       (sum(round({T.sql_quality_score('text')}, 7)::DECIMAL(20,7)))::DOUBLE AS sum_quality
FROM documents
GROUP BY lang, source
"""


def q_ann_recall_checks(spark, sf_dir):
    """All trained-index recall gates (IVFFLAT / IVFPQ / HNSW graph /
    HNSW routed scan / VEARCH-ScaNN / IVFSQ8) as ONE relation with a
    model discriminator — keeps every pruned search path
    driver-hash-checked in a single registry slot (VERDICT r3 #1
    consolidation pattern)."""
    # ONE exact baseline per metric, shared by every leg: each leg
    # used to build its own identical knn_join subplan — five L2 brute
    # joins where one (reused) suffices (r9 review)
    docs = _docs(spark, sf_dir)
    queries_df = _queries_df(spark, sf_dir)
    exact_l2 = knn.knn_join(docs, queries_df, k=KNN_K, metric="L2")
    exact_ip = knn.knn_join(docs, queries_df, k=KNN_K, metric="IP")
    parts = [
        q_ivf_recall_check(spark, sf_dir, exact_l2).withColumn("model", F.lit("IVFFLAT")),
        q_pq_recall_check(spark, sf_dir, exact_l2).withColumn("model", F.lit("IVFPQ")),
        q_hnsw_recall_check(spark, sf_dir, exact_l2).withColumn("model", F.lit("HNSW")),
        q_hnsw_scan_recall_check(spark, sf_dir, exact_l2).withColumn("model", F.lit("HNSW-SCAN")),
        q_scann_recall_check(spark, sf_dir, exact_ip).withColumn("model", F.lit("VEARCH")),
        q_sq8_recall_check(spark, sf_dir, exact_l2).withColumn("model", F.lit("IVFSQ8")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _sql_ann_recall_checks() -> str:
    return " UNION ALL ".join(
        f"SELECT *, '{m}' AS model FROM ({s}) t{i}"
        for i, (m, s) in enumerate(
            [
                ("IVFFLAT", SQL_IVF_RECALL_CHECK),
                ("IVFPQ", SQL_PQ_RECALL_CHECK),
                ("HNSW", SQL_HNSW_RECALL_CHECK),
                ("HNSW-SCAN", SQL_HNSW_SCAN_RECALL_CHECK),
                ("VEARCH", SQL_SCANN_RECALL_CHECK),
                ("IVFSQ8", SQL_SQ8_RECALL_CHECK),
            ]
        )
    )


def q_knn_sq8_rerank_exact(spark, sf_dir):
    """IVFSQ8 with full probes + recall_num = N + exact rerank: the
    compressed tier's two-phase path degenerates to exact brute force
    (candidates from dequantized scores, truth from the rerank) —
    operators/sq.py, the ZFP-tier analogue made oracle-exact."""
    from gamma_spark.operators.sq import IvfSq8Index

    docs = _docs(spark, sf_dir)
    n = docs.count()
    idx = IvfSq8Index.build(docs, ncentroids=IVF_NCENT, seed=42)
    return idx.search(
        docs, _queries_df(spark, sf_dir), k=KNN_K, metric="L2",
        nprobe=IVF_NCENT, recall_num=n, has_rank=True,
    )


def q_knn_ivfpq_variants_exact(spark, sf_dir):
    """Exact-degenerate parity for the compressed-tier family as ONE
    relation with a variant column: the three IVFPQ variants (rerank /
    OPQ / 4-bit fastscan, K3/K4) plus the IVFSQ8 two-phase path —
    four registry slots' coverage in one, every codes→ADC/decode→rerank
    pipeline still hash-checked."""
    parts = [
        q_knn_ivfpq_rerank_exact(spark, sf_dir).withColumn("variant", F.lit("RERANK")),
        q_knn_ivfpq_opq_exact(spark, sf_dir).withColumn("variant", F.lit("OPQ")),
        q_knn_ivfpq_fastscan_exact(spark, sf_dir).withColumn("variant", F.lit("FASTSCAN")),
        q_knn_sq8_rerank_exact(spark, sf_dir).withColumn("variant", F.lit("SQ8RERANK")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _sql_knn_ivfpq_variants_exact() -> str:
    return " UNION ALL ".join(
        f"SELECT *, '{v}' AS variant FROM ({SQL_KNN_L2}) t{i}"
        for i, v in enumerate(["RERANK", "OPQ", "FASTSCAN", "SQ8RERANK"])
    )


def q_knn_hamming_variants(spark, sf_dir):
    """K6 Hamming parity, both execution paths, one relation: the flat
    bit-kernel scan (`knn_join` HAMMING) and BINARYIVF with full probes
    (`index/impl/gamma_index_binary_ivf.cc:281-331` exact-degenerate) —
    two registry slots become one, both paths still hash-checked."""
    parts = [
        q_knn_hamming(spark, sf_dir).withColumn("variant", F.lit("FLAT")),
        q_knn_binaryivf_exact(spark, sf_dir).withColumn("variant", F.lit("BINARYIVF")),
    ]
    return parts[0].unionByName(parts[1])


def _sql_knn_hamming_variants() -> str:
    return " UNION ALL ".join(
        f"SELECT *, '{v}' AS variant FROM ({SQL_KNN_HAMMING}) t{i}"
        for i, v in enumerate(["FLAT", "BINARYIVF"])
    )


def q_knn_graph_models_exact(spark, sf_dir):
    """Corpus-scale kNN join parity for BOTH distributed twins (IVF
    cogroup-BLAS and PQ cogroup-ADC+rerank) as one relation with a
    model column — every embedding queries the corpus, queries never
    collected, exact-degenerate configs hash-match the all-pairs
    oracle (consolidates knn_graph_exact + pq_graph_exact)."""
    parts = [
        q_knn_graph_exact(spark, sf_dir).withColumn("model", F.lit("IVF")),
        q_pq_graph_exact(spark, sf_dir).withColumn("model", F.lit("PQ")),
    ]
    return parts[0].unionByName(parts[1])


def _sql_knn_graph_models_exact() -> str:
    return " UNION ALL ".join(
        f"SELECT *, '{m}' AS model FROM ({SQL_KNN_GRAPH}) t{i}"
        for i, m in enumerate(["IVF", "PQ"])
    )


def q_filter_tags_variants(spark, sf_dir):
    """F3/F4/F5 tag-filter semantics as ONE relation with a variant
    column (consolidates filter_tags_and + filter_tags_or_notin; both
    predicate shapes still hash-checked)."""
    parts = [
        q_filter_tags_and(spark, sf_dir).withColumn("variant", F.lit("AND")),
        q_filter_tags_or_notin(spark, sf_dir).withColumn("variant", F.lit("OR_NOTIN")),
    ]
    return parts[0].unionByName(parts[1])


def _sql_filter_tags_variants() -> str:
    return " UNION ALL ".join(
        f"SELECT *, '{v}' AS variant FROM ({s}) t{i}"
        for i, (v, s) in enumerate(
            [("AND", SQL_FILTER_TAGS_AND), ("OR_NOTIN", SQL_FILTER_TAGS_OR_NOTIN)]
        )
    )


def q_filter_scalar_variants(spark, sf_dir):
    """The full scalar-filter algebra (F2 range incl. include-flags,
    F3 term OR, F4 term AND, F5 NOT-IN, F6 multi-filter AND, F9
    filter-only + total) as ONE relation with a variant column — the
    r11 consolidation of the filter_range_term + filter_only_topn +
    filter_tags_variants registry rows (VERDICT r10 #3: free driver
    headroom; every predicate shape stays hash-checked and the
    underlying functions remain for bench/pytest). Harmonized schema
    (variant, doc_id, info, n_chars, total): ``info`` carries each
    variant's discriminating strings via NULL-propagating concat so
    the oracle's ``||`` compares identically under the dirty-data
    gate."""
    rt = q_filter_range_term(spark, sf_dir).select(
        F.lit("RANGE_TERM").alias("variant"),
        "doc_id",
        F.concat(F.col("lang"), F.lit(":"), F.col("source")).alias("info"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.lit(None).cast("long").alias("total"),
    )
    fo = q_filter_only_topn(spark, sf_dir).select(
        F.lit("FILTER_ONLY").alias("variant"),
        "doc_id",
        F.col("lang").alias("info"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("total").cast("long").alias("total"),
    )

    def _tags(fn, tag):
        return fn(spark, sf_dir).select(
            F.lit(tag).alias("variant"),
            "doc_id",
            F.col("tags_csv").alias("info"),
            F.lit(None).cast("long").alias("n_chars"),
            F.lit(None).cast("long").alias("total"),
        )

    return (
        rt.unionByName(fo)
        .unionByName(_tags(q_filter_tags_and, "TAGS_AND"))
        .unionByName(_tags(q_filter_tags_or_notin, "TAGS_OR_NOTIN"))
    )


def _sql_filter_scalar_variants() -> str:
    legs = [
        ("RANGE_TERM",
         "SELECT doc_id, lang || ':' || source AS info, "
         "n_chars::BIGINT AS n_chars, NULL::BIGINT AS total "
         f"FROM ({SQL_FILTER_RANGE_TERM}) s"),
        ("FILTER_ONLY",
         "SELECT doc_id, lang AS info, n_chars::BIGINT AS n_chars, "
         f"total::BIGINT AS total FROM ({SQL_FILTER_ONLY_TOPN}) s"),
        ("TAGS_AND",
         "SELECT doc_id, tags_csv AS info, NULL::BIGINT AS n_chars, "
         f"NULL::BIGINT AS total FROM ({SQL_FILTER_TAGS_AND}) s"),
        ("TAGS_OR_NOTIN",
         "SELECT doc_id, tags_csv AS info, NULL::BIGINT AS n_chars, "
         f"NULL::BIGINT AS total FROM ({SQL_FILTER_TAGS_OR_NOTIN}) s"),
    ]
    return " UNION ALL ".join(
        f"SELECT '{v}' AS variant, * FROM ({s}) t{i}"
        for i, (v, s) in enumerate(legs)
    )


def q_lm_perplexity(spark, sf_dir):
    """Corpus-trained bigram-LM perplexity (CCNet quality filter,
    Wenzek et al. 2020): the documents table is both training corpus
    and scoring target — per-doc (n_bigrams, sum_logp, ppl) under the
    add-alpha bigram model (operators/quality.py lm_perplexity)."""
    from gamma_spark.operators.quality import lm_perplexity

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return lm_perplexity(docs, docs)


def _sql_lm_perplexity() -> str:
    from gamma_spark.operators.quality import sql_lm_perplexity

    return sql_lm_perplexity("documents", "documents")


def q_embedding_neardup_variants(spark, sf_dir):
    """Both embedding near-dup paths as ONE relation with a variant
    column — the exact all-pairs operator and the multi-band
    hyperplane-LSH scale path (consolidates embedding_neardup +
    embedding_neardup_lsh; both still hash-checked)."""
    from gamma_spark.operators import dedup as D

    star = D.embedding_neardup_banded(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        threshold=EMB_NEARDUP_T, dim=64, pairs="star",
    )
    parts = [
        q_embedding_neardup(spark, sf_dir).withColumn("variant", F.lit("EXACT")),
        q_embedding_neardup_lsh(spark, sf_dir).withColumn("variant", F.lit("LSH")),
        # r11 mega-cluster guard: hub-member LSH edges only (m-1 per
        # bucket, not C(m,2)) — the group-resolution scale mode, hash-
        # checked against the identical DuckDB hub construction
        star.withColumn("variant", F.lit("STAR")),
        # r11: the recommended verified-path mode — exact all-pairs in
        # buckets up to star_cap, star above. star_cap=8 is deliberately
        # tiny so BOTH branches are active at sf0.01 (default buckets
        # average ~20 members) and the size crossover itself is
        # hash-checked engine-to-engine
        D.embedding_neardup_banded(
            _t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
            threshold=EMB_NEARDUP_T, dim=64, pairs="hybrid", star_cap=8,
        ).withColumn("variant", F.lit("HYBRID")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _sql_embedding_neardup_variants() -> str:
    from gamma_spark.operators import dedup as D

    star_sql = D.sql_embedding_neardup_banded(
        "embeddings", "vec_id", "embedding", EMB_NEARDUP_T, dim=64, pairs="star"
    )
    return " UNION ALL ".join(
        f"SELECT *, '{v}' AS variant FROM ({s}) t{i}"
        for i, (v, s) in enumerate(
            [
                ("EXACT", _sql_embedding_neardup()),
                ("LSH", _sql_embedding_neardup_lsh()),
                ("STAR", star_sql),
                (
                    "HYBRID",
                    D.sql_embedding_neardup_banded(
                        "embeddings", "vec_id", "embedding", EMB_NEARDUP_T,
                        dim=64, pairs="hybrid", star_cap=8,
                    ),
                ),
            ]
        )
    )


def q_incdedup_match(spark, sf_dir):
    """Incremental near-dup dedup (MinHashIndex): the corpus split
    doc_id % 3 != 0 is indexed once, then the % 3 == 0 batch is matched
    against the standing buckets — (new_id, corpus_id) LSH candidates
    with NO corpus-side recompute (the nightly-crawl shape;
    operators/dedup.py MinHashIndex, SCALING.md rehearsal 1M corpus)."""
    from gamma_spark.operators import dedup as D

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 3 == 0)
    return D.MinHashIndex.build(corpus, "doc_id", "text").match(new)


def _sql_incdedup_match() -> str:
    from gamma_spark.operators import dedup as D

    rows_per_band = D.N_HASHES // D.N_BANDS

    def banded(sig_cte: str) -> str:
        selects = []
        for b in range(D.N_BANDS):
            cols = " || ':' || ".join(
                f"h{b * rows_per_band + r}::VARCHAR" for r in range(rows_per_band)
            )
            selects.append(f"SELECT doc_id, {b} AS band, {cols} AS bsig FROM {sig_cte}")
        return " UNION ALL ".join(selects)

    sig_c = D.sql_minhash_signatures(
        D.sql_shingles("(SELECT * FROM documents WHERE doc_id % 3 <> 0)", "doc_id", "text"),
        "doc_id",
    )
    sig_n = D.sql_minhash_signatures(
        D.sql_shingles("(SELECT * FROM documents WHERE doc_id % 3 = 0)", "doc_id", "text"),
        "doc_id",
    )
    return f"""
WITH sig_c AS ({sig_c}), sig_n AS ({sig_n}),
bc AS ({banded('sig_c')}), bn AS ({banded('sig_n')})
SELECT DISTINCT bn.doc_id AS new_id, bc.doc_id AS corpus_id
FROM bn JOIN bc ON bn.band = bc.band AND bn.bsig = bc.bsig
"""


# ---------------------------------------------------------------------------
# corpus transforms: PII scrubbing + paragraph-level dedup (north-star)
# ---------------------------------------------------------------------------

def _seeded_pii_docs(spark, sf_dir) -> DataFrame:
    """The synthetic documents carry no PII, so the query plants a
    deterministic email/IP/phone per doc (pure column arithmetic both
    engines reproduce) — the scrub+count pipeline is then a real
    hash-checked transformation, not a trivially-zero report."""
    from gamma_spark.operators import transforms as TR  # noqa: F401

    d = _t(spark, sf_dir, "documents")
    seeded = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com at 10."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."), ((F.col("doc_id") * 7) % 256).cast("string"),
        F.lit(" or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return d.select("doc_id", seeded.alias("text"))


_SQL_SEEDED_PII = """
SELECT doc_id,
       text || ' contact user' || doc_id::VARCHAR || '@example.com at 10.'
            || (doc_id % 256)::VARCHAR || '.0.' || ((doc_id * 7) % 256)::VARCHAR
            || ' or +1-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') AS text
FROM documents
"""


def q_pii_scrub(spark, sf_dir):
    """PII scrubbing + normalization over the documents table (planted
    deterministic PII): per-doc counts of each redacted class, the
    scrubbed text, and its normalized form. Pure scan-stage Catalyst
    expressions — zero shuffles (operators/transforms.py)."""
    from gamma_spark.operators import transforms as TR

    return TR.scrub_pii(_seeded_pii_docs(spark, sf_dir))


def _sql_pii_scrub() -> str:
    from gamma_spark.operators import transforms as TR

    return f"WITH documents_seeded AS ({_SQL_SEEDED_PII})\n" + TR.sql_scrub_pii(
        "documents_seeded"
    )


def q_paragraph_dedup(spark, sf_dir):
    """Corpus-wide paragraph-level exact dedup (CCNet/Dolma pattern):
    documents chunked map-side into 20-token paragraphs, the first
    occurrence of each distinct paragraph survives, docs reassembled
    from survivors. Two map-side-combinable shuffles total
    (operators/transforms.py docstring carries the 100 TB argument)."""
    from gamma_spark.operators import transforms as TR

    return TR.paragraph_dedup(
        _t(spark, sf_dir, "documents"), "doc_id", "text", width=20
    )


def _sql_paragraph_dedup() -> str:
    from gamma_spark.operators import transforms as TR

    return TR.sql_paragraph_dedup("documents", "doc_id", "text", width=20)


# ---------------------------------------------------------------------------
# contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: filtered exact kNN (pre-filter + top-k + projection) on
    sf0.001 — gamma's Search hot path end to end."""
    sf_dir = "/root/testdata/sf0.001"
    docs = _docs(spark, sf_dir)
    queries = _queries_df(spark, sf_dir)
    hits = knn.knn_join(
        docs, queries, k=10, metric="IP", predicate=F.col("label").isin(0, 1, 2)
    )
    return hits.join(docs.select("_docid", "label"), on="_docid", how="inner")


#: queries not yet expected in the newest CORRECTNESS artifact (added
#: or renamed since, or r3 registry-tail casualties now moved into the
#: verified window) — tests/test_registry.py allows exactly these to be
#: absent from it; prune this set once the next artifact lands
NEWLY_ADDED: set[str] = {
    # r11 consolidation row (replaces three driver-verified rows whose
    # every predicate shape it still hash-checks)
    "filter_scalar_variants",
}
# r10: pruned to empty — every registry key is driver-verified in
# CORRECTNESS_r09, so the r4/r5 exemptions had gone stale (a stale
# exemption silently weakens the verified-or-declared-new gate for
# exactly that key). Add keys here ONLY when introducing a row after
# the newest CORRECTNESS artifact; prune again once it lands.


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry contract (VERDICT r3 #1): the driver CORRECTNESS check
    caps at the FIRST 50 entries, so the registry holds exactly <= 50
    and never-yet-verified / newest queries lead. Consolidations that
    made room (no capability lost):

    - knn_ip/l2/cosine_topk -> one ``knn_metrics_topk`` union with a
      metric column (all three metrics still hash-checked);
    - ``knn_ivfflat_pruned`` / ``knn_ivfpq_adc`` dropped as registry
      rows: they were rows-only ``no_oracle`` checks, and the SAME
      pruned code paths run inside the hash-checked
      ``ivf_recall_check`` / ``pq_recall_check`` rows;
    - ``dedup_minhash_lsh`` folded into ``dedup_minhash_verified``
      (identical candidate generation + an exact-Jaccard verify on top);
    - ``simhash_signatures`` folded into ``simhash_neardup_pairs``
      (signatures are its first stage; banding is lossless).
    """
    return {
        # --- newest (never driver-verified): corpus transforms +
        # incremental dedup ---
        # --- new in r11: the scalar-filter algebra as one variants
        # union (consolidates filter_range_term + filter_only_topn +
        # filter_tags_variants -> 2 driver slots freed, VERDICT r10 #3)
        "filter_scalar_variants": q_filter_scalar_variants,
        "pii_scrub": q_pii_scrub,
        "paragraph_dedup": q_paragraph_dedup,
        "incdedup_match": q_incdedup_match,
        "lm_perplexity": q_lm_perplexity,
        # --- new in r5: lexical/hybrid retrieval, curation signals ---
        "bm25_topk": q_bm25_topk,
        "hybrid_rrf": q_hybrid_rrf,
        "quality_signals": q_quality_signals,
        "decontaminate": q_decontaminate,
        "corpus_profile": q_corpus_profile,
        # r5 consolidations (4 recall gates -> 1 slot, 3 IVFPQ exact
        # variants -> 1 slot; every underlying path still hash-checked)
        "ann_recall_checks": q_ann_recall_checks,
        "knn_ivfpq_variants_exact": q_knn_ivfpq_variants_exact,
        # --- never driver-verified in r3 (registry tail casualties) ---
        "events_session_window": q_events_session_window,
        "engine_status": q_engine_status,
        "order_priority_ranks": q_order_priority_ranks,
        "lineitem_by_region": q_lineitem_by_region,
        # --- new in r4 ---
        "faiss_load_search": q_faiss_load_search,
        "knn_ip_filtered_banded": q_knn_ip_filtered_banded,
        "search_request_full": q_search_request_full,
        "mixture_sample": q_mixture_sample,
        "pack_sequences": q_pack_sequences,
        "knn_graph_banded": q_knn_graph_banded,
        "multimodal_resize": q_multimodal_resize,
        "multimodal_audio": q_multimodal_audio,
        "knn_metrics_topk": q_knn_metrics_topk,
        # --- stable suite ---
        # knn_ip_filtered + knn_ip_banded consolidated into
        # knn_ip_filtered_banded above (functions remain for pytest)
        # knn_hamming_topk + knn_binaryivf_exact consolidated into
        # knn_hamming_variants (both paths still hash-checked)
        "knn_hamming_variants": q_knn_hamming_variants,
        "knn_fusion_multivector": q_knn_fusion_variants,
        "knn_ivfflat_exact": q_knn_ivfflat_exact,
        # knn_ivfpq_{rerank,opq,fastscan}_exact consolidated into
        # knn_ivfpq_variants_exact above (functions remain for pytest)
        # filter_range_term folded into filter_scalar_variants (r11)
        "knn_multivid_collapse": q_knn_multivid_collapse,
        # filter_tags_and + filter_tags_or_notin consolidated into
        # filter_tags_variants folded into filter_scalar_variants (r11)
        # search_projected_l2sqrt + search_with_total consolidated into
        # search_request_full above (functions remain for pytest)
        # filter_only_topn folded into filter_scalar_variants (r11)
        "point_lookup": q_point_lookup,
        # upsert_last_wins folded into upsert_chain (the chain's first
        # batch IS the within-batch last-wins case; S2/S3 semantics all
        # hash-checked there) to keep the registry at the 50-row driver
        # window; the function remains for bench/pytest.
        "upsert_chain": q_upsert_chain,
        "delete_by_filter": q_delete_by_filter,
        "snapshot_roundtrip": q_snapshot_roundtrip,
        "migrate_export": q_migrate_export,
        "pricing_summary": q_pricing_summary,
        "top_customers": q_top_customers,
        "events_hourly": q_events_hourly,
        "text_stats": q_text_stats,
        "dedup_exact": q_dedup_exact,
        # dedup_jaccard folded into dedup_minhash_verified (exact
        # n-gram Jaccard is its verify stage) and dedup_groups into
        # curation_pipeline + semantic_dedup_groups (CC + keeper runs
        # hash-checked in both) — functions remain for bench/pytest.
        # embedding_neardup + embedding_neardup_lsh consolidated into
        # embedding_neardup_variants (both paths still hash-checked)
        "embedding_neardup_variants": q_embedding_neardup_variants,
        "curation_pipeline": q_curation_pipeline,
        "semantic_dedup_groups": q_semantic_dedup_groups,
        "simhash_neardup_pairs": q_simhash_neardup_pairs,
        "dedup_minhash_verified": q_dedup_minhash_verified,
        "knn_hybrid_pending_exact": q_knn_hybrid_exact,
        # ivf/pq/hnsw/scann recall checks consolidated into
        # ann_recall_checks above; knn_graph_exact + pq_graph_exact
        # consolidated into knn_graph_models_exact (both distributed
        # twins still hash-checked; functions remain for bench/pytest)
        "knn_graph_models_exact": q_knn_graph_models_exact,
        "events_sliding_window": q_events_sliding_window,
        "events_sessionization": q_events_sessionization,
        # multimodal_features was folded into multimodal_resize (same
        # encode->decode->pool pipeline plus the resize stage) to make
        # room for multimodal_audio within the 50-row window; the
        # function remains for bench/pytest.
    }


def oracle_sql() -> dict[str, str]:
    return {
        "filter_scalar_variants": _sql_filter_scalar_variants(),
        "pii_scrub": _sql_pii_scrub(),
        "paragraph_dedup": _sql_paragraph_dedup(),
        "events_session_window": SQL_EVENTS_SESSION_WINDOW,
        "engine_status": SQL_ENGINE_STATUS,
        "order_priority_ranks": SQL_ORDER_PRIORITY_RANKS,
        "lineitem_by_region": SQL_LINEITEM_BY_REGION,
        "knn_graph_banded": SQL_KNN_GRAPH_BANDED,
        "multimodal_resize": SQL_MULTIMODAL_RESIZE,
        "multimodal_audio": SQL_MULTIMODAL_AUDIO,
        "knn_metrics_topk": SQL_KNN_METRICS,
        "knn_ip_filtered_banded": SQL_KNN_IP_FILTERED_BANDED,
        "knn_hamming_variants": _sql_knn_hamming_variants(),
        "knn_fusion_multivector": SQL_KNN_FUSION_VARIANTS,
        "knn_ivfflat_exact": SQL_KNN_L2,
        "knn_ivfpq_variants_exact": _sql_knn_ivfpq_variants_exact(),
        "knn_multivid_collapse": SQL_KNN_MULTIVID_COLLAPSE,
        "lm_perplexity": _sql_lm_perplexity(),
        "search_request_full": SQL_SEARCH_REQUEST_FULL,
        "faiss_load_search": SQL_KNN_L2,
        "point_lookup": SQL_POINT_LOOKUP,
        "upsert_chain": SQL_UPSERT_CHAIN,
        "delete_by_filter": SQL_DELETE_BY_FILTER,
        "snapshot_roundtrip": SQL_SNAPSHOT_ROUNDTRIP,
        "migrate_export": SQL_MIGRATE_EXPORT,
        "pricing_summary": SQL_PRICING_SUMMARY,
        "top_customers": SQL_TOP_CUSTOMERS,
        "events_hourly": SQL_EVENTS_HOURLY,
        "text_stats": _sql_text_stats(),
        "dedup_exact": _sql_dedup_exact(),
        "embedding_neardup_variants": _sql_embedding_neardup_variants(),
        "incdedup_match": _sql_incdedup_match(),
        "curation_pipeline": _sql_curation_pipeline(),
        "semantic_dedup_groups": _sql_semantic_dedup_groups(),
        "simhash_neardup_pairs": _sql_simhash_neardup_pairs(),
        "dedup_minhash_verified": _sql_dedup_minhash_verified(),
        "knn_hybrid_pending_exact": SQL_KNN_L2,
        "ann_recall_checks": _sql_ann_recall_checks(),
        "bm25_topk": _sql_bm25_topk(),
        "hybrid_rrf": _sql_hybrid_rrf(),
        "quality_signals": _sql_quality_signals(),
        "decontaminate": _sql_decontaminate(),
        "corpus_profile": _sql_corpus_profile(),
        "mixture_sample": _sql_mixture_sample(),
        "pack_sequences": _sql_pack_sequences(),
        "knn_graph_models_exact": _sql_knn_graph_models_exact(),
        "events_sliding_window": SQL_EVENTS_SLIDING_WINDOW,
        "events_sessionization": SQL_EVENTS_SESSIONIZATION,
    }
