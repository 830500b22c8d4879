"""Hybrid-search scale rehearsal: 512 queries, each with a lexical leg
(4 BM25 terms, champion-pruned) AND a vector leg (64-dim embedding,
IVF-pruned), fused by RRF — the full round-5 SearchRequest shape at
1M documents.

Measures the end-to-end wall time of the exact request a production
hybrid engine serves, with both legs on their scale paths (champions
bounding the lexical agg, nprobe bounding the vector scan), and checks
that every query's fused top-k contains its own source doc (the
planted self-hit both systems agree on).

Usage: python tools/scale_check_hybrid.py [n_docs] [n_queries]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gamma_spark.operators.ivf import IvfFlatIndex  # noqa: E402
from gamma_spark.operators.retrieval import Bm25Index, rrf_fuse  # noqa: E402
from gamma_spark.session import get_spark  # noqa: E402
from tools.scale_check import make_corpus  # noqa: E402
from tools.scale_check_bm25 import make_zipf_corpus  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    spark = get_spark("hybrid-scale")
    root = tempfile.mkdtemp(prefix="gamma_hybrid_scale_")
    results = {"n_docs": n, "n_queries": nq}

    # one logical corpus, two modalities keyed by the same id
    texts = make_zipf_corpus(spark, n).cache()
    texts.count()
    make_corpus(spark, n, f"{root}/vecs")
    vecs = spark.read.parquet(f"{root}/vecs")

    t0 = time.time()
    idx = IvfFlatIndex.build(vecs, ncentroids=256, seed=42)
    idx.index_df.cache().count()
    results["ivf_build_sec"] = round(time.time() - t0, 2)

    # materialized lexical index: the one corpus-sized shuffle happens
    # here, once; searches are then broadcast-join work only
    t0 = time.time()
    bm25 = Bm25Index.build(texts, path=f"{root}/bm25")
    results["bm25_build_sec"] = round(time.time() - t0, 2)

    # queries: every (n // nq)-th doc queries with its own text head +
    # its own embedding — both systems should surface the source doc
    stride = n // nq
    qtext = (
        texts.filter(F.col("doc_id") % stride == 0)
        .select(
            (F.col("doc_id") / stride).cast("long").alias("qid"),
            F.explode(F.slice(F.split("text", " "), 1, 4)).alias("term"),
        )
        .distinct()
        .cache()
    )
    nq_actual = qtext.select("qid").distinct().count()
    results["n_queries"] = nq_actual
    qvec_rows = (
        vecs.filter(F.col("_docid") % stride == 0)
        .select(
            (F.col("_docid") / stride).cast("long").alias("qid"),
            F.col("embedding").alias("qvec"),
        )
    )

    def run_hybrid():
        lex = bm25.search(qtext, k=20, champions=4000)
        vec = idx.search(None, qvec_rows, k=20, metric="L2", nprobe=8)
        return rrf_fuse([lex, vec], k=10)

    t0 = time.time()
    fused = run_hybrid().cache()
    n_rows = fused.count()
    results["hybrid_sec"] = round(time.time() - t0, 2)
    results["result_rows"] = n_rows
    t0 = time.time()
    run_hybrid().count()
    results["hybrid_warm_sec"] = round(time.time() - t0, 2)

    # self-hit check: query q's source doc id is q*stride
    hits = (
        fused.filter(F.col("_docid") == F.col("qid") * stride)
        .select("qid").distinct().count()
    )
    results["self_hit_rate"] = round(hits / nq_actual, 4)

    print(json.dumps(results))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
