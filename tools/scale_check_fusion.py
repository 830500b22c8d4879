"""Corpus-scale multi-vector fusion rehearsal (VERDICT r5 #5).

The multi-field semantic-dedup shape (`vector/vector_manager.cc:512-561`
with |Q| ~ |corpus|): every document queries TWO per-field ANN indexes
through `knn_join_distributed` (queries never collected), and `fuse()`
intersects docids + boost-sums scores — the production configuration of
the `knn_fusion_multivector` DISTRIBUTED oracle row, but with *pruned*
nprobe instead of the exact-degenerate full probe the oracle needs.

Measures:
- wall time of the fused corpus x corpus run at pruned nprobe;
- fused recall@k against the exact fused answer on a query sample
  (exact = full-probe + rescore legs for the sampled queries only —
  computing the exact fused answer for all |corpus| queries would be
  the all-pairs cost the operator exists to avoid).

Usage: python tools/scale_check_fusion.py [n_docs] [nprobe] [n_sample]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gamma_spark.operators.fusion import fuse  # noqa: E402
from gamma_spark.operators.ivf import IvfFlatIndex  # noqa: E402
from gamma_spark.session import get_spark  # noqa: E402
from tools.scale_check import make_corpus  # noqa: E402

K_PER_FIELD = 20
K_FUSED = 5
BOOSTS = [0.7, 0.3]
NCENTROIDS = 256


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nprobe = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_sample = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    out = "/tmp/gamma_scale_fusion"
    shutil.rmtree(out, ignore_errors=True)
    spark = get_spark("fusion-scale")
    results = {"n_docs": n, "nprobe": nprobe, "ncentroids": NCENTROIDS,
               "k_per_field": K_PER_FIELD, "k_fused": K_FUSED}

    docs = make_corpus(spark, n, os.path.join(out, "docs")).withColumn(
        "emb2", F.reverse(F.col("embedding"))
    )
    docs = docs.cache()
    docs.count()

    t0 = time.time()
    idx1 = IvfFlatIndex.build(docs, doc_vec="embedding", ncentroids=NCENTROIDS, seed=42)
    idx2 = IvfFlatIndex.build(docs, doc_vec="emb2", ncentroids=NCENTROIDS, seed=43)
    results["build_sec"] = round(time.time() - t0, 2)

    q1 = docs.select(F.col("_docid").alias("qid"), F.col("embedding").alias("qvec"))
    q2 = docs.select(F.col("_docid").alias("qid"), F.col("emb2").alias("qvec"))

    # the timed production run: |Q| = |corpus|, pruned nprobe, salted
    t0 = time.time()
    r1 = idx1.knn_join_distributed(q1, k=K_PER_FIELD, metric="IP", nprobe=nprobe)
    r2 = idx2.knn_join_distributed(
        q2, k=K_PER_FIELD, metric="IP", nprobe=nprobe, doc_vec="emb2"
    )
    fused = fuse([r1, r2], boosts=BOOSTS, metric="IP", k=K_FUSED).cache()
    n_fused = fused.count()
    results["fused_corpus_sec"] = round(time.time() - t0, 2)
    results["fused_rows"] = n_fused

    # exact fused answer on a sample: full probe + rescore degenerates
    # each leg to exact (the oracle identity the sf0.01 hash check pins)
    sample_ids = [r._docid for r in docs.select("_docid")
                  .filter(F.col("_docid") % (max(n // n_sample, 1)) == 0)
                  .limit(n_sample).collect()]
    sdf = spark.createDataFrame([(int(i),) for i in sample_ids], "qid long")
    q1s = q1.join(F.broadcast(sdf), "qid")
    q2s = q2.join(F.broadcast(sdf), "qid")
    t0 = time.time()
    e1 = idx1.knn_join_distributed(
        q1s, k=K_PER_FIELD, metric="IP", nprobe=NCENTROIDS, rescore=True
    )
    e2 = idx2.knn_join_distributed(
        q2s, k=K_PER_FIELD, metric="IP", nprobe=NCENTROIDS, rescore=True,
        doc_vec="emb2",
    )
    exact = fuse([e1, e2], boosts=BOOSTS, metric="IP", k=K_FUSED).cache()
    n_exact = exact.count()
    results["exact_sample_sec"] = round(time.time() - t0, 2)

    inter = (
        fused.join(F.broadcast(sdf), "qid")
        .select("qid", "_docid")
        .intersect(exact.select("qid", "_docid"))
        .count()
    )
    results["sample_queries"] = len(sample_ids)
    results["exact_pairs"] = n_exact
    results["fused_recall_at_k"] = round(inter / max(n_exact, 1), 4)

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
