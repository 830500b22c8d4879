"""Scale rehearsal: generate a 200k x 64 vector corpus (40x the sf0.1
table), build the IVF family on it, and measure exact-scan vs pruned
search latency + recall. This is the local stand-in for the 100 TB
question: does nprobe pruning actually prune (partition-pruned parquet
scan), and does recall hold at the reference's operating points?

Usage: python tools/scale_check.py [n_docs] [out_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gamma_spark.operators import knn  # noqa: E402
from gamma_spark.operators.ivf import IvfFlatIndex  # noqa: E402
from gamma_spark.operators.pq import IvfPqIndex  # noqa: E402
from gamma_spark.session import get_spark  # noqa: E402

DIM = 64
N_CLUSTERS = 1024


def make_corpus(spark, n: int, path: str):
    """Deterministic synthetic vectors generated executor-side (seeded
    per docid) — no driver materialization, scales to any n."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            # one RNG per batch, seeded by the first id: deterministic
            # for a fixed partitioning of spark.range
            # mixture-of-gaussians corpus: real embedding spaces cluster,
            # and IVF recall is only meaningful on clustered data (pure
            # isotropic gaussian is the adversarial no-structure case)
            centers = np.stack(
                [np.random.default_rng(1000 + c).normal(0, 1, DIM) for c in range(N_CLUSTERS)]
            )
            vecs = []
            for i in ids:
                rng = np.random.default_rng(42 + int(i))
                c = int(rng.integers(0, N_CLUSTERS))
                vecs.append((centers[c] + 0.25 * rng.normal(0, 1, DIM)).astype(np.float32))
            yield pd.DataFrame({"_docid": ids, "embedding": vecs, "label": ids % 10})

    df = spark.range(n).repartition(32).mapInPandas(
        gen, schema="_docid long, embedding array<float>, label long"
    )
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/gamma_scale"
    shutil.rmtree(out, ignore_errors=True)
    spark = get_spark("scale-check")

    t0 = time.time()
    docs = make_corpus(spark, n, os.path.join(out, "docs"))
    docs.count()
    t_gen = time.time() - t0

    qrows = docs.filter(F.col("_docid") < 64).collect()
    queries = spark.createDataFrame(
        [(int(r._docid), list(map(float, r.embedding))) for r in qrows],
        "qid long, qvec array<float>",
    )

    # exact ground truth (scan kernel)
    t0 = time.time()
    exact = knn.knn_scan(docs, queries, k=10, metric="L2")
    exact_rows = exact.collect()
    t_flat = time.time() - t0
    truth = {}
    for r in exact_rows:
        truth.setdefault(r.qid, set()).add(r._docid)

    # IVF build (persisted, cluster-partitioned)
    t0 = time.time()
    ivf = IvfFlatIndex.build(
        docs, ncentroids=256, sample_size=100_000, seed=42,
        path=os.path.join(out, "ivf"),
    )
    ivf.index_df.count()
    t_build = time.time() - t0

    def recall(rows):
        got = {}
        for r in rows:
            got.setdefault(r.qid, set()).add(r._docid)
        return sum(len(got.get(q, set()) & s) / len(s) for q, s in truth.items()) / len(truth)

    results = {"n_docs": n, "gen_sec": round(t_gen, 2),
               "flat_scan_sec": round(t_flat, 2), "ivf_build_sec": round(t_build, 2)}
    for nprobe in (8, 32):
        t0 = time.time()
        rows = ivf.search(None, queries, k=10, metric="L2", nprobe=nprobe).collect()
        dt = time.time() - t0
        results[f"ivf_nprobe{nprobe}_sec"] = round(dt, 2)
        results[f"ivf_nprobe{nprobe}_recall"] = round(recall(rows), 4)

    # IVFPQ: codes + ADC + rerank at reference-like settings
    t0 = time.time()
    pq = IvfPqIndex.build(
        docs, ncentroids=256, nsubvector=8, sample_size=50_000, seed=42,
        path=os.path.join(out, "pq"),
    )
    pq.codes_df.count()
    results["pq_build_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    # recall_num must scale with list sizes: this corpus has ~n/1024
    # docs per true cluster, all near-equidistant (the hard case for PQ)
    rows = pq.search(docs, queries, k=10, metric="L2", nprobe=32,
                     recall_num=max(100, n // 1000), has_rank=True).collect()
    results["pq_nprobe32_sec"] = round(time.time() - t0, 2)
    results["pq_nprobe32_recall"] = round(recall(rows), 4)

    # corpus-scale distributed kNN join: a 100k-query DataFrame (never
    # collected) against the full corpus through the cluster-cogrouped
    # path — the kNN-graph / semantic-dedup shape
    nq = min(100_000, n // 2)
    qbig = docs.filter(F.col("_docid") < nq).select(
        F.col("_docid").alias("qid"), F.col("embedding").alias("qvec")
    )
    t0 = time.time()
    dist = ivf.knn_join_distributed(qbig, k=10, metric="L2", nprobe=8)
    nres = dist.count()
    results["dist_join_nq"] = nq
    results["dist_join_sec"] = round(time.time() - t0, 2)
    results["dist_join_rows"] = nres
    results["dist_join_recall"] = round(
        recall(dist.filter(F.col("qid") < 64).collect()), 4
    )

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
