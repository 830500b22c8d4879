"""ANN default calibration (VERDICT r3 #9): sweep nprobe / recall_num
at the reference's production anchors (ncentroids 2048, nprobe 80,
`index/impl/gamma_index_ivfpq.h:676-707`; test anchors ncentroids 256,
nprobe 10, `tests/test.h:51-66`) over a 200k x 64 mixture-of-gaussians
corpus, measuring recall@10 vs the exact kernel and wall latency for a
512-query batch. Records the curve for docs/SCALING.md so the engine's
default knobs have measured footing.

Usage: python tools/calibrate_ann.py [n_docs] [out_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gamma_spark.operators import knn  # noqa: E402
from gamma_spark.operators.ivf import IvfFlatIndex  # noqa: E402
from gamma_spark.operators.pq import IvfPqIndex  # noqa: E402
from gamma_spark.session import get_spark  # noqa: E402
from tools.scale_check import make_corpus  # noqa: E402

K = 10
NQ = 512


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/gamma_calibrate"
    shutil.rmtree(out, ignore_errors=True)
    spark = get_spark("ann-calibrate")

    docs = make_corpus(spark, n, os.path.join(out, "docs"))
    docs.count()
    qrows = docs.filter(F.col("_docid") < NQ).collect()
    queries = spark.createDataFrame(
        [(int(r._docid), list(map(float, r.embedding))) for r in qrows],
        "qid long, qvec array<float>",
    )

    t0 = time.time()
    exact_rows = knn.knn_scan(docs, queries, k=K, metric="L2").collect()
    t_exact = time.time() - t0
    truth: dict[int, set] = {}
    for r in exact_rows:
        truth.setdefault(r.qid, set()).add(r._docid)

    def recall(rows) -> float:
        got: dict[int, set] = {}
        for r in rows:
            got.setdefault(r.qid, set()).add(r._docid)
        return sum(
            len(got.get(q, set()) & s) / len(s) for q, s in truth.items()
        ) / len(truth)

    results = {"n_docs": n, "dim": 64, "k": K, "n_queries": NQ,
               "exact_scan_sec": round(t_exact, 2), "ivf": [], "pq": []}

    for ncent in (256, 2048):
        t0 = time.time()
        ivf = IvfFlatIndex.build(
            docs, ncentroids=ncent, sample_size=100_000, seed=42,
            path=os.path.join(out, f"ivf{ncent}"),
        )
        ivf.index_df.count()
        t_build = round(time.time() - t0, 2)
        for nprobe in (1, 4, 10, 25, 80):
            if nprobe > ncent:
                continue
            t0 = time.time()
            rows = ivf.search(None, queries, k=K, metric="L2", nprobe=nprobe).collect()
            results["ivf"].append({
                "ncentroids": ncent, "nprobe": nprobe,
                "build_sec": t_build,
                "search_sec": round(time.time() - t0, 2),
                "recall": round(recall(rows), 4),
            })
        print(json.dumps(results["ivf"][-1]), file=sys.stderr)

    t0 = time.time()
    pq = IvfPqIndex.build(
        docs, ncentroids=2048, nsubvector=8, sample_size=50_000, seed=42,
        path=os.path.join(out, "pq2048"),
    )
    pq.codes_df.count()
    t_build = round(time.time() - t0, 2)
    for nprobe, recall_num in ((10, 64), (80, 64), (80, 256), (80, 1000)):
        t0 = time.time()
        rows = pq.search(
            docs, queries, k=K, metric="L2",
            nprobe=nprobe, recall_num=recall_num, has_rank=True,
        ).collect()
        results["pq"].append({
            "ncentroids": 2048, "nsubvector": 8, "nprobe": nprobe,
            "recall_num": recall_num, "build_sec": t_build,
            "search_sec": round(time.time() - t0, 2),
            "recall": round(recall(rows), 4),
        })
        print(json.dumps(results["pq"][-1]), file=sys.stderr)

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
