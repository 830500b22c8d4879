"""Scale rehearsal for the two-level (hierarchical) coarse quantizer:
at ncentroids where the flat probe's broadcast is still cheap, verify
the relation-based probe (a) returns the same answers, (b) costs an
acceptable constant factor, so the 65k+-centroid regime (where flat
probing is impossible) has a measured, working plan.

Usage: python tools/scale_check_hier.py [n_docs] [ncentroids] [out_dir]
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
from gamma_spark.session import get_spark  # noqa: E402
from tools.scale_check import make_corpus  # noqa: E402

K = 10


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    ncent = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/gamma_hier"
    shutil.rmtree(out, ignore_errors=True)
    spark = get_spark("hier-check")

    docs = make_corpus(spark, n, os.path.join(out, "docs"))
    docs.count()

    t0 = time.time()
    idx = IvfFlatIndex.build(
        docs, ncentroids=ncent, sample_size=100_000, seed=42,
        path=os.path.join(out, "ivf"),
    )
    idx.index_df.count()
    t_build = time.time() - t0
    t0 = time.time()
    idx.build_hierarchy()
    t_hier = time.time() - t0
    nsuper = len(idx._hierarchy[0])

    nq = min(20_000, n // 4)
    qbig = docs.filter(F.col("_docid") < nq).select(
        F.col("_docid").alias("qid"), F.col("embedding").alias("qvec")
    )

    # exact truth on a 64-query probe subset
    qsmall = spark.createDataFrame(
        [
            (int(r._docid), list(map(float, r.embedding)))
            for r in docs.filter(F.col("_docid") < 64).collect()
        ],
        "qid long, qvec array<float>",
    )
    truth: dict[int, set] = {}
    for r in knn.knn_scan(docs, qsmall, k=K, metric="L2").collect():
        truth.setdefault(r.qid, set()).add(r._docid)

    def recall(rows) -> float:
        got: dict[int, set] = {}
        for r in rows:
            got.setdefault(r.qid, set()).add(r._docid)
        return sum(
            len(got.get(q, set()) & s) / len(s) for q, s in truth.items()
        ) / len(truth)

    results = {
        "n_docs": n, "ncentroids": ncent, "nsuper": nsuper,
        "n_queries": nq, "k": K,
        "build_sec": round(t_build, 2), "hier_build_sec": round(t_hier, 2),
    }
    nprobe = max(8, ncent // 256)
    for mode, kw in (
        ("flat", {}),
        ("hier_w4", {"hierarchical": True, "super_probe": 4}),
        ("hier_w8", {"hierarchical": True, "super_probe": 8}),
    ):
        t0 = time.time()
        res = idx.knn_join_distributed(qbig, k=K, metric="L2", nprobe=nprobe, **kw)
        cnt = res.count()
        results[f"{mode}_sec"] = round(time.time() - t0, 2)
        results[f"{mode}_rows"] = cnt
        results[f"{mode}_recall"] = round(
            recall(res.filter(F.col("qid") < 64).collect()), 4
        )
        print(json.dumps({mode: results[f"{mode}_sec"],
                          "recall": results[f"{mode}_recall"]}), file=sys.stderr)

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
