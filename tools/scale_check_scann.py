"""Does the anisotropic objective actually buy MIPS recall at equal
code budget? Plain-Lloyd vs anisotropic codebooks (VEARCH, SURVEY K7)
on the same 200k mixture corpus, same 4-bit budget, rerank DISABLED so
codebook quality is exposed (rerank would mask it). Records recall@10
against the exact IP kernel for docs/SCALING.md.

Usage: python tools/scale_check_scann.py [n_docs] [out_dir]
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
from gamma_spark.operators.pq import IvfPqIndex  # noqa: E402
from gamma_spark.session import get_spark  # noqa: E402
from tools.scale_check import make_corpus  # noqa: E402

K = 10
NQ = 256


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/gamma_scale_scann"
    shutil.rmtree(out, ignore_errors=True)
    spark = get_spark("scann-scale")
    results = {"n": n}

    docs = make_corpus(spark, n, os.path.join(out, "docs"))
    docs.count()
    qrows = docs.filter(F.col("_docid") < NQ).collect()
    queries = spark.createDataFrame(
        [(int(r._docid), list(map(float, r.embedding))) for r in qrows],
        "qid long, qvec array<float>",
    )
    exact = {
        (r.qid, r._docid)
        for r in knn.knn_scan(docs, queries, k=K, metric="IP").collect()
    }

    for name, aniso in (("plain", False), ("anisotropic", True)):
        t0 = time.time()
        idx = IvfPqIndex.build(
            docs, ncentroids=256, nsubvector=16, nbits=4,
            anisotropic=aniso, seed=42,
        )
        results[f"{name}_build_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        got = {
            (r.qid, r._docid)
            for r in idx.search(
                None, queries, k=K, metric="IP", nprobe=32,
                recall_num=128, has_rank=False,
            ).collect()
        }
        results[f"{name}_adc_s"] = round(time.time() - t0, 2)
        results[f"{name}_recall"] = round(len(got & exact) / len(exact), 4)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
