"""Quantify the sharded-HNSW "union advantage" (the honest
architecture note in docs/SCALING.md): our K5 is a union of
independent per-shard graphs (the Vespa/Milvus segment pattern), so at
equal ``ef`` it does nshards x the traversal work of the reference's
single monolithic hnswlib graph (`index/impl/hnswlib/hnswalg.h`) and
structurally yields HIGHER recall — its anchor number is therefore not
a like-for-like traversal comparison. This rehearsal puts a NUMBER on
that advantage: one hard-overlap corpus (noise high enough that recall
actually discriminates), one exact ground truth, then a
(nshards x ef) grid at the published graph knobs (m=32, efc=160):

* monolithic (nshards=1) vs sharded (4, 32) at EQUAL ef — the
  structural advantage itself;
* monolithic at ef = nshards x base — the equal-total-budget leg: the
  union's extra recall is bought with extra work a single graph could
  also spend, so the fair comparison is budget-matched.

The monolithic build is one task on one core (the shard builder with
nshards=1) — that is the point: it IS the reference's build shape.

Usage: python tools/scale_check_hnsw_union.py [n] [nq] [noise] [out]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gamma_spark.operators import knn  # noqa: E402
from gamma_spark.operators.hnsw import HnswIndex  # noqa: E402
from gamma_spark.session import get_spark  # noqa: E402
from tools.scale_check_sift import (  # noqa: E402
    make_queries,
    make_sift_like,
    recall_at,
)

K = 10


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    noise = float(sys.argv[3]) if len(sys.argv) > 3 else 1.2
    out = sys.argv[4] if len(sys.argv) > 4 else "/tmp/gamma_hnsw_union"
    shutil.rmtree(out, ignore_errors=True)
    spark = get_spark("hnsw-union")
    results: dict = {"n": n, "nq": nq, "noise": noise, "m": 32,
                     "ef_construction": 160, "rows": []}

    def mark(msg):
        print(f"[union] {msg}", file=sys.stderr, flush=True)

    mark("corpus")
    t0 = time.time()
    docs = make_sift_like(spark, n, os.path.join(out, "docs"), noise, 128, 0)
    docs.count()
    queries = make_queries(spark, nq, noise, 128, 0)
    results["corpus_s"] = round(time.time() - t0, 1)

    mark("ground truth")
    t0 = time.time()
    truth = {
        r.qid: r._docid
        for r in knn.knn_scan(docs, queries, k=1, metric="L2").collect()
    }
    results["ground_truth_s"] = round(time.time() - t0, 1)

    # (nshards, [ef legs]) — the monolithic row also gets the
    # budget-matched legs (ef = 4x and 32x the 64 base) so the union
    # advantage can be read at equal ef AND at equal total work
    grid = [
        (1, [16, 64, 256, 2048]),
        (4, [16, 64]),
        (32, [16, 64]),
    ]
    for nshards, efs in grid:
        mark(f"build nshards={nshards}")
        t0 = time.time()
        idx = HnswIndex.build(
            docs, nshards=nshards, m=32, ef_construction=160, metric="L2",
            path=os.path.join(out, f"hnsw_{nshards}"),
        )
        build_s = round(time.time() - t0, 1)
        for ef in efs:
            mark(f"search nshards={nshards} ef={ef}")
            t0 = time.time()
            got = idx.search(
                None, queries, k=K, ef_search=ef, mode="graph"
            ).collect()
            row = {
                "nshards": nshards,
                "ef": ef,
                "build_s": build_s,
                "search_s": round(time.time() - t0, 1),
                # searched with k=K=10: only @1/@10 are measurable
                **recall_at(got, truth, ks=(1, 10)),
            }
            results["rows"].append(row)
            mark(f"  -> {row}")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
