"""Job-level profile of one bench entry (r12 measurement harness).

Runs a named bench entry in a session with the UI/REST API enabled,
then reads /api/v1 jobs+stages to break the entry's wall time into its
driver-job sequence: per-job duration, task count, and the gap to the
previous job (driver-side planning / py4j / commit latency lives in
the gaps). This is guide §1.1's empirical loop for a suite whose
entries are driver-latency-bound at bench scale.

Usage:
  python tools/profile_entry.py <entry> [sf_dir] [repeats]

Prints one JSON line per repeat plus a per-job table for the best
repeat.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from gamma_spark.session import get_spark  # noqa: E402


def _api(port: int, path: str):
    url = f"http://localhost:{port}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as fh:
        return json.load(fh)


def main():
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    spark = get_spark(
        "profile-entry", extra_conf={"spark.ui.enabled": "true"}
    )
    sc = spark.sparkContext
    port = int(sc.uiWebUrl.rsplit(":", 1)[1])
    app_id = sc.applicationId

    import bench

    qs = bench.extra_queries(entry_mod)
    bench_fns = {
        "knn_scan_512q": lambda: bench.bench_knn_scan(spark, sf_dir),
        "ivf_build_search_512q": lambda: bench.bench_ivf(spark, sf_dir),
        "hnsw_build_search_512q": lambda: bench.bench_hnsw(spark, sf_dir),
        "hnsw_bulk_routed": lambda: bench.bench_hnsw_bulk_routed(spark, sf_dir),
        "vearch_build_search_512q": lambda: bench.bench_vearch(spark, sf_dir),
        "sq8_build_search_512q": lambda: bench.bench_sq8(spark, sf_dir),
        "knn_graph_selfjoin": lambda: bench.bench_knn_graph(spark, sf_dir),
        "knn_graph_distributed_10kq": lambda: bench.bench_knn_graph_10kq(spark, sf_dir),
        "embedding_neardup_banded": lambda: bench.bench_neardup_banded(spark, sf_dir),
        "pq_build_search": lambda: entry_mod.q_knn_ivfpq_adc(spark, sf_dir).count(),
    }
    if name in bench_fns:
        fn = bench_fns[name]
    elif name.endswith("_noop"):
        base = name[: -len("_noop")]
        fn = lambda: qs[base](spark, sf_dir).write.format("noop").mode(  # noqa: E731
            "overwrite"
        ).save()
    else:
        fn = lambda: qs[name](spark, sf_dir).count()  # noqa: E731

    # warmup (workers, JIT, parquet footers)
    fn()
    spark.catalog.clearCache()

    walls = []
    marks = []
    for rep in range(repeats):
        jobs_before = {j["jobId"] for j in _api(port, f"applications/{app_id}/jobs")}
        t0 = time.time()
        fn()
        wall = time.time() - t0
        walls.append(round(wall, 3))
        jobs = [
            j
            for j in _api(port, f"applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        marks.append((wall, sorted(jobs, key=lambda j: j["jobId"])))
        spark.catalog.clearCache()
        try:
            sc._jvm.System.gc()
        except Exception:
            pass

    best_wall, best_jobs = min(marks, key=lambda m: m[0])
    print(json.dumps({"entry": name, "walls": walls}))

    def _ts(s):
        return time.mktime(time.strptime(s[:19], "%Y-%m-%dT%H:%M:%S")) + float(
            "0." + s[20:23] if len(s) > 20 else 0
        )

    prev_end = None
    total_job = 0.0
    total_gap = 0.0
    print(f"{'job':>5} {'dur_s':>7} {'gap_s':>7} {'tasks':>6}  description")
    for j in sorted(best_jobs, key=lambda j: j["jobId"]):
        st = _ts(j["submissionTime"])
        en = _ts(j["completionTime"]) if j.get("completionTime") else st
        dur = en - st
        gap = (st - prev_end) if prev_end is not None else 0.0
        prev_end = en
        total_job += dur
        total_gap += max(0.0, gap)
        desc = (j.get("description") or j.get("name") or "")[:90]
        print(
            f"{j['jobId']:>5} {dur:>7.3f} {max(0.0, gap):>7.3f} "
            f"{j.get('numTasks', 0):>6}  {desc}"
        )
    print(
        json.dumps(
            {
                "best_wall": round(best_wall, 3),
                "n_jobs": len(best_jobs),
                "sum_job_s": round(total_job, 3),
                "sum_gap_s": round(total_gap, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
