"""Stage-level profile of the HNSW 512q search leg (VERDICT r10 #4).

The `hnsw_build_search_512q` bench row spends ~79% of its time in the
search leg; this tool decomposes that leg into:

  - executor kernel segments, booked by spark accumulators inside the
    cogroup UDF (hnsw.py per_shard, opt-in `profile=` dict):
      stack_s   argsort + Arrow->numpy stacking + vecs prep
      adj_s     per-node python rebuild of the adjacency lists
      kernel_s  the traversal (or GEMM scan) math itself
      emit_s    score mapping + band + pandas assembly
  - everything else = wall - executor busy: cogroup shuffle write/read
    of the graph relation, Arrow serialization, scheduling, and the
    driver-side top-k merge stage.

Usage:
  python tools/profile_hnsw.py [sf_dir] [repeats]

Prints one JSON line and appends a row to docs/profile_hnsw_r11.md is
left to the operator (this tool only measures).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from gamma_spark.operators.hnsw import HnswIndex  # noqa: E402
from gamma_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("hnsw-profile")
    sc = spark.sparkContext

    docs = entry_mod._docs(spark, sf_dir)
    # the exact bench_hnsw shape (bench.py): 8 shards, m=16, efc=80, L2
    t0 = time.time()
    idx = HnswIndex.build(docs, nshards=8, m=16, ef_construction=80, metric="L2")
    idx.index_df.cache().count()
    build_s = time.time() - t0
    queries = docs.select(
        F.col("_docid").alias("qid"), F.col("embedding").alias("qvec")
    ).limit(512)

    results = []
    for rep in range(repeats + 1):  # first pass = warmup, untimed
        prof = {
            k: sc.accumulator(0.0)
            for k in ("stack_s", "adj_s", "kernel_s", "emit_s")
        }
        prof.update({k: sc.accumulator(0) for k in ("blocks", "rows", "queries")})
        t0 = time.time()
        n = idx.search(
            None, queries, k=10, ef_search=64, mode="graph", profile=prof
        ).count()
        wall = time.time() - t0
        row = {k: round(float(a.value), 3) for k, a in prof.items()}
        row["wall_s"] = round(wall, 3)
        row["n_out"] = n
        busy = sum(
            row[k] for k in ("stack_s", "adj_s", "kernel_s", "emit_s")
        )
        row["udf_busy_s"] = round(busy, 3)
        # per-task busy ~ busy/blocks; overhead = wall - (busy / slots)
        # is crude on a shared host, so report both raw numbers
        if rep > 0:
            results.append(row)
        print(f"[profile] rep{rep}{' (warmup)' if rep == 0 else ''}: {row}",
              file=sys.stderr)

    if not results:
        raise SystemExit(
            "need repeats >= 1 beyond the warmup pass (rep 0 is untimed)"
        )
    best = min(results, key=lambda r: r["wall_s"])
    out = {
        "what": "hnsw_512q_search_leg_profile",
        "sf_dir": sf_dir,
        "build_s": round(build_s, 3),
        "repeats": repeats,
        "best": best,
        "all": results,
        "shape": {"nshards": 8, "m": 16, "ef_search": 64, "k": 10,
                  "mode": "graph", "queries": 512},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
