"""Isolated best-of-N A/B for single bench entries (VERDICT r5 #3).

Suite-level drift on untouched code paths is often contention noise
(the r4 dedup_groups scare: exonerated by exactly this methodology,
groups.py:71-76). This runs ONE bench function N times in a quiet
session — fresh cache state per repeat, nothing else on the JVM — and
prints min/median/all, so a +47% suite drift can be pinned as real or
noise. Run it from each code tree under comparison (e.g. HEAD vs a
round-tip worktree) with the SAME sf_dir.

PROTOCOL (r7): when comparing two code trees, run the pair in BOTH
orders (A,B then B,A) and compare within-position — on this host the
first JVM of a back-to-back sequence wins by ~10-20% regardless of
tree (the upsert_chain exoneration, docs/SCALING.md r7 note), so a
single-order pair confounds tree identity with position.

Usage: python tools/ab_bench.py <entry> [repeats] [sf_dir]
  entry: a builder shorthand {vearch, hnsw, sq8, knn_scan, ivf,
  knn_graph, knn_graph_10kq, neardup} OR any bench-suite name — every
  registry row (__spark_entry__.queries()) plus the stable bench-only
  names (knn_ip_topk, dedup_groups, ...) resolves, so any entry the
  BENCH artifact times can be A/B'd in isolation (r6).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from gamma_spark.session import get_spark  # noqa: E402

ENTRIES = {
    "vearch": "bench_vearch",
    "hnsw": "bench_hnsw",
    "sq8": "bench_sq8",
    "knn_scan": "bench_knn_scan",
    "ivf": "bench_ivf",
    "knn_graph": "bench_knn_graph",
    "knn_graph_10kq": "bench_knn_graph_10kq",
    "neardup": "bench_neardup_banded",
}


def _resolve(entry: str):
    """Builder shorthand first, then any bench-suite query name: the
    registry callables plus the consolidated-but-still-benched names
    (mirrors the ``qs`` map in bench.main)."""
    if entry in ENTRIES:
        return getattr(bench, ENTRIES[entry])
    import __spark_entry__ as entry_mod

    qs = {
        **entry_mod.queries(),
        "knn_ip_topk": entry_mod.q_knn_ip,
        "knn_hamming_topk": entry_mod.q_knn_hamming,
        "dedup_minhash_lsh": entry_mod.q_dedup_minhash_lsh,
        "simhash_signatures": entry_mod.q_simhash_signatures,
        "multimodal_features": entry_mod.q_multimodal_features,
        "upsert_last_wins": entry_mod.q_upsert_last_wins,
        "dedup_groups": entry_mod.q_dedup_groups,
        "knn_fusion_multivector": entry_mod.q_knn_fusion,
        "knn_fusion_distributed": entry_mod.q_knn_fusion_distributed,
    }
    if entry not in qs:
        raise SystemExit(
            f"unknown entry {entry!r}; builders: {sorted(ENTRIES)}; "
            f"queries: {sorted(qs)}"
        )
    q = qs[entry]
    return lambda spark, sf_dir: q(spark, sf_dir).count()


def main():
    entry = sys.argv[1]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    fn = _resolve(entry)
    spark = get_spark("ab-bench")
    times = []
    for i in range(repeats):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        fn(spark, sf_dir)
        times.append(round(time.time() - t0, 3))
    out = {
        "entry": entry,
        "sf_dir": sf_dir,
        "repeats": repeats,
        "best": min(times),
        "median": statistics.median(times),
        "times": times,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
