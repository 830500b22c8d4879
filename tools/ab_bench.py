"""Isolated best-of-N A/B for single bench entries (VERDICT r5 #3).

Suite-level drift on untouched code paths is often contention noise
(the r4 dedup_groups scare: exonerated by exactly this methodology,
groups.py:71-76). Single-tree mode runs ONE bench function N times in a
quiet session — fresh cache state per repeat, nothing else on the JVM —
and prints min/median/all.

PROTOCOL (r7, AUTOMATED r8): when comparing two code trees, the pair
must run in BOTH orders (A,B then B,A) and be compared within-position —
on this host the first JVM of a back-to-back sequence wins by ~10-20%
regardless of tree (the upsert_chain exoneration, docs/SCALING.md r7
note), so a single-order pair confounds tree identity with position.
``--ab`` runs all four (order x position) cells in one invocation, each
in a fresh subprocess JVM, and emits the within-position deltas plus a
verdict; single-tree mode NEVER prints a verdict line, so a mis-run
one-order comparison cannot masquerade as the protocol.

SWAP-CHECK (r10 lesson, docs/ab_r10): the AB+BA schedule always puts
tree A in time slots {1,4} and tree B in {2,3}; non-monotone host drift
that keys on the absolute slot (observed: inner slots consistently
slower) then produces a consistent same-sign verdict on bit-identical
code. A verdict-grade ``A_faster``/``B_faster`` must therefore survive
a SECOND ``--ab`` run with the tree arguments swapped — the label must
follow the tree, not the slot (the decontaminate adjudication flipped
with the swap and was thereby exonerated). ``--ab A B --swap-check``
automates this: both runs in one invocation, combined verdict
{A_faster_confirmed, B_faster_confirmed, slot_bias, noise,
inconclusive}.

Usage:
  python tools/ab_bench.py <entry> [repeats] [sf_dir]            # measure
  python tools/ab_bench.py <entry> [repeats] [sf_dir] --ab A B   # verdict
  (internal) --tree <path>: resolve gamma_spark/bench from that tree

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
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENTRIES = {
    "vearch": "bench_vearch",
    "hnsw": "bench_hnsw",
    "sq8": "bench_sq8",
    "knn_scan": "bench_knn_scan",
    "ivf": "bench_ivf",
    "knn_graph": "bench_knn_graph",
    "knn_graph_10kq": "bench_knn_graph_10kq",
    "neardup": "bench_neardup_banded",
    "hnsw_bulk_routed": "bench_hnsw_bulk_routed",
}

# two positions can only call the same tree "faster" together if each
# position's delta clears this band — below it the verdict is "noise"
NOISE_BAND = 0.05


def _resolve(entry: str):
    """Builder shorthand first, then any bench-suite query name: the
    registry callables plus the consolidated-but-still-benched names
    (mirrors the ``qs`` map in bench.main)."""
    import bench

    if entry in ENTRIES:
        return getattr(bench, ENTRIES[entry])
    import __spark_entry__ as entry_mod

    if hasattr(bench, "extra_queries"):
        qs = bench.extra_queries(entry_mod)
    else:
        # --tree pointing at a pre-r9 tree whose bench.py predates the
        # extra_queries helper: registry rows still resolve, only the
        # bench-only consolidated names need the helper
        qs = dict(entry_mod.queries())
    if entry not in qs:
        raise SystemExit(
            f"unknown entry {entry!r}; builders: {sorted(ENTRIES)}; "
            f"queries: {sorted(qs)}"
        )
    q = qs[entry]
    return lambda spark, sf_dir: q(spark, sf_dir).count()


def _measure(entry: str, repeats: int, sf_dir: str, tree: str) -> dict:
    """Single-tree measurement (one JVM). NO verdict is ever attached
    here — only the dual-order --ab mode may print one."""
    sys.path.insert(0, tree)
    from gamma_spark.session import get_spark

    fn = _resolve(entry)
    spark = get_spark("ab-bench")
    times = []
    for _ in range(repeats):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        fn(spark, sf_dir)
        times.append(round(time.time() - t0, 3))
    out = {
        "entry": entry,
        "tree": tree,
        "sf_dir": sf_dir,
        "repeats": repeats,
        "best": min(times),
        "median": statistics.median(times),
        "times": times,
    }
    spark.stop()
    return out


def _run_cell(entry: str, repeats: int, sf_dir: str, tree: str) -> dict:
    """One (tree, position) cell in a FRESH subprocess JVM, so position
    effects come only from the host, never from shared process state."""
    proc = subprocess.run(
        [
            sys.executable, os.path.abspath(__file__),
            entry, str(repeats), sf_dir, "--tree", tree,
        ],
        capture_output=True,
        text=True,
    )
    if proc.returncode != 0:
        raise SystemExit(
            f"cell failed (tree={tree}): {proc.stderr.strip()[-2000:]}"
        )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def _ab(entry: str, repeats: int, sf_dir: str, tree_a: str, tree_b: str) -> dict:
    """The full protocol: sequence 1 = (A then B), sequence 2 =
    (B then A); compare within-position so JVM-order bias cancels.
    Returns the result dict (caller prints)."""
    tree_a, tree_b = os.path.abspath(tree_a), os.path.abspath(tree_b)
    for t in (tree_a, tree_b):
        if not os.path.isdir(os.path.join(t, "gamma_spark")):
            raise SystemExit(f"{t} is not a gamma_spark tree")
    cells = {}  # (tree_label, position) -> measurement
    for seq, order in (("AB", ("A", "B")), ("BA", ("B", "A"))):
        for pos, label in enumerate(order, start=1):
            tree = tree_a if label == "A" else tree_b
            print(
                f"[ab] seq {seq} position {pos}: tree {label} ({tree})",
                file=sys.stderr,
            )
            cells[(label, pos)] = _run_cell(entry, repeats, sf_dir, tree)

    deltas = {}
    for pos in (1, 2):
        a, b = cells[("A", pos)]["best"], cells[("B", pos)]["best"]
        deltas[f"pos{pos}"] = {
            "A_best": a,
            "B_best": b,
            # >0: B is slower than A by this fraction
            "b_over_a": round(b / a - 1.0, 4) if a > 0 else None,
        }
    d1, d2 = deltas["pos1"]["b_over_a"], deltas["pos2"]["b_over_a"]
    if d1 is None or d2 is None:
        verdict = "invalid"
    elif d1 > NOISE_BAND and d2 > NOISE_BAND:
        verdict = "A_faster"
    elif d1 < -NOISE_BAND and d2 < -NOISE_BAND:
        verdict = "B_faster"
    elif abs(d1) <= NOISE_BAND and abs(d2) <= NOISE_BAND:
        verdict = "noise"
    else:
        verdict = "inconclusive_positions_disagree"
    return {
        "entry": entry,
        "sf_dir": sf_dir,
        "repeats": repeats,
        "tree_a": tree_a,
        "tree_b": tree_b,
        "protocol": "dual-order within-position (A,B then B,A)",
        "positions": deltas,
        "noise_band": NOISE_BAND,
        "verdict": verdict,
        "cells": {f"{lbl}@pos{pos}": m for (lbl, pos), m in cells.items()},
    }


def _ab_swap_checked(
    entry: str, repeats: int, sf_dir: str, tree_a: str, tree_b: str
) -> dict:
    """The r10 verdict-grade protocol (docs/ab_r10): run the dual-order
    A/B twice — once as given, once with the TREE ARGUMENTS SWAPPED —
    and require the faster label to FOLLOW THE TREE across the swap.
    The AB+BA schedule always hands tree A the outer time slots {1,4};
    host drift that keys on the slot then produces a consistent
    same-sign verdict on bit-identical code (measured: the decontaminate
    exoneration). The swap is the control that separates tree identity
    from slot identity:

      run1 A_faster + run2 B_faster  -> A_faster_confirmed (tree effect)
      run1 B_faster + run2 A_faster  -> B_faster_confirmed
      same winner LABEL in both runs -> slot_bias (host artifact)
      both noise                     -> noise
      anything else                  -> inconclusive
    """
    run1 = _ab(entry, repeats, sf_dir, tree_a, tree_b)
    print("[ab] swap-check: rerunning with tree labels swapped",
          file=sys.stderr)
    run2 = _ab(entry, repeats, sf_dir, tree_b, tree_a)
    v1, v2 = run1["verdict"], run2["verdict"]
    if v1 == "A_faster" and v2 == "B_faster":
        verdict = "A_faster_confirmed"
    elif v1 == "B_faster" and v2 == "A_faster":
        verdict = "B_faster_confirmed"
    elif v1 == v2 and v1 in ("A_faster", "B_faster"):
        verdict = "slot_bias"
    elif v1 == "noise" and v2 == "noise":
        verdict = "noise"
    else:
        verdict = "inconclusive"
    return {
        "entry": entry,
        "sf_dir": sf_dir,
        "repeats": repeats,
        "tree_a": os.path.abspath(tree_a),
        "tree_b": os.path.abspath(tree_b),
        "protocol": "dual-order within-position x tree-swap control",
        "verdict": verdict,
        "run1": run1,
        "run2_swapped": run2,
    }


def main():
    argv = list(sys.argv[1:])
    tree = REPO
    ab_trees = None
    if "--tree" in argv:
        i = argv.index("--tree")
        tree = os.path.abspath(argv[i + 1])
        del argv[i : i + 2]
    if "--ab" in argv:
        i = argv.index("--ab")
        ab_trees = (argv[i + 1], argv[i + 2])
        del argv[i : i + 3]
    swap_check = "--swap-check" in argv
    if swap_check:
        argv.remove("--swap-check")
    entry = argv[0]
    repeats = int(argv[1]) if len(argv) > 1 else 8
    sf_dir = argv[2] if len(argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    if ab_trees and swap_check:
        print(json.dumps(_ab_swap_checked(entry, repeats, sf_dir, *ab_trees)))
    elif ab_trees:
        print(json.dumps(_ab(entry, repeats, sf_dir, *ab_trees)))
    else:
        print(json.dumps(_measure(entry, repeats, sf_dir, tree)))


if __name__ == "__main__":
    main()
