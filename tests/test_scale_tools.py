"""Tiny-scale smoke pins for the judge-facing anchor/sweep rehearsal
tools (tools/scale_check_sift.py, tools/scale_check_sweeps.py).

The tools' real oracles are their 1M/10M runs recorded in
docs/SCALING.md + docs/ab_r9/; these tests only pin that the tools
still RUN end-to-end against the library API — an index-builder
signature change must fail here, in CI, not in the next round's
manual anchor refresh. Knobs are shrunk for wall clock; recall floors
are loose (tiny corpora are noisy) but nonzero, so a silently-empty
result also fails.
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name: str, spark=None):
    path = os.path.join(REPO, "tools", f"{name}.py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    if spark is not None:
        # run as a script the tool pickles its generators by value
        # (__main__); imported as a named module they pickle by
        # REFERENCE, so executors' python workers must be able to
        # import it
        spark.sparkContext.addPyFile(path)
    return mod


def test_sift_anchor_tool_end_to_end(spark, tmp_path):
    sift = _load("scale_check_sift", spark)
    from gamma_spark.operators import knn
    from gamma_spark.operators.pq import VearchIndex

    docs = sift.make_sift_like(
        spark, 3000, str(tmp_path / "docs"), noise=0.35, dim=32
    )
    queries = sift.make_queries(spark, 16, noise=0.35, dim=32)
    truth = {
        r.qid: r._docid
        for r in knn.knn_scan(docs, queries, k=1, metric="L2").collect()
    }
    assert len(truth) == 16
    idx = VearchIndex.build(
        docs, ncentroids=16, nsubvector=16, nbits=8, seed=42,
        path=str(tmp_path / "idx"),
    )
    got = idx.search(
        None, queries, k=16, metric="L2", nprobe=8,
        recall_num=64, has_rank=True,
    ).collect()
    rec = sift.recall_at(got, truth)
    assert set(rec) == {"recall@1", "recall@10", "recall@100"}
    assert rec["recall@100"] >= 0.5  # loose floor; zero means broken

    # the intrinsic-manifold variant stays rank-limited and runnable
    mdocs = sift.make_sift_like(
        spark, 500, str(tmp_path / "mdocs"), noise=0.35, dim=32,
        intrinsic=4,
    )
    import numpy as np

    mat = np.stack(
        [r.embedding for r in mdocs.limit(200).collect()]
    ).astype(np.float64)
    # rank of the centered sample ~= intrinsic dim, far below ambient
    s = np.linalg.svd(mat - mat.mean(axis=0), compute_uv=False)
    assert (s > 1e-6 * s[0]).sum() <= 8


def test_sweeps_tool_point_runner(spark, tmp_path):
    sift = _load("scale_check_sift", spark)
    sweeps = _load("scale_check_sweeps")
    from gamma_spark.operators import knn
    from gamma_spark.operators.pq import IvfPqIndex

    docs = sift.make_sift_like(
        spark, 2000, str(tmp_path / "docs"), noise=0.6, dim=32
    )
    queries = sift.make_queries(spark, 8, noise=0.6, dim=32)
    truth = {
        r.qid: r._docid
        for r in knn.knn_scan(docs, queries, k=1, metric="L2").collect()
    }
    idx = IvfPqIndex.build(
        docs, ncentroids=8, nsubvector=8, nbits=8, seed=42,
        path=str(tmp_path / "idx"),
    )
    point = sweeps.run_point(idx, queries, truth, 8, nprobe=4, rerank=True)
    assert {"recall@1", "recall@10", "recall@100", "search_s", "qps"} <= set(
        point
    )
    assert point["qps"] > 0 and point["recall@100"] >= 0.5
