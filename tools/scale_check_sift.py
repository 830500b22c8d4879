"""Recall at the reference's OWN anchor configuration (VERDICT r8 #2).

BASELINE.md's only hard recall numbers are the `benchs/README.md`
SIFT1M table: Vearch (= anisotropic IVFPQ + exact rerank) at
ncentroids 1024, nprobe 40, 64 PQ bytes → recall@1/@10/@100 =
0.9814/0.9902/0.9902; hnsw 0.9795 (@1); ivfpq-no-rerank 0.8201 (@1).
The repo's six per-round recall gates run at sf-scale on 64-dim
mixtures — this rehearsal reproduces the published METHODOLOGY at the
anchor shape so a number sits next to the published one:

* corpus: 1M x 128-dim (SIFT's shape) clustered mixture. Real SIFT1M
  is not redistributable inside this container, so the corpus is
  synthetic — recall is therefore comparable within a stated
  tolerance, not bit-for-bit (the reference README itself warns its
  numbers "change slightly due to ... different machines").
* queries: held OUT of the corpus (SIFT's query set is disjoint).
* ground truth: exact L2 scan (the faiss/reference methodology).
* recall@k: fraction of queries whose TRUE 1-NN appears in the top-k
  result — the faiss definition the reference tables use, which is
  why rerank makes @10 and @100 equal (once the true NN survives the
  ADC candidate cut, exact rerank pins it to rank 1).
* n >= 5M switches to the published SIFT10M knobs (ncentroids 2048,
  nprobe 80 — `benchs/README.md` "recalls of SIFT10M", published
  Vearch row 0.977/0.9774/0.9774) and skips the HNSW leg (a 10M
  graph build is hours of single-host compute for no extra anchor —
  the published 10M tables are IVF-family rows).
* dim=512 (argv[5]) is the VGG-shaped anchor: the published VGG1M
  table (Vearch 0.9651/0.9702/0.9703 at the same ncentroids 1024 /
  nprobe 40 / 64 PQ-byte knobs) is 512-dim VGG features. The HNSW
  leg is skipped off the SIFT shape (BASELINE.md carries no VGG HNSW
  row); 64 PQ bytes means dsub 8 instead of 2.
* intrinsic=d (argv[6], 0 = off) plants the mixture inside a seeded
  d-dimensional subspace of the ambient space. A fully isotropic
  512-dim mixture is the WORST case for 64-byte PQ — every dimension
  carries independent noise, so residuals are incompressible and the
  measured recall legitimately undershoots the published VGG row
  (0.88-0.94 vs 0.9651 across the noise sweep). Real VGG activations
  concentrate near a low-dimensional manifold — the reason the
  reference's VGG recall matches its SIFT recall despite 4x the
  ambient dims — so the faithful VGG-shaped anchor is intrinsic<<512;
  the isotropic rows stay as the ambient-dim stress case.

Usage: python tools/scale_check_sift.py [n_docs] [nq] [out_dir] [noise] [dim] [intrinsic]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from gamma_spark.operators import knn  # noqa: E402
from gamma_spark.operators.hnsw import HnswIndex  # noqa: E402
from gamma_spark.operators.pq import IvfPqIndex, VearchIndex  # noqa: E402
from gamma_spark.session import get_spark  # noqa: E402

DIM = 128
N_CLUSTERS = 1000
NOISE = 0.35  # cluster std; overridable via argv[4] for harder variants
K = 100  # single k=100 search serves recall@{1,10,100}


def _basis(dim: int, intrinsic: int) -> np.ndarray | None:
    """Seeded orthonormal (intrinsic, dim) embedding of the latent
    subspace into the ambient space; None when intrinsic is off."""
    if not intrinsic or intrinsic >= dim:
        return None
    g = np.random.default_rng(99).normal(0.0, 1.0, (dim, intrinsic))
    q, _ = np.linalg.qr(g)
    return q.T  # (intrinsic, dim), rows orthonormal


def _centers(dim: int, intrinsic: int) -> np.ndarray:
    """Cluster centers, drawn in the latent space when intrinsic is on
    (then embedded), else in the ambient space."""
    d = intrinsic if intrinsic else dim
    c = np.stack(
        [
            np.random.default_rng(7000 + i).normal(0.0, 1.0, d)
            for i in range(N_CLUSTERS)
        ]
    )
    b = _basis(dim, intrinsic)
    return c if b is None else c @ b


def make_sift_like(
    spark, n: int, path: str, noise: float = NOISE, dim: int = DIM,
    intrinsic: int = 0,
):
    """Clustered corpus at the anchor shape (128-dim SIFT-like by
    default, 512-dim VGG-like via ``dim``), generated executor-side
    (seeded per docid, no driver materialization). Both source feature
    sets are clustered; the mixture reproduces the clustering, which
    is what IVF/HNSW recall actually depends on. ``intrinsic`` plants
    the whole mixture (centers AND noise) inside a seeded
    low-dimensional subspace — the VGG-manifold model (see module
    docstring)."""

    def gen(batches):
        centers = _centers(dim, intrinsic)
        basis = _basis(dim, intrinsic)
        nd = intrinsic if basis is not None else dim
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = []
            for i in ids:
                rng = np.random.default_rng(42 + int(i))
                c = int(rng.integers(0, N_CLUSTERS))
                eps = noise * rng.normal(0.0, 1.0, nd)
                if basis is not None:
                    eps = eps @ basis
                vecs.append((centers[c] + eps).astype(np.float32))
            yield pd.DataFrame({"_docid": ids, "embedding": vecs})

    df = spark.range(n).repartition(32).mapInPandas(
        gen, schema="_docid long, embedding array<float>"
    )
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def make_queries(
    spark, nq: int, noise: float = NOISE, dim: int = DIM, intrinsic: int = 0
):
    """Held-out query set: same mixture, disjoint seeds (negative id
    space), so no query vector exists in the corpus."""
    centers = _centers(dim, intrinsic)
    basis = _basis(dim, intrinsic)
    nd = intrinsic if basis is not None else dim
    rows = []
    for i in range(nq):
        rng = np.random.default_rng(10_000_000 + i)
        c = int(rng.integers(0, N_CLUSTERS))
        eps = noise * rng.normal(0.0, 1.0, nd)
        if basis is not None:
            eps = eps @ basis
        v = centers[c] + eps
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "qid long, qvec array<float>")


def recall_at(
    rows, truth: dict[int, int], ks: tuple[int, ...] = (1, 10, 100)
) -> dict[str, float]:
    """faiss recall@k: P(true 1-NN within the top-k). ``ks`` must not
    exceed the k the rows were searched with — a caller that searched
    k=10 would otherwise emit a recall@100 label computed over 10
    ranks (an under-measured number under a wrong name)."""
    by_q: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append((r.rank, r._docid))
    out = {}
    for k in ks:
        hit = sum(
            1
            for q, nn in truth.items()
            if any(d == nn for rk, d in by_q.get(q, []) if rk <= k)
        )
        out[f"recall@{k}"] = round(hit / len(truth), 4)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/gamma_scale_sift"
    noise = float(sys.argv[4]) if len(sys.argv) > 4 else NOISE
    dim = int(sys.argv[5]) if len(sys.argv) > 5 else DIM
    intrinsic = int(sys.argv[6]) if len(sys.argv) > 6 else 0
    shutil.rmtree(out, ignore_errors=True)
    spark = get_spark("sift-anchor")
    results: dict = {
        "n": n, "nq": nq, "dim": dim, "noise": noise, "intrinsic": intrinsic,
    }

    def mark(msg):
        print(f"[sift] {msg}", file=sys.stderr, flush=True)

    mark("corpus")
    t0 = time.time()
    docs = make_sift_like(
        spark, n, os.path.join(out, "docs"), noise, dim, intrinsic
    )
    docs.count()
    queries = make_queries(spark, nq, noise, dim, intrinsic)
    results["corpus_s"] = round(time.time() - t0, 1)

    # exact ground truth (the reference benchs' methodology)
    mark("ground truth")
    t0 = time.time()
    truth = {
        r.qid: r._docid
        for r in knn.knn_scan(docs, queries, k=1, metric="L2").collect()
    }
    results["ground_truth_s"] = round(time.time() - t0, 1)
    assert len(truth) == nq

    # --- anchor row 1: Vearch = anisotropic IVFPQ + exact rerank -------
    # SIFT1M knobs: ncentroids 1024, nprobe 40; SIFT10M knobs: 2048/80
    # (both 64 PQ bytes = nsubvector 64 x 8 bits, per BASELINE.md)
    big = n >= 5_000_000
    nc, nprobe = (2048, 80) if big else (1024, 40)
    results["ncentroids"], results["nprobe"] = nc, nprobe
    for label, cls_, rerank in (
        ("vearch_rerank", VearchIndex, True),
        ("ivfpq_no_rerank", IvfPqIndex, False),
    ):
        mark(f"build {label}")
        t0 = time.time()
        # path-backed: codes materialize partitioned by cluster_id at
        # build time, so search reads only probed clusters (partition
        # pruning) instead of lazily re-encoding the corpus per search
        # — build_s includes the one-time codes write, search_s is
        # genuinely search (r9 fix; earlier anchor search_s carried a
        # full corpus re-encode per search call)
        idx = cls_.build(
            docs, ncentroids=nc, nsubvector=64, nbits=8, seed=42,
            path=os.path.join(out, f"idx_{label}"),
        )
        results[f"{label}_build_s"] = round(time.time() - t0, 1)
        mark(f"search {label}")
        t0 = time.time()
        got = idx.search(
            None, queries, k=K, metric="L2", nprobe=nprobe,
            recall_num=(200 if rerank else K),
            has_rank=rerank,  # has_rank=False truncates the ADC order at k
        ).collect()
        results[f"{label}_search_s"] = round(time.time() - t0, 1)
        results[label] = recall_at(got, truth)
        mark(f"{label}: {results[label]}")

    # --- anchor row 2: HNSW at the reference's test defaults ----------
    if dim == 512:
        # VGG-shaped anchor: IVF-family rows only (BASELINE.md has no
        # VGG HNSW row; same knobs as SIFT at the matching scale)
        results["published_vgg1m" if not big else "published_vgg10m"] = (
            {
                "vearch_rerank": {"recall@1": 0.9651, "recall@10": 0.9702,
                                  "recall@100": 0.9703},
            }
            if not big
            else {
                "vearch_rerank": {"recall@1": 0.9649, "recall@10": 0.9829,
                                  "recall@100": 0.9832},
            }
        )
        print(json.dumps(results))
        return
    if big:
        results["published_sift10m"] = {
            "vearch_rerank": {"recall@1": 0.977, "recall@10": 0.9774,
                              "recall@100": 0.9774},
        }
        print(json.dumps(results))
        return
    # nlinks 32, efConstruction 160, efSearch 64 (tests/test.h:51-148);
    # k=100 lifts the effective ef to 100 (ef >= k by construction)
    mark("build hnsw")
    t0 = time.time()
    hidx = HnswIndex.build(
        docs, nshards=32, m=32, ef_construction=160, metric="L2",
        path=os.path.join(out, "hnsw"),
    )
    results["hnsw_build_s"] = round(time.time() - t0, 1)
    mark("search hnsw")
    t0 = time.time()
    got = hidx.search(None, queries, k=K, ef_search=64, mode="graph").collect()
    results["hnsw_search_s"] = round(time.time() - t0, 1)
    results["hnsw"] = recall_at(got, truth)

    results["published_sift1m"] = {
        "vearch_rerank": {"recall@1": 0.9814, "recall@10": 0.9902,
                          "recall@100": 0.9902},
        "ivfpq_no_rerank": {"recall@1": 0.8201},
        "hnsw": {"recall@1": 0.9795},
    }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
