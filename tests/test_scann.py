"""VEARCH / ScaNN-objective quantization (SURVEY K7 —
`index/impl/scann/gamma_index_vearch.cc:19,415-520`): anisotropic
codebook training (Guo et al., ICML 2020) behind the shared IVFPQ
search machinery."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gamma_spark.operators import knn
from gamma_spark.operators.ivf import kmeans_lloyd_np
from gamma_spark.operators.pq import IvfPqIndex, VearchIndex, anisotropic_kmeans_np


@pytest.fixture(scope="module")
def docs(embeddings):
    return embeddings.withColumnRenamed("vec_id", "_docid")


@pytest.fixture(scope="module")
def queries(spark, docs):
    rows = docs.orderBy("_docid").limit(8).collect()
    return spark.createDataFrame(
        [(int(r._docid), [float(x) for x in r.embedding]) for r in rows],
        "qid long, qvec array<float>",
    )


def _recall(approx_rows, exact_rows):
    a = {(r.qid, r._docid) for r in approx_rows}
    e = {(r.qid, r._docid) for r in exact_rows}
    return len(a & e) / len(e)


def test_aniso_eta1_is_plain_lloyd():
    """eta == 1 (h_par == h_perp) must reproduce plain Lloyd exactly —
    the degenerate configuration the oracle checks rely on."""
    rng = np.random.default_rng(5)
    data = rng.normal(size=(400, 8))
    a = anisotropic_kmeans_np(data, 16, eta=1.0, seed=3)
    b = kmeans_lloyd_np(data, 16, seed=3)
    assert np.array_equal(a, b)


def test_aniso_deterministic_and_finite():
    rng = np.random.default_rng(6)
    data = rng.normal(size=(500, 8))
    a = anisotropic_kmeans_np(data, 16, eta=4.0, seed=9)
    b = anisotropic_kmeans_np(data, 16, eta=4.0, seed=9)
    assert np.array_equal(a, b) and np.isfinite(a).all()


def test_aniso_reduces_parallel_error():
    """The whole point of the objective: at equal k, the anisotropic
    codebook's PARALLEL quantization error is below plain Lloyd's."""
    rng = np.random.default_rng(8)
    data = rng.normal(size=(2000, 8))
    norms = np.linalg.norm(data, axis=1)
    u = data / norms[:, None]

    def par_err(cents):
        d2 = (
            (data * data).sum(1)[:, None]
            - 2.0 * (data @ cents.T)
            + (cents * cents).sum(1)[None, :]
        )
        par = norms[:, None] - (u @ cents.T)
        # evaluate parallel error at each point's own anisotropic-loss
        # assignment for that codebook
        loss = d2  # plain assignment for the plain codebook
        a = loss.argmin(axis=1)
        return float((par[np.arange(len(data)), a] ** 2).mean())

    plain = kmeans_lloyd_np(data, 32, seed=1)
    aniso = anisotropic_kmeans_np(data, 32, eta=8.0, seed=1)
    assert par_err(aniso) < par_err(plain)


def test_vearch_build_search_recall(docs, queries):
    idx = VearchIndex.build(docs, ncentroids=16, nsubvector=8, seed=42)
    assert idx.name == "VEARCH" and idx.ksub == 16  # 4-bit codes
    exact = knn.knn_join(docs, queries, k=10, metric="IP").collect()
    out = idx.search(
        None, queries, k=10, metric="IP", nprobe=16, recall_num=64
    ).collect()
    assert _recall(out, exact) >= 0.6


def test_vearch_exact_degenerate(docs, queries):
    """nprobe == ncentroids + recall_num == N + exact rerank: identical
    to brute force regardless of codebook placement."""
    idx = VearchIndex.build(docs, ncentroids=8, nsubvector=8, seed=42)
    n = docs.count()
    exact = {
        (r.qid, r.rank): (r._docid, round(r.score, 9))
        for r in knn.knn_join(docs, queries, k=10, metric="L2").collect()
    }
    got = {
        (r.qid, r.rank): (r._docid, round(r.score, 9))
        for r in idx.search(
            None, queries, k=10, metric="L2", nprobe=8, recall_num=n
        ).collect()
    }
    assert got == exact


def test_vearch_registered():
    from gamma_spark.operators.ann import get_model

    assert get_model("VEARCH") is VearchIndex
    assert get_model("SCANN") is VearchIndex


def test_vearch_composes_with_opq(docs, queries):
    """Anisotropic training composes with the OPQ rotation; the
    exact-degenerate configuration stays exact regardless."""
    idx = VearchIndex.build(docs, ncentroids=8, nsubvector=8, opq=True, seed=42)
    n = docs.count()
    exact = {
        (r.qid, r.rank): r._docid
        for r in knn.knn_join(docs, queries, k=5, metric="L2").collect()
    }
    got = {
        (r.qid, r.rank): r._docid
        for r in idx.search(
            None, queries, k=5, metric="L2", nprobe=8, recall_num=n
        ).collect()
    }
    assert got == exact


def _aniso_update_reference(data, u, norms, assign, cents, eta, eye):
    """The pre-r9 per-cluster closed-form update, kept verbatim as the
    parity oracle for the vectorized bincount+batched-solve rewrite."""
    import numpy as np

    delta = float(eta) - 1.0
    out = cents.copy()
    for j in range(len(cents)):
        mask = assign == j
        nc = int(mask.sum())
        if nc == 0:
            continue
        uu = u[mask].T @ u[mask]
        b = eta * data[mask].sum(axis=0)
        out[j] = np.linalg.solve(nc * eye + delta * uu, b)
    return out


def test_vectorized_aniso_update_matches_loop_reference():
    """r9: the vectorized update must agree with the per-cluster loop
    to float accumulation noise (bincount sums sequentially where the
    loop summed pairwise — same closed form, different rounding)."""
    import numpy as np

    from gamma_spark.operators.pq import anisotropic_kmeans_np

    rng = np.random.default_rng(17)
    k, dim, eta = 8, 4, 4.0
    centers = rng.normal(0, 5, size=(k, dim))  # well-separated
    data = np.repeat(centers, 40, axis=0) + 0.1 * rng.normal(
        size=(k * 40, dim)
    )
    # one full trained run stays deterministic and sane
    cents = anisotropic_kmeans_np(data, k, eta, seed=3)
    cents2 = anisotropic_kmeans_np(data, k, eta, seed=3)
    assert np.array_equal(cents, cents2)

    # single-step parity vs the loop reference at a fixed assignment
    norms = np.linalg.norm(data, axis=1)
    u = data / norms[:, None]
    start = data[rng.choice(len(data), size=k, replace=False)]
    d2 = (
        (data * data).sum(axis=1)[:, None]
        - 2.0 * (data @ start.T)
        + (start * start).sum(axis=1)[None, :]
    )
    par = norms[:, None] - (u @ start.T)
    assign = (d2 + (eta - 1.0) * par * par).argmin(axis=1)
    want = _aniso_update_reference(
        data, u, norms, assign, start, eta, np.eye(dim)
    )
    delta = eta - 1.0
    counts = np.bincount(assign, minlength=k).astype(np.float64)
    sx = np.stack(
        [np.bincount(assign, weights=data[:, d], minlength=k) for d in range(dim)],
        axis=1,
    )
    uu = np.empty((k, dim, dim))
    for a in range(dim):
        for b_ in range(a, dim):
            col = np.bincount(assign, weights=u[:, a] * u[:, b_], minlength=k)
            uu[:, a, b_] = col
            uu[:, b_, a] = col
    mats = counts[:, None, None] * np.eye(dim)[None] + delta * uu
    got = start.copy()
    ne = counts > 0
    got[ne] = np.linalg.solve(mats[ne], eta * sx[ne])
    assert np.allclose(got, want, rtol=1e-9, atol=1e-9)
