"""Deterministic sampling / mixing (operators/sampling.py) and
sequence packing (operators/packing.py) — training-pipeline operators
over the documents table."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gamma_spark.operators import packing as P
from gamma_spark.operators import sampling as S


@pytest.fixture(scope="module")
def docs(documents):
    return documents


def test_deterministic_sample_reproducible(docs):
    a = sorted(r.doc_id for r in S.deterministic_sample(docs, "doc_id", 0.3).collect())
    b = sorted(r.doc_id for r in S.deterministic_sample(docs, "doc_id", 0.3).collect())
    assert a == b and 0 < len(a) < docs.count()
    # monotone: raising the fraction only ADDS rows (stability under
    # rate changes — the hash gate is a threshold, not a reshuffle)
    c = set(r.doc_id for r in S.deterministic_sample(docs, "doc_id", 0.6).collect())
    assert set(a) <= c


def test_sample_salt_decorrelates(docs):
    a = set(r.doc_id for r in S.deterministic_sample(docs, "doc_id", 0.5, salt="x").collect())
    b = set(r.doc_id for r in S.deterministic_sample(docs, "doc_id", 0.5, salt="y").collect())
    assert a != b


def test_sample_mixture_rates(docs):
    out = S.sample_mixture(
        docs, "lang", {"en": 1.0, "de": 0.5}, key_col="doc_id"
    ).groupBy("lang").count().collect()
    got = {r.lang: r["count"] for r in out}
    n_en = docs.filter(F.col("lang") == "en").count()
    n_de = docs.filter(F.col("lang") == "de").count()
    assert got["en"] == n_en            # rate 1.0 keeps everything
    assert 0 < got["de"] < n_de         # rate 0.5 keeps a strict subset
    assert set(got) == {"en", "de"}     # default 0.0 drops other langs


def test_stratified_quota(docs):
    out = S.stratified_quota(docs, "lang", quota=20, key_col="doc_id")
    per = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    full = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    for lang, n in full.items():
        assert per[lang] == min(20, n)
    again = S.stratified_quota(docs, "lang", quota=20, key_col="doc_id")
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_train_eval_split_disjoint_total(docs):
    out = S.train_eval_split(docs, "doc_id", eval_fraction=0.2)
    counts = {r._split: r["count"] for r in out.groupBy("_split").count().collect()}
    assert sum(counts.values()) == docs.count()
    assert counts.get("eval", 0) > 0 and counts.get("train", 0) > 0


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------

def test_pack_contiguous_matches_serial(docs):
    """The two-level distributed prefix sum equals the serial layout."""
    from gamma_spark.functions.text import bpe_token_count

    toks = docs.select("doc_id", bpe_token_count("text").alias("n_tokens"))
    out = P.pack_contiguous(
        toks, "doc_id", "n_tokens", max_tokens=256, bucket_width=100
    ).collect()
    rows = sorted(((r.doc_id, r.n_tokens, r.seq_id, r.seq_offset, r.spans) for r in out))
    cum = 0
    for doc_id, n, seq_id, off, spans in rows:
        assert seq_id == cum // 256
        assert off == cum % 256
        assert spans == ((cum + n - 1) // 256 > seq_id)
        cum += n


def test_pack_contiguous_bucket_width_invariant(docs):
    from gamma_spark.functions.text import bpe_token_count

    toks = docs.select("doc_id", bpe_token_count("text").alias("n_tokens"))
    a = {r.doc_id: (r.seq_id, r.seq_offset) for r in
         P.pack_contiguous(toks, "doc_id", "n_tokens", 128, bucket_width=50).collect()}
    b = {r.doc_id: (r.seq_id, r.seq_offset) for r in
         P.pack_contiguous(toks, "doc_id", "n_tokens", 128, bucket_width=10_000).collect()}
    assert a == b


def test_pack_first_fit_capacity_and_coverage(docs):
    from gamma_spark.functions.text import bpe_token_count

    toks = docs.select("doc_id", bpe_token_count("text").alias("n_tokens"))
    cap = 512
    out = P.pack_first_fit(toks, "doc_id", "n_tokens", max_tokens=cap, nshards=4)
    rows = out.collect()
    assert len(rows) == toks.count()  # every doc packed exactly once
    fill = {}
    for r in rows:
        fill.setdefault(r.seq_id, 0)
        fill[r.seq_id] += r.n_tokens
    oversized = {r.doc_id for r in rows if r.n_tokens > cap}
    for seq, tot in fill.items():
        members = [r for r in rows if r.seq_id == seq]
        if any(m.doc_id in oversized for m in members):
            assert len(members) == 1  # oversized docs sit alone
        else:
            assert tot <= cap
    # determinism
    again = {(r.doc_id, r.seq_id) for r in
             P.pack_first_fit(toks, "doc_id", "n_tokens", max_tokens=cap, nshards=4).collect()}
    assert again == {(r.doc_id, r.seq_id) for r in rows}


def test_plan_mixture_token_budgets(docs):
    from gamma_spark.functions.text import bpe_token_count
    from gamma_spark.operators.sampling import plan_mixture, sample_mixture

    toks = docs.select("doc_id", "lang", bpe_token_count("text").alias("n_tokens"))
    have = {
        r.lang: r.tot for r in
        toks.groupBy("lang").agg(F.sum("n_tokens").alias("tot")).collect()
    }
    targets = {"en": have["en"] * 0.4, "de": have["de"] * 2.0}  # de over-asks
    fracs = plan_mixture(toks, "lang", "n_tokens", targets)
    assert fracs["de"] == 1.0  # capped: can't yield more than it holds
    assert 0.3 < fracs["en"] < 0.5
    mixed = sample_mixture(toks, "lang", fracs, key_col="doc_id")
    got = {
        r.lang: r.tot for r in
        mixed.groupBy("lang").agg(F.sum("n_tokens").alias("tot")).collect()
    }
    assert got["de"] == have["de"]  # rate 1.0 keeps every de token
    # realized en tokens land near the target (per-row hash gate)
    assert 0.2 * have["en"] < got["en"] < 0.6 * have["en"]


def test_diversity_sample_cluster_balanced(spark, embeddings):
    """Cluster-quota semantics: each cluster contributes
    min(quota, |cluster|) rows, membership is deterministic, and the
    sample covers every nonempty cluster (the diversity property)."""
    import numpy as np

    from gamma_spark.operators.ivf import assign_clusters, kmeans_lloyd_np
    from gamma_spark.operators.sampling import diversity_sample

    docs = embeddings.withColumnRenamed("vec_id", "_docid")
    mat = np.stack([r.embedding for r in docs.limit(200).collect()]).astype(np.float64)
    cents = kmeans_lloyd_np(mat, 8, seed=7)

    quota = 5
    got = diversity_sample(docs, cents, quota, key_col="_docid")
    sizes = {
        r.cluster_id: r.n
        for r in got.groupBy("cluster_id").agg(F.count("*").alias("n")).collect()
    }
    full = {
        r.cluster_id: r.n
        for r in assign_clusters(docs, cents)
        .groupBy("cluster_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert sizes, "sample is empty"
    for cid, n_full in full.items():
        assert sizes.get(cid, 0) == min(quota, n_full)
    # determinism: second run picks the identical ids
    a = sorted(r._docid for r in got.collect())
    b = sorted(
        r._docid
        for r in diversity_sample(docs, cents, quota, key_col="_docid").collect()
    )
    assert a == b
