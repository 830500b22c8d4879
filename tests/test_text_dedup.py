"""Text analysis + dedup operators: DuckDB parity (the same arithmetic
must produce identical values) and semantic checks."""

import duckdb
import pytest
from pyspark.sql import functions as F

from gamma_spark.functions import text as T
from gamma_spark.operators import dedup as D


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    c.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'")
    return c


def test_hash60_parity(spark, con):
    vals = ["hello", "the quick brown fox", "", "Ünïcödé test"]
    sdf = spark.createDataFrame([(v,) for v in vals], "s string").select(
        "s", T.hash60("s").alias("h")
    )
    got = {r.s: r.h for r in sdf.collect()}
    for v in vals:
        want = con.execute(f"SELECT {T.sql_hash60('?')}", [v]).fetchone()[0] if False else \
            con.execute("SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [v]).fetchone()[0]
        assert got[v] == want, v


def test_text_stats_parity(documents, con):
    sdf = documents.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        T.avg_token_len("text").alias("avg_token_len"),
        T.stopword_ratio("text").alias("stopword_ratio"),
        T.quality_score("text").alias("quality"),
        T.fingerprint("text").alias("fp"),
        T.lang_id("text").alias("lang_pred"),
    )
    ddf = con.execute(f"""
        SELECT doc_id,
               {T.sql_token_count('text')} AS n_tokens,
               {T.sql_avg_token_len('text')} AS avg_token_len,
               {T.sql_stopword_ratio('text')} AS stopword_ratio,
               {T.sql_quality_score('text')} AS quality,
               {T.sql_fingerprint('text')} AS fp,
               {T.sql_lang_id('text')} AS lang_pred
        FROM documents
    """).fetchdf().set_index("doc_id").sort_index()
    spdf = sdf.toPandas().set_index("doc_id").sort_index()
    for col in ["n_tokens", "fp", "lang_pred"]:
        assert (spdf[col] == ddf[col]).all(), col
    for col in ["avg_token_len", "stopword_ratio", "quality"]:
        assert (spdf[col].to_numpy() == ddf[col].to_numpy()).all(), col


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (3, "aa"), (4, "aa")], "id long, t string"
    )
    res = {r.id: (r.keeper_id, r.group_size) for r in
           D.exact_dedup(df, "id", F.col("t")).collect()}
    assert res == {1: (1, 3), 3: (1, 3), 4: (1, 3), 2: (2, 1)}


def test_shingles_parity(documents, con):
    got = D.shingles(documents.limit(50), "doc_id", "text", n=3)
    want = con.execute(
        "SELECT count(*) FROM (" + D.sql_shingles("(SELECT * FROM documents WHERE doc_id < 50)", "doc_id", "text", 3) + ")"
    ).fetchone()[0]
    assert got.filter(F.col("doc_id") < 50).count() == con.execute(
        "SELECT count(*) FROM (" + D.sql_shingles("(SELECT * FROM documents WHERE doc_id < 50)", "doc_id", "text", 3) + ")"
    ).fetchone()[0]
    # spot-check identical shingle sets for one doc
    s_spark = {
        r.shingle
        for r in D.shingles(documents.filter(F.col("doc_id") == 7), "doc_id", "text").collect()
    }
    s_duck = {
        r[0]
        for r in con.execute(
            "SELECT shingle FROM (" + D.sql_shingles("(SELECT * FROM documents WHERE doc_id = 7)", "doc_id", "text", 3) + ")"
        ).fetchall()
    }
    assert s_spark == s_duck


def test_minhash_lsh_parity(documents, con):
    docs = documents.filter(F.col("doc_id") < 100)
    pairs = D.minhash_dedup_pairs(docs, "doc_id", "text")
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    sig_sql = D.sql_minhash_signatures(
        D.sql_shingles("(SELECT * FROM documents WHERE doc_id < 100)", "doc_id", "text", 3),
        "doc_id",
    )
    want = {
        (a, b)
        for a, b in con.execute(D.sql_lsh_candidate_pairs(sig_sql, "doc_id")).fetchall()
    }
    assert got == want


def test_jaccard_pairs_parity(documents, con):
    docs = documents.filter(F.col("doc_id") < 100)
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.2).collect()
    }
    want = {
        (a, b): j
        for a, b, j in con.execute(
            D.sql_jaccard_pairs(
                "(SELECT * FROM documents WHERE doc_id < 100)", "doc_id", "text", 3, 0.2
            )
        ).fetchall()
    }
    assert got == want


def test_simhash_parity_and_selfpairs(spark, documents, con):
    docs = documents.filter(F.col("doc_id") < 100)
    got = {r.doc_id: r.simhash for r in D.simhash(docs, "doc_id", "text").collect()}
    want = dict(
        con.execute(
            D.sql_simhash("(SELECT * FROM documents WHERE doc_id < 100)", "doc_id", "text")
        ).fetchall()
    )
    assert got == want
    # identical texts must collide at distance 0
    dup = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    pairs = D.simhash_pairs(dup, "doc_id", "text", max_distance=0).collect()
    assert [(p.id_a, p.id_b, p.distance) for p in pairs] == [(1, 2, 0)]


def test_simhash_banded_equals_allpairs(documents):
    """Pigeonhole banding is lossless: the banded plan must return the
    identical pair set (ids AND distances) as the all-pairs scan."""
    docs = documents.filter(F.col("doc_id") < 120)
    for d in (0, 2, 3):
        banded = {
            (r.id_a, r.id_b, r.distance)
            for r in D.simhash_neardup_pairs(docs, "doc_id", "text", max_distance=d).collect()
        }
        exact = {
            (r.id_a, r.id_b, r.distance)
            for r in D.simhash_pairs(docs, "doc_id", "text", max_distance=d).collect()
        }
        assert banded == exact, f"max_distance={d}"


def test_simhash_blocks_cover_signature():
    for d in range(0, 8):
        blocks = D._simhash_blocks(d)
        assert len(blocks) == d + 1
        assert sum(w for _, w in blocks) == D.SIMHASH_BITS
        # contiguous, non-overlapping
        pos = 0
        for start, w in blocks:
            assert start == pos and w >= 1
            pos += w


def test_jaccard_on_pairs_matches_full_mine(documents):
    """Scoring only the LSH candidates must agree with the full-corpus
    jaccard mine on exactly those pairs."""
    docs = documents.filter(F.col("doc_id") < 100)
    sh = D.shingles(docs, "doc_id", "text", 3)
    cands = D.lsh_candidate_pairs(D.minhash_signatures(sh, "doc_id"), "doc_id")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.jaccard_on_pairs(cands, sh, "doc_id", threshold=0.2).collect()
    }
    full = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.2).collect()
    }
    cand_set = {(r.id_a, r.id_b) for r in cands.collect()}
    assert got == {p: j for p, j in full.items() if p in cand_set}


def test_embedding_neardup(embeddings, con):
    got = {
        (r.id_a, r.id_b)
        for r in D.embedding_neardup_pairs(embeddings, threshold=0.8).collect()
    }
    want = {
        (a, b)
        for a, b, _ in con.execute(
            D.sql_embedding_neardup_pairs("embeddings", "vec_id", "embedding", 0.8)
        ).fetchall()
    }
    assert got == want


def test_embedding_neardup_lsh_is_subset(embeddings):
    exact = {
        (r.id_a, r.id_b)
        for r in D.embedding_neardup_pairs(embeddings, threshold=0.8).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in D.embedding_neardup_pairs(
            embeddings, threshold=0.8, prefilter_bits=8
        ).collect()
    }
    assert lsh <= exact


def test_embedding_banded_subset_and_sql_parity(embeddings, con):
    banded = {
        (r.id_a, r.id_b): r.cosine
        for r in D.embedding_neardup_banded(
            embeddings, threshold=0.3, dim=64
        ).collect()
    }
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in D.embedding_neardup_pairs(embeddings, threshold=0.3).collect()
    }
    assert set(banded) <= set(exact)
    assert all(exact[p] == c for p, c in banded.items())  # bit-exact cosines
    duck = {
        (a, b): c
        for a, b, c in con.execute(
            D.sql_embedding_neardup_banded("embeddings", "vec_id", "embedding", 0.3, dim=64)
        ).fetchall()
    }
    assert banded == duck


def test_embedding_banded_kernel_matches_catalyst(embeddings):
    cat = {
        (r.id_a, r.id_b)
        for r in D.embedding_neardup_banded(embeddings, threshold=0.3, dim=64).collect()
    }
    ker = {
        (r.id_a, r.id_b)
        for r in D.embedding_neardup_banded(
            embeddings, threshold=0.3, dim=64, kernel=True
        ).collect()
    }
    assert cat == ker


def test_embedding_banded_recall_on_planted_neardups(spark):
    """The honest near-dup regime (cosine >= 0.9): plant 50 perturbed
    copies, banded LSH must recover nearly all planted pairs."""
    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.standard_normal((50, 64))
    near = base + 0.12 * rng.standard_normal((50, 64))  # cosine ~0.97
    rows = [(i, [float(x) for x in base[i]]) for i in range(50)] + [
        (1000 + i, [float(x) for x in near[i]]) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    found = {
        (r.id_a, r.id_b)
        for r in D.embedding_neardup_banded(df, threshold=0.9, dim=64).collect()
    }
    planted = {(i, 1000 + i) for i in range(50)}
    exact_planted = {
        (r.id_a, r.id_b)
        for r in D.embedding_neardup_pairs(df, threshold=0.9).collect()
    } & planted
    recall = len(found & exact_planted) / max(1, len(exact_planted))
    assert recall >= 0.95, recall


def test_minhash_index_incremental_equals_batch(documents, tmp_path):
    """The materialized-index split must lose nothing: candidates from
    match(new vs corpus-index) plus each side's self-join equal the
    one-shot self-join over corpus ∪ new, as unordered pairs."""
    corpus = documents.filter(F.col("doc_id") % 3 != 0)
    new = documents.filter(F.col("doc_id") % 3 == 0)

    idx = D.MinHashIndex.build(corpus, "doc_id", "text", path=str(tmp_path / "mh"))
    cross = {
        tuple(sorted((r.new_id, r.corpus_id)))
        for r in idx.match(new).collect()
    }
    self_new = {
        (r.id_a, r.id_b)
        for r in D.minhash_dedup_pairs(new, "doc_id", "text").collect()
    }
    self_corpus = {
        (r.id_a, r.id_b)
        for r in D.minhash_dedup_pairs(corpus, "doc_id", "text").collect()
    }
    want = {
        (r.id_a, r.id_b)
        for r in D.minhash_dedup_pairs(documents, "doc_id", "text").collect()
    }
    assert cross | self_new | self_corpus == want
    # pair orientation: cross pairs are (new, corpus) by construction
    new_ids = {r.doc_id for r in new.select("doc_id").collect()}
    for r in idx.match(new).collect():
        assert r.new_id in new_ids and r.corpus_id not in new_ids


def test_minhash_index_append_and_load_roundtrip(documents, tmp_path, spark):
    """append() makes batch N+1 dedup against batch N; load() serves
    the same buckets from disk."""
    b0 = documents.filter(F.col("doc_id") < 300)
    b1 = documents.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 400))
    b2 = documents.filter(F.col("doc_id") >= 400)

    path = str(tmp_path / "mh2")
    idx = D.MinHashIndex.build(b0, "doc_id", "text", path=path)
    idx = idx.append(b1)

    got = {
        tuple(sorted((r.new_id, r.corpus_id)))
        for r in D.MinHashIndex.load(spark, path).match(b2).collect()
    }
    # expected: every LSH pair of the full corpus with exactly one end in b2
    b2_ids = {r.doc_id for r in b2.select("doc_id").collect()}
    want = {
        (r.id_a, r.id_b)
        for r in D.minhash_dedup_pairs(documents, "doc_id", "text").collect()
        if (r.id_a in b2_ids) != (r.id_b in b2_ids)
    }
    assert got == want


def test_embedding_neardup_index_incremental_equals_batch(embeddings, tmp_path, spark):
    """Semantic twin of the MinHashIndex equivalence: verified cross
    pairs from match(new vs corpus-index) plus both batch self-joins
    equal the one-shot banded operator over the full table."""
    t, bands, bits, seed = 0.35, 16, 6, 7
    corpus = embeddings.filter(F.col("vec_id") % 4 != 0)
    new = embeddings.filter(F.col("vec_id") % 4 == 0)

    idx = D.EmbeddingNearDupIndex.build(
        corpus, dim=64, bands=bands, bits=bits, seed=seed,
        threshold=t, path=str(tmp_path / "emb"),
    )
    idx = D.EmbeddingNearDupIndex.load(spark, str(tmp_path / "emb"))
    cross = {
        tuple(sorted((r.new_id, r.corpus_id)))
        for r in idx.match(new).collect()
    }

    def self_pairs(df):
        return {
            (r.id_a, r.id_b)
            for r in D.embedding_neardup_banded(
                df, threshold=t, bands=bands, bits=bits, seed=seed, kernel=True
            ).collect()
        }

    want = self_pairs(embeddings)
    assert cross | self_pairs(new) | self_pairs(corpus) == want
    assert cross, "no cross-corpus pairs found — fixture split is degenerate"
    # append makes the batch visible to the NEXT batch
    idx2 = idx.append(new)
    again = {
        tuple(sorted((r.new_id, r.corpus_id)))
        for r in idx2.match(new).collect()
    }
    # matching new against (corpus + new) must now include new-new pairs
    assert again == cross | self_pairs(new)


def test_minhash_index_compact_preserves_matches(documents, tmp_path, spark):
    import glob

    corpus = documents.filter(F.col("doc_id") >= 100)
    path = str(tmp_path / "mh3")
    idx = D.MinHashIndex.build(
        corpus.filter(F.col("doc_id") < 300), "doc_id", "text", path=path
    )
    for lo, hi in ((300, 400), (400, 500)):
        idx = idx.append(
            corpus.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        )
    probe = documents.filter(F.col("doc_id") < 100)
    before = {
        tuple(sorted((r.new_id, r.corpus_id))) for r in idx.match(probe).collect()
    }
    files_before = len(glob.glob(f"{path}/*.parquet"))
    idx = idx.compact(spark, partitions=2)
    after = {
        tuple(sorted((r.new_id, r.corpus_id))) for r in idx.match(probe).collect()
    }
    assert after == before and before  # content identical, non-trivial
    assert len(glob.glob(f"{path}/*.parquet")) <= min(2, files_before)


def test_minhash_index_meta_roundtrip(tmp_path, spark, documents):
    """r9 review fix: the shingle width is baked into the stored
    signatures — load() must recover it from the meta sidecar instead
    of trusting the caller's default (a mismatched n silently banded
    new batches against incompatible buckets)."""
    from gamma_spark.operators.dedup import MinHashIndex

    corpus = documents.limit(40)
    path = str(tmp_path / "mh5")
    MinHashIndex.build(corpus, n=5, path=path)
    loaded = MinHashIndex.load(spark, path)  # default n=3 would be wrong
    assert loaded.n == 5
    assert loaded.id_col == "doc_id"
    # an indexed doc re-presented as a new batch must match itself-ish:
    # identical text lands in identical buckets at the recovered n
    probe = corpus.limit(5).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    hits = loaded.match(probe)
    assert hits.count() > 0


def test_lsh_star_pairs_same_components_linear_cost(documents, spark):
    """pairs="star" (r11 mega-cluster guard): per bucket, hub-member
    edges instead of all C(m,2) pairs. (a) LOSSLESS for the group
    consumer — connected components over star edges equal components
    over all-pairs edges (a bucket's star connects exactly the clique's
    members); (b) linear in the bucket — a planted k-doc identical
    cluster emits C(k,2) all-pairs candidates but only k-1 star edges;
    (c) star edges are a subset of the all-pairs relation."""
    from gamma_spark.operators.groups import connected_components

    k = 40
    clones = spark.range(k).select(
        (F.lit(100_000) + F.col("id")).alias("doc_id"),
        F.lit(
            "identical boilerplate page body repeated across the crawl "
            "exactly as web duplicates do"
        ).alias("text"),
    )
    docs = documents.filter(F.col("doc_id") < 120).select(
        "doc_id", "text"
    ).unionByName(clones)

    sh = D.hashed_shingle_stream(docs, "doc_id", "text")
    sig = D.minhash_signatures(sh, "doc_id", hashed=True).cache()

    allp = D.lsh_candidate_pairs(sig, "doc_id").cache()
    star = D.lsh_candidate_pairs(sig, "doc_id", pairs="star").cache()

    all_set = {(r.id_a, r.id_b) for r in allp.collect()}
    star_set = {(r.id_a, r.id_b) for r in star.collect()}
    assert star_set <= all_set  # (c)
    # (b): the clone cluster alone is C(k,2) in all-pairs vs k-1 in star
    clone_all = {p for p in all_set if p[0] >= 100_000}
    clone_star = {p for p in star_set if p[0] >= 100_000}
    assert len(clone_all) == k * (k - 1) // 2
    assert len(clone_star) == k - 1

    cc_all = {
        (r.id, r.group_id) for r in connected_components(allp).collect()
    }
    cc_star = {
        (r.id, r.group_id) for r in connected_components(star).collect()
    }
    assert cc_all == cc_star  # (a)

    with pytest.raises(ValueError, match="expected 'all', 'star' or 'hybrid'"):
        D.lsh_candidate_pairs(sig, "doc_id", pairs="clique")
    sig.unpersist(); allp.unpersist(); star.unpersist()


def test_lsh_bucket_stats_predicts_join_cost(documents, spark):
    """The skew diagnostic's arithmetic: for each bucket size m,
    allpairs_rows = m(m-1)/2 * n_buckets and star_rows = (m-1) *
    n_buckets, and the totals equal the actual (pre-distinct) edge
    counts of both modes."""
    docs = documents.filter(F.col("doc_id") < 150)
    sh = D.hashed_shingle_stream(docs, "doc_id", "text")
    sig = D.minhash_signatures(sh, "doc_id", hashed=True)
    banded = D.banded_signatures(sig, "doc_id").cache()

    stats = D.lsh_bucket_stats(banded, ["band", "bsig"], "doc_id").collect()
    assert all(
        r.allpairs_rows == r.size * (r.size - 1) // 2 * r.n_buckets
        and r.star_rows == (r.size - 1) * r.n_buckets
        for r in stats
    )
    # totals match the real joins before the cross-band distinct
    a, b = banded.alias("a"), banded.alias("b")
    n_allpairs = a.join(
        b,
        on=(F.col("a.band") == F.col("b.band"))
        & (F.col("a.bsig") == F.col("b.bsig"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).count()
    assert sum(r.allpairs_rows for r in stats) == n_allpairs
    hubs = banded.groupBy("band", "bsig").agg(F.min("doc_id").alias("_hub"))
    n_star = (
        banded.join(hubs, on=["band", "bsig"])
        .filter(F.col("doc_id") != F.col("_hub"))
        .count()
    )
    assert sum(r.star_rows for r in stats) == n_star
    banded.unpersist()


def test_embedding_banded_star_groups_planted_duplicates(spark):
    """Star mode on the embedding LSH: a planted cluster of identical
    vectors (the web-scale hazard: every band puts all of them in ONE
    bucket) resolves to one duplicate group from k-1 verified edges
    instead of C(k,2), and star candidates stay a subset of all-mode
    candidates on mixed data."""
    import numpy as np

    from gamma_spark.operators.groups import connected_components

    rng = np.random.default_rng(5)
    k, dim = 30, 16
    dup = rng.standard_normal(dim)
    rows = [(i, [float(x) for x in dup]) for i in range(k)]
    rows += [
        (100 + i, [float(x) for x in rng.standard_normal(dim)])
        for i in range(60)
    ]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    kw = dict(threshold=0.99, dim=dim, bands=4, bits=6)
    star = D.embedding_neardup_banded(embs, pairs="star", **kw).cache()
    allp = D.embedding_neardup_banded(embs, **kw).cache()
    star_set = {(r.id_a, r.id_b) for r in star.collect()}
    all_set = {(r.id_a, r.id_b) for r in allp.collect()}
    assert star_set <= all_set
    clone_star = {p for p in star_set if p[1] < k}
    assert len(clone_star) == k - 1  # hub 0 -> each clone, once
    cc = connected_components(star).collect()
    groups = {r.id: r.group_id for r in cc}
    assert {groups[i] for i in range(k)} == {0}
    star.unpersist(); allp.unpersist()


def test_minhash_index_witness_only_match(documents, tmp_path):
    """witness_only=True (r11 bipartite mega-cluster guard): one
    (new_id, min corpus_id) row per matching new doc — exactly the
    per-new-doc minimum of the full match relation, with a map-side-
    combinable aggregate instead of a k x m candidate shuffle."""
    docs = documents.filter(F.col("doc_id") < 200)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 3 == 0)
    idx = D.MinHashIndex.build(corpus, "doc_id", "text")

    full = idx.match(new).collect()
    want = {}
    for r in full:
        want[r.new_id] = min(want.get(r.new_id, r.corpus_id), r.corpus_id)
    got = {r.new_id: r.corpus_id for r in idx.match(new, witness_only=True).collect()}
    assert got == want and len(got) > 0


def test_embedding_hybrid_survives_dissimilar_hub(spark):
    """r11 review (hub hijack): in a VERIFIED star path, a bucket whose
    min-id member is a dissimilar LSH collider orphans genuinely-
    similar members — their only emitted edges (hub-member) fail the
    cosine verify. Construction: a near-dup pair at LARGE ids (900,
    901) inside a crowd of small-id random vectors at tiny bits (4
    buckets/band), so the pair's bucket hub is always a dissimilar
    crowd vector. pairs="hybrid" (all-pairs under star_cap) must find
    the pair; pure star demonstrably loses it; "all" is ground truth."""
    import numpy as np

    rng = np.random.default_rng(11)
    dim = 16
    rows = [
        (i, [float(x) for x in rng.standard_normal(dim)]) for i in range(100)
    ]
    v = rng.standard_normal(dim)
    pert = v + 0.25 * rng.standard_normal(dim)
    rows += [(900, [float(x) for x in v]), (901, [float(x) for x in pert])]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    kw = dict(threshold=0.9, dim=dim, bands=2, bits=2)
    truth = {
        (r.id_a, r.id_b)
        for r in D.embedding_neardup_banded(embs, **kw).collect()
    }
    assert (900, 901) in truth  # the planted pair survives the prune
    hybrid = {
        (r.id_a, r.id_b)
        for r in D.embedding_neardup_banded(
            embs, pairs="hybrid", star_cap=64, **kw
        ).collect()
    }
    star = {
        (r.id_a, r.id_b)
        for r in D.embedding_neardup_banded(embs, pairs="star", **kw).collect()
    }
    # every bucket is under the cap here, so hybrid IS exact
    assert hybrid == truth
    # and pure star loses the pair — the reason hybrid exists
    assert (900, 901) not in star


def test_embedding_hybrid_and_star_sql_parity(embeddings, con):
    """The hybrid and star DuckDB twins reproduce the Spark relations
    bit-for-bit on the real embeddings table (same hub construction,
    same size crossover, vectors late-materialized from the base
    table on both engines)."""
    for mode, cap in (("star", D.STAR_CAP), ("hybrid", 3)):
        got = {
            (r.id_a, r.id_b): r.cosine
            for r in D.embedding_neardup_banded(
                embeddings, threshold=0.3, dim=64, pairs=mode, star_cap=cap
            ).collect()
        }
        want = {
            (a, b): c
            for a, b, c in con.execute(
                D.sql_embedding_neardup_banded(
                    "embeddings", "vec_id", "embedding", 0.3, dim=64,
                    pairs=mode, star_cap=cap,
                )
            ).fetchall()
        }
        assert got == want, f"pairs={mode} diverges"


def test_minhash_star_sql_parity(documents, con):
    """The text-path star edges are oracle-checkable too: Spark
    pairs="star" equals the DuckDB hub construction on the same
    corpus."""
    docs = documents.filter(F.col("doc_id") < 100)
    got = {
        (r.id_a, r.id_b)
        for r in D.minhash_dedup_pairs(docs, "doc_id", "text", pairs="star").collect()
    }
    sig_sql = D.sql_minhash_signatures(
        D.sql_shingles(
            "(SELECT * FROM documents WHERE doc_id < 100)", "doc_id", "text", 3
        ),
        "doc_id",
    )
    want = {
        (a, b)
        for a, b in con.execute(
            D.sql_lsh_candidate_pairs(sig_sql, "doc_id", pairs="star")
        ).fetchall()
    }
    assert got == want and len(got) > 0


def test_minhash_hybrid_sql_parity(documents, con):
    """The text-path hybrid crossover is oracle-checkable too: Spark
    pairs="hybrid" equals the DuckDB twin at a tiny star_cap (both
    branches active) AND at a large cap (pure all-pairs equivalence)."""
    docs = documents.filter(F.col("doc_id") < 100)
    sig_sql = D.sql_minhash_signatures(
        D.sql_shingles(
            "(SELECT * FROM documents WHERE doc_id < 100)", "doc_id", "text", 3
        ),
        "doc_id",
    )
    for cap in (2, 10_000):
        got = {
            (r.id_a, r.id_b)
            for r in D.minhash_dedup_pairs(
                docs, "doc_id", "text", pairs="hybrid", star_cap=cap
            ).collect()
        }
        want = {
            (a, b)
            for a, b in con.execute(
                D.sql_lsh_candidate_pairs(
                    sig_sql, "doc_id", pairs="hybrid", star_cap=cap
                )
            ).fetchall()
        }
        assert got == want and len(got) > 0, f"star_cap={cap} diverges"
    # large-cap hybrid degenerates to exact all-pairs
    allp = {
        (r.id_a, r.id_b)
        for r in D.minhash_dedup_pairs(docs, "doc_id", "text").collect()
    }
    assert got == allp


# ---------------------------------------------------------------------------
# Column-algebra REFERENCE builders for the r11 §15 canonical-parity
# pin. These deliberately duplicate dedup.py's pre-§15 formulas in
# Column form (ADVICE r11): they MUST mirror minhash_signatures /
# banded_signatures / simhash exactly — if the production formula ever
# changes, change the matching helper in the same commit or the parity
# test pins the wrong baseline.
# ---------------------------------------------------------------------------

def _ref_minhash_signatures(sh, id_col):
    """Column-algebra mirror of dedup.minhash_signatures(hashed=True)."""
    hashed = sh.select(
        F.col(id_col), F.pmod(F.col("shingle"), F.lit(D.P)).alias("_x")
    )
    return hashed.groupBy(id_col).agg(
        *[
            F.min((F.lit(a) * F.col("_x") + F.lit(b)) % F.lit(D.P)).alias(f"h{i}")
            for i, (a, b) in enumerate(zip(D.MINHASH_A, D.MINHASH_B))
        ]
    )


def _ref_banded_signatures(sig, id_col):
    """Column-algebra mirror of dedup.banded_signatures."""
    rpb = D.N_HASHES // D.N_BANDS
    bands = F.array(
        *[
            F.concat_ws(
                ":", *[F.col(f"h{b * rpb + r}") for r in range(rpb)]
            )
            for b in range(D.N_BANDS)
        ]
    )
    return sig.select(
        F.col(id_col), F.posexplode(bands).alias("band", "bsig")
    )


def _ref_simhash(docs, id_col, text_col):
    """Column-algebra mirror of dedup.simhash."""
    from gamma_spark.session import ensure_parallelism

    tok = (
        ensure_parallelism(docs, fanout=500.0)
        .select(F.col(id_col), F.explode(T.tokens(text_col)).alias("tok"))
        .distinct()
        .withColumn("h", T.hash60("tok"))
    )
    sums = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * F.lit(2)
                - F.lit(1)
            ).alias(f"s{j}")
            for j in range(D.SIMHASH_BITS)
        ]
    )
    return sums.select(
        F.col(id_col),
        sum(
            [
                F.when(F.col(f"s{j}") > 0, F.lit(2**j).cast("long"))
                .otherwise(F.lit(0).cast("long"))
                for j in range(D.SIMHASH_BITS)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )


def test_expr_built_signatures_canonically_equal_column_algebra(documents):
    """r11 §15: the minhash/simhash expression lists are built as parsed
    ``F.expr`` strings (one py4j round-trip each) instead of Column
    algebra (~6 round-trips per hash) — a driver-side construction cut
    only. This pins that the parsed plans are CANONICALLY IDENTICAL to
    the Column-built ones, so the rewrite can never drift semantically.
    The references live in the ``_ref_*`` helpers above (ADVICE r11)."""
    docs = documents.limit(50)

    def canon(df):
        return (
            df._jdf.queryExecution().optimizedPlan().canonicalized().toString()
        )

    sh = D.hashed_shingle_stream(docs, "doc_id", "text", 3)
    ref_sig = _ref_minhash_signatures(sh, "doc_id")
    got_sig = D.minhash_signatures(sh, "doc_id", hashed=True)
    assert canon(got_sig) == canon(ref_sig)

    assert canon(D.banded_signatures(got_sig, "doc_id")) == canon(
        _ref_banded_signatures(ref_sig, "doc_id")
    )

    assert canon(D.simhash(docs, "doc_id", "text")) == canon(
        _ref_simhash(docs, "doc_id", "text")
    )
