"""BM25 lexical retrieval, RRF hybrid fusion, repetition signals and
decontamination (round-5 north-star operators): semantic checks against
hand-computed references plus determinism properties."""

import math

import pytest
from pyspark.sql import functions as F

from gamma_spark.operators import dedup as D
from gamma_spark.operators import retrieval as R
from gamma_spark.operators.quality import repetition_signals


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "spark runs fast queries"),
        (1, "spark shuffles data fast"),
        (2, "ducks swim on the pond"),
        (3, "the pond is calm today"),
        (4, "fast fast fast spark"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bm25_reference(corpus_rows, qterms, k1=R.BM25_K1, b=R.BM25_B):
    """Plain-python BM25 (Lucene variant) for the expected scores."""
    docs = {i: t.split(" ") for i, t in corpus_rows}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    scores = {}
    for term in qterms:
        df = sum(1 for t in docs.values() if term in t)
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for i, toks in docs.items():
            tf = toks.count(term)
            if tf == 0:
                continue
            contrib = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
            scores[i] = scores.get(i, 0.0) + round(contrib, 7)
    return scores


def test_bm25_matches_reference(spark, corpus):
    qt = spark.createDataFrame(
        [(0, "spark"), (0, "fast"), (1, "pond")], "qid long, term string"
    )
    got = {
        (r.qid, r._docid): r.score
        for r in R.bm25_search(corpus, qt, k=5).collect()
    }
    rows = [(r.doc_id, r.text) for r in corpus.collect()]
    want0 = _bm25_reference(rows, ["spark", "fast"])
    want1 = _bm25_reference(rows, ["pond"])
    for (qid, doc), score in got.items():
        want = (want0 if qid == 0 else want1)[doc]
        assert score == pytest.approx(want, abs=1e-6), (qid, doc)
    # ranking: doc 4 says "fast" 3x + "spark" -> top for query 0
    ranks = {
        (r.qid, r.rank): r._docid for r in R.bm25_search(corpus, qt, k=5).collect()
    }
    assert ranks[(0, 1)] == 4
    # query 1 only matches the two pond docs
    assert {d for (q, _), d in ranks.items() if q == 1} == {2, 3}


def test_bm25_respects_k_and_ties(spark, corpus):
    qt = spark.createDataFrame([(7, "the")], "qid long, term string")
    out = R.bm25_search(corpus, qt, k=1).collect()
    assert len(out) == 1 and out[0].rank == 1
    # both pond docs contain "the" once with equal dl -> tie broken by _docid
    assert out[0]._docid == 2


def test_rrf_union_semantics(spark):
    a = spark.createDataFrame([(0, 10, 1), (0, 11, 2)], "qid long, _docid long, rank int")
    b = spark.createDataFrame([(0, 11, 1), (0, 12, 2)], "qid long, _docid long, rank int")
    got = {r._docid: r.score for r in R.rrf_fuse([a, b], k=10).collect()}
    c = R.RRF_C
    assert set(got) == {10, 11, 12}  # union, not intersection
    assert got[11] == pytest.approx(1 / (c + 2) + 1 / (c + 1))
    assert got[10] == pytest.approx(1 / (c + 1))
    assert got[12] == pytest.approx(1 / (c + 2))
    # doc present in both systems outranks single-system docs here
    ranks = {r.rank: r._docid for r in R.rrf_fuse([a, b], k=10).collect()}
    assert ranks[1] == 11


def test_repetition_signals_hand_computed(spark):
    df = spark.createDataFrame([(0, "a a a b")], "doc_id long, text string")
    row = repetition_signals(df).collect()[0]
    assert row.n_tokens == 4
    assert row.dup_token_fraction == pytest.approx(1 - 2 / 4)
    # bigrams: "a a" x2, "a b" x1 -> 2/3
    assert row.top_bigram_fraction == pytest.approx(2 / 3)
    want_ent = -(0.75 * math.log(0.75)) - (0.25 * math.log(0.25))
    assert row.token_entropy == pytest.approx(want_ent, abs=1e-6)


def test_repetition_signals_degenerate_docs(spark):
    df = spark.createDataFrame(
        [(0, "x"), (1, "x x x x")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in repetition_signals(df).collect()}
    # single token: no bigrams, zero entropy, no dup
    assert rows[0].top_bigram_fraction == 0.0
    assert rows[0].token_entropy == 0.0
    assert rows[0].dup_token_fraction == 0.0
    # pure repetition: entropy 0, everything duplicated
    assert rows[1].token_entropy == 0.0
    assert rows[1].dup_token_fraction == pytest.approx(0.75)
    assert rows[1].top_bigram_fraction == pytest.approx(1.0)


def test_decontaminate_planted(spark):
    shared = "one two three four five six"
    train = spark.createDataFrame(
        [(0, f"clean text with no overlap at all padding words here"),
         (1, f"prefix {shared} suffix tokens")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, f"{shared} tail")], "doc_id long, text string")
    got = {r.doc_id: r.n_contaminated for r in
           D.decontaminate(train, ev, n=6).collect()}
    assert 1 in got and 0 not in got
    assert got[1] >= 1


def test_bm25_plan_broadcasts_query_side(spark, corpus):
    qt = spark.createDataFrame([(0, "spark")], "qid long, term string")
    plan = R.bm25_search(corpus, qt, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bm25_champions_degenerate_exact(spark, corpus):
    """champions >= corpus size keeps every posting -> identical to
    the exact mode, scores included (the IVF nprobe=ncentroids
    pattern applied to lexical retrieval)."""
    qt = spark.createDataFrame(
        [(0, "spark"), (0, "fast"), (1, "the")], "qid long, term string"
    )
    exact = sorted(
        (r.qid, r._docid, r.score, r.rank)
        for r in R.bm25_search(corpus, qt, k=5).collect()
    )
    champ = sorted(
        (r.qid, r._docid, r.score, r.rank)
        for r in R.bm25_search(corpus, qt, k=5, champions=100).collect()
    )
    assert exact == champ


def test_bm25_champions_prunes_per_term(spark, corpus):
    """champions=1 with champion_df_floor=0 (unconditional pruning)
    and rescore=False — the classic textbook champion list — keeps
    only each term's best doc: query 0's result set is at most one doc
    per query term. (With rescore=True the r6 per-query fallback now
    detects kth<ub and returns the exact answer instead — covered by
    test_bm25_wand_all_pruned_terms_falls_back_exact.)"""
    qt = spark.createDataFrame(
        [(0, "spark"), (0, "pond")], "qid long, term string"
    )
    out = R.bm25_search(
        corpus, qt, k=5, champions=1, champion_df_floor=0, rescore=False
    ).collect()
    assert len(out) <= 2
    # "spark": docs 0/1/4 tie on tf-normalization (tf=1, dl=4) -> the
    # _docid tiebreak keeps doc 0; "pond": docs 2/3 tie -> doc 2
    docs_hit = {r._docid for r in out}
    assert docs_hit == {0, 2}


def test_bm25_champion_df_floor_keeps_midband_terms_exact(spark, corpus):
    """The df-aware default (floor = 4*champions) leaves terms with
    df <= floor untouched: champions=1 then equals exact on this
    corpus, where every term's df is < 4."""
    qt = spark.createDataFrame(
        [(0, "spark"), (0, "pond"), (1, "the")], "qid long, term string"
    )
    exact = sorted(
        (r.qid, r._docid, str(r.score), r.rank)
        for r in R.bm25_search(corpus, qt, k=5).collect()
    )
    champ = sorted(
        (r.qid, r._docid, str(r.score), r.rank)
        for r in R.bm25_search(corpus, qt, k=5, champions=1).collect()
    )
    assert exact == champ


def test_bm25_index_matches_adhoc(spark, corpus, tmp_path):
    """Bm25Index.build/search must equal bm25_search bit-for-bit (same
    rounding + decimal sum; avgdl = Σtf/N from the postings equals
    Σdl/N from the docs), both cached and parquet-backed."""
    qt = spark.createDataFrame(
        [(0, "spark"), (0, "fast"), (1, "pond"), (1, "the")],
        "qid long, term string",
    )
    want = sorted(
        (r.qid, r._docid, str(r.score), r.rank)
        for r in R.bm25_search(corpus, qt, k=5).collect()
    )
    for path in (None, str(tmp_path / "bm25")):
        idx = R.Bm25Index.build(corpus, path=path)
        got = sorted(
            (r.qid, r._docid, str(r.score), r.rank)
            for r in idx.search(qt, k=5).collect()
        )
        assert got == want, f"path={path}"
    # champions path parity too
    idx = R.Bm25Index.build(corpus)
    a = sorted(map(tuple, R.bm25_search(corpus, qt, k=5, champions=2).collect()))
    c = sorted(map(tuple, idx.search(qt, k=5, champions=2).collect()))
    assert a == c


def test_bm25_index_load_roundtrip(spark, corpus, tmp_path):
    """S5-style dump/load for the lexical model: load() reopens the
    postings + meta sidecar with no corpus pass and returns identical
    results."""
    qt = spark.createDataFrame([(0, "spark"), (0, "pond")], "qid long, term string")
    path = str(tmp_path / "bm25_store")
    built = R.Bm25Index.build(corpus, path=path)
    want = sorted(map(tuple, built.search(qt, k=5).collect()))
    loaded = R.Bm25Index.load(spark, path)
    assert (loaded.n_docs, loaded.avgdl, loaded.k1, loaded.b) == (
        built.n_docs, built.avgdl, built.k1, built.b,
    )
    got = sorted(map(tuple, loaded.search(qt, k=5).collect()))
    assert got == want


def test_bm25_index_append_equals_fresh_build(spark, corpus, tmp_path):
    """Incremental growth parity: build on half, append the rest — the
    search result (scores included) must equal a fresh build over the
    full corpus, both in memory and through the durable path."""
    first = corpus.filter(F.col("doc_id") < 3)
    rest = corpus.filter(F.col("doc_id") >= 3)
    q = spark.createDataFrame(
        [(0, "spark"), (0, "fast"), (1, "pond")], "qid long, term string"
    )

    want = [
        (r.qid, r._docid, r.score, r.rank)
        for r in R.Bm25Index.build(corpus).search(q, k=5)
        .orderBy("qid", "rank").collect()
    ]

    grown = R.Bm25Index.build(first).append(rest)
    got_mem = [
        (r.qid, r._docid, r.score, r.rank)
        for r in grown.search(q, k=5).orderBy("qid", "rank").collect()
    ]
    assert got_mem == want

    path = str(tmp_path / "bm25inc")
    idx = R.Bm25Index.build(first, path=path)
    idx.append(rest)
    got_disk = [
        (r.qid, r._docid, r.score, r.rank)
        for r in R.Bm25Index.load(spark, path).search(q, k=5)
        .orderBy("qid", "rank").collect()
    ]
    assert got_disk == want


def test_bm25_wand_rescore_equals_exact_under_active_pruning(spark):
    """VERDICT r4 #4: champion mode with the WAND band rescore must
    return the EXACT top-k (scores bit-for-bit) even when the champion
    cut is aggressive and actually drops postings — on a corpus where
    a hot term spans most docs and relevance is summed across legs."""
    import random

    rng = random.Random(11)
    rows = []
    for i in range(400):
        toks = ["hot"] * rng.randint(1, 4)  # near-universal term
        for _ in range(rng.randint(3, 12)):
            toks.append(f"m{rng.randint(0, 30)}")  # mid-band terms
        rng.shuffle(toks)
        rows.append((i, " ".join(toks)))
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    qt = spark.createDataFrame(
        [(q, t) for q in range(6) for t in ("hot", f"m{q}", f"m{q+7}")],
        "qid long, term string",
    )
    exact = sorted(
        (r.qid, r._docid, str(r.score), r.rank)
        for r in R.bm25_search(corpus, qt, k=10).collect()
    )
    # floor 100 forces pruning of "hot" (df ~400) but not the mids
    wand = sorted(
        (r.qid, r._docid, str(r.score), r.rank)
        for r in R.bm25_search(
            corpus, qt, k=10, champions=20, champion_df_floor=100
        ).collect()
    )
    assert wand == exact
    # index path identical
    idx = R.Bm25Index.build(corpus)
    wand_idx = sorted(
        (r.qid, r._docid, str(r.score), r.rank)
        for r in idx.search(qt, k=10, champions=20, champion_df_floor=100).collect()
    )
    assert wand_idx == exact
    # the r4 plateau mode (rescore=False) really is lossier here —
    # proves the band rescue is doing work, not vacuously passing
    plain = sorted(
        (r.qid, r._docid, str(r.score), r.rank)
        for r in R.bm25_search(
            corpus, qt, k=10, champions=20, champion_df_floor=100,
            rescore=False,
        ).collect()
    )
    assert plain != exact


def test_bm25_wand_all_pruned_terms_falls_back_exact(spark):
    """ADVICE r5: a query whose terms are ALL prunable (all stop-words)
    can have a true-top-k doc that appears in NO kept list — partial
    scores can't see it, so the band can't rescue it. The per-query
    kth<ub detector must route such queries to exact unpruned scoring
    instead of silently approximating (the r5 docstring overclaim)."""
    import random

    rng = random.Random(23)
    rows = []
    # every doc contains stop-word "the"; tf varies so the champion cut
    # (by tfn) actually ranks docs and drops most of them
    for i in range(300):
        toks = ["the"] * rng.randint(1, 6) + ["filler"] * rng.randint(0, 8)
        rows.append((i, " ".join(toks)))
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    # single-term stop-word query: with champions=3 and floor=0 the
    # kept list holds 3 docs but k=10 — nk<k AND kth<ub both trigger
    qt = spark.createDataFrame(
        [(0, "the"), (1, "filler"), (1, "the")], "qid long, term string"
    )
    exact = sorted(
        (r.qid, r._docid, str(r.score), r.rank)
        for r in R.bm25_search(corpus, qt, k=10).collect()
    )
    wand = sorted(
        (r.qid, r._docid, str(r.score), r.rank)
        for r in R.bm25_search(
            corpus, qt, k=10, champions=3, champion_df_floor=0
        ).collect()
    )
    assert wand == exact
    idx = R.Bm25Index.build(corpus)
    wand_idx = sorted(
        (r.qid, r._docid, str(r.score), r.rank)
        for r in idx.search(qt, k=10, champions=3, champion_df_floor=0).collect()
    )
    assert wand_idx == exact


def test_bm25_index_empty_batch_append(spark, corpus):
    """r9 review fix: an empty micro-batch (or all-NULL text) used to
    TypeError on None stats; it must be a stats no-op."""
    idx = R.Bm25Index.build(corpus)
    empty = spark.createDataFrame([], "doc_id long, text string")
    grown = idx.append(empty)
    assert grown.n_docs == idx.n_docs
    assert grown.avgdl == idx.avgdl
    # all-NULL text: rows count toward N, contribute no tokens
    nulls = spark.createDataFrame([(90, None), (91, None)], "doc_id long, text string")
    grown2 = idx.append(nulls)
    assert grown2.n_docs == idx.n_docs + 2
    assert grown2.avgdl == pytest.approx(
        idx.avgdl * idx.n_docs / (idx.n_docs + 2)
    )


def test_bm25_index_stale_handle_stats(spark, corpus, tmp_path):
    """r9 review fix: a handle loaded before another process's append
    must base its running stats on DISK meta, not its in-memory copy —
    otherwise the other batch silently vanishes from n_docs/avgdl."""
    path = str(tmp_path / "bm25stale")
    first = corpus.filter(F.col("doc_id") < 3)
    R.Bm25Index.build(first, path=path)
    a = R.Bm25Index.load(spark, path)
    b = R.Bm25Index.load(spark, path)
    batch1 = corpus.filter(F.col("doc_id") == 3)
    batch2 = corpus.filter(F.col("doc_id") == 4)
    a.append(batch1, batch_id="b1")
    out = b.append(batch2, batch_id="b2")  # stale handle
    fresh = R.Bm25Index.build(corpus)
    assert out.n_docs == fresh.n_docs
    assert out.avgdl == pytest.approx(fresh.avgdl)
    # idempotent replay of a committed id also returns DISK stats
    replay = R.Bm25Index.load(spark, path).append(batch1, batch_id="b1")
    assert replay.n_docs == fresh.n_docs
    assert replay.avgdl == pytest.approx(fresh.avgdl)


def test_bm25_stats_count_nulltext_docs(spark):
    """r9 review fix: N counts every doc (NULL/empty text included) in
    BOTH paths — Bm25Index.build scores must stay bit-for-bit equal to
    bm25_search on a corpus with NULL-text rows."""
    rows = [
        (0, "spark runs fast"),
        (1, "fast pond spark"),
        (2, None),
        (3, "the pond"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    q = spark.createDataFrame([(0, "spark"), (0, "pond")], "qid long, term string")
    adhoc = {(r.qid, r._docid): r.score for r in R.bm25_search(corpus, q, k=4).collect()}
    idx = R.Bm25Index.build(corpus)
    assert idx.n_docs == 4.0
    got = {(r.qid, r._docid): r.score for r in idx.search(q, k=4).collect()}
    assert got == adhoc


def _scan_counted(spark, corpus):
    """corpus routed through a mapInPandas row counter: the accumulator
    counts how many rows the docs relation SENDS through the plan — one
    full corpus pass adds exactly len(corpus)."""
    acc = spark.sparkContext.accumulator(0)

    def count_rows(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    return corpus.mapInPandas(count_rows, corpus.schema), acc


def test_bm25_build_single_corpus_pass(spark, corpus, tmp_path):
    """VERDICT r9 #4: fit costs ONE corpus action — the row count and
    token total ride the postings job as observed metrics instead of a
    second docs scan. The accumulator sees each input row exactly once,
    and the stats are bit-identical to the two-pass shape."""
    n = corpus.count()
    counted, acc = _scan_counted(spark, corpus)
    idx = R.Bm25Index.build(counted, path=str(tmp_path / "bm25single"))
    assert acc.value == n, f"docs scanned {acc.value / n:.1f}x, want 1x"
    assert idx.n_docs == float(n)
    # reference stats from an uninstrumented build over the same corpus
    ref = R.Bm25Index.build(corpus)
    assert idx.avgdl == ref.avgdl
    # memory-mode build also makes one pass
    counted2, acc2 = _scan_counted(spark, corpus)
    idx2 = R.Bm25Index.build(counted2)
    assert acc2.value == n
    assert (idx2.n_docs, idx2.avgdl) == (idx.n_docs, idx.avgdl)


def test_bm25_append_single_pass_and_no_pins(spark, corpus, tmp_path):
    """ADVICE r9 + VERDICT r9 #4 on the append path: one action over
    the new batch, no persisted RDD left pinned after the call (the r9
    shape staged post_new and leaked the pin for plain batch callers),
    stats unchanged vs a fresh build over the union."""
    jsc = spark.sparkContext._jsc.sc()
    base_pins = int(jsc.getPersistentRDDs().size())
    path = str(tmp_path / "bm25append")
    first = corpus.filter(F.col("doc_id") < 3)
    idx = R.Bm25Index.build(first, path=path)
    batch = corpus.filter(F.col("doc_id") >= 3)
    nb = batch.count()
    counted, acc = _scan_counted(spark, batch)
    grown = idx.append(counted, batch_id="b1")
    assert acc.value == nb, f"batch scanned {acc.value / nb:.1f}x, want 1x"
    assert int(jsc.getPersistentRDDs().size()) == base_pins
    fresh = R.Bm25Index.build(corpus)
    assert grown.n_docs == fresh.n_docs
    assert grown.avgdl == pytest.approx(fresh.avgdl, abs=1e-12)
    # memory-only append: also leak-free (its one action materializes
    # the observations, nothing stays persisted beyond build()'s own
    # intentional postings cache)
    mem_idx = R.Bm25Index.build(first)
    pins_after_build = int(jsc.getPersistentRDDs().size())
    grown2 = mem_idx.append(batch)
    assert int(jsc.getPersistentRDDs().size()) == pins_after_build
    assert grown2.n_docs == fresh.n_docs
    assert grown2.avgdl == pytest.approx(fresh.avgdl, abs=1e-12)
