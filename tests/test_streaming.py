"""Incremental indexing (SURVEY T1-T4) + event-time windows via real
Structured Streaming micro-batches."""

import pytest
from pyspark.sql import functions as F

from gamma_spark.operators import knn
from gamma_spark.operators.ivf import IvfFlatIndex
from gamma_spark.streaming.incremental import (
    HybridSearcher,
    compact_index,
    stream_index_appender,
    windowed_event_stats,
)

NCENT = 8


def _await_done(q, timeout=600):
    """awaitTermination with a LOUD timeout: the bare
    q.awaitTermination(N) pattern returns False when the availableNow
    stream hasn't finished (e.g. under concurrent host load), and the
    test then reads a partial corpus while session teardown kills the
    in-flight batch — a confusing cascade instead of one clear
    assertion (r11 flake post-mortem: a 10M rehearsal saturating the
    host pushed the 2-batch stream past the old 180 s ceiling)."""
    assert q.awaitTermination(timeout), (
        f"stream {q.name or q.id} did not terminate within {timeout}s"
    )


@pytest.fixture(scope="module")
def docs(embeddings):
    return embeddings.withColumnRenamed("vec_id", "_docid")


@pytest.fixture(scope="module")
def queries(spark, docs):
    rows = docs.orderBy("_docid").limit(4).collect()
    return spark.createDataFrame(
        [(int(r._docid), [float(x) for x in r.embedding]) for r in rows],
        "qid long, qvec array<float>",
    )


def test_stream_append_then_search(tmp_path, spark, docs, queries):
    """Train on the first half, stream the second half in as parquet
    micro-batches via foreachBatch, verify full-probe search over the
    grown index equals exact brute force over everything (T2)."""
    path = str(tmp_path / "ivf")
    n = docs.count()
    first = docs.filter(F.col("_docid") < n // 2)
    rest = docs.filter(F.col("_docid") >= n // 2)

    idx = IvfFlatIndex.build(first, ncentroids=NCENT, seed=42, path=path)

    src_dir = str(tmp_path / "incoming")
    rest.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(rest.schema).parquet(src_dir)
    q = (
        stream_index_appender(stream, idx, path)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await_done(q)

    grown = IvfFlatIndex.load(spark, path)
    assert grown.index_df.count() == n

    got = grown.search(None, queries, k=10, metric="L2", nprobe=NCENT)
    want = knn.knn_join(docs, queries, k=10, metric="L2")
    g = {(r.qid, r.rank): r._docid for r in got.collect()}
    w = {(r.qid, r.rank): r._docid for r in want.collect()}
    assert g == w


def test_stream_append_pq_codes_then_search(tmp_path, spark, docs, queries):
    """T2 for IVFPQ: the appender encodes micro-batches with the trained
    codebooks (no retrain) into codes/; degenerate search over the grown
    index equals exact brute force."""
    from gamma_spark.operators.pq import IvfPqIndex

    path = str(tmp_path / "pq")
    n = docs.count()
    first = docs.filter(F.col("_docid") < n // 2)
    rest = docs.filter(F.col("_docid") >= n // 2)
    pq = IvfPqIndex.build(first, ncentroids=NCENT, nsubvector=8, seed=42, path=path)

    src = str(tmp_path / "incoming")
    rest.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(rest.schema).parquet(src)
    q = (
        stream_index_appender(stream, pq, path)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await_done(q)

    grown = IvfPqIndex.load(spark, path, docs)
    assert grown.codes_df.count() == n
    got = grown.search(
        docs, queries, k=10, metric="L2", nprobe=NCENT, recall_num=n, has_rank=True
    )
    want = knn.knn_join(docs, queries, k=10, metric="L2")
    g = {(r.qid, r.rank): (r._docid, round(r.score, 9)) for r in got.collect()}
    w = {(r.qid, r.rank): (r._docid, round(r.score, 9)) for r in want.collect()}
    assert g == w


def test_hybrid_search_covers_pending(spark, docs, queries):
    """T1: docs not yet in the index must still be searchable (exact
    tail union), and results must equal full exact search."""
    n = docs.count()
    indexed = docs.filter(F.col("_docid") < n // 2)
    pending = docs.filter(F.col("_docid") >= n // 2)
    idx = IvfFlatIndex.build(indexed, ncentroids=NCENT, seed=42)
    hybrid = HybridSearcher(idx, pending, doc_vec="embedding")
    got = hybrid.search(queries, k=10, metric="L2", nprobe=NCENT)
    want = knn.knn_join(docs, queries, k=10, metric="L2")
    g = {(r.qid, r.rank): r._docid for r in got.collect()}
    w = {(r.qid, r.rank): r._docid for r in want.collect()}
    assert g == w


def test_streaming_dripfeed_into_bucketed_store(tmp_path, spark, documents):
    """T2/T4 durable ingest: micro-batches stream through foreachBatch
    into a BucketedDocStore (O(batch) commits); final state equals the
    same batches applied sequentially with add_or_update."""
    from gamma_spark.table import BucketedDocStore, GammaTable

    base = documents.limit(100)
    table = GammaTable(spark, base, id_col="doc_id")
    store = BucketedDocStore.create(table, str(tmp_path / "store"), nbuckets=8)

    # three micro-batch files: updates + an insert wave
    src = str(tmp_path / "incoming")
    waves = []
    for i in range(3):
        w = base.filter(F.col("doc_id") % 3 == i).drop("_docid").withColumn(
            "text", F.lit(f"wave{i}")
        )
        waves.append(w)
        w.coalesce(1).write.mode("append").parquet(src)

    holder = {"store": store}

    def sink(batch_df, epoch_id):
        holder["store"] = holder["store"].upsert(batch_df)

    stream = spark.readStream.schema(waves[0].schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await_done(q)

    got = {
        r.doc_id: r.text
        for r in holder["store"].table().df.select("doc_id", "text").collect()
    }
    expect = table
    for w in waves:
        expect = expect.add_or_update(w)
    want = {r.doc_id: r.text for r in expect.df.select("doc_id", "text").collect()}
    assert got == want
    # every commit advanced the marker
    assert int(holder["store"].meta["commit"]) >= 3


def test_compaction_drops_tombstones(tmp_path, spark, docs):
    path = str(tmp_path / "ivf")
    flagged = docs.withColumn("_deleted", F.col("_docid") % 5 == 0)
    IvfFlatIndex.build(flagged, ncentroids=NCENT, seed=42, path=path)
    compact_index(spark, path)
    kept = spark.read.parquet(str(tmp_path / "ivf" / "index"))
    assert kept.filter(F.col("_docid") % 5 == 0).count() == 0
    assert kept.count() == docs.filter(F.col("_docid") % 5 != 0).count()


def test_windowed_event_stats_stream_matches_batch(tmp_path, spark, events):
    """The same windowed plan on a real stream (availableNow micro-
    batches + watermark) must produce the batch answer."""
    ev = events.withColumn(
        "ts2", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    ).drop("ts").withColumnRenamed("ts2", "ts")
    src = str(tmp_path / "events_src")
    ev.write.mode("overwrite").parquet(src)

    batch = windowed_event_stats(spark.read.parquet(src))
    want = {
        (r.window_start, r.event_type): (r.n_events, round(r.total_value, 6))
        for r in batch.collect()
    }

    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = windowed_event_stats(stream, watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("winstats")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    _await_done(q)
    got_rows = spark.sql("SELECT * FROM winstats").collect()
    got = {
        (r.window_start, r.event_type): (r.n_events, round(r.total_value, 6))
        for r in got_rows
    }
    # append mode only emits windows closed by the watermark; every
    # emitted window must match the batch result, and most windows close
    assert got, "stream produced no closed windows"
    for k, v in got.items():
        assert want[k] == v


def test_hnsw_micro_batch_append(spark, embeddings, tmp_path):
    """T2 for the graph model: successive micro-batches become fresh
    segments with non-colliding shard ids (the returned index must
    carry the advanced base), and search covers all of them."""
    from pyspark.sql import functions as F

    from gamma_spark.operators.hnsw import HnswIndex
    from gamma_spark.streaming.incremental import index_append_batch

    docs = embeddings.withColumnRenamed("vec_id", "_docid")
    first = docs.filter(F.col("_docid") < 300)
    b1 = docs.filter((F.col("_docid") >= 300) & (F.col("_docid") < 400))
    b2 = docs.filter(F.col("_docid") >= 400)
    path = str(tmp_path / "hnsw_stream")
    idx = HnswIndex.build(first, nshards=2, m=8, ef_construction=40,
                          metric="L2", path=path)
    idx = index_append_batch(idx, b1, path)
    idx = index_append_batch(idx, b2, path)
    assert idx.nshards == 4
    shards = {r._shard for r in idx.index_df.select("_shard").distinct().collect()}
    assert shards == {0, 1, 2, 3}  # no segment-id collision
    assert idx.index_df.count() == docs.count()
    target = b2.orderBy("_docid").limit(1).collect()[0]
    q = spark.createDataFrame(
        [(int(target._docid), [float(x) for x in target.embedding])],
        "qid long, qvec array<float>",
    )
    hits = idx.search(None, q, k=3, ef_search=64).collect()
    assert hits[0]._docid == target._docid


def test_stream_append_replayed_batch_is_skipped(spark, embeddings, tmp_path):
    """r9 replay ledger: Spark replays a micro-batch whose append
    committed but whose checkpoint didn't. The ledger records committed
    batch_ids, so the replay is a no-op — without it the HNSW path
    appended a DUPLICATE segment whose docids occupy top-k slots
    twice."""
    from pyspark.sql import functions as F

    from gamma_spark.operators.hnsw import HnswIndex
    from gamma_spark.streaming.incremental import index_append_batch_once

    docs = embeddings.withColumnRenamed("vec_id", "_docid")
    first = docs.filter(F.col("_docid") < 300)
    b1 = docs.filter(F.col("_docid") >= 300)
    path = str(tmp_path / "hnsw_replay")
    idx = HnswIndex.build(first, nshards=2, m=8, ef_construction=40,
                          metric="L2", path=path)
    state = {"index": idx}
    index_append_batch_once(state, b1, 7, path)
    after_first = state["index"]
    assert after_first.nshards == 3
    rows = after_first.index_df.count()
    # the replay: same batch_id arrives again (checkpoint never
    # committed) — must not append a second segment
    index_append_batch_once(state, b1, 7, path)
    assert state["index"] is after_first  # no new index object minted
    assert state["index"].nshards == 3
    assert state["index"].index_df.count() == rows
    # a NEW batch_id with the same rows still appends (the ledger keys
    # on batch identity, not content)
    index_append_batch_once(state, b1, 8, path)
    assert state["index"].nshards == 4


def test_stream_ledger_runs_stay_compact():
    """The ledger must be O(#gaps), not O(#batches): a years-long
    monotone stream stays ONE range, and arbitrary insertion orders
    match a set oracle (sorted, disjoint, fully merged runs)."""
    import random

    from gamma_spark.streaming.incremental import _runs_add, _runs_contain

    runs = []
    for i in range(5000):
        runs = _runs_add(runs, i)
    assert runs == [[0, 4999]]

    rng = random.Random(7)
    for _ in range(100):
        runs, seen = [], set()
        for _ in range(rng.randrange(1, 50)):
            x = rng.randrange(0, 30)
            if not _runs_contain(runs, x):
                runs = _runs_add(runs, x)
            seen.add(x)
        for (a, b), (c, d) in zip(runs, runs[1:]):
            assert b + 1 < c  # disjoint and fully merged
        assert {v for a, b in runs for v in range(a, b + 1)} == seen


def test_streaming_curation_gate_matches_batch(tmp_path, spark, documents):
    """r5 streaming curation: per-doc quality gating micro-batch by
    micro-batch equals the batch-mode gate over the full input (the
    signals are per-document, so no cross-batch state exists)."""
    from gamma_spark.streaming.incremental import (
        curate_batch,
        stream_curated_appender,
    )

    base = documents.limit(90).select("doc_id", "text")
    src = str(tmp_path / "incoming")
    for i in range(3):
        base.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    out = str(tmp_path / "curated")
    stream = spark.readStream.schema(base.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream_curated_appender(stream, out, max_dup_token_fraction=0.55)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await_done(q)

    from gamma_spark.streaming.incremental import read_stream_corpus

    got = {r.doc_id for r in read_stream_corpus(spark, out).select("doc_id").collect()}
    want = {
        r.doc_id
        for r in curate_batch(base, max_dup_token_fraction=0.55)
        .select("doc_id")
        .collect()
    }
    assert got == want
    assert 0 < len(got) < 90  # the gate actually cuts something


def test_stream_exact_dedup_across_batches(tmp_path, spark, documents):
    """r5 streaming exact dedup: the state store drops repeats that
    arrive in LATER micro-batches (file-per-trigger forces batch
    boundaries), keeping exactly one row per distinct content key."""
    from gamma_spark.streaming.incremental import stream_exact_dedup

    base = documents.limit(40).select("doc_id", "text")
    src = str(tmp_path / "incoming")
    # batch 0: docs 0..39; batch 1: the same texts under shifted ids
    base.coalesce(1).write.mode("append").parquet(src)
    base.select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    ).coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "deduped")
    stream = spark.readStream.schema(base.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream_exact_dedup(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await_done(q)

    got = spark.read.parquet(out)
    texts = [r.text for r in got.collect()]
    # one row per distinct text, no cross-batch repeats
    assert len(texts) == len(set(texts))
    distinct_in = base.select("text").distinct().count()
    assert len(texts) == distinct_in


def test_stream_neardup_dedup_across_batches(tmp_path, spark, documents):
    """r5 streaming near-dup: batch 1 bootstraps the MinHashIndex;
    batch 2 contains exact copies of batch-1 docs under new ids — the
    index must drop them, keeping only genuinely new content."""
    from gamma_spark.streaming.incremental import stream_neardup_dedup

    b1 = documents.filter(F.col("doc_id") < 200).select("doc_id", "text")
    # batch 2: 50 copies of batch-1 texts (new ids) + 100 fresh docs
    copies = b1.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 5000).alias("doc_id"), "text"
    )
    fresh = documents.filter(
        (F.col("doc_id") >= 200) & (F.col("doc_id") < 300)
    ).select("doc_id", "text")
    b2 = copies.unionByName(fresh)

    src = str(tmp_path / "incoming")
    b1.coalesce(1).write.mode("append").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "corpus")
    idxp = str(tmp_path / "mhidx")
    stream = spark.readStream.schema(b1.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream_neardup_dedup(stream, idxp, out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await_done(q)

    from gamma_spark.streaming.incremental import read_stream_corpus

    kept = {r.doc_id for r in read_stream_corpus(spark, out).select("doc_id").collect()}
    b1_ids = {r.doc_id for r in b1.select("doc_id").collect()}
    fresh_ids = {r.doc_id for r in fresh.select("doc_id").collect()}
    copy_ids = {r.doc_id + 0 for r in copies.select("doc_id").collect()}
    # batch-1 survivors: everything except within-batch near-dup losers
    assert b1_ids - kept == set() or (b1_ids & kept)  # batch 1 mostly kept
    # every exact copy of earlier content dropped; fresh content kept
    # unless it legitimately near-dups earlier content (the fixture
    # plants such pairs) — any dropped fresh doc must have an LSH pair
    assert not (copy_ids & kept)
    dropped_fresh = fresh_ids - kept
    if dropped_fresh:
        from gamma_spark.operators.dedup import minhash_dedup_pairs

        paired = {
            i
            for r in minhash_dedup_pairs(
                b1.unionByName(b2), "doc_id", "text"
            ).collect()
            for i in (r.id_a, r.id_b)
        }
        assert dropped_fresh <= paired
    assert len(fresh_ids & kept) > 80  # the bulk of fresh content survives


def test_stream_append_bm25_then_search(tmp_path, spark, documents):
    """Lexical model through the same foreachBatch appender as the
    vector models: stream half the corpus in, search must equal a fresh
    build over everything (scores included)."""
    from gamma_spark.operators import retrieval as R
    from gamma_spark.streaming.incremental import stream_index_appender

    base = documents.limit(100).select("doc_id", "text")
    first = base.filter(F.col("doc_id") < 50)
    rest = base.filter(F.col("doc_id") >= 50)

    path = str(tmp_path / "bm25")
    idx = R.Bm25Index.build(first, path=path)

    src = str(tmp_path / "incoming")
    rest.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(rest.schema).parquet(src)
    q = (
        stream_index_appender(stream, idx, path)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await_done(q)

    terms = spark.createDataFrame(
        [(0, "table"), (0, "scan"), (1, "spark")], "qid long, term string"
    )
    got = [
        (r.qid, r._docid, r.score)
        for r in R.Bm25Index.load(spark, path).search(terms, k=5)
        .orderBy("qid", "rank").collect()
    ]
    want = [
        (r.qid, r._docid, r.score)
        for r in R.Bm25Index.build(base).search(terms, k=5)
        .orderBy("qid", "rank").collect()
    ]
    assert got == want


# A pair that shares one LSH band but has exact Jaccard ~0.27 (searched
# offline over random word sequences with the production banding:
# 8 bands x 4 rows) — the "chance band collision between dissimilar
# docs" ADVICE r4 warned must not delete a non-duplicate at ingest.
_COLLIDER_A = (
    "w207 w335 w122 w154 w247 w285 w342 w201 w061 w085 w329 w082 w038 "
    "w106 w256 w254 w281 w112 w231 w170 w388 w230 w218 w071 w280 w098 "
    "w124 w046 w089 w175 w284 w046 w163 w122 w188 w132 w291 w103 w010 w383"
)
_COLLIDER_B = (
    "w207 w335 w122 w154 w247 w285 w342 w201 w061 w085 w329 w082 w038 "
    "w106 w256 w254 w281 w112 w211 w196 w211 w381 w268 w107 w192 w138 "
    "w173 w385 w031 w255 w142 w294 w184 w064 w351 w257 w270 w322 w110 w047"
)


def _run_neardup_stream(tmp_path, spark, batches, schema, threshold, tag):
    from gamma_spark.streaming.incremental import (
        read_stream_corpus,
        stream_neardup_dedup,
    )

    src = str(tmp_path / f"in_{tag}")
    for b in batches:
        b.coalesce(1).write.mode("append").parquet(src)
    out = str(tmp_path / f"out_{tag}")
    idxp = str(tmp_path / f"idx_{tag}")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream_neardup_dedup(stream, idxp, out, threshold=threshold)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{tag}"))
        .trigger(availableNow=True)
        .start()
    )
    _await_done(q)
    return {r.doc_id for r in read_stream_corpus(spark, out).select("doc_id").collect()}


def test_stream_neardup_verify_keeps_chance_collisions(tmp_path, spark):
    """ADVICE r4 (medium): an LSH band collision whose exact Jaccard is
    below threshold must NOT drop the document — the default verified
    mode keeps it; threshold=None (explicit unverified mode) drops it."""
    from gamma_spark.operators.dedup import MinHashIndex

    b1 = spark.createDataFrame([(1, _COLLIDER_A)], "doc_id long, text string")
    # batch 2: the dissimilar collider + an exact copy of doc 1
    b2 = spark.createDataFrame(
        [(2, _COLLIDER_B), (3, _COLLIDER_A)], "doc_id long, text string"
    )

    # precondition: (1,2) really is an LSH candidate pair (else the
    # test is vacuous) with sub-threshold exact Jaccard
    idx = MinHashIndex.build(b1, "doc_id", "text")
    cands = {(r.new_id, r.corpus_id) for r in idx.match(b2, "text").collect()}
    assert (2, 1) in cands

    kept = _run_neardup_stream(tmp_path, spark, [b1, b2], b1.schema, 0.5, "v")
    assert kept == {1, 2}, f"verified mode must keep the non-dup: {kept}"

    kept_u = _run_neardup_stream(tmp_path, spark, [b1, b2], b1.schema, None, "u")
    assert kept_u == {1}, f"unverified mode drops candidates outright: {kept_u}"


def test_minhash_index_append_idempotent(tmp_path, spark, documents):
    """batch_id-keyed appends overwrite their own subdir: re-appending
    the same micro-batch must not duplicate bucket rows."""
    from gamma_spark.operators.dedup import MinHashIndex

    b1 = documents.filter(F.col("doc_id") < 100).select("doc_id", "text")
    b2 = documents.filter(
        (F.col("doc_id") >= 100) & (F.col("doc_id") < 150)
    ).select("doc_id", "text")
    p = str(tmp_path / "mh")
    idx = MinHashIndex.build(b1, "doc_id", "text", path=p)
    idx = idx.append(b2, "text", batch_id=7)
    n1 = idx.banded.count()
    idx = idx.append(b2, "text", batch_id=7)  # retry of the same batch
    assert idx.banded.count() == n1


def test_bm25_index_append_idempotent(tmp_path, spark, documents):
    """The meta ledger makes a committed batch a no-op on retry: stats
    and postings must not double-count (ADVICE r4)."""
    from gamma_spark.operators.retrieval import Bm25Index

    b1 = documents.filter(F.col("doc_id") < 100).select("doc_id", "text")
    b2 = documents.filter(
        (F.col("doc_id") >= 100) & (F.col("doc_id") < 150)
    ).select("doc_id", "text")
    p = str(tmp_path / "bm25")
    idx = Bm25Index.build(b1, path=p)
    idx = idx.append(b2, batch_id=3)
    n_post, nd, avg = idx.postings.count(), idx.n_docs, idx.avgdl
    idx = idx.append(b2, batch_id=3)  # retry
    assert idx.postings.count() == n_post
    assert idx.n_docs == nd and idx.avgdl == avg
    # a NEW batch id still appends
    b3 = documents.filter(
        (F.col("doc_id") >= 150) & (F.col("doc_id") < 170)
    ).select("doc_id", "text")
    idx = idx.append(b3, batch_id=4)
    assert idx.n_docs == nd + 20
    # reload sees the ledgered stats
    re = Bm25Index.load(spark, p)
    assert re.n_docs == idx.n_docs and re.postings.count() == idx.postings.count()


def test_bm25_index_append_crash_before_meta_then_retry(
    tmp_path, spark, documents, monkeypatch
):
    """The documented crash contract (retrieval.py append docstring):
    postings commit, then the meta (stats + ledger) replaces last. A
    crash between the two leaves the batch visible but un-ledgered;
    retrying the SAME batch_id overwrites the same subdir and completes
    the ledger — stats count the batch exactly once."""
    import gamma_spark.io_util as ioutil
    from gamma_spark.operators.retrieval import Bm25Index

    b1 = documents.filter(F.col("doc_id") < 100).select("doc_id", "text")
    b2 = documents.filter(
        (F.col("doc_id") >= 100) & (F.col("doc_id") < 150)
    ).select("doc_id", "text")
    p = str(tmp_path / "bm25c")
    idx = Bm25Index.build(b1, path=p)
    nd0, avg0 = idx.n_docs, idx.avgdl

    real_replace = ioutil.os.replace
    armed = {"on": True}

    def crash_on_meta(src_p, dst_p):
        if armed["on"] and str(dst_p).endswith("meta.json"):
            raise RuntimeError("injected crash before meta commit")
        return real_replace(src_p, dst_p)

    monkeypatch.setattr(ioutil.os, "replace", crash_on_meta)
    with pytest.raises(RuntimeError, match="injected crash"):
        idx.append(b2, batch_id=11)
    armed["on"] = False

    # reload: the old meta is intact (atomic replace never landed), so
    # stats are one batch stale exactly as documented
    re = Bm25Index.load(spark, p)
    assert re.n_docs == nd0 and re.avgdl == avg0
    # retry of the same batch on the stale index completes the commit
    done = re.append(b2, batch_id=11)
    assert done.n_docs == nd0 + 50
    # postings contain the batch exactly once
    batch_docs = done.postings.select("_docid").distinct().count()
    assert batch_docs == 150
    # and a second retry is now the ledgered no-op
    again = done.append(b2, batch_id=11)
    assert again.n_docs == done.n_docs and again.avgdl == done.avgdl


def test_embedding_neardup_append_idempotent(tmp_path, spark, embeddings):
    from gamma_spark.operators.dedup import EmbeddingNearDupIndex

    b1 = embeddings.filter(F.col("vec_id") < 100)
    b2 = embeddings.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 150))
    p = str(tmp_path / "emb")
    idx = EmbeddingNearDupIndex.build(b1, path=p)
    idx = idx.append(b2, batch_id=9)
    nv, nb = idx.vectors.count(), idx.banded.count()
    idx = idx.append(b2, batch_id=9)  # retry
    assert idx.vectors.count() == nv and idx.banded.count() == nb


def test_stream_neardup_dedup_releases_persists_per_batch(
    tmp_path, spark, documents
):
    """r8 soak regression, end-to-end: the foreachBatch handler must
    leave ZERO persisted RDDs behind after the stream drains — before
    the stage_scope fix each micro-batch pinned +3-4 (the staged
    intermediates inside minhash_verified_pairs), which OOM'd the
    20-batch 1M-corpus soak."""
    from gamma_spark.streaming.incremental import stream_neardup_dedup

    jsc = spark.sparkContext._jsc
    spark.catalog.clearCache()
    base = int(jsc.getPersistentRDDs().size())

    src = str(tmp_path / "incoming")
    for lo in (0, 60, 120):
        documents.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 60)
        ).select("doc_id", "text").coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream_neardup_dedup(
            stream, str(tmp_path / "idx"), str(tmp_path / "corpus")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await_done(q)
    assert int(jsc.getPersistentRDDs().size()) == base


def test_stream_index_appender_releases_persists_per_batch(
    tmp_path, spark, docs
):
    """VERDICT r8 #5: the zero-leak invariant must hold for EVERY
    foreachBatch handler, not just the near-dup one — a staged
    intermediate added inside index_append_batch later must not be
    able to reintroduce the r8 soak leak silently. Multi-batch drain
    (maxFilesPerTrigger=1), then persistent RDDs == baseline."""
    path = str(tmp_path / "ivf")
    n = docs.count()
    first = docs.filter(F.col("_docid") < n // 2)
    rest = docs.filter(F.col("_docid") >= n // 2)
    idx = IvfFlatIndex.build(first, ncentroids=NCENT, seed=42, path=path)

    src = str(tmp_path / "incoming")
    for i in range(3):
        rest.filter(F.col("_docid") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    jsc = spark.sparkContext._jsc
    spark.catalog.clearCache()
    base = int(jsc.getPersistentRDDs().size())

    stream = spark.readStream.schema(rest.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream_index_appender(stream, idx, path)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await_done(q)
    assert int(jsc.getPersistentRDDs().size()) == base
    assert IvfFlatIndex.load(spark, path).index_df.count() == n


def test_stream_curated_appender_releases_persists_per_batch(
    tmp_path, spark, documents
):
    """Same zero-leak pin for the curation-gate sink (VERDICT r8 #5)."""
    from gamma_spark.streaming.incremental import stream_curated_appender

    base_docs = documents.limit(90).select("doc_id", "text")
    src = str(tmp_path / "incoming")
    for i in range(3):
        base_docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    jsc = spark.sparkContext._jsc
    spark.catalog.clearCache()
    base = int(jsc.getPersistentRDDs().size())

    stream = spark.readStream.schema(base_docs.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream_curated_appender(stream, str(tmp_path / "curated"),
                                max_dup_token_fraction=0.55)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await_done(q)
    assert int(jsc.getPersistentRDDs().size()) == base
