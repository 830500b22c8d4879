"""Incremental indexing + event-time analytics (SURVEY §2.7 T1-T4).

The reference's real-time story: docs are searchable immediately after
Add via brute force, a background thread appends new vectors to the
trained index every second (`search/gamma_engine.cc:1012-1043`,
`vector/vector_manager.cc:280-382`), and deletes are masked lazily.
BASELINE.json scopes us to micro-batch semantics, which map exactly:

- T1 (searchable before indexed)  -> HybridSearcher: index search over
  the indexed set UNION exact scan over the pending tail, one top-k.
- T2 (background index append)    -> Structured Streaming
  ``foreachBatch``: assign cluster ids for the micro-batch with the
  *already trained* centroids (map-only) and append to the
  cluster-partitioned index table.
- T3 (bucket compaction)          -> periodic rewrite job
  (:func:`compact_index`).
- T4 (lazy delete masking)        -> `_deleted` tombstones checked at
  scan time, physically dropped by compaction.

Event-time windows (watermarks, tumbling/sliding) are *new* Spark-native
capability beyond the reference (gamma is arrival-time only — SURVEY
§2.7), exposed here for the ``events`` stream table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gamma_spark.operators.ivf import IvfFlatIndex, assign_clusters
from gamma_spark.operators.topk import topk
from gamma_spark.session import stage_scope


def index_append_batch(index, batch_df: DataFrame, path: str,
                       batch_id: int | None = None):
    """T2: assign the micro-batch to inverted lists with the trained
    quantizer and append — the Spark analogue of AddRTVecsToIndex's
    <=1000-vector chunked appends. Map-only + partitioned append; no
    retrain, no shuffle. Dispatches on index kind: IVFFLAT appends raw
    rows to ``index/``; IVFPQ encodes the batch with the trained
    codebooks and appends to ``codes/``; HNSW grows by fresh graph
    segments. Returns the index to use for the NEXT batch (a new
    object for HNSW — segment ids advance with it; unchanged
    otherwise). ``batch_id`` reaches the Bm25 idempotent per-batch
    path; replay protection for the other kinds lives in
    :func:`stream_index_appender`'s ledger."""
    from gamma_spark.operators.hnsw import HnswIndex
    from gamma_spark.operators.pq import IvfPqIndex
    from gamma_spark.operators.retrieval import Bm25Index

    if isinstance(index, Bm25Index):
        # lexical model: only the batch tokenizes; stats update as
        # running totals (Bm25Index.append). Returned index carries the
        # new stats — REQUIRED for the next batch. batch_id flows
        # through to the per-batch-subdir idempotent path when the
        # caller (stream_index_appender) has one.
        return index.append(batch_df, batch_id=batch_id)
    if isinstance(index, IvfPqIndex):
        index.encode_df(batch_df).write.mode("append").partitionBy(
            "cluster_id"
        ).parquet(os.path.join(path, "codes"))
        return index
    if isinstance(index, HnswIndex):
        # HNSW micro-batches become fresh graph segments (append-only,
        # existing graphs untouched — Lucene/Vespa per-segment growth);
        # compaction = rebuild at larger nshards. The RETURNED index
        # must be used for the next batch: its segment-id base advanced
        return index.append(batch_df, nshards=1)
    meta_vec = _index_vec_col(path)
    assigned = assign_clusters(batch_df, index.centroids, meta_vec)
    assigned.write.mode("append").partitionBy("cluster_id").parquet(
        os.path.join(path, "index")
    )
    return index


def _index_vec_col(path: str) -> str:
    import json

    with open(os.path.join(path, "meta.json")) as fh:
        return json.load(fh)["doc_vec"]


def stream_index_appender(stream_df: DataFrame, index, path: str):
    """Attach a foreachBatch writer that keeps the index table growing
    as micro-batches arrive. Returns the DataStreamWriter (caller picks
    trigger/checkpoint and calls .start()).

    Replay protection (r9): Spark replays a micro-batch when the batch
    committed but the checkpoint didn't. Bm25 appends are idempotent
    per batch_id on their own; the IVF/HNSW appends are bare parquet
    appends / fresh segments, so a replay would duplicate rows (HNSW:
    duplicate segments whose docids occupy top-k slots twice). A
    ``stream_ledger.json`` sidecar records committed batch_ids —
    updated AFTER the append is durable, read under the store's writer
    lock — and a replayed id is skipped. Crash between append and
    ledger narrows (not eliminates) the duplicate window for the
    IVF-family kinds, the same crash contract Bm25Index.append
    documents for its stats.

    On RESTART from a checkpoint, attach a freshly loaded index (e.g.
    ``HnswIndex.load(path)``): the evolving index object lives in this
    closure, so a stale pre-crash object would resume with stale
    stats/segment bases — the ledger protects against double-writes,
    not against stale in-memory state."""
    state = {"index": index}

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        index_append_batch_once(state, batch_df, batch_id, path)

    return stream_df.writeStream.foreachBatch(handle)


def _runs_add(runs: list[list[int]], x: int) -> list[list[int]]:
    """Insert ``x`` into sorted, disjoint [start, end] runs (merging
    neighbors). Contiguous monotone batch ids stay ONE run forever —
    the ledger is O(#gaps), not O(#batches), so a years-long stream
    never grows it."""
    out: list[list[int]] = []
    placed = False
    for a, b in runs:
        if placed or x > b + 1:
            out.append([a, b])
        elif x < a - 1:
            out.append([x, x])
            out.append([a, b])
            placed = True
        else:  # adjacent or inside: extend this run
            out.append([min(a, x), max(b, x)])
            placed = True
    if not placed:
        out.append([x, x])
    # merge runs the insertion made adjacent
    merged: list[list[int]] = []
    for r in out:
        if merged and r[0] <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], r[1])
        else:
            merged.append(r)
    return merged


def _runs_contain(runs: list[list[int]], x: int) -> bool:
    return any(a <= x <= b for a, b in runs)


def index_append_batch_once(state: dict, batch_df: DataFrame,
                            batch_id: int, path: str) -> None:
    """One exactly-once-per-batch_id append step (the foreachBatch body
    of :func:`stream_index_appender`, factored out so the ledger
    semantics are directly testable). ``state['index']`` is replaced
    with the index to use for the next batch.

    The ledger stores committed ids as run-length ranges (structured
    streaming ids are monotone and contiguous, so the common case is a
    single range regardless of stream age); the legacy flat-list form
    is read transparently. One ledger per CHECKPOINT lifetime: a
    stream restarted with a fresh checkpoint restarts batch ids at 0,
    so delete the ledger (and the index) together when re-seeding."""
    import json as _json

    from gamma_spark.io_util import atomic_write_json, writer_lock

    if batch_df.isEmpty():
        return
    ledger_path = os.path.join(path, "stream_ledger.json")
    # per-batch staged intermediates released once the append is
    # durable — an unbounded stream must not pin storage (r8 soak)
    with stage_scope():
        with writer_lock(path, name=".stream.lock", block=True):
            try:
                with open(ledger_path) as fh:
                    led = _json.load(fh)
                runs = [list(map(int, r)) for r in led.get("runs", [])]
                for x in led.get("batches", []):  # legacy flat form
                    runs = _runs_add(runs, int(x))
            except (OSError, ValueError):
                runs = []
            if _runs_contain(runs, int(batch_id)):
                return  # replayed micro-batch: already committed
            state["index"] = index_append_batch(
                state["index"], batch_df, path, batch_id=int(batch_id)
            )
            atomic_write_json(
                ledger_path, {"runs": _runs_add(runs, int(batch_id))}
            )


def compact_index(spark, path: str) -> None:
    """T3: rewrite the index table (drops tombstoned rows if a
    ``_deleted`` column exists, coalesces small append files).

    Rename-aside swap, not rmtree-then-rename (r9 — the same window
    dedup._compact_parquet closed in r4): the live dir is parked
    aside, the compacted dir renamed in, THEN the old content removed.
    A crash between the two renames leaves ``<index>.old`` intact for
    manual repair instead of no index at all.

    The WHOLE read->rewrite->swap runs under the stream appender's
    ``.stream.lock`` (blocking): without it, a micro-batch append
    landing between the compaction read and the swap — or mid-write
    when the live dir is renamed aside — would be silently destroyed
    while the appender's replay ledger records its batch_id as
    committed, so the replayed batch is skipped too: permanent loss.
    Consequence of the same-process non-reentrancy of ``writer_lock``
    (io_util): never call this from inside a foreachBatch handler —
    run it between batches or from a maintenance job."""
    from gamma_spark.io_util import writer_lock

    idx_path = os.path.join(path, "index")
    tmp = idx_path + ".compact"
    old = idx_path + ".old"
    import shutil

    with writer_lock(path, name=".stream.lock", block=True):
        df = spark.read.parquet(idx_path)
        if "_deleted" in df.columns:
            df = df.filter(~F.col("_deleted"))
        df.write.mode("overwrite").partitionBy("cluster_id").parquet(tmp)
        shutil.rmtree(old, ignore_errors=True)  # prior interrupted compact
        os.rename(idx_path, old)
        os.rename(tmp, idx_path)
        shutil.rmtree(old)
        spark.catalog.refreshByPath(idx_path)


class HybridSearcher:
    """T1: answer queries over indexed + not-yet-indexed docs.

    ``pending`` is the tail the background appender hasn't processed —
    searched exactly (gamma searches raw vectors brute-force until the
    index covers them, `search/gamma_engine.cc:329-340`). Both branches
    produce (qid, _docid, score); one final top-k merges them.
    """

    def __init__(self, index: IvfFlatIndex, pending: DataFrame | None, doc_vec: str):
        self.index = index
        self.pending = pending
        self.doc_vec = doc_vec

    def search(self, queries: DataFrame, k: int = 10, metric: str = "IP",
               nprobe: int = 10, predicate=None) -> DataFrame:
        from gamma_spark.functions.vector import metric_ascending
        from gamma_spark.operators import knn

        parts = [
            self.index.search(
                None, queries, k=k, metric=metric, doc_vec=self.doc_vec,
                nprobe=nprobe, predicate=predicate,
            ).select("qid", "_docid", "score")
        ]
        if self.pending is not None:
            parts.append(
                knn.knn_join(
                    self.pending, queries, k=k, metric=metric,
                    doc_vec=self.doc_vec, predicate=predicate,
                ).select("qid", "_docid", "score")
            )
        merged = parts[0]
        for p in parts[1:]:
            merged = merged.unionByName(p)
        return topk(merged, ["qid"], "score", k,
                    ascending=metric_ascending(metric), tiebreak_cols=["_docid"])


# ---------------------------------------------------------------------------
# event-time windows (Spark-native capability beyond the reference)
# ---------------------------------------------------------------------------

def windowed_event_stats(
    events: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding) window counts/sums per event_type. Works on
    both batch and streaming inputs; pass ``watermark`` on streams so
    state is bounded and late data beyond it is dropped."""
    df = events
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window_duration, slide) if slide else F.window(
        F.col(ts_col), window_duration
    )
    return (
        df.groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# streaming curation (r5): quality-gate micro-batches on ingest
# ---------------------------------------------------------------------------

def curate_batch(
    batch_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_token_fraction: float = 0.6,
    min_token_entropy: float = 0.5,
) -> DataFrame:
    """Quality-gate one micro-batch with the repetition signals
    (:mod:`gamma_spark.operators.quality`): keep docs whose duplicate-
    token fraction and unigram entropy pass the Gopher-style cut.

    The signals are strictly per-document, so gating a stream batch by
    batch is EXACTLY the batch-mode gate — no cross-batch state, no
    watermark, no approximation (unlike dedup, which needs the
    corpus-wide pass and stays a batch/compaction job)."""
    from gamma_spark.operators.quality import repetition_signals

    sig = repetition_signals(batch_df, id_col, text_col)
    keep = sig.filter(
        (F.col("dup_token_fraction") <= max_dup_token_fraction)
        & (F.col("token_entropy") >= min_token_entropy)
    ).select(id_col)
    return batch_df.join(keep, id_col)


def stream_curated_appender(
    stream_df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    **gate,
):
    """foreachBatch sink: gate each incoming micro-batch with
    :func:`curate_batch` and append survivors to a parquet corpus —
    the ingest edge of the curation pipeline (annotate/gate streaming,
    dedup batch — the split a 100 TB pipeline actually runs)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        # deterministic per-batch subdir + overwrite = idempotent under
        # micro-batch retries (Spark replays a failed batch with the
        # same batch_id; an append sink would duplicate survivors).
        # Read the corpus root with recursiveFileLookup=true.
        with stage_scope():
            curate_batch(batch_df, id_col, text_col, **gate).write.mode(
                "overwrite"
            ).parquet(f"{path}/batch-{batch_id}")

    return stream_df.writeStream.foreachBatch(handle)


def stream_exact_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    normalize: bool = True,
    watermark: tuple[str, str] | None = None,
) -> DataFrame:
    """Cross-batch exact dedup at the ingest edge: a content key
    (md5-derived hash of the optionally-normalized text) fed to
    streaming ``dropDuplicates`` — Spark's state store remembers every
    key seen so far, so a document arriving in batch 40 that repeats
    batch 3 is dropped, with no bespoke state code.

    ``watermark=(ts_col, delay)`` switches to
    ``dropDuplicatesWithinWatermark`` so state is evicted once a key is
    older than the delay — the knob that bounds state at 100 TB ingest
    (unbounded keys otherwise; exact corpus-wide dedup over all history
    stays the batch/compaction job in operators/dedup.py).

    Returns the deduplicated *streaming* DataFrame — compose with any
    sink (``.writeStream`` or :func:`stream_curated_appender`'s gate)."""
    from gamma_spark.functions import text as T
    from gamma_spark.operators.transforms import normalize_text

    key_src = normalize_text(text_col) if normalize else F.col(text_col)
    keyed = stream_df.withColumn("_key", T.hash60(key_src))
    if watermark is not None:
        keyed = keyed.withWatermark(*watermark).dropDuplicatesWithinWatermark(
            ["_key"]
        )
    else:
        keyed = keyed.dropDuplicates(["_key"])
    return keyed.drop("_key")


def stream_neardup_dedup(
    stream_df: DataFrame,
    index_path: str,
    out_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float | None = 0.5,
):
    """foreachBatch sink composing the incremental near-dup index with
    ingest: each micro-batch is matched against the standing
    `MinHashIndex` (near-dups of ANY earlier batch are dropped),
    survivors land in the output corpus AND their LSH buckets in the
    index — so batch N+1 dedups against batch N with no corpus
    recompute. The first batch bootstraps the index.

    Within-batch near-dups are additionally collapsed to their keeper
    (min id) via the batch self-join — the complete arrival-order
    semantics: a doc survives iff nothing similar arrived before it.

    ``threshold``: minimum exact Jaccard for a drop. LSH candidates
    (cross-batch AND within-batch) are verified with
    :func:`jaccard_on_pairs` before any document is dropped — a chance
    band collision between dissimilar docs must NOT permanently delete
    a non-duplicate at the ingest edge (the false-positive count
    otherwise grows with corpus size). The verify cost is bounded by
    the candidates: corpus-side shingles are re-mined only for docs
    that actually collided (a semi-join-pruned read of the survivor
    corpus). ``threshold=None`` opts into the cheaper UNVERIFIED
    candidate-level drop — only defensible when the banding is tuned
    far above the dup boundary.

    Exactly-once: survivors are written to a deterministic
    ``batch-<id>`` subdir of ``out_path`` with overwrite semantics and
    the index append is keyed by the same micro-batch id, so Spark's
    batch replay after a failure overwrites rather than duplicates.
    Read the corpus with ``recursiveFileLookup=true`` (or
    :func:`read_stream_corpus`).

    Note: the bootstrap check reads the index directory directly (local
    or DBFS-style paths); the per-batch work is the `match` join plus
    the batch-sized self-join — both bounded by the batch, not the
    corpus (docs/SCALING.md `MinHashIndex` row)."""
    import os

    from gamma_spark.operators.dedup import (
        MinHashIndex,
        jaccard_on_pairs,
        minhash_dedup_pairs,
        minhash_verified_pairs,
        shingles,
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        # EVERY staged intermediate of this batch — including the ones
        # inside minhash_verified_pairs (shingle stream, signatures,
        # LSH pair relation) — is released at scope exit. Before this,
        # each micro-batch pinned +3-4 persisted RDDs forever; the r8
        # 20-batch 1M-corpus soak OOM'd the default 8 GiB heap at
        # batch ~14 from exactly that growth (storage inside
        # spark.memory.storageFraction is unevictable, so execution
        # memory shrank batch over batch).
        with stage_scope():
            _handle(batch_df, batch_id)

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # collapse within-batch near-dups first (keeper = min id)
        if threshold is None:
            pairs = minhash_dedup_pairs(batch_df, id_col, text_col)
        else:
            pairs = minhash_verified_pairs(
                batch_df, id_col, text_col, threshold=threshold
            )
        losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
        batch = batch_df.join(losers, id_col, "left_anti")
        if os.path.isdir(index_path):
            idx = MinHashIndex.load(spark, index_path, id_col)
            cand = idx.match(batch, text_col)
            if threshold is not None:
                # verify: shingle ONLY the collided docs (batch side +
                # a semi-join-pruned read of the survivor corpus).
                # cand is the batch-bands x standing-index join — the
                # corpus-sized relation of this path — and the verify
                # consumes it from several subtrees (members -> the
                # corpus semi-join AND the pair joins inside
                # jaccard_on_pairs); stage it so the index join runs
                # ONCE per micro-batch (measured at 1M corpus: the
                # verify stage drops ~54 s -> ~20 s per batch)
                from gamma_spark.session import stage as _stage

                # released by the enclosing stage_scope once the
                # batch's writes are durable, like every other staged
                # intermediate of this handler
                cpairs = _stage(
                    cand.select(
                        F.col("corpus_id").alias("id_a"),
                        F.col("new_id").alias("id_b"),
                    )
                )
                corpus = read_stream_corpus(spark, out_path).select(
                    id_col, text_col
                )
                members = cpairs.select(
                    F.col("id_a").alias(id_col)
                ).distinct()
                touched = corpus.join(
                    members, id_col, "left_semi"
                ).unionByName(batch.select(id_col, text_col))
                sh = shingles(touched, id_col, text_col, idx.n)
                verified = jaccard_on_pairs(cpairs, sh, id_col, threshold)
                matched = verified.select(
                    F.col("id_b").alias(id_col)
                ).distinct()
                survivors = batch.join(matched, id_col, "left_anti")
                survivors.write.mode("overwrite").parquet(
                    f"{out_path}/batch-{batch_id}"
                )
                idx.append(survivors, text_col, batch_id=batch_id)
                return
            matched = cand.select(F.col("new_id").alias(id_col)).distinct()
            survivors = batch.join(matched, id_col, "left_anti")
            survivors.write.mode("overwrite").parquet(
                f"{out_path}/batch-{batch_id}"
            )
            idx.append(survivors, text_col, batch_id=batch_id)
        else:
            survivors = batch
            survivors.write.mode("overwrite").parquet(
                f"{out_path}/batch-{batch_id}"
            )
            MinHashIndex.build(survivors, id_col, text_col, path=index_path)

    return stream_df.writeStream.foreachBatch(handle)


def read_stream_corpus(spark, path: str) -> DataFrame:
    """Read a corpus written by the streaming sinks here (one
    ``batch-<id>`` subdir per micro-batch): recursive listing, no
    partition inference."""
    return spark.read.option("recursiveFileLookup", "true").parquet(path)
