"""BM25 + RRF scale rehearsal: 1M synthetic documents (~200x the sf0.1
documents table), a 512-query batch, through the full postings ->
semi-join-pruned scoring -> top-k pipeline, plus the quality-signal and
decontamination passes at the same scale.

Validates the 100 TB design claims: the only corpus-sized shuffles are
the postings/gram aggregations (map-side combinable), every join
against a corpus-sized relation is broadcast, and wall time is linear
in corpus bytes.

Usage: python tools/scale_check_bm25.py [n_docs] [n_queries]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gamma_spark.operators import dedup as D  # noqa: E402
from gamma_spark.operators import retrieval as R  # noqa: E402
from gamma_spark.operators.quality import repetition_signals  # noqa: E402
from gamma_spark.session import get_spark  # noqa: E402

#: retrieval rehearsals need a REALISTIC term distribution: the
#: uniform 500-word corpus in scale_check_text has constant dl=80 and
#: tf ∈ {1,2} for every (term, doc) — the within-term BM25 order is
#: then one giant tie and any champion cut is arbitrary (measured
#: overlap@10 ≈ 0.02). A Zipfian vocabulary with lognormal-ish doc
#: lengths is the published IR workload shape and what a 100 TB web
#: corpus actually looks like.
VOCAB = 50_000
ZIPF_A = 1.4


def make_zipf_corpus(spark, n: int):
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = []
            for i in ids:
                rng = np.random.default_rng(777 + int(i))
                dl = int(np.clip(rng.lognormal(4.2, 0.6), 20, 400))
                toks = (rng.zipf(ZIPF_A, size=dl) - 1) % VOCAB
                texts.append(" ".join(f"w{t}" for t in toks))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    return spark.range(n).repartition(32).mapInPandas(
        gen, schema="doc_id long, text string"
    )


def _start_rss_sampler(out: dict):
    """Peak-RSS watermark over every java/python process on the host
    (local mode: the one JVM + the Arrow Python workers ARE the
    executor). Coarse but honest for the single-JVM rehearsal box;
    records GiB into out['peak_rss_gib'] every 2 s (VERDICT r10 #5:
    the 10M rehearsal must record peak executor memory)."""
    import glob
    import threading

    stop = threading.Event()

    def sample():
        peak = 0
        while not stop.is_set():
            total = 0
            for sd in glob.glob("/proc/[0-9]*/"):
                try:
                    with open(sd + "comm") as fh:
                        comm = fh.read().strip()
                    if comm not in ("java", "python", "python3"):
                        continue
                    with open(sd + "status") as fh:
                        for line in fh:
                            if line.startswith("VmRSS:"):
                                total += int(line.split()[1])  # kB
                                break
                except OSError:
                    continue
            peak = max(peak, total)
            out["peak_rss_gib"] = round(peak / 1048576.0, 2)
            stop.wait(2.0)

    t = threading.Thread(target=sample, daemon=True)
    t.start()
    return stop


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    bm25_only = "--bm25-only" in sys.argv
    n = int(args[0]) if len(args) > 0 else 1_000_000
    nq = int(args[1]) if len(args) > 1 else 512
    # size the single-JVM heap to the corpus unless the caller pinned
    # it: the exact (oracle) search aggregates ~O(Σ_t df_t) partial
    # scores, and stop-word-like head terms at 10M docs put ~1.5B
    # (qid,doc) partials through the hash agg — the 8g default heap
    # OOM'd stage "exact search" at 10M (r11 rehearsal; on a real
    # cluster this is ordinary distributed agg volume, locally it
    # needs the heap the host actually has). Champion mode exists
    # precisely to bound this volume at serving time.
    if "SPARK_GRAFT_DRIVER_MEM" not in os.environ and n > 2_000_000:
        os.environ["SPARK_GRAFT_DRIVER_MEM"] = "48g"
    spark = get_spark("bm25-scale")
    docs = make_zipf_corpus(spark, n).cache()
    docs.count()
    results = {"n_docs": n, "n_queries": nq}
    rss_stop = _start_rss_sampler(results)

    # queries: 1 hot head term + 3 mid-frequency terms per query,
    # deterministic per qid (the mixed-selectivity shape real query
    # logs have)
    import pandas as pd

    rows = []
    for q in range(nq):
        rows.append((q, f"w{q % 20}"))  # head term (stop-word-like)
        for j in range(3):
            rows.append((q, f"w{100 + (q * 7 + j * 131) % 2000}"))  # mid band
    qterms = spark.createDataFrame(
        pd.DataFrame(rows, columns=["qid", "term"])
    ).distinct().cache()
    qterms.count()

    # the EXACT (oracle) legs run on a query subsample above 2M docs:
    # exact scoring with stop-word head terms aggregates
    # ~Σ_head df_t × (nq/20) partial scores — at 10M docs × 512
    # queries that is ~5B rows / >79 GB of shuffle spill, which
    # filled this host's disk (r11 first attempt). Champion/build
    # legs stay at the full nq (champion pruning bounds their volume
    # — that is the claim under test); overlap@10 is measured
    # exact-vs-champion on the SAME subsample, apples to apples.
    exact_nq = None  # None = flag not passed (an explicit --exact-nq=nq
    for a in sys.argv[1:]:  # must NOT be mistaken for the default and
        if a.startswith("--exact-nq="):  # silently clamped to 64)
            exact_nq = int(a.split("=", 1)[1])
    if exact_nq is None:
        exact_nq = min(nq, 64) if n > 2_000_000 else nq
    results["exact_nq"] = exact_nq
    qterms_exact = qterms.filter(F.col("qid") < exact_nq).cache()
    qterms_exact.count()

    def _gc():
        # nudge the ContextCleaner between legs: the exact legs leave
        # tens of GB of shuffle files that are only deleted once their
        # ShuffleDependency is GC'd — without this the 10M run fills
        # the disk across legs even though no single leg needs it all
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass

    t0 = time.time()
    exact = R.bm25_search(docs, qterms_exact, k=10).cache()
    n_hits = exact.count()
    results["bm25_exact_sec"] = round(time.time() - t0, 2)
    results["bm25_hits"] = n_hits
    _gc()

    # champion-list mode: impact-ordered per-term pruning bounds the
    # score-agg volume when query terms are stop-word-like (this
    # synthetic 500-word vocab is the worst case: every term matches
    # ~15% of the corpus)
    champions = (
        [int(x) for x in args[2].split(",")] if len(args) > 2 else [1000]
    )
    for r_champ in champions:
        t0 = time.time()
        champ = R.bm25_search(docs, qterms, k=10, champions=r_champ).cache()
        champ.count()
        results[f"bm25_champions{r_champ}_sec"] = round(time.time() - t0, 2)
        inter = exact.select("qid", "_docid").intersect(
            champ.filter(F.col("qid") < exact_nq).select("qid", "_docid")
        ).count()
        results[f"bm25_champions{r_champ}_overlap_at_10"] = round(
            inter / max(n_hits, 1), 4
        )
        champ.unpersist()
        _gc()

    # the serving shape: a prebuilt index (the one corpus-sized shuffle
    # paid at build), exact vs champion+WAND-rescore searches — here
    # the ad-hoc path's corpus re-tokenization no longer masks the
    # aggregation-volume win
    t0 = time.time()
    idx = R.Bm25Index.build(docs)
    idx.postings.cache().count()
    results["bm25_index_build_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    iexact = idx.search(qterms_exact, k=10).cache()
    iexact.count()
    results["bm25_index_exact_sec"] = round(time.time() - t0, 2)
    for r_champ in champions:
        t0 = time.time()
        ichamp = idx.search(qterms, k=10, champions=r_champ).cache()
        ichamp.count()
        results[f"bm25_index_champions{r_champ}_sec"] = round(time.time() - t0, 2)
        inter = iexact.select("qid", "_docid").intersect(
            ichamp.filter(F.col("qid") < exact_nq).select("qid", "_docid")
        ).count()
        results[f"bm25_index_champions{r_champ}_overlap_at_10"] = round(
            inter / max(n_hits, 1), 4
        )
        ichamp.unpersist()
        _gc()
    iexact.unpersist()
    idx.postings.unpersist()
    exact.unpersist()
    _gc()

    if bm25_only:
        print(json.dumps(results))
        spark.stop()
        return

    t0 = time.time()
    # force the full signal computation (a bare count() lets the
    # optimizer eliminate the unique-key joins and the aggs under them)
    sums = repetition_signals(docs).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("token_entropy").alias("s_ent"),
        F.sum("top_bigram_fraction").alias("s_big"),
    ).collect()[0]
    results["quality_signals_sec"] = round(time.time() - t0, 2)
    assert sums.n == n and sums.s_ent > 0 and sums.s_big > 0

    t0 = time.time()
    train = docs.filter(F.col("doc_id") % 101 != 0)
    ev = docs.filter(F.col("doc_id") % 101 == 0)
    n_cont = D.decontaminate(train, ev, n=6).count()
    results["decontaminate_sec"] = round(time.time() - t0, 2)
    results["contaminated_docs"] = n_cont

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
