"""End-to-end training-data pipeline rehearsal: the full curation
chain a 100 TB run would execute, stage-timed at N docs (default 1M):

    scrub PII -> quality gate + near-dup dedup (curate_corpus)
    -> bigram-LM perplexity filter -> paragraph dedup
    -> mixture sampling -> sequence packing

Usage: python tools/scale_check_pipeline.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from gamma_spark.functions.text import bpe_token_count  # noqa: E402
from gamma_spark.operators.curation import curate_corpus  # noqa: E402
from gamma_spark.operators.packing import pack_contiguous  # noqa: E402
from gamma_spark.operators.quality import lm_perplexity  # noqa: E402
from gamma_spark.operators.sampling import deterministic_sample  # noqa: E402
from gamma_spark.operators.transforms import paragraph_dedup, scrub_pii  # noqa: E402
from gamma_spark.session import get_spark, stage  # noqa: E402
from scale_check_text import make_corpus  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("pipeline-scale")
    docs = make_corpus(spark, n).cache()
    docs.count()
    out = {"n_docs": n}
    total0 = time.time()

    t0 = time.time()
    clean = stage(
        scrub_pii(docs).select("doc_id", F.col("clean").alias("text"))
    )
    out["n_scrubbed"] = clean.count()
    out["scrub_s"] = round(time.time() - t0, 1)
    docs.unpersist()  # each stage frees its input once the hand-off
    # is materialized — the staging-table lifecycle a cluster run has

    t0 = time.time()
    decisions = curate_corpus(clean, "doc_id", "text", min_quality=0.0,
                              langs=("und",))  # synthetic vocab has no
                              # real-language markers; keep the gate
                              # structural, not selective, here
    kept = stage(
        decisions.filter("kept").select("doc_id").join(clean, "doc_id")
    )
    out["n_curated"] = kept.count()
    out["curate_s"] = round(time.time() - t0, 1)
    clean.unpersist()

    t0 = time.time()
    # train the LM on a bounded reference sample of survivors, score all
    ref = deterministic_sample(kept, "doc_id", 0.1)
    ppl = lm_perplexity(ref, kept)
    lm_kept = stage(
        kept.join(ppl.filter(F.col("ppl") <= 1000).select("doc_id"), "doc_id")
    )
    out["n_lm_kept"] = lm_kept.count()
    out["lm_s"] = round(time.time() - t0, 1)
    kept.unpersist()

    t0 = time.time()
    paras = stage(
        paragraph_dedup(lm_kept, "doc_id", "text", width=20, min_tokens=5)
        .filter(F.length("kept_text") > 0)
        .select("doc_id", F.col("kept_text").alias("text"))
    )
    out["n_para_deduped"] = paras.count()
    out["para_s"] = round(time.time() - t0, 1)
    lm_kept.unpersist()

    t0 = time.time()
    sampled = deterministic_sample(paras, "doc_id", 0.5, salt="mix")
    toks = sampled.select("doc_id", bpe_token_count("text").alias("n_tokens"))
    packed = pack_contiguous(toks, "doc_id", "n_tokens", max_tokens=4096)
    out["n_packed_docs"] = packed.count()
    out["n_sequences"] = packed.agg(F.max("seq_id")).collect()[0][0]
    out["pack_s"] = round(time.time() - t0, 1)

    out["total_s"] = round(time.time() - total0, 1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
