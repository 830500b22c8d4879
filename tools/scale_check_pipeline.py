"""End-to-end training-data pipeline rehearsal: the full curation
chain a 100 TB run would execute, stage-timed at N docs (default 1M):

    scrub PII -> quality gate + near-dup dedup (curate_corpus)
    -> bigram-LM perplexity filter -> paragraph dedup
    -> mixture sampling -> sequence packing

Stage hand-offs go through the dataset sink by default (r5, VERDICT
r4 #5): each stage's output is materialized with ``write_dataset`` and
re-read as a bare parquet scan, so neither lineage nor executor-cache
footprint grows across stages — exactly the staging-table lifecycle a
cluster run has. The r4 in-memory mode (persist hand-offs) measured
superlinear past 2M docs in a single JVM (4M = 1461 s at 48 GiB vs
linear 538 s at 2M — commit f67f9f2); disk staging runs 4M at the
default 8 GiB driver heap. ``--mem`` restores the persist mode.

Usage: python tools/scale_check_pipeline.py [n_docs] [--mem]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
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
from gamma_spark.sources.export import read_dataset, write_dataset  # noqa: E402
from scale_check_text import make_corpus  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 1_000_000
    disk = "--mem" not in sys.argv
    if disk:
        # operator-INTERNAL staged intermediates (the minhash shingle /
        # signature relations inside curate) go to disk too: on-heap
        # staging at 4M+ docs sits at the 8 GiB default heap's edge —
        # it passed on one host instance (754 s series) and OOM'd in
        # the curate stage on a slower one. Disk staging removes the
        # host dependence; a cluster stages these to tables anyway.
        os.environ.setdefault("SPARK_GRAFT_STAGE_LEVEL", "DISK_ONLY")
    # shuffle partitions scale with the corpus (~25k docs each): the
    # reduce-side agg/join state per task is then bounded regardless
    # of n — the same rule a cluster submit script applies
    spark = get_spark(
        "pipeline-scale",
        extra_conf={"spark.sql.shuffle.partitions": str(max(32, n // 25_000))},
    )
    root = tempfile.mkdtemp(prefix="gamma_pipeline_stage_")

    def hand_off(df, name):
        """Materialize a stage boundary. Disk mode: dataset-sink write
        + bare re-read (no lineage, no cache, stage N's plan can be
        GC'd wholesale); mem mode: the r4 persist hand-off."""
        if not disk:
            return stage(df)
        write_dataset(df, os.path.join(root, name))
        out, _ = read_dataset(spark, os.path.join(root, name))
        # drop operator-internal persists from the finished stage: in
        # the single-JVM rehearsal they otherwise accumulate across
        # stages and recreate the r4 heap growth
        spark.catalog.clearCache()
        return out

    def free(df):
        if not disk:
            df.unpersist()

    docs = make_corpus(spark, n).cache()
    docs.count()
    out = {"n_docs": n, "staging": "disk" if disk else "mem"}
    total0 = time.time()

    t0 = time.time()
    clean = hand_off(
        scrub_pii(docs).select("doc_id", F.col("clean").alias("text")),
        "scrubbed",
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
    kept = hand_off(
        decisions.filter("kept").select("doc_id").join(clean, "doc_id"),
        "curated",
    )
    out["n_curated"] = kept.count()
    out["curate_s"] = round(time.time() - t0, 1)
    free(clean)

    t0 = time.time()
    # train the LM on a bounded reference sample of survivors, score all
    ref = deterministic_sample(kept, "doc_id", 0.1)
    ppl = lm_perplexity(ref, kept)
    lm_kept = hand_off(
        kept.join(ppl.filter(F.col("ppl") <= 1000).select("doc_id"), "doc_id"),
        "lm_filtered",
    )
    out["n_lm_kept"] = lm_kept.count()
    out["lm_s"] = round(time.time() - t0, 1)
    free(kept)

    t0 = time.time()
    paras = hand_off(
        paragraph_dedup(lm_kept, "doc_id", "text", width=20, min_tokens=5)
        .filter(F.length("kept_text") > 0)
        .select("doc_id", F.col("kept_text").alias("text")),
        "para_deduped",
    )
    out["n_para_deduped"] = paras.count()
    out["para_s"] = round(time.time() - t0, 1)
    free(lm_kept)

    t0 = time.time()
    sampled = deterministic_sample(paras, "doc_id", 0.5, salt="mix")
    toks = sampled.select("doc_id", bpe_token_count("text").alias("n_tokens"))
    packed = pack_contiguous(toks, "doc_id", "n_tokens", max_tokens=4096)
    out["n_packed_docs"] = packed.count()
    out["n_sequences"] = packed.agg(F.max("seq_id")).collect()[0][0]
    out["pack_s"] = round(time.time() - t0, 1)

    out["total_s"] = round(time.time() - total0, 1)
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
