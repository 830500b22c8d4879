"""Sub-stage timing probe for the curate chain (r6 diagnostics).

Times each internal stage of the minhash-dedup path with a forcing
count() on the staged intermediate, at the same conf the pipeline
rehearsal uses (shuffle partitions ~ n/25k, synthetic Zipf-free corpus
from scale_check_text). This is the probe that located the 2M-doc
superlinearity in the staged STRING shingle relation (signatures stage
3.4x for 2x docs) and motivated hashing shingles to longs before the
distinct/stage (dedup.minhash_verified_pairs; docs/SCALING.md MinHash
row).

Usage: python tools/probe_curate_stages.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from gamma_spark.functions import text as T  # noqa: E402
from gamma_spark.operators import groups as G  # noqa: E402
from gamma_spark.operators.dedup import (  # noqa: E402
    jaccard_on_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
)
from gamma_spark.session import get_spark, stage  # noqa: E402
from scale_check_text import make_corpus  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(
        "probe-curate",
        extra_conf={"spark.sql.shuffle.partitions": str(max(32, n // 25_000))},
    )
    docs = make_corpus(spark, n)
    out = {"n": n}
    t0 = time.time()

    # the synthetic vocab has no real-language markers: gate on 'und'
    # at quality floor 0, exactly like scale_check_pipeline
    annotated = stage(
        docs.select(
            F.col("doc_id"),
            F.col("text").alias("_text"),
            T.quality_score("text").alias("quality"),
            T.lang_id("text").alias("lang"),
        ).withColumn(
            "passed_filter",
            (F.col("quality") >= 0.0) & F.col("lang").isin("und"),
        )
    )
    gated = annotated.filter(F.col("passed_filter"))
    out["n_gated"] = gated.count()
    out["t_annotate_gate"] = round(time.time() - t0, 1)
    t0 = time.time()

    # mirrors minhash_verified_pairs' staging, broken apart for timing:
    # raw hashed stream, no corpus-wide distinct (min-agg is duplicate-
    # insensitive; the verify stage dedups after its candidate prune)
    sh = stage(
        shingles(gated, "doc_id", "_text", 3, distinct=False)
        .select(F.col("doc_id"), T.hash60("shingle").alias("shingle"))
    )
    out["n_shingle_rows"] = sh.count()
    out["t_shingles"] = round(time.time() - t0, 1)
    t0 = time.time()

    sig = stage(minhash_signatures(sh, "doc_id", hashed=True))
    out["n_sigs"] = sig.count()
    out["t_signatures"] = round(time.time() - t0, 1)
    t0 = time.time()

    cands = stage(lsh_candidate_pairs(sig, "doc_id"))
    out["n_cands"] = cands.count()
    out["t_lsh_join"] = round(time.time() - t0, 1)
    t0 = time.time()

    pairs = stage(jaccard_on_pairs(cands, sh, "doc_id", 0.3))
    out["n_pairs"] = pairs.count()
    out["t_verify"] = round(time.time() - t0, 1)
    t0 = time.time()

    resolved = G.resolve_groups(
        pairs, gated, "doc_id", keeper_order=F.col("quality")
    )
    out["n_resolved"] = resolved.count()
    out["t_groups"] = round(time.time() - t0, 1)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
