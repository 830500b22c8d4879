"""Text-pipeline scale rehearsal: 100k synthetic documents (20x the
sf0.1 documents table) through MinHash-LSH dedup, SimHash signatures,
and text stats — validating that the shingle explode -> signature agg
-> banded self-join design holds when the corpus has real duplicate
structure.

Usage: python tools/scale_check_text.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gamma_spark.functions import text as T  # noqa: E402
from gamma_spark.operators import dedup as D  # noqa: E402
from gamma_spark.session import get_spark  # noqa: E402

VOCAB = [f"w{i}" for i in range(500)]


def make_corpus(spark, n: int, partitions: int | None = None):
    """~10% of docs are near-duplicates of a 'source' doc (a few tokens
    perturbed) — the structure LSH must recover.

    ``partitions`` defaults to ~50k docs per partition (min 32): the
    per-task hash-aggregate tables downstream (shingle/signature aggs)
    are sized by docs-per-partition, so partition count must scale
    with the corpus or a fixed-32 layout OOMs the default heap at 4M+
    docs — exactly the cluster-sizing rule (partitions ~ input bytes),
    applied to the rehearsal generator."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = []
            for i in ids:
                rng = np.random.default_rng(42 + int(i))
                if i % 10 == 1 and i > 0:
                    src = np.random.default_rng(42 + int(i) - 1)
                    toks = list(src.choice(VOCAB, size=80))
                    for _ in range(3):  # small perturbation
                        toks[int(rng.integers(0, 80))] = str(rng.choice(VOCAB))
                else:
                    toks = list(rng.choice(VOCAB, size=80))
                texts.append(" ".join(toks))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    parts = partitions if partitions is not None else max(32, n // 50_000)
    return spark.range(n).repartition(parts).mapInPandas(
        gen, schema="doc_id long, text string"
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("text-scale")
    docs = make_corpus(spark, n).cache()
    docs.count()
    results = {"n_docs": n}

    t0 = time.time()
    pairs = D.minhash_dedup_pairs(docs, "doc_id", "text").cache()
    n_pairs = pairs.count()
    results["minhash_lsh_sec"] = round(time.time() - t0, 2)
    results["candidate_pairs"] = n_pairs
    # planted near-dup pairs are (i-1, i) for i%10==1: measure recall
    planted = docs.sparkSession.range(1, n, 10).select(
        (F.col("id") - 1).alias("id_a"), F.col("id").alias("id_b")
    )
    found = pairs.join(planted, on=["id_a", "id_b"], how="inner").count()
    results["planted_recall"] = round(found / planted.count(), 4)

    # composed scale pipeline: exact Jaccard scored on the LSH
    # candidate relation ONLY (no corpus re-mine)
    t0 = time.time()
    sh = D.shingles(docs, "doc_id", "text", 3)
    verified = D.jaccard_on_pairs(pairs, sh, "doc_id", threshold=0.5).cache()
    results["verified_pairs"] = verified.count()
    results["jaccard_on_candidates_sec"] = round(time.time() - t0, 2)
    found_v = verified.join(planted, on=["id_a", "id_b"], how="inner").count()
    results["verified_planted_recall"] = round(found_v / planted.count(), 4)

    # pair -> group resolution over the verified pairs
    from gamma_spark.operators import groups as G

    t0 = time.time()
    resolved = G.resolve_groups(verified, docs, "doc_id").cache()
    results["n_groups"] = resolved.filter(F.col("is_keeper")).count()
    results["n_dropped"] = resolved.filter(~F.col("is_keeper")).count()
    results["resolve_groups_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    D.simhash(docs, "doc_id", "text").count()
    results["simhash_sec"] = round(time.time() - t0, 2)

    # banded simhash near-dup: pigeonhole candidates + exact verify —
    # lossless, so no recall row (identity with all-pairs is unit-tested)
    t0 = time.time()
    results["simhash_banded_pairs"] = D.simhash_neardup_pairs(
        docs, "doc_id", "text", max_distance=3
    ).count()
    results["simhash_banded_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    docs.select(
        "doc_id", T.token_count("text").alias("n"), T.quality_score("text").alias("q"),
        T.fingerprint("text").alias("fp"), T.lang_id("text").alias("lang"),
    ).count()
    results["text_stats_sec"] = round(time.time() - t0, 2)

    # end-to-end curation (annotate -> gate -> mine survivors -> resolve);
    # the synthetic vocab carries no English markers, so gate on 'und'
    # with min_quality 0 to exercise the full corpus through the chain
    from gamma_spark.operators import curation as Cur

    t0 = time.time()
    cur = Cur.curate_corpus(docs, "doc_id", "text", min_quality=0.0, langs=("und",))
    results["curation_kept"] = cur.filter(F.col("kept")).count()
    results["curation_sec"] = round(time.time() - t0, 2)

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
