"""Embedding near-dup scale rehearsal: N vectors (default 1M), ~10%
planted near-duplicates (cosine ~0.95), through the multi-band
hyperplane-LSH pipeline at a scale-appropriate banding (b=48 x r=20:
2^20 buckets per band keeps random-collision candidates ~N^2/2^21 per
band; 48 OR'd bands hold planted-pair recall ~0.998 at threshold 0.9 —
size ``bits`` ~ log2(N) and grow ``bands`` to hold the S-curve).

The exact all-pairs path is O(N²) and intentionally NOT run here;
ground truth is the planted-pair relation (whose true cosines are
computed directly — a linear join, not a pair mine).

Usage: python tools/scale_check_neardup.py [n_vecs]
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

from gamma_spark.functions import vector as V  # noqa: E402
from gamma_spark.operators import dedup as D  # noqa: E402
from gamma_spark.session import get_spark  # noqa: E402

DIM = 64
THRESHOLD = 0.9
BANDS, BITS = 48, 20


def make_corpus(spark, n: int):
    """vec i for i%10==1 is a perturbed copy of vec i-1 (cosine ~0.95);
    everything else is independent gaussian. Executor-side, seeded."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = []
            for i in ids:
                if i % 10 == 1 and i > 0:
                    src = np.random.default_rng(42 + int(i) - 1).standard_normal(DIM)
                    pert = np.random.default_rng(10_000_000 + int(i)).standard_normal(DIM)
                    v = src + 0.33 * pert  # E[cos] ~ 1/sqrt(1+0.33^2) ~ 0.95
                else:
                    v = np.random.default_rng(42 + int(i)).standard_normal(DIM)
                vecs.append(v.astype(np.float64))
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    return spark.range(n).repartition(32).mapInPandas(
        gen, schema="vec_id long, embedding array<double>"
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("neardup-scale")
    vecs = make_corpus(spark, n).cache()
    vecs.count()
    results = {"n_vecs": n, "bands": BANDS, "bits": BITS, "threshold": THRESHOLD}

    # ground truth: planted pairs whose actual cosine clears the threshold
    planted = spark.range(1, n, 10).select(
        (F.col("id") - 1).alias("id_a"), F.col("id").alias("id_b")
    )
    pa = vecs.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    pb = vecs.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    truth = (
        planted.join(pa, "id_a").join(pb, "id_b")
        .select("id_a", "id_b", V.cosine("va", "vb").alias("cosine"))
        .filter(F.col("cosine") >= THRESHOLD)
        .cache()
    )
    n_truth = truth.count()
    results["planted_true_pairs"] = n_truth

    t0 = time.time()
    found = D.embedding_neardup_banded(
        vecs, "vec_id", "embedding", threshold=THRESHOLD, dim=DIM,
        bands=BANDS, bits=BITS, kernel=True,
    ).cache()
    results["found_pairs"] = found.count()
    results["lsh_sec"] = round(time.time() - t0, 2)
    hit = found.join(truth.select("id_a", "id_b"), on=["id_a", "id_b"]).count()
    results["planted_recall"] = round(hit / max(1, n_truth), 4)

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()


