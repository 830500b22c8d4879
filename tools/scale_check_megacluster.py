"""Mega-cluster (skewed-LSH-bucket) rehearsal: the one place the
near-dup family's cost is NOT bounded by design is within-bucket pair
expansion — an m-member bucket emits C(m,2) all-pairs candidates, and
AQE skew-splitting redistributes input rows but cannot shrink that
output. Real web corpora produce exactly this shape: boilerplate /
error-page / empty-doc clusters of 10^5-10^6 near-identical documents
whose members share EVERY band bucket.

This rehearsal plants a K-member identical-vector cluster in an
N-vector corpus and measures, on the banded embedding-LSH pipeline
(the candidate-stage shape is identical for the minhash text path):

1. `lsh_bucket_stats` — the skew diagnostic's predicted all-pairs vs
   star output (and that the prediction matches the measured counts);
2. pairs="all" — wall + candidate count (quadratic in K);
3. pairs="star" — wall + candidate count (linear in K), and that the
   cluster resolves to ONE connected component either way.

Usage: python tools/scale_check_megacluster.py [n_vecs] [k_cluster]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gamma_spark.operators import dedup as D  # noqa: E402
from gamma_spark.operators.groups import connected_components  # noqa: E402
from gamma_spark.session import get_spark  # noqa: E402

DIM = 64
BANDS, BITS = 8, 20  # 2^20 buckets/band: background collisions ~N²/2^21


def make_corpus(spark, n: int, k: int):
    """ids [0, k) share ONE vector (the planted cluster); the rest are
    independent gaussians. Executor-side, seeded per id."""

    def gen(batches):
        import pandas as pd

        dup = np.random.default_rng(4242).standard_normal(DIM)
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = [
                dup if i < k else np.random.default_rng(7_000 + int(i)).standard_normal(DIM)
                for i in ids
            ]
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [[float(x) for x in v] for v in vecs]}
            )

    return spark.range(n).repartition(32).mapInPandas(
        gen, schema="vec_id long, embedding array<double>"
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    spark = get_spark("megacluster-scale")
    embs = make_corpus(spark, n, k).cache()
    embs.count()
    results = {"n_vecs": n, "k_cluster": k, "bands": BANDS, "bits": BITS}

    kw = dict(
        threshold=0.99, dim=DIM, bands=BANDS, bits=BITS, kernel=True
    )

    # 1. the diagnostic: build the banded relation once, the same way
    # embedding_neardup_banded does, and ask what the join will cost
    planes = D._hyperplanes(DIM, BANDS, BITS, D.NEARDUP_SEED)
    base = embs.select(F.col("vec_id").alias("_id"), F.col("embedding").alias("_v"))
    from gamma_spark.session import ensure_parallelism

    sigs = D._banded_signatures_kernel(
        ensure_parallelism(base, fanout=8.0), planes, BANDS, BITS
    )
    banded = sigs.select("_id", F.posexplode("_bvals").alias("band", "bval"))
    t0 = time.time()
    stats = D.lsh_bucket_stats(banded, ["band", "bval"], "_id").limit(5).collect()
    results["bucket_stats_sec"] = round(time.time() - t0, 2)
    results["top_buckets"] = [
        {"size": r.size, "n": r.n_buckets, "allpairs": r.allpairs_rows,
         "star": r.star_rows}
        for r in stats
    ]
    results["predicted_allpairs_top5"] = sum(r.allpairs_rows for r in stats)

    # 2. all-pairs mode (quadratic in K — feasible at rehearsal K only)
    t0 = time.time()
    allp = D.embedding_neardup_banded(embs, pairs="all", **kw)
    results["allpairs_verified"] = allp.count()
    results["allpairs_sec"] = round(time.time() - t0, 2)

    # 3. star mode (linear in K)
    t0 = time.time()
    star = D.embedding_neardup_banded(embs, pairs="star", **kw).cache()
    results["star_verified"] = star.count()
    results["star_sec"] = round(time.time() - t0, 2)

    # 3b. hybrid (the recommended verified-path mode: exact under
    # star_cap, star above — here the mega-bucket is the entire cost,
    # so hybrid should track star)
    t0 = time.time()
    hybrid = D.embedding_neardup_banded(embs, pairs="hybrid", **kw)
    results["hybrid_verified"] = hybrid.count()
    results["hybrid_sec"] = round(time.time() - t0, 2)

    # the cluster must resolve to ONE group from the star edges
    t0 = time.time()
    cc = connected_components(star.filter(F.col("id_b") < k))
    n_groups = cc.select("group_id").distinct().count()
    results["star_cluster_groups"] = n_groups
    results["cc_sec"] = round(time.time() - t0, 2)
    star.unpersist()

    # what the diagnostic predicts for a web-scale cluster (not run)
    for big_k in (100_000, 1_000_000):
        results[f"extrapolated_allpairs_k{big_k}"] = (
            big_k * (big_k - 1) // 2 * BANDS
        )

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
