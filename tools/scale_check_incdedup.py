"""Incremental-dedup scale rehearsal: build a MinHashIndex over an
N-doc corpus once, then dedup a new 10%-sized batch against it (the
nightly-crawl shape) — comparing against what re-mining the combined
corpus would cost.

Usage: python tools/scale_check_incdedup.py [n_corpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gamma_spark.operators import dedup as D  # noqa: E402
from gamma_spark.session import get_spark  # noqa: E402
from scale_check_text import make_corpus  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_new = n // 10
    spark = get_spark("incdedup-scale")
    # corpus ids [0, n); the new batch reuses the generator at an id
    # offset with the SAME near-dup structure, so ~10% of new docs are
    # near-dups of another new doc and the planted cross-corpus dups
    # come from exact id collisions shifted into the corpus range
    corpus = make_corpus(spark, n).cache()
    corpus.count()
    new = (
        make_corpus(spark, n_new)
        .withColumn("doc_id", F.col("doc_id") + n)
        .cache()
    )
    new.count()
    out = {"n_corpus": n, "n_new": n_new}

    root = f"/tmp/incdedup_{n}"
    t0 = time.time()
    idx = D.MinHashIndex.build(corpus, "doc_id", "text", path=f"{root}/mh")
    out["build_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    pairs = idx.match(new)
    out["cross_pairs"] = pairs.count()
    out["match_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    out["batch_selfjoin_pairs"] = D.minhash_dedup_pairs(new, "doc_id", "text").count()
    out["batch_selfjoin_s"] = round(time.time() - t0, 1)

    # the cost incremental dedup avoids: re-mining corpus+new from text
    t0 = time.time()
    out["full_remine_pairs"] = D.minhash_dedup_pairs(
        corpus.unionByName(new), "doc_id", "text"
    ).count()
    out["full_remine_s"] = round(time.time() - t0, 1)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
