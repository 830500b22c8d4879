"""Corpus-transform scale rehearsal: N synthetic documents (default 1M)
through pii_scrub (scan-stage regex projection) and paragraph_dedup
(map-side chunking + keeper election + per-doc reassembly), with planted
duplicate paragraphs so the dedup does real work.

Usage: python tools/scale_check_transforms.py [n_docs]
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

from gamma_spark.operators import transforms as TR  # noqa: E402
from gamma_spark.session import get_spark  # noqa: E402

VOCAB = [f"w{i}" for i in range(500)]
#: 10 boilerplate paragraphs (exactly chunk-width tokens) that ~30% of
#: docs splice in — the repeated-banner structure paragraph dedup exists
#: to strip (cookie notices, nav bars, license headers).
WIDTH = 20
BOILER = [
    " ".join(np.random.default_rng(1000 + b).choice(VOCAB, size=WIDTH))
    for b in range(10)
]


def make_corpus(spark, n: int):
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = []
            for i in ids:
                rng = np.random.default_rng(42 + int(i))
                toks = list(rng.choice(VOCAB, size=int(rng.integers(40, 120))))
                body = " ".join(toks)
                if i % 10 < 3:  # plant a boilerplate paragraph up front
                    body = BOILER[int(i) % 10] + " " + body
                texts.append(body)
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    return spark.range(n).repartition(32).mapInPandas(
        gen, schema="doc_id long, text string"
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("transforms-scale")
    docs = make_corpus(spark, n).cache()
    docs.count()
    out = {"n_docs": n}

    t0 = time.time()
    scrubbed = TR.scrub_pii(docs)
    out["pii_scrub_rows"] = scrubbed.count()
    out["pii_scrub_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    dd = TR.paragraph_dedup(docs, width=WIDTH)
    agg = dd.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_chunks").alias("chunks"),
        F.sum("n_dropped").alias("dropped"),
    ).collect()[0]
    out["paragraph_dedup_s"] = round(time.time() - t0, 1)
    out["chunks"] = int(agg["chunks"])
    out["dropped"] = int(agg["dropped"])
    # sanity: ~30% of docs carry a boilerplate chunk; all but the first
    # occurrences must drop. Body chunks are rng-unique, so dropped ≈
    # 0.3*n plus chance collisions of short tail chunks (500-word vocab
    # -> 1-token tails collide at ~1/20 of docs); min_tokens=5 should
    # take dropped back to ≈ planted.
    planted = int(0.3 * n) - 3
    out["dropped_vs_planted"] = round(out["dropped"] / max(planted, 1), 4)

    t0 = time.time()
    agg5 = (
        TR.paragraph_dedup(docs, width=WIDTH, min_tokens=5)
        .agg(F.sum("n_dropped").alias("dropped"))
        .collect()[0]
    )
    out["paragraph_dedup_minlen5_s"] = round(time.time() - t0, 1)
    out["dropped_minlen5_vs_planted"] = round(
        int(agg5["dropped"]) / max(planted, 1), 4
    )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
