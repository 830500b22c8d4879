"""Decontamination rehearsal with a REALISTIC contamination rate.

The text-suite rehearsal (scale_check_bm25.py) splits one Zipf corpus
into train/eval, which SATURATES the matched-shingle bound: hot-token
6-grams make ~91% of train docs "contaminated", so the post-join
shuffle is corpus-sized and the operator's scale argument (shuffle
volume = |matched shingles|, ~0 on a real corpus) never shows in the
number. This fixture makes contamination what it is in production —
rare and known:

- train: n docs over vocabulary A (w0..w499, the shared generator);
- eval: n//100 docs over a DISJOINT vocabulary B (e0..e499) — a real
  benchmark's text is not the crawl's text;
- plants: contam_pct of train docs get a 12-token span copied from a
  deterministic eval doc appended — the actual leak shape
  (GPT-3 appendix C measures exactly this: eval n-grams inside train).

Because the vocabularies are disjoint, every flagged doc must be a
plant and every plant must be flagged (a 12-token span contains 7
6-grams) — recall and precision are asserted 1.0, so the timing is for
a provably-correct run.

Usage: python tools/scale_check_decontam.py [n_docs] [contam_pct]
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

from gamma_spark.operators import dedup as D  # noqa: E402
from gamma_spark.session import get_spark  # noqa: E402

EVAL_VOCAB = [f"e{i}" for i in range(500)]
TRAIN_VOCAB = [f"w{i}" for i in range(500)]
SPAN = 12  # planted span length (tokens) -> SPAN - 6 + 1 = 7 shingles


def _eval_tokens(eval_id: int, size: int = 80) -> list:
    rng = np.random.default_rng(9_000_000 + eval_id)
    return list(rng.choice(EVAL_VOCAB, size=size))


def make_train(spark, n: int, n_eval: int, every: int):
    """Train corpus; docs with id % every == 0 carry a planted span
    from eval doc (id // every) % n_eval."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = []
            for i in ids:
                i = int(i)
                rng = np.random.default_rng(42 + i)
                toks = list(rng.choice(TRAIN_VOCAB, size=80))
                if i % every == 0:
                    ev = _eval_tokens((i // every) % n_eval)
                    start = int(rng.integers(0, 80 - SPAN))
                    toks.extend(ev[start : start + SPAN])
                texts.append(" ".join(toks))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    parts = max(32, n // 50_000)
    return spark.range(n).repartition(parts).mapInPandas(
        gen, schema="doc_id long, text string"
    )


def make_eval(spark, n_eval: int):
    rows = [(i, " ".join(_eval_tokens(i))) for i in range(n_eval)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    contam_pct = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    every = max(1, int(round(100.0 / contam_pct)))
    n_eval = max(100, n // 100)
    spark = get_spark("decontam-scale")

    train = make_train(spark, n, n_eval, every)
    ev = make_eval(spark, n_eval)

    t0 = time.time()
    flagged = D.decontaminate(train, ev, n=6)
    n_flagged = flagged.count()
    wall = round(time.time() - t0, 2)

    planted = n // every + (1 if n % every else 0)
    wrong = flagged.filter(F.col("doc_id") % every != 0).count()
    out = {
        "n_train": n,
        "n_eval": n_eval,
        "contam_pct": contam_pct,
        "planted": planted,
        "flagged": n_flagged,
        "false_positives": wrong,
        "recall": round(n_flagged / max(planted, 1), 4) if wrong == 0 else None,
        "decontaminate_sec": wall,
    }
    print(json.dumps(out))
    assert wrong == 0, "disjoint vocab must yield zero false positives"
    assert n_flagged == planted, (n_flagged, planted)
    spark.stop()


if __name__ == "__main__":
    main()
