"""Scale rehearsal for the O(batch) bucketed upsert (BucketedDocStore):
generate an N-doc table, materialize it as a 256-bucket store, then
drip-feed a small batch and measure (a) wall time vs a full-table
snapshot rewrite, (b) how many bucket directories the commit touched.

This is the local stand-in for the 100 TB question: a drip-feed batch
must cost O(batch buckets / nbuckets) of the table, not O(table) — the
Spark analogue of the reference's in-place update
(`search/gamma_engine.cc:761-800`).

Usage: python tools/scale_check_upsert.py [n_docs] [batch_keys] [out_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gamma_spark.session import get_spark  # noqa: E402
from gamma_spark.table import BucketedDocStore, GammaTable  # noqa: E402

NBUCKETS = 256


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    batch_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/gamma_upsert_rehearsal"
    shutil.rmtree(out, ignore_errors=True)
    spark = get_spark("scale-upsert")

    docs = spark.range(n).select(
        F.col("id").alias("_id"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        (F.col("id") % 1000).cast("double").alias("value"),
    )
    table = GammaTable(spark, docs, id_col="_id")

    t0 = time.time()
    store = BucketedDocStore.create(table, os.path.join(out, "store"), nbuckets=NBUCKETS)
    t_create = time.time() - t0

    batch = spark.range(batch_keys).select(
        (F.col("id") * (n // batch_keys)).alias("_id"),  # spread across buckets
        F.lit("updated").alias("payload"),
        F.lit(-1.0).alias("value"),
    )

    docs_dir = os.path.join(out, "store", "docs")

    def mtimes():
        m = {}
        for d in os.listdir(docs_dir):
            if d.startswith("_bucket="):
                p = os.path.join(docs_dir, d)
                m[d] = max(os.path.getmtime(os.path.join(p, f)) for f in os.listdir(p))
        return m

    before = mtimes()
    t0 = time.time()
    store = store.upsert(batch)
    t_upsert = time.time() - t0
    after = mtimes()
    touched = sum(1 for d in before if after[d] != before[d])

    # narrow batch: all keys in one bucket -> must touch ~1 bucket
    one = spark.createDataFrame([(7, "one", 0.0)], "_id long, payload string, value double")
    before = mtimes()
    t0 = time.time()
    store = store.upsert(one)
    t_one = time.time() - t0
    touched_one = sum(1 for d in before if mtimes()[d] != before[d])

    # baseline: the old persist_root behavior = full snapshot rewrite
    t0 = time.time()
    table.add_or_update(batch, persist_root=os.path.join(out, "full"))
    t_full = time.time() - t0

    print(json.dumps({
        "n_docs": n, "nbuckets": NBUCKETS, "batch_keys": batch_keys,
        "create_store_sec": round(t_create, 2),
        "spread_batch_upsert_sec": round(t_upsert, 2),
        "spread_batch_buckets_touched": touched,
        "one_key_upsert_sec": round(t_one, 2),
        "one_key_buckets_touched": touched_one,
        "full_snapshot_rewrite_sec": round(t_full, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
