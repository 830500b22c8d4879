"""Migrate-export lock-hold rehearsal (VERDICT r10 #6).

Builds a BucketedDocStore at [n_docs], advances it one delta commit,
then measures the writer-lock hold of the snapshot-isolated export:

  pin_s        lock-hold of the r11 hardlink pin (O(part files))
  scan_s       the delta scan + checkpoint that now runs OUTSIDE the
               lock (this was the r10 lock-hold)
  n_part_files what the pin cost actually scales with

Usage: python tools/scale_check_migrate.py [n_docs] [nbuckets]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gamma_spark.session import get_spark  # noqa: E402
from gamma_spark.table import BucketedDocStore, GammaTable  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nbuckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("migrate-scale")
    import tempfile

    work = tempfile.mkdtemp(prefix="migrate_scale_")
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document text payload "), F.col("id")).alias("text"),
        (F.col("id") % 7).cast("int").alias("label"),
    )
    table = GammaTable(spark, docs, id_col="doc_id")
    root = os.path.join(work, "store")
    t0 = time.time()
    store = BucketedDocStore.create(table, root, nbuckets=nbuckets)
    create_s = time.time() - t0

    snap_root = os.path.join(work, "snap")
    store.table().dump(snap_root)
    base = GammaTable.load(spark, snap_root)

    # one drip-feed delta commit: 1% updates + 0.1% inserts
    batch = (
        docs.filter(F.col("doc_id") % 100 == 0)
        .withColumn("text", F.concat(F.lit("UPDATED "), F.col("doc_id")))
        .unionByName(
            docs.filter(F.col("doc_id") % 1000 == 0).select(
                (F.col("doc_id") + 10 * n).alias("doc_id"), "text", "label"
            )
        )
    )
    store = store.upsert(batch)

    t0 = time.time()
    pin = store._pin_current_commit()
    pin_s = time.time() - t0
    n_files = sum(
        len([f for f in files if not f.startswith(("_", "."))])
        for _, _, files in os.walk(os.path.join(pin, "docs"))
    )
    t0 = time.time()
    upserts, deleted = store._pinned_table(pin).migrate_since(base)
    upserts = upserts.localCheckpoint()
    deleted = deleted.localCheckpoint()
    scan_s = time.time() - t0
    n_up, n_del = upserts.count(), deleted.count()
    import shutil

    shutil.rmtree(pin, ignore_errors=True)

    print(json.dumps({
        "what": "migrate_export_lock_hold",
        "n_docs": n,
        "nbuckets": nbuckets,
        "store_create_s": round(create_s, 2),
        "pin_s_lock_hold_r11": round(pin_s, 4),
        "scan_s_was_lock_hold_r10": round(scan_s, 2),
        "n_part_files": n_files,
        "n_upserts": n_up,
        "n_deleted": n_del,
    }))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
