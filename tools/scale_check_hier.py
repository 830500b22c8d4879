"""Scale rehearsal for the two-level (hierarchical) coarse quantizer:
at ncentroids where the flat probe's broadcast is still cheap, verify
the relation-based probe (a) returns the same answers, (b) costs an
acceptable constant factor, so the 65k+-centroid regime (where flat
probing is impossible) has a measured, working plan.

At ``ncentroids >= 32768`` (the at-ceiling mode, VERDICT r6 #3) the
script skips k-means — Lloyd over >=131k centroids is not the thing
under test — and instead samples ncentroids corpus vectors as the
centroid set (classic k-means init), assigns every doc to its exact
nearest centroid with a CHUNKED map-only kernel (the stock
assign_clusters would materialize a rows x 131k distance matrix per
Arrow batch), and then measures the flat vs hierarchical probe plus
driver peak RSS.

Usage: python tools/scale_check_hier.py [n_docs] [ncentroids] [out_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from gamma_spark.operators import knn  # noqa: E402
from gamma_spark.operators.ivf import IvfFlatIndex  # noqa: E402
from gamma_spark.session import get_spark  # noqa: E402
from tools.scale_check import make_corpus  # noqa: E402

K = 10
CEILING_MODE_MIN = 32_768


def _build_at_ceiling(spark, docs, ncent: int, out: str, seed: int = 42):
    """Sampled-centroid build for the >=65k regime: centroids = a
    deterministic ncent-row sample of the corpus; assignment = exact
    argmin over ALL centroids, computed in centroid-chunks so each
    Arrow batch holds at most rows x 8192 distance cells."""
    samp = (
        docs.select(F.col("embedding").cast("array<double>").alias("_v"))
        .orderBy(F.xxhash64(F.col("_v").cast("string"), F.lit(seed)))
        .limit(ncent)
        .toPandas()
    )
    # float32 assignment: the argmin is memory-bandwidth bound under 32
    # concurrent workers, so halving the bytes ~doubles throughput; a
    # borderline (quantization-flipped) assignment only moves a doc to
    # an equidistant cluster — the probe still reaches it at nprobe>>1
    cents = np.stack(samp["_v"].to_numpy()).astype(np.float32)
    cnorm = (cents * cents).sum(axis=1)
    cchunk = 8192

    def assign(batches):
        import pandas as pd  # noqa: F401

        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
            best_d = np.full(len(mat), np.inf, dtype=np.float32)
            best_i = np.zeros(len(mat), dtype=np.int64)
            buf = None
            for s in range(0, len(cents), cchunk):
                cb = cents[s : s + cchunk]
                if buf is None or buf.shape != (len(mat), len(cb)):
                    buf = np.empty((len(mat), len(cb)), dtype=np.float32)
                np.matmul(mat, cb.T, out=buf)
                buf *= -2.0
                buf += cnorm[None, s : s + cchunk]
                j = buf.argmin(axis=1)
                dj = np.take_along_axis(buf, j[:, None], axis=1).ravel()
                upd = dj < best_d
                best_d[upd] = dj[upd]
                best_i[upd] = j[upd] + s
            pdf = pdf.copy()
            pdf["cluster_id"] = best_i.astype(np.int32)
            yield pdf

    from pyspark.sql.types import IntegerType, StructField, StructType

    schema = StructType(
        list(docs.schema.fields) + [StructField("cluster_id", IntegerType())]
    )
    assigned = docs.mapInPandas(assign, schema=schema)
    assigned.repartition("cluster_id").write.mode("overwrite").parquet(
        os.path.join(out, "index")
    )
    assigned = spark.read.parquet(os.path.join(out, "index"))
    # the probe paths run float64 math over the centroid matrix
    return IvfFlatIndex(cents.astype(np.float64), assigned)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    ncent = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/gamma_hier"
    shutil.rmtree(out, ignore_errors=True)
    spark = get_spark("hier-check")

    docs = make_corpus(spark, n, os.path.join(out, "docs"))
    docs.count()

    t0 = time.time()
    if ncent >= CEILING_MODE_MIN:
        idx = _build_at_ceiling(spark, docs, ncent, os.path.join(out, "ivf"))
    else:
        idx = IvfFlatIndex.build(
            docs, ncentroids=ncent, sample_size=100_000, seed=42,
            path=os.path.join(out, "ivf"),
        )
    idx.index_df.count()
    t_build = time.time() - t0
    t0 = time.time()
    # supers ~ sqrt(C) by default; the SCALING.md claim is "supers stay
    # a broadcastable few-hundred-row matrix while centroids stream as
    # a relation"
    idx.build_hierarchy(nsuper=512 if ncent >= CEILING_MODE_MIN else None)
    t_hier = time.time() - t0
    nsuper = len(idx._hierarchy[0])

    nq = min(20_000, n // 4)
    qbig = docs.filter(F.col("_docid") < nq).select(
        F.col("_docid").alias("qid"), F.col("embedding").alias("qvec")
    )

    # exact truth on a 64-query probe subset
    qsmall = spark.createDataFrame(
        [
            (int(r._docid), list(map(float, r.embedding)))
            for r in docs.filter(F.col("_docid") < 64).collect()
        ],
        "qid long, qvec array<float>",
    )
    truth: dict[int, set] = {}
    for r in knn.knn_scan(docs, qsmall, k=K, metric="L2").collect():
        truth.setdefault(r.qid, set()).add(r._docid)

    def recall(rows) -> float:
        got: dict[int, set] = {}
        for r in rows:
            got.setdefault(r.qid, set()).add(r._docid)
        return sum(
            len(got.get(q, set()) & s) / len(s) for q, s in truth.items()
        ) / len(truth)

    results = {
        "n_docs": n, "ncentroids": ncent, "nsuper": nsuper,
        "n_queries": nq, "k": K,
        "build_sec": round(t_build, 2), "hier_build_sec": round(t_hier, 2),
    }
    nprobe = max(8, ncent // 256)
    results["nprobe"] = nprobe
    probes = [
        ("flat", {}),
        ("hier_w4", {"hierarchical": True, "super_probe": 4}),
        ("hier_w8", {"hierarchical": True, "super_probe": 8}),
    ]
    if ncent >= CEILING_MODE_MIN:
        probes.append(("hier_w16", {"hierarchical": True, "super_probe": 16}))
    for mode, kw in probes:
        t0 = time.time()
        res = idx.knn_join_distributed(qbig, k=K, metric="L2", nprobe=nprobe, **kw)
        cnt = res.count()
        results[f"{mode}_sec"] = round(time.time() - t0, 2)
        results[f"{mode}_rows"] = cnt
        results[f"{mode}_recall"] = round(
            recall(res.filter(F.col("qid") < 64).collect()), 4
        )
        print(json.dumps({mode: results[f"{mode}_sec"],
                          "recall": results[f"{mode}_recall"]}), file=sys.stderr)

    import resource

    results["driver_peak_rss_mb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
    )
    results["centroid_matrix_mb"] = round(idx.centroids.nbytes / 1e6, 1)
    results["super_matrix_mb"] = round(idx._hierarchy[0].nbytes / 1e6, 2)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
