"""IVFPQ — product quantization with two-phase exact rerank
(SURVEY K3, O6).

Reference behavior (`index/impl/gamma_index_ivfpq.cc`): coarse IVF
quantizer (ncentroids) + per-subspace codebooks (nsubvector x 2^nbits);
search scans ``nprobe`` lists computing approximate distances via a
per-query ADC lookup table, keeps ``recall_num`` candidates, then
optionally fetches raw vectors and reranks exactly (``has_rank``,
`compute_dis` :642-697) before emitting top-k. Defaults: ncentroids
2048, nsubvector 64, nbits 8, nprobe 80 (`gamma_index_ivfpq.h:676-707`).

Spark design:

- **Train**: codebooks are per-subspace k-means over a bounded sample —
  numpy Lloyd iterations on the driver (the training set is bounded by
  ``indexing_size`` exactly as in the reference; the *data* never
  leaves the cluster, only the sample).
- **Encode**: one ``mapInPandas`` pass writes ``codes: array<int>``
  (m entries in [0, ksub)) + ``cluster_id``; persisted partitioned by
  ``cluster_id``. At 100 TB the codes table is ~m bytes/row — the whole
  point of PQ is that this scan is tiny compared to raw vectors.
- **ADC search**: per-query lookup tables (m x ksub, numpy) ride into a
  ``mapInPandas`` kernel that gathers LUT[m, code] and keeps
  partition-local top-``recall_num`` heaps — same shuffle-light shape
  as the FLAT scan kernel.
- **Rerank**: candidates join back to raw vectors (broadcast the
  candidate ids — they are k-scale), exact distance, final top-k.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gamma_spark.functions import vector as V
from gamma_spark.operators.ivf import IvfFlatIndex, assign_clusters
from gamma_spark.operators.topk import topk


from gamma_spark.operators.ivf import kmeans_lloyd_np as _kmeans_np


class IvfPqIndex:
    """IVF + PQ codes + exact rerank."""

    name = "IVFPQ"

    def __init__(
        self,
        centroids: np.ndarray,  # (ncentroids, d) coarse quantizer
        codebooks: np.ndarray,  # (m, ksub, dsub) subspace codebooks
        codes_df: DataFrame,  # (_docid, cluster_id, codes)
        raw_docs: DataFrame,  # docs relation with raw vectors
        doc_vec: str,
        path: str | None = None,
    ):
        self.centroids = centroids
        self.codebooks = codebooks
        self.codes_df = codes_df
        self.raw_docs = raw_docs
        self.doc_vec = doc_vec
        self.path = path
        self.m, self.ksub, self.dsub = codebooks.shape

    @classmethod
    def build(
        cls,
        docs: DataFrame,
        doc_vec: str = "embedding",
        ncentroids: int = 256,
        nsubvector: int = 8,
        nbits: int = 8,
        sample_size: int = 100_000,
        seed: int = 42,
        path: str | None = None,
    ) -> "IvfPqIndex":
        from gamma_spark.operators.ivf import _train_centroids

        centroids = _train_centroids(docs, doc_vec, ncentroids, sample_size, seed)
        d = centroids.shape[1]
        if d % nsubvector:
            raise ValueError(f"dimension {d} not divisible by nsubvector {nsubvector}")
        dsub, ksub = d // nsubvector, 2**nbits

        # cap codebook training points per centroid (faiss caps at 256;
        # 128 is plenty for 8-dim subspaces) — training cost scales
        # linearly in this
        cap = min(sample_size, 100_000, 128 * ksub)
        spdf = (
            docs.select(F.col(doc_vec).cast("array<double>").alias("_v"))
            .limit(cap)
            .toPandas()
        )
        sample = np.stack(spdf["_v"].to_numpy()).astype(np.float64)
        codebooks = np.stack(
            [
                _kmeans_np(sample[:, i * dsub : (i + 1) * dsub], ksub, seed + i)
                for i in range(nsubvector)
            ]
        )  # (m, ksub_eff, dsub) — ksub_eff may be < 2^nbits on tiny data
        cls_m, cls_ksub = nsubvector, codebooks.shape[1]

        assigned = assign_clusters(docs, centroids, doc_vec)
        cb = codebooks

        def encode(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                mat = np.stack(pdf[doc_vec].to_numpy()).astype(np.float64)
                codes = np.empty((len(mat), cls_m), dtype=np.int32)
                for i in range(cls_m):
                    sub = mat[:, i * dsub : (i + 1) * dsub]
                    cents = cb[i]
                    dist = (
                        (sub * sub).sum(axis=1)[:, None]
                        - 2.0 * (sub @ cents.T)
                        + (cents * cents).sum(axis=1)[None, :]
                    )
                    codes[:, i] = dist.argmin(axis=1)
                yield pd.DataFrame(
                    {
                        "_docid": pdf["_docid"].to_numpy(dtype=np.int64),
                        "cluster_id": pdf["cluster_id"].to_numpy(dtype=np.int32),
                        "codes": list(codes),
                    }
                )

        codes_df = assigned.mapInPandas(
            encode, schema="_docid long, cluster_id int, codes array<int>"
        )
        if path:
            # co-locate inverted lists before the partitioned write (see
            # IvfFlatIndex.build: avoids tasks x clusters tiny files)
            codes_df.repartition("cluster_id").write.mode("overwrite").partitionBy(
                "cluster_id"
            ).parquet(os.path.join(path, "codes"))
            np.save(os.path.join(path, "centroids.npy"), centroids)
            np.save(os.path.join(path, "codebooks.npy"), codebooks)
            with open(os.path.join(path, "meta.json"), "w") as fh:
                json.dump(
                    {"model": cls.name, "nsubvector": nsubvector, "doc_vec": doc_vec}, fh
                )
            codes_df = docs.sparkSession.read.parquet(os.path.join(path, "codes"))
        return cls(centroids, codebooks, codes_df, docs, doc_vec, path)

    @classmethod
    def load(cls, spark: SparkSession, path: str, raw_docs: DataFrame) -> "IvfPqIndex":
        with open(os.path.join(path, "meta.json")) as fh:
            meta = json.load(fh)
        return cls(
            np.load(os.path.join(path, "centroids.npy")),
            np.load(os.path.join(path, "codebooks.npy")),
            spark.read.parquet(os.path.join(path, "codes")),
            raw_docs,
            meta["doc_vec"],
            path,
        )

    # -- search -----------------------------------------------------------
    def search(
        self,
        docs: DataFrame,  # protocol arg; raw vectors for rerank (None -> build-time docs)
        queries: DataFrame,
        k: int = 10,
        metric: str = "IP",
        doc_vec: str | None = None,
        nprobe: int = 10,
        recall_num: int | None = None,
        has_rank: bool = True,
        predicate: Column | None = None,
        min_score: float | None = None,
        max_score: float | None = None,
        l2_sqrt: bool = False,
        query_id: str = "qid",
        query_vec: str = "qvec",
    ) -> DataFrame:
        """ADC candidate generation + optional exact rerank.

        ``recall_num`` defaults to max(4k, 64) candidates per query
        (reference keeps recall_num >= k, `gamma_index_ivfpq.cc:762-764`).
        Without ``has_rank`` the ADC ordering is truncated at k directly.
        """
        doc_vec = doc_vec or self.doc_vec
        raw = docs if docs is not None else self.raw_docs
        recall_num = recall_num or max(4 * k, 64)
        asc = V.metric_ascending(metric)
        metric_u = metric.upper()
        if metric_u not in ("IP", "L2"):
            raise ValueError("IVFPQ supports IP and L2")

        qrows = queries.select(query_id, query_vec).collect()
        qids = np.asarray([r[0] for r in qrows], dtype=np.int64)
        qmat = np.asarray([r[1] for r in qrows], dtype=np.float64)

        # per-query ADC lookup tables: (Q, m, ksub)
        m, ksub, dsub = self.m, self.ksub, self.dsub
        luts = np.empty((len(qids), m, ksub))
        for i in range(m):
            qsub = qmat[:, i * dsub : (i + 1) * dsub]  # (Q, dsub)
            cb = self.codebooks[i]  # (ksub, dsub)
            if metric_u == "IP":
                luts[:, i, :] = qsub @ cb.T
            else:
                luts[:, i, :] = (
                    (qsub * qsub).sum(axis=1)[:, None]
                    - 2.0 * (qsub @ cb.T)
                    + (cb * cb).sum(axis=1)[None, :]
                )

        coarse = IvfFlatIndex(self.centroids, self.codes_df)
        probes = coarse.probe_clusters(qmat, nprobe)
        wanted = sorted({int(c) for row in probes for c in row})
        # (Q, ncentroids) bool: query q probes cluster c
        probe_mask = np.zeros((len(qids), len(self.centroids)), dtype=bool)
        for qi, row in enumerate(probes):
            probe_mask[qi, row] = True

        pruned = self.codes_df.filter(F.col("cluster_id").isin(wanted))
        if predicate is not None or "_deleted" in raw.columns:
            allowed = raw
            if predicate is not None:
                allowed = allowed.filter(predicate)
            if "_deleted" in allowed.columns:
                allowed = allowed.filter(~F.col("_deleted"))
            pruned = pruned.join(allowed.select("_docid"), on="_docid", how="leftsemi")

        qids_l, luts_l, asc_l, rn = qids, luts, asc, recall_num
        pmask = probe_mask

        def adc_scan(batches):
            best_s = np.full((len(qids_l), rn), np.inf if asc_l else -np.inf)
            best_i = np.full((len(qids_l), rn), -1, dtype=np.int64)
            seen = 0
            for pdf in batches:
                if pdf.empty:
                    continue
                seen += len(pdf)
                codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # (B, m)
                ids = pdf["_docid"].to_numpy(dtype=np.int64)
                clus = pdf["cluster_id"].to_numpy(dtype=np.int64)
                # ADC: s[q, b] = sum_m LUT[q, m, codes[b, m]]
                s = np.zeros((len(qids_l), len(ids)))
                for i in range(codes.shape[1]):
                    s += luts_l[:, i, codes[:, i]]
                # candidate counts for query q only if its cluster was probed by q
                s = np.where(pmask[:, clus], s, np.inf if asc_l else -np.inf)
                cand_s = np.concatenate([best_s, s], axis=1)
                cand_i = np.concatenate(
                    [best_i, np.broadcast_to(ids, (len(qids_l), len(ids)))], axis=1
                )
                kk = min(rn, cand_s.shape[1])
                part = np.argpartition(cand_s if asc_l else -cand_s, kk - 1, axis=1)[:, :kk]
                best_s = np.take_along_axis(cand_s, part, axis=1)
                best_i = np.take_along_axis(cand_i, part, axis=1)
            if not seen:
                return
            valid = (best_i.ravel() >= 0) & np.isfinite(best_s.ravel())
            yield pd.DataFrame(
                {
                    "qid": np.repeat(qids_l, best_s.shape[1])[valid],
                    "_docid": best_i.ravel()[valid],
                    "adc_score": best_s.ravel()[valid],
                }
            )

        partials = pruned.mapInPandas(
            adc_scan, schema="qid long, _docid long, adc_score double"
        )
        candidates = topk(
            partials, ["qid"], "adc_score", recall_num, ascending=asc, rank_col=None,
            tiebreak_cols=["_docid"],
        )

        if not has_rank:
            out = candidates.withColumnRenamed("adc_score", "score")
            return topk(out, ["qid"], "score", k, ascending=asc, tiebreak_cols=["_docid"])

        # two-phase rerank (R6): exact distances for the candidate set
        qdf = queries.select(
            F.col(query_id).alias("_qid2"), F.col(query_vec).alias("_qvec")
        )
        rer = (
            candidates.join(raw.select("_docid", doc_vec), on="_docid", how="inner")
            .join(F.broadcast(qdf), on=F.col("qid") == F.col("_qid2"), how="inner")
            .select(
                "qid",
                "_docid",
                V.score(metric, doc_vec, "_qvec", l2_sqrt=l2_sqrt).alias("score"),
            )
        )
        if min_score is not None:
            rer = rer.filter(F.col("score") >= min_score)
        if max_score is not None:
            rer = rer.filter(F.col("score") <= max_score)
        return topk(rer, ["qid"], "score", k, ascending=asc, tiebreak_cols=["_docid"])
