"""IVFSQ8 — IVF over 8-bit scalar-quantized vectors.

The idiomatic answer to the reference's lossy vector compression tier
(ZFP-compressed raw vector store, `storage/compress/compressor_zfp.h:38-58`,
SURVEY O12): store each float32 dimension as one uint8 against trained
per-dimension [min, max] bounds — 4x fewer vector bytes scanned at
search time, with recall governed by quantization resolution instead of
a shortlist (contrast IVFPQ, where the code is sub-vector-level and
recall_num is the lever). The same tier faiss ships as
IndexScalarQuantizer(QT_8bit) + IVF.

Design: a thin composition over the IVF machinery — build trains the
same coarse quantizer and writes a cluster-partitioned CODES table
(uint8 bytes per row); search prunes code partitions with the standard
probe, decodes ONLY the probed lists back to floats in an Arrow kernel,
and delegates scoring/top-k to `IvfFlatIndex.search` on the decoded
relation. Nothing else is new — pruning, kernels, bands, l2_sqrt and
predicates are the already-audited paths.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from gamma_spark.functions.vector import stack_vectors

from gamma_spark.operators.ivf import (
    DEFAULT_NCENTROIDS,
    DEFAULT_NPROBE,
    IvfFlatIndex,
    _train_centroids,
    assign_clusters,
)


class IvfSq8Index:
    """RetrievalModel analogue for the scalar-quantized tier."""

    name = "IVFSQ8"

    def __init__(
        self,
        centroids: np.ndarray,
        codes_df: DataFrame,
        mins: np.ndarray,
        maxs: np.ndarray,
        doc_vec: str = "embedding",
        path: str | None = None,
    ):
        self.centroids = centroids
        self.codes_df = codes_df
        self.mins = np.asarray(mins, dtype=np.float64)
        self.maxs = np.asarray(maxs, dtype=np.float64)
        self.doc_vec = doc_vec
        self.path = path

    # -- build -----------------------------------------------------------

    @classmethod
    def build(
        cls,
        docs: DataFrame,
        doc_vec: str = "embedding",
        ncentroids: int = DEFAULT_NCENTROIDS,
        sample_size: int = 100_000,
        seed: int = 42,
        path: str | None = None,
    ) -> "IvfSq8Index":
        sout: dict = {}
        centroids = _train_centroids(
            docs, doc_vec, ncentroids, sample_size, seed, sample_out=sout
        )
        dim = centroids.shape[1]
        # per-dimension bounds over the FULL relation, the SQ train
        # step (faiss trains the same bounds from its sample). When the
        # centroid-training collection provably holds every row (small
        # relation, no sampling applied), min/max over that matrix is
        # the identical full-table statistic — skip the second
        # aggregation pass (guide §1.2); otherwise run the ONE
        # 2·d map-side-combinable min/max agg pass as before.
        # NaN guard: Spark's min/max order NaN as the GREATEST value
        # while numpy propagates it — only fuse when no NaN is present
        # so the two paths are bit-identical on every input.
        if sout.get("complete") and not np.isnan(sout["data"]).any():
            mins = sout["data"].min(axis=0)
            maxs = sout["data"].max(axis=0)
        else:
            aggs = [
                F.min(F.element_at(F.col(doc_vec), i + 1)).alias(f"mn{i}")
                for i in range(dim)
            ] + [
                F.max(F.element_at(F.col(doc_vec), i + 1)).alias(f"mx{i}")
                for i in range(dim)
            ]
            row = docs.agg(*aggs).collect()[0]
            mins = np.array([row[f"mn{i}"] for i in range(dim)], dtype=np.float64)
            maxs = np.array([row[f"mx{i}"] for i in range(dim)], dtype=np.float64)

        assigned = assign_clusters(docs, centroids, doc_vec)
        codes = cls._encode(assigned, doc_vec, mins, maxs)
        if path:
            codes.repartition("cluster_id").write.mode("overwrite").partitionBy(
                "cluster_id"
            ).parquet(os.path.join(path, "codes"))
            np.save(os.path.join(path, "centroids.npy"), centroids)
            np.save(os.path.join(path, "bounds.npy"), np.stack([mins, maxs]))
            from gamma_spark.io_util import atomic_write_json

            atomic_write_json(
                os.path.join(path, "meta.json"),
                {"model": cls.name, "ncentroids": len(centroids), "doc_vec": doc_vec},
            )
            codes = docs.sparkSession.read.parquet(os.path.join(path, "codes"))
        return cls(centroids, codes, mins, maxs, doc_vec, path)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IvfSq8Index":
        centroids = np.load(os.path.join(path, "centroids.npy"))
        bounds = np.load(os.path.join(path, "bounds.npy"))
        with open(os.path.join(path, "meta.json")) as fh:
            meta = json.load(fh)
        return cls(
            centroids,
            spark.read.parquet(os.path.join(path, "codes")),
            bounds[0], bounds[1], meta["doc_vec"], path,
        )

    # -- codec -----------------------------------------------------------

    @staticmethod
    def _encode(assigned: DataFrame, doc_vec: str, mins, maxs) -> DataFrame:
        """Replace the float vector column with d uint8 bytes/row."""
        from pyspark.sql.types import BinaryType, StructField, StructType

        mins64 = np.asarray(mins, dtype=np.float64)
        span = np.maximum(np.asarray(maxs, dtype=np.float64) - mins64, 1e-30)

        fields = [f for f in assigned.schema.fields if f.name != doc_vec]
        out_schema = StructType(fields + [StructField("_sq8", BinaryType())])
        keep = [f.name for f in fields]

        def enc(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                M = stack_vectors(
                    pdf[doc_vec].to_numpy(), "SQ8 encode (docs)"
                ).astype(np.float64)
                q = np.clip(
                    np.rint((M - mins64) / span * 255.0), 0, 255
                ).astype(np.uint8)
                out = pdf[keep].copy()
                out["_sq8"] = [r.tobytes() for r in q]
                yield out

        return assigned.mapInPandas(enc, schema=out_schema)

    def _decode(self, codes: DataFrame) -> DataFrame:
        """Restore a float vector column from the uint8 codes —
        reconstruction value mn + c/255*(mx-mn), the dequantization the
        scoring kernel consumes. Arrow-batched, map-only."""
        from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

        mins64, maxs64 = self.mins, self.maxs
        span = np.maximum(maxs64 - mins64, 1e-30)
        doc_vec = self.doc_vec

        fields = [f for f in codes.schema.fields if f.name != "_sq8"]
        out_schema = StructType(
            fields + [StructField(doc_vec, ArrayType(FloatType()))]
        )
        keep = [f.name for f in fields]
        dim = len(mins64)

        def dec(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                C = np.stack(
                    [np.frombuffer(b, dtype=np.uint8, count=dim) for b in pdf["_sq8"]]
                ).astype(np.float64)
                V = (mins64 + C / 255.0 * span).astype(np.float32)
                out = pdf[keep].copy()
                out[doc_vec] = list(V)
                yield out

        return codes.mapInPandas(dec, schema=out_schema)

    def _np_decoder(self):
        """Kernel-side decoder for the code-native scan/cogroup paths:
        maps a batch of ``_sq8`` byte strings straight to the float64
        score matrix. Bit-identical to decode-then-score: the same
        float64 dequantization expression rounded through float32 (what
        :meth:`_decode` materializes) before the float64 promotion the
        kernels apply."""
        mins64 = self.mins
        span = np.maximum(self.maxs - mins64, 1e-30)
        dim = len(mins64)

        def dec(raw) -> np.ndarray:
            C = np.stack(
                [np.frombuffer(b, dtype=np.uint8, count=dim) for b in raw]
            ).astype(np.float64)
            return (mins64 + C / 255.0 * span).astype(np.float32).astype(
                np.float64
            )

        return dec

    # -- search ----------------------------------------------------------

    def search(
        self,
        docs: DataFrame | None,  # raw vectors for the optional rerank
        queries: DataFrame,
        k: int = 10,
        metric: str = "IP",
        doc_vec: str | None = None,
        nprobe: int = DEFAULT_NPROBE,
        recall_num: int | None = None,
        has_rank: bool = False,
        predicate: Column | None = None,
        min_score: float | None = None,
        max_score: float | None = None,
        l2_sqrt: bool = False,
        query_id: str = "qid",
        query_vec: str = "qvec",
        **kw,
    ) -> DataFrame:
        """Probe → prune code partitions → the standard IVF scoring/
        top-k. On the scan path (large batches) the probed CODES bytes
        go straight into the BLAS kernel, which dequantizes at scoring
        (one Python pass over 1-byte/dim rows — guide §4); the
        small-batch Catalyst join path decodes the probed lists first
        (it scores with an expression, bit-reproducible vs the oracle).

        ``has_rank`` (R6, needs ``docs``): keep ``recall_num``
        dequantized-score candidates, join them back to the raw
        vectors, rescore exactly and re-select top-k — with full probes
        and recall_num = N this degenerates to exact brute force
        bit-for-bit (rerank scores are the in-order exact kernel), the
        oracle configuration; at practical settings it erases the
        quantization recall loss for the price of a k-scale join. Score
        bands apply to the exact reranked scores, matching gamma
        (`index/impl/gamma_index_ivfpq.cc:668,689`)."""
        dv = doc_vec or self.doc_vec
        qrows = queries.select(query_id, query_vec).collect()
        qmat = np.asarray([r[1] for r in qrows], dtype=np.float64)
        prober = IvfFlatIndex(self.centroids, self.codes_df)
        probes = prober.probe_clusters(qmat, nprobe)
        wanted = sorted({int(c) for row in probes for c in row})
        pruned = self.codes_df
        if len(wanted) < len(self.centroids):
            pruned = pruned.filter(F.col("cluster_id").isin(wanted))
        # strategy resolution mirrors IvfFlatIndex.search's 'auto' rule
        # (same constant, same float-metric set) so the relation handed
        # down matches the path the delegate will take: the scan kernel
        # consumes raw codes + the numpy decoder, the Catalyst join
        # path needs the decoded float column
        strategy = kw.pop("strategy", "auto")
        use_scan = metric.upper() in ("IP", "L2", "COSINE") and (
            strategy == "scan"
            or (
                strategy == "auto"
                and len(qrows) > IvfFlatIndex.SCAN_STRATEGY_MIN_Q
            )
        )
        if use_scan:
            helper = IvfFlatIndex(self.centroids, pruned)
            dv_eff, doc_decode, strategy = "_sq8", self._np_decoder(), "scan"
        else:
            helper = IvfFlatIndex(self.centroids, self._decode(pruned))
            dv_eff, doc_decode = dv, None
        # the batch is already collected and probed (the pre-decode
        # partition prune above needs both) — hand them down so the
        # delegated search doesn't re-collect and re-probe
        pre = (qrows, qmat, probes)
        if not (has_rank and docs is not None):
            return helper.search(
                None, queries, k=k, metric=metric, doc_vec=dv_eff, nprobe=nprobe,
                predicate=predicate, min_score=min_score, max_score=max_score,
                l2_sqrt=l2_sqrt, query_id=query_id, query_vec=query_vec,
                _precomputed=pre, strategy=strategy, doc_decode=doc_decode, **kw,
            )

        pool = max(recall_num or max(4 * k, 64), k)
        candidates = helper.search(
            None, queries, k=pool, metric=metric, doc_vec=dv_eff, nprobe=nprobe,
            predicate=predicate, query_id=query_id, query_vec=query_vec,
            _precomputed=pre, strategy=strategy, doc_decode=doc_decode, **kw,
        ).select("qid", "_docid")

        from pyspark.sql.types import StructField, StructType

        from gamma_spark.functions import vector as V
        from gamma_spark.operators.topk import topk

        spark = self.codes_df.sparkSession
        qschema = StructType(
            [
                StructField("_qid2", queries.schema[query_id].dataType),
                StructField("_qvec", queries.schema[query_vec].dataType),
            ]
        )
        qdf = spark.createDataFrame([(r[0], r[1]) for r in qrows], schema=qschema)
        rer = (
            candidates.join(docs.select("_docid", dv), on="_docid", how="inner")
            .join(F.broadcast(qdf), on=F.col("qid") == F.col("_qid2"), how="inner")
            .select(
                "qid",
                "_docid",
                V.score(metric, dv, "_qvec", l2_sqrt=l2_sqrt).alias("score"),
            )
        )
        if min_score is not None:
            rer = rer.filter(F.col("score") >= min_score)
        if max_score is not None:
            rer = rer.filter(F.col("score") <= max_score)
        return topk(
            rer, ["qid"], "score", k,
            ascending=V.metric_ascending(metric), tiebreak_cols=["_docid"],
        )


    # -- corpus-scale join (queries relation of any size) ----------------

    def knn_join_distributed(
        self,
        queries: DataFrame,
        k: int = 10,
        metric: str = "L2",
        nprobe: int = DEFAULT_NPROBE,
        rescore_docs: DataFrame | None = None,
        recall_num: int | None = None,
        l2_sqrt: bool = False,
        **kw,
    ) -> DataFrame:
        """Corpus x corpus kNN join for the compressed tier: run the
        audited IVF cogroup join code-native — the doc side shuffles
        the 1-byte/dim ``_sq8`` codes and the per-cluster kernel
        dequantizes at scoring (``doc_decode``), so the exchange
        carries a quarter of the float bytes and the decode costs no
        extra Python pass (guide §2.3/§4; scores bit-identical to
        decode-first — the decoder rounds through float32 exactly as
        ``_decode`` materializes). Scores are dequantized-exact by
        default; pass ``rescore_docs`` (the raw vector relation) to
        keep ``recall_num`` candidates per query and rescore them on
        the true floats — with full probes and recall_num = N that
        degenerates to exact brute force bit-for-bit (the PQ twin's
        contract)."""
        helper = IvfFlatIndex(self.centroids, self.codes_df)
        dec = self._np_decoder()
        if rescore_docs is None:
            return helper.knn_join_distributed(
                queries, k=k, metric=metric, nprobe=nprobe,
                doc_vec="_sq8", doc_decode=dec, l2_sqrt=l2_sqrt, **kw,
            )

        from gamma_spark.functions import vector as V
        from gamma_spark.operators.topk import topk

        pool = max(recall_num or max(4 * k, 64), k)
        # (qid, _docid) pairs are unique already: the inner join's
        # global top-pool emits at most one row per (query, doc) — a
        # dedup here would spend a full exchange proving it
        cand = helper.knn_join_distributed(
            queries, k=pool, metric=metric, nprobe=nprobe,
            doc_vec="_sq8", doc_decode=dec, l2_sqrt=l2_sqrt, **kw,
        ).select("qid", "_docid")
        # honor query_id/query_vec overrides riding in **kw: the
        # candidate pass above renames to (qid, _docid), but the
        # rescore must read the caller's OWN column names here
        qsel = queries.select(
            F.col(kw.get("query_id", "qid")).alias("qid"),
            F.col(kw.get("query_vec", "qvec")).alias("_qvec"),
        )
        rescored = (
            cand.join(
                rescore_docs.select("_docid", F.col(self.doc_vec).alias("_dvec")),
                on="_docid", how="inner",
            )
            .join(qsel, on="qid", how="inner")
            .select(
                "qid", "_docid",
                V.score(metric, "_dvec", "_qvec", l2_sqrt=l2_sqrt).alias("score"),
            )
        )
        return topk(
            rescored, ["qid"], "score", k,
            ascending=V.metric_ascending(metric), tiebreak_cols=["_docid"],
        )
